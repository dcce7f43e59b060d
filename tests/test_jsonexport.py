"""JSON marshal sink parity (filing.go String(), folder.go SaveFolder).

The reference's own marshal golden (samples/sample_10K_marshal.json)
predates its current bsData struct — its golden test is disabled with a
``Skip`` prefix (parser_test.go:556-597) — so we assert (a) exact value and
rendering parity on every key the golden carries, and (b) the full
current-struct layout, indent, and Go-style number forms.
"""

from __future__ import annotations

import json
import pathlib

SAMPLES = pathlib.Path(__file__).parent / "fixtures" / "samples"

GOLDEN_ROW = {
    # values of sample_10K_marshal.json expressed as a filings row
    "ticker": "AAPL",
    "filing_date": "2017-02-01",
    "filing_type": "10-K",
    "sharecount": 5575331000.0,
    "revenue": 233715000000.0,
    "cost_of_revenue": 140089000000.0,
    "gross_margin": 93626000000.0,
    "op_income": 71230000000.0,
    "op_expense": 22396000000.0,
    "net_income": 53394000000.0,
    "washares": 5793069000.0,
    "dps": 1.98,
    "ldebt": 53463000000.0,
    "sdebt": 0.0,
    "cliab": 80610000000.0,
    "deferred": 8940000000.0,
    "retained": 92284000000.0,
    "equity": 119355000000.0,
    "cassets": 89378000000.0,
    "cash": None,
    "securities": None,
    "goodwill": None,
    "intangibles": None,
    "assets": None,
    "liab": None,
    "op_cashflow": 81266000000.0,
    "capex": -11247000000.0,
    "dividends": 0.0,
    "interest": 0.0,
}


def test_marshal_golden_shared_keys():
    from edgar_spark.model.jsonexport import filing_json

    golden_text = (SAMPLES / "sample_10K_marshal.json").read_text().strip()
    got_text = filing_json(GOLDEN_ROW)

    golden = json.loads(golden_text)
    got = json.loads(got_text)
    assert got["Company"] == golden["Company"]
    assert got["Report date"] == golden["Report date"]
    gf, of = golden["Financial Data"], got["Financial Data"]
    assert of["Filing Type"] == gf["Filing Type"]
    for section in (
        "Entity Information",
        "Operational Information",
        "Cash Flow Information",
    ):
        # Collected Data differs by design: the golden predates the current
        # bitmask layout (its own test is skipped); values must agree
        for k, v in gf[section].items():
            if k != "Collected Data":
                assert of[section][k] == v, (section, k)
    for k, v in gf["Balance Sheet Information"].items():
        if k != "Collected Data":
            assert of["Balance Sheet Information"][k] == v, k

    # byte-level rendering parity on the lines the golden shares: indent,
    # ': ' separator, integral floats with no decimal point, shortest
    # fractional form
    golden_lines = set(l.rstrip(",") for l in golden_text.splitlines())
    got_lines = set(l.rstrip(",") for l in got_text.splitlines())
    shared_keys = {'"Revenue"', '"Dividend Per Share"', '"Shares Outstanding"',
                   '"Long-Term debt"', '"Capital Expenditure"', '"Company"',
                   '"Report date"', '"Filing Type"'}
    for line in golden_lines:
        if any(k in line for k in shared_keys):
            assert line in got_lines, line


def test_marshal_number_forms():
    from edgar_spark.model.jsonexport import filing_json

    row = dict(GOLDEN_ROW, dps=2.0, revenue=1234.5)
    text = filing_json(row)
    assert '"Dividend Per Share": 2' in text  # integral float → no ".0"
    assert '"Revenue": 1234.5' in text  # shortest fractional
    assert '"Cash": 0' in text  # unset → Go zero value
    assert text.startswith('{\n    "Company": "AAPL"')


def test_gofloat_extreme_integrals():
    """Go prints the shortest round-trip decimal; above 2^53 the exact
    binary expansion diverges from it, and -0.0 keeps its sign."""
    from edgar_spark.model.jsonexport import _GoFloat

    assert repr(_GoFloat(1.2345678901234568e20)) == "123456789012345680000"
    assert repr(_GoFloat(-0.0)) == "-0"
    assert repr(_GoFloat(0.0)) == "0"
    assert repr(_GoFloat(2.0)) == "2"
    assert repr(_GoFloat(-5.0)) == "-5"
    assert repr(_GoFloat(float(2**53 + 2))) == "9007199254740994"


def test_marshal_bitmask():
    from edgar_spark.model.jsonexport import filing_json

    got = json.loads(filing_json(GOLDEN_ROW))
    fd = got["Financial Data"]
    assert fd["Entity Information"]["Collected Data"] == 1  # sharecount bit 0
    assert fd["Operational Information"]["Collected Data"] == 255  # all 8
    # BS: bits 0..6 set, 7..12 (cash..liab) null → 0b1111111 = 127
    assert fd["Balance Sheet Information"]["Collected Data"] == 127
    assert fd["Cash Flow Information"]["Collected Data"] == 15


def test_folder_json_sorted_maps():
    from edgar_spark.model.jsonexport import folder_json

    rows = [
        dict(GOLDEN_ROW, filing_date="2016-02-01", filing_type="10-Q"),
        dict(GOLDEN_ROW, filing_date="2017-02-01", filing_type="10-K"),
        dict(GOLDEN_ROW, filing_date="2015-02-01", filing_type="10-K"),
    ]
    text = folder_json("AAPL", rows)
    obj = json.loads(text)
    assert list(obj["Financial Reports"]) == ["10-K", "10-Q"]
    assert list(obj["Financial Reports"]["10-K"]) == ["2015-02-01", "2017-02-01"]
    # shape matches samples/sample_folder.json
    assert text.startswith('{\n    "Company": "AAPL",\n    "Financial Reports": {')
