"""Tier-2 golden-file tests against the reference's samples/ corpus.

Each test replays a reference golden (parser_test.go tier-2 offline tests)
through the Python kernels; expected values are the exact floats embedded in
the reference tests.
"""

from __future__ import annotations

import pytest

from edgar_spark.parse.docs import (
    fin_report_facts,
    filing_index_parse,
    query_page_parse,
)
from edgar_spark.parse.numbers import (
    DOC_BS,
    DOC_CF,
    DOC_EN,
    DOC_INC,
    DOC_OPS,
)
from tests.conftest import read_sample


def consolidate_single_doc(facts):
    """Single-document reduction of the reference zero-guard semantics:
    per fin_type, first nonzero candidate wins, else 0.0-with-presence."""
    out = {}
    for _seq, ft, val in facts:
        if ft not in out or out[ft] == 0.0:
            if ft not in out or val != 0.0:
                out[ft] = val
    return out


def test_query_page_golden():  # parser_test.go:102-128
    links = query_page_parse(read_sample("sample_query.html"), "10-Q")
    expected = {
        "2018-08-01": "/cgi-bin/viewer?action=view&cik=320193&accession_number=0000320193-18-000100&xbrl_type=v",
        "2018-05-02": "/cgi-bin/viewer?action=view&cik=320193&accession_number=0000320193-18-000070&xbrl_type=v",
        "2018-02-02": "/cgi-bin/viewer?action=view&cik=320193&accession_number=0000320193-18-000007&xbrl_type=v",
        "2017-08-02": "/cgi-bin/viewer?action=view&cik=320193&accession_number=0000320193-17-000009&xbrl_type=v",
        "2017-05-03": "/cgi-bin/viewer?action=view&cik=320193&accession_number=0001628280-17-004790&xbrl_type=v",
        "2017-02-01": "/cgi-bin/viewer?action=view&cik=320193&accession_number=0001628280-17-000717&xbrl_type=v",
        "2016-07-27": "/cgi-bin/viewer?action=view&cik=320193&accession_number=0001628280-16-017809&xbrl_type=v",
        "2016-04-27": "/cgi-bin/viewer?action=view&cik=320193&accession_number=0001193125-16-559625&xbrl_type=v",
        "2016-01-27": "/cgi-bin/viewer?action=view&cik=320193&accession_number=0001193125-16-439878&xbrl_type=v",
        "2015-07-22": "/cgi-bin/viewer?action=view&cik=320193&accession_number=0001193125-15-259935&xbrl_type=v",
    }
    assert links == expected


def test_filing_index_10q():  # parser_test.go:138-154
    docs = filing_index_parse(read_sample("sample_10Q.html"), "10-Q")
    base = "/Archives/edgar/data/320193/000032019318000100/"
    assert docs[DOC_CF] == base + "R7.htm"
    assert docs[DOC_INC] == base + "R3.htm"
    assert docs[DOC_EN] == base + "R1.htm"
    assert docs[DOC_OPS] == base + "R2.htm"
    assert docs[DOC_BS] == base + "R5.htm"


def test_filing_index_10k():  # parser_test.go:156-172
    docs = filing_index_parse(read_sample("sample_10K.html"), "10-K")
    base = "/Archives/edgar/data/320193/000119312515356351/"
    assert docs[DOC_CF] == base + "R8.htm"
    assert docs[DOC_INC] == base + "R3.htm"
    assert docs[DOC_EN] == base + "R1.htm"
    assert docs[DOC_OPS] == base + "R2.htm"
    assert docs[DOC_BS] == base + "R5.htm"


def test_filing_index_10k_1():  # parser_test.go:231-246 (4-doc variant)
    docs = filing_index_parse(read_sample("sample_10K_1.html"), "10-K")
    base = "/Archives/edgar/data/320193/000119312511282113/"
    assert docs[DOC_CF] == base + "R6.htm"
    assert docs[DOC_EN] == base + "R1.htm"
    assert docs[DOC_OPS] == base + "R2.htm"
    assert docs[DOC_BS] == base + "R3.htm"


@pytest.mark.parametrize(
    "sample,golden",
    [
        ("sample_entity.html", 4829926000.0),  # parser_test.go:252-265
        ("sample_entity1.html", 266252295.0),  # parser_test.go:267-278
        ("sample_10K_entity.html", 5575331000.0),  # parser_test.go:280-291
    ],
)
def test_entity_parsers(sample, golden):
    facts, _ = fin_report_facts(read_sample(sample), DOC_EN)
    vals = consolidate_single_doc(facts)
    assert vals["Shares Outstanding"] == golden


def test_ops_parser():  # parser_test.go:297-327
    facts, _ = fin_report_facts(read_sample("sample_ops.html"), DOC_OPS)
    vals = consolidate_single_doc(facts)
    assert vals["Revenue"] == 53265000000.0
    assert vals["Cost Of Revenue"] == 32844000000.0
    assert vals["Gross Margin"] == 20421000000.0
    assert vals["Operational Expense"] == 7809000000.0
    assert vals["Operational Income"] == 12612000000.0
    assert vals["Net Income"] == 11519000000.0


def test_10k_ops_parser():  # parser_test.go:369-399
    facts, _ = fin_report_facts(read_sample("sample_10K_ops.html"), DOC_OPS)
    vals = consolidate_single_doc(facts)
    assert vals["Revenue"] == 233715000000.0
    assert vals["Cost Of Revenue"] == 140089000000.0
    assert vals["Gross Margin"] == 93626000000.0
    assert vals["Operational Expense"] == 22396000000.0
    assert vals["Operational Income"] == 71230000000.0
    assert vals["Net Income"] == 53394000000.0


def test_cf_parser():  # parser_test.go:405-423
    facts, _ = fin_report_facts(read_sample("sample_cf.html"), DOC_CF)
    vals = consolidate_single_doc(facts)
    assert vals["Operating Cash Flow"] == 57911000000.0
    assert vals["Capital Expenditure"] == -10272000000.0


def test_10k_cf_parser():  # parser_test.go:425-441
    facts, _ = fin_report_facts(read_sample("sample_10K_cf.html"), DOC_CF)
    vals = consolidate_single_doc(facts)
    assert vals["Operating Cash Flow"] == 81266000000.0
    assert vals["Capital Expenditure"] == -11247000000.0


def test_bs_parser():  # parser_test.go:447-477
    facts, _ = fin_report_facts(read_sample("sample_bs.html"), DOC_BS)
    vals = consolidate_single_doc(facts)
    assert vals["Current Liabilities"] == 88548000000.0
    assert vals["Long-Term debt"] == 97128000000.0
    assert vals["Retained Earnings"] == 79436000000.0
    assert vals["Cash"] == 31971000000.0
    assert vals["Total Liabilities"] == 234248000000.0
    assert vals["Total Assets"] == 349197000000.0


def test_bs1_parser():  # parser_test.go:479-523
    facts, _ = fin_report_facts(read_sample("sample_bs1.html"), DOC_BS)
    vals = consolidate_single_doc(facts)
    assert vals["Current Liabilities"] == 5018600000.0
    assert vals["Long-Term debt"] == 14846300000.0
    assert vals["Deferred revenue"] == 27000000.0
    assert vals["Total Shareholder Equity"] == 28331100000.0
    assert vals["Retained Earnings"] == -198200000.0
    assert vals["Goodwill"] == 24521500000.0
    assert vals["Intangibles"] == 19188400000.0
    assert vals["Cash"] == 250000000.0
    assert vals["Total Liabilities"] == 24193600000.0
    assert vals["Total Assets"] == 52529100000.0


def test_10k_bs_parser():  # parser_test.go:525-550
    facts, _ = fin_report_facts(read_sample("sample_10K_bs.html"), DOC_BS)
    vals = consolidate_single_doc(facts)
    assert vals["Current Liabilities"] == 80610000000.0
    assert vals["Long-Term debt"] == 53463000000.0
    assert vals["Retained Earnings"] == 92284000000.0
    assert vals["Total Liabilities"] == 171124000000.0
    assert vals["Total Assets"] == 290479000000.0


def test_cash_strict_gate():
    """data_def.go:229-233 — Cash facts are dropped from non-BS documents."""
    facts, _ = fin_report_facts(read_sample("sample_bs.html"), DOC_CF)
    vals = consolidate_single_doc(facts)
    assert "Cash" not in vals
