"""Deterministic synthetic EDGAR page corpus.

Generates a ``pages`` table (input_hint shape) whose page bodies follow the
structural idioms of the reference's samples/ corpus: browse-edgar query
pages (5-cell rows with an interactiveDataBtn viewer link), filing-index
viewer pages (``var reports = new Array(N)`` + accordion menu), and R<n>.htm
report pages (heading row with scale text + defref/onclick XBRL rows with
nump value cells). URL formats follow page.go:10-19.

Everything is a pure function of (company index, filing, tag) via crc32, so
tests can compute expected consolidated filings independently
(``expected_filing``), and generation is distributed (mapInPandas over a
range — no driver-side loops at bench scale).

A "golden company" (AAPL) embeds verbatim copies of the reference samples so
the end-to-end pipeline is checked against the reference's own goldens:
sample_query.html is the 10-Q query page, sample_10Q.html the index page of
accession 0000320193-18-000100, and sample_entity/ops/income/bs/cf.html its
R1/R2/R3/R5/R7 report pages (parser_test.go:102-128, :138-154, :252-265,
:297-327, :405-423, :447-477).
"""

from __future__ import annotations

import pathlib
import zlib
from datetime import datetime, timedelta, timezone
from typing import Dict, Iterator, List, Optional, Tuple

import pandas as pd

from edgar_spark.parse.numbers import (
    DOC_BS,
    DOC_CF,
    DOC_DEBT_NOTES,
    DOC_EN,
    DOC_INC,
    DOC_OPS,
)

BASE_URL = "https://www.sec.gov/"  # page.go:11 (trailing slash — see canonical.py)
QUERY_URL_FMT = (
    "https://www.sec.gov/cgi-bin/browse-edgar?action=getcompany"
    "&CIK={ticker}&type={ftype}&dateb=&owner=exclude&count=10"
)  # page.go:13-14
CIK_URL_FMT = (
    "https://www.sec.gov/cgi-bin/browse-edgar?action=getcompany&output=xml&CIK={ticker}"
)  # page.go:12
VIEWER_PATH_FMT = (
    "/cgi-bin/viewer?action=view&cik={cik_int}&accession_number={an}&xbrl_type=v"
)
REPORT_PATH_FMT = "/Archives/edgar/data/{cik_int}/{an18}/R{n}.htm"

FILING_TYPES = ("10-K", "10-Q")

# R-number layout inside every synthetic filing (mirrors the AAPL 10-Q shape)
R_ENTITY, R_OPS, R_INC, R_PAREN, R_BS, R_EXTRA, R_CF, R_DEBT = 1, 2, 3, 4, 5, 6, 7, 8
N_REPORTS = 8
DOC_OF_R = {
    R_ENTITY: DOC_EN,
    R_OPS: DOC_OPS,
    R_INC: DOC_INC,
    R_BS: DOC_BS,
    R_CF: DOC_CF,
    R_DEBT: DOC_DEBT_NOTES,
}


def _h(*parts) -> int:
    return zlib.crc32("|".join(str(p) for p in parts).encode("utf-8"))


def ticker_of(i: int) -> str:
    return f"SYN{i:04d}"


def cik_of(i: int) -> str:
    return f"{1000000 + i:010d}"


def filing_dates(ftype: str, n: int) -> List[str]:
    """Deterministic, unique, descending-capable filing dates (years from the
    2012 threshold upward — data_def.go:27)."""
    if ftype == "10-K":
        return [f"{2012 + k}-10-15" for k in range(n)]
    return [f"{2012 + k}-02-15" for k in range(n)]


def accession_of(i: int, ftype: str, date: str) -> str:
    yy = date[2:4]
    seq = _h(cik_of(i), ftype, date) % 1000000
    return f"{int(cik_of(i)):010d}-{yy}-{seq:06d}"


def an18(accession: str) -> str:
    return accession.replace("-", "")


def filing_numbers(i: int, accession: str) -> Dict[str, object]:
    """The deterministic financial numbers of one synthetic filing, pre-scale.

    Money figures are in $M (rendered with thousands commas under a
    '$ in Millions' heading), share figures per their doc scale.
    """
    cik = cik_of(i)
    h = lambda tag: _h(cik, accession, tag)  # noqa: E731
    rev = 10_000 + h("rev") % 90_000
    cos = 1_000 + h("cos") % (rev - 2_000)
    opinc = 500 + h("opinc") % max(rev - cos - 100, 500)
    ni_ops = 400 + h("ni") % opinc
    ni_inc = ni_ops + 7  # Income doc disagrees → doc_priority must pick Ops
    sharecount = 1_000_000_000 + h("shc") % 8_000_000_000
    washares_m = max(int(sharecount / 1e6 * 0.98), 1)
    dps = (h("dps") % 300 + 1) / 100
    div_m = 500 + h("div") % 5_000
    interest_m = 50 + h("int") % 900
    opcf = 1_000 + h("opcf") % 50_000
    capex = 100 + h("capex") % 9_000
    ldebt = 1_000 + h("ldebt") % 60_000
    ldebt_notes = ldebt + 11  # notes doc disagrees → BS (prio 1) must win
    sdebt = 0 if h("sdebt") % 3 == 0 else 10 + h("sdebt") % 3_000
    cliab = 5_000 + h("cliab") % 80_000
    deferred = 100 + h("def") % 20_000
    retained = (h("ret") % 90_000) - 20_000 or 13
    equity = 10_000 + h("eq") % 100_000
    cassets = 5_000 + h("ca") % 90_000
    cash = 1_000 + h("cash") % 40_000
    goodwill = 100 + h("gw") % 25_000
    intang = 100 + h("it") % 20_000
    assets = cassets + goodwill + intang + 10_000 + h("as") % 100_000
    liab = cliab + ldebt + sdebt + h("li") % 50_000
    return {
        "rev": rev,
        "cos": cos,
        "opinc": opinc,
        "ni_ops": ni_ops,
        "ni_inc": ni_inc,
        "sharecount": sharecount,
        "washares_m": washares_m,
        "dps": dps,
        "div_m": div_m,
        "interest_m": interest_m,
        "opcf": opcf,
        "capex": capex,
        "ldebt": ldebt,
        "ldebt_notes": ldebt_notes,
        "sdebt": sdebt,
        "cliab": cliab,
        "deferred": deferred,
        "retained": retained,
        "equity": equity,
        "cassets": cassets,
        "cash": cash,
        "goodwill": goodwill,
        "intang": intang,
        "assets": assets,
        "liab": liab,
        # structural variants
        "has_grossprofit": h("gp") % 7 != 0,  # else generated = rev - cos
        "has_opexpense": h("oe") % 5 != 0,  # else generated = trunc2(...)
        "has_dps": h("hd") % 4 != 0,  # else generated = trunc2(-div/washares)
        "entity_num_in_link": h("nl") % 2 == 0,
        "missing_income_page": h("mi") % 11 == 0,
    }


def expected_filing(i: int, accession: str) -> Dict[str, Optional[float]]:
    """Consolidated expectation for one synthetic filing (mirrors
    data_def.go semantics applied to the generated rows)."""
    n = filing_numbers(i, accession)
    M = 1e6

    def t2(x: float) -> float:
        import math

        return math.floor(x * 100) / 100

    gm = (n["rev"] - n["cos"]) * M  # GrossProfit row or generated — same value
    oe_base = n["rev"] - n["cos"] - n["opinc"]
    if n["has_opexpense"]:
        oe: Optional[float] = oe_base * M  # parsed (0 ⇒ collected zero)
    elif oe_base != 0:
        oe = t2(oe_base * M)  # generated, trunc2 (data_def.go:113-118)
    else:
        oe = None  # generated 0 is rejected (data_def.go:142-147)
    dps = (
        n["dps"]
        if n["has_dps"]
        else t2((n["div_m"] * M) / (n["washares_m"] * M))
    )
    return {
        "sharecount": float(n["sharecount"]),
        "revenue": n["rev"] * M,
        "cost_of_revenue": n["cos"] * M,
        "gross_margin": gm,
        "op_income": n["opinc"] * M,
        "op_expense": oe,
        "net_income": n["ni_ops"] * M,
        "washares": n["washares_m"] * M,
        "dps": dps,
        "op_cashflow": n["opcf"] * M,
        "capex": -n["capex"] * M,
        "dividends": -n["div_m"] * M,
        "interest": n["interest_m"] * M,
        "ldebt": n["ldebt"] * M,
        "sdebt": float(n["sdebt"] * M),
        "cliab": n["cliab"] * M,
        "deferred": n["deferred"] * M,
        "retained": n["retained"] * M,
        "equity": n["equity"] * M,
        "cassets": n["cassets"] * M,
        "cash": n["cash"] * M,
        "securities": None,  # no XBRL tag maps to Securities in the reference
        "goodwill": n["goodwill"] * M,
        "intangibles": n["intang"] * M,
        "assets": n["assets"] * M,
        "liab": n["liab"] * M,
    }


# ---------------------------------------------------------------- renderers


def _fmt(n) -> str:
    return f"{n:,}"


def _row(tag: str, label: str, cells: List[str]) -> str:
    tds = "".join(f'<td class="nump">{c}<span></span></td>' for c in cells)
    return (
        f'<tr><td class="pl" style="border-bottom: 0px;" valign="top">'
        f'<a class="a" href="javascript:void(0);" '
        f"onclick=\"top.Show.showAR( this, 'defref_{tag}', window );\">{label}</a></td>"
        f"{tds}</tr>\n"
    )


def _num_in_link_row(tag: str, label: str, value: str) -> str:
    return (
        f'<tr><td class="pl" style="border-bottom: 0px;" valign="top">'
        f'<a class="a" href="javascript:void(0);" '
        f"onclick=\"top.Show.showAR( this, 'defref_{tag}', window );\">{label}</a></td>"
        f'<td class="text">&#xA0;<span></span></td>'
        f'<td class="nump"><a title="{tag}" onclick="toggleNextSibling(this);">{value}</a>'
        f"<span></span></td></tr>\n"
    )


# Real EDGAR R·htm pages run 20–200 KB with 50–200 rows, most of them tags
# outside the reference's 97-entry map (see /root/reference/samples/*.html,
# 22–206 KB). Filler rows reproduce that shape: the parser must tokenize and
# reject them, so per-page work matches production pages instead of being
# 50× too cheap. Values are deterministic; tags never collide with the map.
REPORT_FILLER_ROWS = 120

_FILLER_LABELS = [
    "Accumulated Depreciation Depletion And Amortization Property Plant And Equipment",
    "Other Comprehensive Income Loss Foreign Currency Transaction And Translation Adjustment Net Of Tax",
    "Share Based Compensation Arrangement By Share Based Payment Award Options Outstanding Weighted Average Exercise Price",
    "Deferred Tax Assets Operating Loss Carryforwards Subject To Expiration",
    "Finite Lived Intangible Assets Amortization Expense Next Twelve Months",
    "Unrecognized Tax Benefits That Would Impact Effective Tax Rate",
    "Operating Lease Right Of Use Asset Amortization Expense",
    "Available For Sale Securities Gross Unrealized Losses Accumulated In Investments",
]


def _filler_rows(seed: int, count: int) -> List[str]:
    rows = []
    for k in range(count):
        h = _h(seed, k)
        label = _FILLER_LABELS[h % len(_FILLER_LABELS)]
        val = _fmt(h % 9_999_999)
        rows.append(
            _row(f"syn{seed % 97}F{k}", f"{label} ({k})", [val, _fmt(h % 83_211)])
        )
    return rows


def _report_page(
    title: str, scale_note: str, rows: List[str], filler: int = REPORT_FILLER_ROWS
) -> str:
    fill = _filler_rows(_h(title), filler)
    half = len(fill) // 2
    body = fill[:half] + rows + fill[half:]
    return (
        "<html><head><title></title></head><body>\n"
        '<table class="report" border="0" cellspacing="2">\n'
        f'<tr><th class="tl" colspan="1" rowspan="1"><div style="width: 200px;">'
        f"<strong>{title}<br> {scale_note}</strong></div></th>"
        '<th class="th"><div>Period End</div></th></tr>\n' + "".join(body) + "</table></body></html>\n"
    )


def render_report(i: int, accession: str, r: int, ftype: str) -> str:
    n = filing_numbers(i, accession)
    if r == R_ENTITY:
        shares = _fmt(n["sharecount"])
        row = (
            _num_in_link_row(
                "dei_EntityCommonStockSharesOutstanding",
                "Entity Common Stock, Shares Outstanding",
                shares,
            )
            if n["entity_num_in_link"]
            else _row(
                "dei_EntityCommonStockSharesOutstanding",
                "Entity Common Stock, Shares Outstanding",
                [shares],
            )
        )
        return _report_page(
            "Document and Entity Information", "", ["<tr><td>filler</td></tr>\n", row]
        )
    if r == R_OPS:
        rows = [
            _row("us-gaap_SalesRevenueNet", "Net sales", [f"$ {_fmt(n['rev'])}"]),
            _row("us-gaap_CostOfGoodsSold", "Cost of sales", [_fmt(n["cos"])]),
        ]
        if n["has_grossprofit"]:
            rows.append(_row("us-gaap_GrossProfit", "Gross margin", [_fmt(n["rev"] - n["cos"])]))
        if n["has_opexpense"]:
            rows.append(
                _row(
                    "us-gaap_OperatingExpenses",
                    "Total operating expenses",
                    [_fmt(n["rev"] - n["cos"] - n["opinc"])],
                )
            )
        rows += [
            _row("us-gaap_OperatingIncomeLoss", "Operating income", [_fmt(n["opinc"])]),
            _row("us-gaap_NetIncomeLoss", "Net income", [f"$ {_fmt(n['ni_ops'])}"]),
            _row(
                "us-gaap_WeightedAverageNumberOfDilutedSharesOutstanding",
                "Diluted (in shares)",
                [_fmt(n["washares_m"])],
            ),
        ]
        if n["has_dps"]:
            rows.append(
                _row(
                    "us-gaap_CommonStockDividendsPerShareDeclared",
                    "Dividends declared per share (in dollars per share)",
                    [f"$ {n['dps']:.2f}"],
                )
            )
        rows.append(_row("syn_UnknownTagForRealism", "Other", ["1,234"]))
        return _report_page(
            "CONDENSED CONSOLIDATED STATEMENTS OF OPERATIONS - USD ($)",
            "shares in Millions, $ in Millions",
            rows,
        )
    if r == R_INC:
        rows = [_row("us-gaap_NetIncomeLoss", "Net income", [f"$ {_fmt(n['ni_inc'])}"])]
        return _report_page(
            "CONDENSED CONSOLIDATED STATEMENTS OF INCOME - USD ($)",
            "$ in Millions",
            rows,
        )
    if r == R_BS:
        rows = [
            _row(
                "us-gaap_CashAndCashEquivalentsAtCarryingValue",
                "Cash and cash equivalents",
                [f"$ {_fmt(n['cash'])}"],
            ),
            _row("us-gaap_AssetsCurrent", "Total current assets", [_fmt(n["cassets"])]),
            _row("us-gaap_Goodwill", "Goodwill", [_fmt(n["goodwill"])]),
            _row(
                "us-gaap_IntangibleAssetsNetExcludingGoodwill",
                "Acquired intangible assets, net",
                [_fmt(n["intang"])],
            ),
            _row("us-gaap_Assets", "Total assets", [_fmt(n["assets"])]),
            _row("us-gaap_ShortTermBorrowings", "Short-term debt", [_fmt(n["sdebt"])]),
            _row(
                "us-gaap_LiabilitiesCurrent",
                "Total current liabilities",
                [_fmt(n["cliab"])],
            ),
            _row(
                "us-gaap_DeferredRevenueCurrent", "Deferred revenue", [_fmt(n["deferred"])]
            ),
            _row(
                "us-gaap_LongTermDebtNoncurrent", "Long-term debt", [_fmt(n["ldebt"])]
            ),
            _row("us-gaap_Liabilities", "Total liabilities", [_fmt(n["liab"])]),
            _row(
                "us-gaap_RetainedEarningsAccumulatedDeficit",
                "Retained earnings",
                [_fmt(n["retained"]) if n["retained"] >= 0 else f"({_fmt(-n['retained'])})"],
            ),
            _row(
                "us-gaap_StockholdersEquity",
                "Total shareholders' equity",
                [_fmt(n["equity"])],
            ),
        ]
        return _report_page(
            "CONDENSED CONSOLIDATED BALANCE SHEETS (Unaudited) - USD ($)",
            "$ in Millions",
            rows,
        )
    if r == R_CF:
        rows = [
            _row(
                "us-gaap_NetCashProvidedByUsedInOperatingActivities",
                "Cash generated by operating activities",
                [_fmt(n["opcf"])],
            ),
            _row(
                "us-gaap_PaymentsToAcquirePropertyPlantAndEquipment",
                "Payments for acquisition of property, plant and equipment",
                [f"({_fmt(n['capex'])})"],
            ),
            _row(
                "us-gaap_PaymentsOfDividendsCommonStock",
                "Payments for dividends",
                [f"({_fmt(n['div_m'])})"],
            ),
            _row("us-gaap_InterestPaidNet", "Interest paid", [_fmt(n["interest_m"])]),
        ]
        return _report_page(
            "CONDENSED CONSOLIDATED STATEMENTS OF CASH FLOWS - USD ($)",
            "$ in Millions",
            rows,
        )
    if r == R_DEBT:
        rows = [
            _row(
                "us-gaap_LongTermDebtNoncurrent",
                "Long-term debt (notes)",
                [_fmt(n["ldebt_notes"])],
            )
        ]
        return _report_page("NOTES ON DEBT - USD ($)", "$ in Millions", rows)
    # R_PAREN / R_EXTRA — present in the corpus, never fetched
    return _report_page(
        "CONDENSED CONSOLIDATED BALANCE SHEETS (Parenthetical) - USD ($)",
        "$ in Millions",
        [_row("us-gaap_CommonStockParOrStatedValuePerShare", "par value", ["0.01"])],
    )


def render_index(i: int, accession: str, ftype: str) -> str:
    cik_int = int(cik_of(i))
    a18 = an18(accession)
    lines = [f"var reports = new Array({N_REPORTS + 1});"]
    for r in range(1, N_REPORTS + 1):
        path = REPORT_PATH_FMT.format(cik_int=cik_int, an18=a18, n=r)
        lines.append(f'    reports[{r - 1}+1] = "{path}";')
    lines.append(f"    reports[{N_REPORTS}+1] = 'all';")
    script = "\n".join(lines)
    menu = (
        "<ul>\n"
        '<li><a id="menu_cat1" href="#">Cover</a><ul>\n'
        f'<li><a href="javascript:loadReport({R_ENTITY});">Document and Entity Information</a></li>\n'
        "</ul></li>\n"
        '<li><a id="menu_cat2" href="#">Financial Statements</a><ul>\n'
        f'<li><a href="javascript:loadReport({R_OPS});">CONSOLIDATED STATEMENTS OF OPERATIONS</a></li>\n'
        f'<li><a href="javascript:loadReport({R_INC});">CONSOLIDATED STATEMENTS OF INCOME</a></li>\n'
        f'<li><a href="javascript:loadReport({R_PAREN});">CONSOLIDATED BALANCE SHEETS (Parenthetical)</a></li>\n'
        f'<li><a href="javascript:loadReport({R_BS});">CONSOLIDATED BALANCE SHEETS</a></li>\n'
        f'<li><a href="javascript:loadReport({R_CF});">CONSOLIDATED STATEMENTS OF CASH FLOWS</a></li>\n'
        "</ul></li>\n"
        '<li><a id="menu_cat3" href="#">Notes to Financial Statements</a><ul>\n'
        f'<li><a href="javascript:loadReport({R_DEBT});">NOTES ON DEBT</a></li>\n'
        "</ul></li>\n"
        '<li><a id="menu_cat4" href="#">Accounting Policies</a><ul>\n'
        f'<li><a href="javascript:loadReport({R_EXTRA});">SIGNIFICANT ACCOUNTING POLICIES</a></li>\n'
        "</ul></li>\n"
        "</ul>\n"
    )
    return (
        "<html><head><title>View Filing Data</title>\n"
        f'<script type="text/javascript" language="javascript">\n{script}\n</script>\n'
        f"</head>\n<body>\n{menu}</body></html>\n"
    )


def render_query(i: int, ftype: str, n_filings: int) -> str:
    cik_int = int(cik_of(i))
    rows = []

    def row(rtype: str, date: str, an: str) -> str:
        viewer = VIEWER_PATH_FMT.format(cik_int=cik_int, an=an).replace("&", "&amp;")
        return (
            f'<tr><td nowrap="nowrap">{rtype}</td><td nowrap="nowrap">'
            f'<a href="/Archives/edgar/data/{cik_int}/{an18(an)}/index.htm" id="documentsbutton">&nbsp;Documents</a>&nbsp; '
            f'<a href="{viewer}" id="interactiveDataBtn">&nbsp;Interactive Data</a></td>'
            f'<td class="small">Periodic report</td>'
            f"<td>{date}</td>"
            f'<td nowrap="nowrap"><a href="/cgi-bin/browse-edgar?action=getcompany&amp;filenum=001-00001">001-00001</a><br>{cik_int}</td></tr>\n'
        )

    for date in filing_dates(ftype, n_filings):
        rows.append(row(ftype, date, accession_of(i, ftype, date)))
    # an amendment row (dropped: type mismatch) and a pre-threshold row
    rows.append(row(ftype + "/A", "2019-01-02", accession_of(i, ftype, "2019-01-02")))
    rows.append(row(ftype, "2010-03-03", accession_of(i, ftype, "2010-03-03")))
    return (
        "<html><body><table>\n" + "".join(rows) + "</table></body></html>\n"
    )


def render_cik_page(i: int) -> str:
    return (
        "<?xml version='1.0'?><companyFilings><companyInfo>"
        f"<cik> {cik_of(i)} </cik><name>{ticker_of(i)} Corp</name>"
        "</companyInfo></companyFilings>"
    )


def company_pages(
    i: int, n_filings: int = 10, types: Tuple[str, ...] = FILING_TYPES
) -> Iterator[Tuple[str, datetime, bytes, str, str]]:
    """All pages of one synthetic company: 1 cik page + per type: 1 query page,
    n index pages, n×8 report pages (some income pages withheld to exercise
    the missing-page path)."""
    base_ts = datetime(2024, 1, 1, tzinfo=timezone.utc)

    def page(url: str, text: str):
        ts = base_ts + timedelta(seconds=_h(url) % 86400)
        return (url, ts, text.encode("utf-8"), text, "en")

    yield page(CIK_URL_FMT.format(ticker=ticker_of(i)), render_cik_page(i))
    cik_int = int(cik_of(i))
    for ftype in types:
        yield page(
            QUERY_URL_FMT.format(ticker=ticker_of(i), ftype=ftype),
            render_query(i, ftype, n_filings),
        )
        for date in filing_dates(ftype, n_filings):
            an = accession_of(i, ftype, date)
            n = filing_numbers(i, an)
            yield page(
                BASE_URL.rstrip("/") + VIEWER_PATH_FMT.format(cik_int=cik_int, an=an),
                render_index(i, an, ftype),
            )
            for r in range(1, N_REPORTS + 1):
                if r == R_INC and n["missing_income_page"]:
                    continue
                yield page(
                    BASE_URL.rstrip("/")
                    + REPORT_PATH_FMT.format(cik_int=cik_int, an18=an18(an), n=r),
                    render_report(i, an, r, ftype),
                )


# ------------------------------------------------------------ golden company

GOLDEN_TICKER = "AAPL"
GOLDEN_CIK = "0000320193"
GOLDEN_ACCESSION = "0000320193-18-000100"
GOLDEN_10K_ACCESSION = "0001193125-15-356351"
_G10K_BASE = "https://www.sec.gov/Archives/edgar/data/320193/000119312515356351/"
_G10K_VIEWER = (
    "https://www.sec.gov/cgi-bin/viewer?action=view&cik=320193"
    "&accession_number=0001193125-15-356351&xbrl_type=v"
)
GOLDEN_10K1_ACCESSION = "0001193125-11-282113"
_G10K1_VIEWER = (
    "https://www.sec.gov/cgi-bin/viewer?action=view&cik=320193"
    "&accession_number=0001193125-11-282113&xbrl_type=v"
)

_GOLDEN_SAMPLES = {
    # url path → sample file (R-number mapping per parser_test.go:138-154)
    QUERY_URL_FMT.format(ticker="AAPL", ftype="10-Q"): "sample_query.html",
    "https://www.sec.gov/cgi-bin/viewer?action=view&cik=320193&accession_number=0000320193-18-000100&xbrl_type=v": "sample_10Q.html",
    "https://www.sec.gov/Archives/edgar/data/320193/000032019318000100/R1.htm": "sample_entity.html",
    "https://www.sec.gov/Archives/edgar/data/320193/000032019318000100/R2.htm": "sample_ops.html",
    "https://www.sec.gov/Archives/edgar/data/320193/000032019318000100/R3.htm": "sample_income.htm",
    "https://www.sec.gov/Archives/edgar/data/320193/000032019318000100/R5.htm": "sample_bs.html",
    "https://www.sec.gov/Archives/edgar/data/320193/000032019318000100/R7.htm": "sample_cf.html",
    # the FY2015 10-K filing (parser_test.go:156-172 index mapping: EN=R1,
    # OPS=R2, INC=R3, BS=R5, CF=R8). R3 is deliberately absent from the
    # corpus — the income page goes 'missing' and Ops supplies net income.
    _G10K_VIEWER: "sample_10K.html",
    _G10K_BASE + "R1.htm": "sample_10K_entity.html",
    _G10K_BASE + "R2.htm": "sample_10K_ops.html",
    _G10K_BASE + "R5.htm": "sample_10K_bs.html",
    _G10K_BASE + "R8.htm": "sample_10K_cf.html",
    # partial filing: the 4-doc index variant (parser_test.go:231-246) with
    # only its entity page present — and that page is the num-in-link
    # variant (parser_test.go:71-89), so the crawl exercises the
    # num-in-first-text extraction AND the validation-error path end-to-end
    _G10K1_VIEWER: "sample_10K_1.html",
    "https://www.sec.gov/Archives/edgar/data/320193/000119312511282113/R1.htm": "sample_entity1.html",
}


def _golden_10k_query_page() -> str:
    """A browse-edgar query page (real EDGAR row format, cf.
    sample_query.html) listing the FY2015 10-K filing."""
    return (
        "<html><body><table>\n"
        '<tr><th scope="col">Filings</th><th scope="col">Format</th>'
        '<th scope="col">Description</th><th scope="col">Filing Date</th>'
        '<th scope="col">File/Film Number</th></tr>\n'
        "<tr>\n"
        '<td nowrap="nowrap">10-K</td>\n'
        '<td nowrap="nowrap"><a href="/Archives/edgar/data/320193/000119312515356351/0001193125-15-356351-index.htm" id="documentsbutton">&nbsp;Documents</a>&nbsp; '
        '<a href="/cgi-bin/viewer?action=view&amp;cik=320193&amp;accession_number=0001193125-15-356351&amp;xbrl_type=v" id="interactiveDataBtn">&nbsp;Interactive Data</a></td>\n'
        '<td class="small">Annual report [Section 13 and 15(d)]<br />Acc-no: 0001193125-15-356351&nbsp;(34 Act)&nbsp; Size: 10 MB</td>\n'
        "<td>2015-10-28</td>\n"
        '<td nowrap="nowrap"><a href="/cgi-bin/browse-edgar?action=getcompany&amp;filenum=001-36743&amp;owner=exclude&amp;count=10">001-36743</a><br>151180619</td>\n'
        "</tr>\n"
        '<tr class="blueRow">\n'
        '<td nowrap="nowrap">10-K</td>\n'
        '<td nowrap="nowrap"><a href="/Archives/edgar/data/320193/000119312511282113/0001193125-11-282113-index.htm" id="documentsbutton">&nbsp;Documents</a>&nbsp; '
        '<a href="/cgi-bin/viewer?action=view&amp;cik=320193&amp;accession_number=0001193125-11-282113&amp;xbrl_type=v" id="interactiveDataBtn">&nbsp;Interactive Data</a></td>\n'
        '<td class="small">Annual report [Section 13 and 15(d)]<br />Acc-no: 0001193125-11-282113&nbsp;(34 Act)&nbsp; Size: 9 MB</td>\n'
        "<td>2012-10-26</td>\n"
        '<td nowrap="nowrap"><a href="/cgi-bin/browse-edgar?action=getcompany&amp;filenum=001-36743&amp;owner=exclude&amp;count=10">001-36743</a><br>111159350</td>\n'
        "</tr>\n</table></body></html>\n"
    )


def golden_pages(samples_dir: str) -> List[Tuple[str, datetime, bytes, str, str]]:
    sdir = pathlib.Path(samples_dir)
    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    out = []
    for url, fname in _GOLDEN_SAMPLES.items():
        p = sdir / fname
        if not p.exists():
            raise FileNotFoundError(str(p))
        text = p.read_text(encoding="utf-8")
        out.append((url, ts, text.encode("utf-8"), text, "en"))
    qtext = _golden_10k_query_page()
    out.append(
        (
            QUERY_URL_FMT.format(ticker="AAPL", ftype="10-K"),
            ts,
            qtext.encode("utf-8"),
            qtext,
            "en",
        )
    )
    return out


# ------------------------------------------------------------ Spark builders


def build_pages(
    spark,
    n_companies: int,
    n_filings: int = 10,
    types: Tuple[str, ...] = FILING_TYPES,
    samples_dir: Optional[str] = None,
    partitions: Optional[int] = None,
):
    """Distributed corpus build: one task per slice of companies."""
    from edgar_spark.model.schemas import PAGES_SCHEMA

    parts = partitions or max(spark.sparkContext.defaultParallelism, 4)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid in pdf["id"]:
                rows.extend(company_pages(int(cid), n_filings, types))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    df = (
        spark.range(0, n_companies, 1, parts)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )
    if samples_dir is not None:
        # pandas + Arrow conversion ⇒ JVM LocalTableScan (a plain list would
        # become a Python-RDD plan re-executing Python workers per job)
        gp = pd.DataFrame(
            golden_pages(samples_dir),
            columns=["url", "warc_ts", "html", "text", "lang"],
        )
        golden = spark.createDataFrame(gp, PAGES_SCHEMA)
        df = df.unionByName(golden)
    return df


def build_seeds(spark, n_companies: int, include_golden: bool = False):
    from edgar_spark.model.schemas import SEEDS_SCHEMA

    rows = [(ticker_of(i), cik_of(i), i) for i in range(n_companies)]
    if include_golden:
        rows.append((GOLDEN_TICKER, GOLDEN_CIK, n_companies))
    # pandas + Arrow conversion ⇒ JVM LocalTableScan: the seed table is pure
    # JVM data, so the (unpersisted) seed-frontier lineage never re-runs a
    # Python stage in the wave jobs that touch it
    pdf = pd.DataFrame(rows, columns=["ticker", "cik", "seed_seq"])
    return spark.createDataFrame(pdf, SEEDS_SCHEMA)
