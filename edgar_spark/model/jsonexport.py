"""Deterministic JSON export replicating the reference's marshal sinks.

``filing.String()`` / ``financialReport.String()`` / ``SaveFolder`` all call
Go's ``json.MarshalIndent(v, "", "    ")`` over the structs in report.go /
filing.go / folder.go. This module reproduces that output from a ``filings``
row:

* key order = Go struct field order (report.go:8-56, filing.go:11-15);
* 4-space indent, ``": "`` separators (MarshalIndent with "    ");
* float64 rendering = Go strconv shortest form — integral values print with
  no decimal point (``5575331000``), fractional shortest (``1.98``);
* unset fields marshal as their Go zero value 0 (the structs carry plain
  float64s, not pointers);
* ``Collected Data`` = the presence bitmask recomputed from NULLness with
  the ``bit:"N"`` positions of report.go (utils.go:93-113);
* map keys (filing types, dates in ``SaveFolder``) sort lexicographically,
  matching Go's sorted map marshaling (folder.go:152-159).

Note: the reference's own marshal golden (samples/sample_10K_marshal.json)
predates its current bsData struct — its test is disabled with a ``Skip``
prefix (parser_test.go:556). We match the *current* struct layout and verify
format compatibility (indent/number rendering/ordering) against the golden's
shared keys in tests.
"""

from __future__ import annotations

import json
import math
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

# (json key, filings column, bit position) in Go struct order
ENTITY_FIELDS: List[Tuple[str, str, int]] = [
    ("Shares Outstanding", "sharecount", 0),
]
OPS_FIELDS: List[Tuple[str, str, int]] = [
    ("Revenue", "revenue", 0),
    ("Cost Of Revenue", "cost_of_revenue", 1),
    ("Gross Margin", "gross_margin", 2),
    ("Operational Income", "op_income", 3),
    ("Operational Expense", "op_expense", 4),
    ("Net Income", "net_income", 5),
    ("Weighted Average Share Count", "washares", 6),
    ("Dividend Per Share", "dps", 7),
]
BS_FIELDS: List[Tuple[str, str, int]] = [
    ("Long-Term debt", "ldebt", 0),
    ("Short-Term debt", "sdebt", 1),
    ("Current Liabilities", "cliab", 2),
    ("Deferred revenue", "deferred", 3),
    ("Retained Earnings", "retained", 4),
    ("Total Shareholder Equity", "equity", 5),
    ("Current Assets", "cassets", 6),
    ("Cash", "cash", 7),
    ("Securities", "securities", 8),
    ("Goodwill", "goodwill", 9),
    ("Intangibles", "intangibles", 10),
    ("Total Assets", "assets", 11),
    ("Total Liabilities", "liab", 12),
]
CF_FIELDS: List[Tuple[str, str, int]] = [
    ("Operating Cash Flow", "op_cashflow", 0),
    ("Capital Expenditure", "capex", 1),
    ("Dividends paid", "dividends", 2),
    ("Interest paid", "interest", 3),
]


class _GoFloat(float):
    """float that renders like Go's json.Marshal of a float64:
    shortest round-trip digits; plain decimal for 1e-6 ≤ |x| < 1e21
    (encoding/json's 'f' range — Python repr would switch to exponent
    below 1e-4); exponent form elsewhere with Go's trimmed exponent
    ('9e-05' → '9e-5')."""

    def __repr__(self) -> str:
        if math.isnan(self) or math.isinf(self):
            return "null"  # Go errors here; we degrade to null
        v = float(self)
        if v == int(v) and abs(v) < 1e21:
            if v == 0:
                return "-0" if math.copysign(1.0, v) < 0 else "0"
            # Go prints the SHORTEST round-trip decimal expanded to 'f'
            # form; str(int(v)) would print the exact binary expansion,
            # which diverges above 2^53 (…683968 vs Go's …680000)
            from decimal import Decimal

            s = format(Decimal(repr(v)), "f")
            return s[: s.index(".")] if "." in s else s
        r = repr(v)
        in_f_range = v != 0 and 1e-6 <= abs(v) < 1e21
        if "e" in r and in_f_range:
            from decimal import Decimal

            return format(Decimal(r), "f")
        if "e" in r:
            mant, exp = r.split("e")
            sign = "-" if exp.startswith("-") else "+"
            digits = exp.lstrip("+-").lstrip("0") or "0"
            # Go keeps 'e-5' / 'e+21' (sign always present, no zero padding)
            return f"{mant}e{sign}{digits}"
        return r


def _section(row, fields: List[Tuple[str, str, int]]) -> "OrderedDict":
    out: "OrderedDict" = OrderedDict()
    mask = 0
    for _, col, bit in fields:
        if row[col] is not None:
            mask |= 1 << bit
    out["Collected Data"] = mask
    for key, col, _ in fields:
        v = row[col]
        out[key] = _GoFloat(0.0 if v is None else float(v))
    return out


def filing_obj(row) -> "OrderedDict":
    """The nested dict for one filings row (filing struct, filing.go:11-15)."""
    fin = OrderedDict()
    fin["Filing Type"] = row["filing_type"]
    fin["Entity Information"] = _section(row, ENTITY_FIELDS)
    fin["Operational Information"] = _section(row, OPS_FIELDS)
    fin["Balance Sheet Information"] = _section(row, BS_FIELDS)
    fin["Cash Flow Information"] = _section(row, CF_FIELDS)
    obj = OrderedDict()
    obj["Company"] = row["ticker"]
    obj["Report date"] = str(row["filing_date"])
    obj["Financial Data"] = fin
    return obj


def _render(obj, indent: int, out: List[str]) -> None:
    pad = "    " * indent
    if isinstance(obj, dict):
        if not obj:
            out.append("{}")
            return
        out.append("{\n")
        items = list(obj.items())
        for i, (k, v) in enumerate(items):
            out.append(f'{pad}    {json.dumps(k, ensure_ascii=False)}: ')
            _render(v, indent + 1, out)
            out.append(",\n" if i < len(items) - 1 else "\n")
        out.append(pad + "}")
    elif isinstance(obj, _GoFloat):
        out.append(repr(obj))
    elif isinstance(obj, bool):
        out.append("true" if obj else "false")
    elif isinstance(obj, (int, float)):
        out.append(json.dumps(obj))
    elif obj is None:
        out.append("null")
    else:
        out.append(json.dumps(obj, ensure_ascii=False))


def marshal(obj) -> str:
    """Go json.MarshalIndent(v, "", "    ") rendering (custom serializer —
    json.dumps's C encoder would bypass _GoFloat's Go-style float form)."""
    out: List[str] = []
    _render(obj, 0, out)
    return "".join(out)


def filing_json(row) -> str:
    return marshal(filing_obj(row))


def folder_json(ticker: str, rows, types: Optional[List[str]] = None) -> str:
    """SaveFolder (folder.go:152-159): {"Company", "Financial Reports":
    {type: {date: filing}}} with sorted map keys."""
    by_type: Dict[str, Dict[str, "OrderedDict"]] = {}
    for row in rows:
        by_type.setdefault(row["filing_type"], {})[str(row["filing_date"])] = (
            filing_obj(row)
        )
    reports = OrderedDict()
    for t in sorted(types or by_type):
        dates = by_type.get(t, {})
        reports[t] = OrderedDict((d, dates[d]) for d in sorted(dates))
    obj = OrderedDict()
    obj["Company"] = ticker
    obj["Financial Reports"] = reports
    return marshal(obj)


def filings_json_df(filings_df):
    """Distributed export: one JSON document per filing row (the String()
    sink as a column) — rendered executor-side via Arrow-batched
    ``mapInPandas``, never collected to the driver."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            docs = [filing_json(row) for _, row in pdf.iterrows()]
            yield pd.DataFrame(
                {
                    "ticker": pdf["ticker"],
                    "filing_date": pdf["filing_date"].astype(str),
                    "filing_json": docs,
                }
            )

    return filings_df.mapInPandas(
        gen, schema="ticker string, filing_date string, filing_json string"
    )


def export_filings_json(filings_df, limit: Optional[int] = None):
    """Driver-side convenience over :func:`filings_json_df` (small results
    only; ``limit`` is applied before the collect when given)."""
    df = filings_json_df(filings_df)
    if limit is not None:
        df = df.limit(limit)
    return [
        (row["ticker"], row["filing_date"], row["filing_json"])
        for row in df.collect()
    ]
