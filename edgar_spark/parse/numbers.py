"""Scalar string/number helpers matching /root/reference/utils.go semantics."""

from __future__ import annotations

import math
import re
from typing import Dict, List, Optional

# Scale factors (reference data_def.go:41-44)
SCALE_NONE = 1
SCALE_THOUSAND = 1000
SCALE_MILLION = 1000 * 1000
SCALE_BILLION = 1000 * 1000 * 1000

# Scale entities (data_def.go:47-49)
ENTITY_SHARES = "Shares"
ENTITY_MONEY = "Money"
ENTITY_PER_SHARE = "PerShare"

# Doc type constants (data_def.go:30-38) — shared across parse modules.
DOC_OPS = "Operations"
DOC_INC = "Income"
DOC_BS = "Assets"
DOC_CF = "Cash Flow"
DOC_EN = "Entity Info"
DOC_EPS_NOTES = "Notes on EPS"
DOC_EQUITY_NOTES = "Notes on Equity"
DOC_DEBT_NOTES = "Notes on Debt"
DOC_IGNORE = "Ignore"

THRESHOLD_YEAR = 2012  # data_def.go:27


def normalize_number(s: str) -> Optional[float]:
    """``"$ (1,234.56)"`` → ``-1234.56``; None on unparseable input.

    Mirrors utils.go:11-46 on the DECIMAL float grammar (the only one that
    occurs in filing data): parens anywhere ⇒ negative; trim order is
    left-spaces, left-``$``, left-spaces, right-spaces, left-``(``,
    right-``)``; split one decimal part on the first ``.``; strip thousands
    commas from the integer part only; ParseFloat. Go's strconv.ParseFloat
    additionally accepts hexadecimal floats ("0x1p-2"), which this gate
    deliberately rejects — the property tests scope equivalence to the
    decimal subset.
    """
    negative = 1.0
    if "(" in s and ")" in s:
        negative = -1.0
    s = s.lstrip(" ").lstrip("$").lstrip(" ").rstrip(" ").lstrip("(").rstrip(")")
    parts = s.split(".")
    dec = parts[1] if len(parts) > 1 else ""
    joined = "".join(parts[0].split(","))
    if dec != "":
        joined = joined + "." + dec
    # Go strconv.ParseFloat grammar: decimal/exponent forms and the Inf/NaN
    # specials — NO surrounding whitespace (Python's float() tolerates
    # "0\t", Go errors; property-tested in tests/test_property.py)
    if not (
        _GO_FLOAT_RE.match(joined) or joined.lower() in _GO_FLOAT_SPECIALS
    ):
        return None
    try:
        return float(joined) * negative
    except ValueError:
        return None


# Go float-literal grammar: ASCII digits only (\d would admit Unicode
# digits Go rejects), underscores legal between digits (Go 1.13+ literal
# syntax, which Python's float() shares)
_D = r"[0-9](?:_?[0-9])*"
_GO_FLOAT_RE = re.compile(
    rf"^[+-]?({_D}(\.(?:{_D})?)?|\.{_D})([eE][+-]?{_D})?$"
)
_GO_FLOAT_SPECIALS = {
    "inf", "+inf", "-inf", "infinity", "+infinity", "-infinity", "nan",
}


def trunc_round(val: float) -> float:
    """utils.go:165-167 — floor(val*100)/100, truncation toward -inf (NOT
    half-up rounding; do not substitute ``round``)."""
    return math.floor(val * 100) / 100


def is_same_scale(one: float, two: float) -> bool:
    """utils.go:170-181 — relative difference ≤ 1 (within 2×) ⇒ same scale.

    Divides by ``two`` when one >= two else by ``one``; replicates IEEE
    division so 0/0 → NaN (NaN <= 1 is False) and x/0 → ±inf.
    """
    try:
        if one < two:
            val = (two - one) / one
        else:
            val = (one - two) / two
    except ZeroDivisionError:
        # only if inputs are ints; floats give inf/nan like Go
        val = math.inf if (one != two) else math.nan
    return val <= 1


def filing_scale(strs: List[str], doc_type: str) -> Dict[str, int]:
    """utils.go:48-79 — derive {Shares, Money, PerShare} scale factors from the
    heading strings of a report table.

    Defaults: Money=1e6, PerShare=1, Shares=1e6 (Shares=1 for Entity docs —
    the heading of the entity doc states raw share counts). Each heading is
    lowercased and split on commas; a part containing "share" may override the
    share scale (thousand/million); a part containing "$" or "usd" may
    override the money scale (thousand/billion — "million" is already the
    default).
    """
    ret = {
        ENTITY_SHARES: SCALE_NONE if doc_type == DOC_EN else SCALE_MILLION,
        ENTITY_MONEY: SCALE_MILLION,
        ENTITY_PER_SHARE: SCALE_NONE,
    }
    for s in strs:
        for part in s.lower().split(","):
            if "share" in part:
                if "thousand" in part:
                    ret[ENTITY_SHARES] = SCALE_THOUSAND
                elif "million" in part:
                    ret[ENTITY_SHARES] = SCALE_MILLION
            elif "$" in part or "usd" in part:
                if "thousand" in part:
                    ret[ENTITY_MONEY] = SCALE_THOUSAND
                elif "billion" in part:
                    ret[ENTITY_MONEY] = SCALE_BILLION
    return ret


def year_of(date_str: str) -> int:
    """date.go:32-43 getYear — split on '-', silent 0 on malformed."""
    parts = date_str.split("-")
    if not parts:
        return 0
    try:
        return int(parts[0])
    except ValueError:
        return 0
