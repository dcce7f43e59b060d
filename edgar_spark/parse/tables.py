"""Table-walk kernels over the Go-compatible token cursor.

Each function mirrors the control flow of its reference counterpart in
/root/reference/parser.go so the extracted strings are byte-identical
(quirks catalogued in SURVEY.md §2.7):

* ``nump``/``num`` cells never look inside ``<a>`` — the first text wins
  (parser.go:183-188), which is how a number rendered inside a link is
  captured (parser_test.go:71-89);
* link body text is deliberately ignored in non-num cells (the commented-out
  block at parser.go:227-234): an XBRL row label yields the ``defref_…`` tag
  from ``onclick``, never the label text;
* only the first non-empty trimmed string per ``<td>`` is kept; empty cells
  contribute nothing, so row arity varies (parser.go:189-193);
* text tokens are re-escaped via Token.String(); attribute values arrive
  fully unescaped (parser_test.go:37-39).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from edgar_spark.parse.tokenizer import (
    END_TAG,
    ERROR,
    START_TAG,
    TEXT,
    Tok,
    TokenCursor,
)
from edgar_spark.parse.xbrl import xbrl_tag_from_onclick

# Hyperlink ids whose href is returned verbatim (parser.go:201-203)
REQ_HYPERLINKS = frozenset({"interactiveDataBtn"})


def parse_hyperlink_tag(z: TokenCursor, token: Tok) -> str:
    """parser.go:205-244 — from an ``<a>`` start tag: an ``onclick`` carrying a
    ``showAR(…'defref_…')`` call returns the XBRL tag immediately; otherwise
    the anchor is consumed to ``</a>`` (body text ignored) and the ``href`` is
    returned only for allow-listed ids (``interactiveDataBtn``)."""
    href = ""
    an_id = ""
    for k, v in token.attrs:
        if k == "id":
            an_id = v
        elif k == "href":
            href = v
        elif k == "onclick":
            tag = xbrl_tag_from_onclick(v)
            if tag is not None:
                return tag

    t = token
    while not (t.data == "a" and t.type == END_TAG):
        if z.next() == ERROR:
            break
        t = z.token()

    if an_id in REQ_HYPERLINKS:
        return href
    return ""


def parse_table_data(z: TokenCursor, parse_href: bool) -> str:
    """parser.go:129-160 — within ``<td>``: hyperlinks via
    ``parse_hyperlink_tag`` when enabled, else the first non-empty trimmed
    text token."""
    token = z.token()
    while not (token.data == "td" and token.type == END_TAG):
        if token.type == ERROR:
            break
        if parse_href and token.data == "a" and token.type == START_TAG:
            s = parse_hyperlink_tag(z, token)
            if s:
                return s
        elif token.type == TEXT:
            s = token.string().strip()
            if s:
                return s
        z.next()
        token = z.token()
    return ""


def parse_table_row(z: TokenCursor, parse_href: bool) -> Optional[List[str]]:
    """parser.go:162-199 — advance to the next ``<tr>``, collect one string per
    non-empty ``<td>``; a td with class ``nump``/``num`` disables href parsing
    for that cell. Returns None at EOF (the Go 'Done with parsing' error)."""
    ret: List[str] = []
    token = z.token()
    while not (token.type == START_TAG and token.data == "tr"):
        if z.next() == ERROR:
            return None
        token = z.token()
    while not (token.data == "tr" and token.type == END_TAG):
        if token.type == ERROR:
            return None
        if token.data == "td" and token.type == START_TAG:
            flag = parse_href
            for k, v in token.attrs:
                if k == "class" and v in ("nump", "num"):
                    flag = False
            s = parse_table_data(z, flag)
            if s:
                ret.append(s)
        z.next()
        token = z.token()
    return ret


def parse_table_title(z: TokenCursor) -> List[str]:
    """parser.go:246-272 — collect all non-empty trimmed text tokens inside the
    current ``<th>``."""
    strs: List[str] = []
    token = z.token()
    while not (token.data == "th" and token.type == END_TAG):
        if token.type == ERROR:
            break
        if token.type == TEXT:
            s = token.string().strip()
            if s:
                strs.append(s)
        z.next()
        token = z.token()
    return strs


def parse_table_heading(z: TokenCursor) -> Optional[List[str]]:
    """parser.go:274-305 — advance to the next ``<tr>`` and collect the text of
    every ``<th>`` in it. None at EOF."""
    ret: List[str] = []
    token = z.token()
    while not (token.type == START_TAG and token.data == "tr"):
        if z.next() == ERROR:
            return None
        token = z.token()
    while not (token.data == "tr" and token.type == END_TAG):
        if token.type == ERROR:
            return None
        if token.data == "th" and token.type == START_TAG:
            ret.extend(parse_table_title(z))
        z.next()
        token = z.token()
    return ret


def parse_cik_and_doc_id(url: str) -> Tuple[str, str]:
    """parser.go:17-24 — split a viewer URL into (cik, accession). The Go
    implementation scans ``%d`` on the three accession segments, which drops
    leading zeros from the *last* segment; its only test uses a zero-free
    sample (parser_test.go:130-136). We keep the quirk for compatibility:
    the middle segment is %010d-formatted, the last two are int-formatted."""
    import re

    m = re.match(
        r"/cgi-bin/viewer\?action=view&cik=(\d+)&accession_number=(\d+)-(\d+)-(\d+)",
        url,
    )
    if not m:
        return "", ""
    cik = str(int(m.group(1)))
    an = f"{int(m.group(2)):010d}{int(m.group(3))}{int(m.group(4))}"
    return cik, an
