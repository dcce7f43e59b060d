"""Go-x/net/html-compatible token stream on top of ``html.parser``.

The reference engine walks pages with golang.org/x/net/html's streaming
tokenizer (used throughout /root/reference/parser.go and reportmap.go). For
byte-identical extraction we need the same observable token semantics:

* tag names and attribute keys lowercased; attribute values fully unescaped
  (asserted by the reference at parser_test.go:37-39 — ``&amp;cik=`` comes back
  as ``&cik=``);
* ``Token.String()`` on a text token returns the *re-escaped* text
  (entities decoded, then ``& ' < > " \\r`` re-escaped) — parser.go:148,
  parser.go:262, parser.go:67 all call ``token.String()`` on text tokens;
* ``<script>``/``<style>`` bodies are raw text, never tags;
* a cursor with Go's ``z.Token()`` / ``z.Next()`` shape: the current token
  starts as a zero (ERROR) token, ``next()`` advances and returns the new
  token type, EOF yields ERROR forever.

Python's ``html.parser.HTMLParser`` with ``convert_charrefs=True`` gives the
same unescaping behavior; we buffer consecutive data events into maximal text
runs to match Go's maximal text tokens.
"""

from __future__ import annotations

import html.parser
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

# Token types (mirror x/net/html TokenType values we care about)
ERROR = 0
TEXT = 1
START_TAG = 2
END_TAG = 3
SELF_CLOSING = 4
COMMENT = 5
DOCTYPE = 6

# Go x/net/html escape.go escapes exactly these characters when re-stringifying
# a text token: & ' < > " and \r.
_ESCAPES = {
    "&": "&amp;",
    "'": "&#39;",
    "<": "&lt;",
    ">": "&gt;",
    '"': "&#34;",
    "\r": "&#13;",
}


def escape_string(s: str) -> str:
    """Replicate Go html.EscapeString (escape.go of x/net/html)."""
    if not any(c in s for c in _ESCAPES):
        return s
    return "".join(_ESCAPES.get(c, c) for c in s)


@dataclass
class Tok:
    """One token. ``data`` is the lowercased tag name for tag tokens and the
    unescaped text for TEXT tokens. ``attrs`` preserves source order with
    unescaped values (valueless attributes get ``""``)."""

    type: int
    data: str = ""
    attrs: List[Tuple[str, str]] = field(default_factory=list)

    def string(self) -> str:
        """Go Token.String() for TEXT tokens: EscapeString(Data)."""
        if self.type == TEXT:
            return escape_string(self.data)
        return self.data

    def attr(self, key: str) -> Optional[str]:
        for k, v in self.attrs:
            if k == key:
                return v
        return None


_ZERO = Tok(ERROR, "")


class _Collector(html.parser.HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.toks: List[Tok] = []
        self._text: List[str] = []

    def _flush(self) -> None:
        if self._text:
            self.toks.append(Tok(TEXT, "".join(self._text)))
            self._text = []

    @staticmethod
    def _norm_attrs(attrs) -> List[Tuple[str, str]]:
        return [(k, v if v is not None else "") for k, v in attrs]

    def handle_starttag(self, tag, attrs):
        self._flush()
        self.toks.append(Tok(START_TAG, tag, self._norm_attrs(attrs)))

    def handle_endtag(self, tag):
        self._flush()
        self.toks.append(Tok(END_TAG, tag))

    def handle_startendtag(self, tag, attrs):
        self._flush()
        self.toks.append(Tok(SELF_CLOSING, tag, self._norm_attrs(attrs)))

    def handle_data(self, data):
        self._text.append(data)

    def handle_comment(self, data):
        self._flush()
        self.toks.append(Tok(COMMENT, data))

    def handle_decl(self, decl):
        self._flush()
        self.toks.append(Tok(DOCTYPE, decl))

    def unknown_decl(self, data):
        self._flush()
        self.toks.append(Tok(COMMENT, data))

    def handle_pi(self, data):
        self._flush()
        self.toks.append(Tok(COMMENT, data))

    def close(self):
        super().close()
        self._flush()


def tokenize(text: str) -> List[Tok]:
    """Tokenize a whole document into the Go-compatible token list."""
    c = _Collector()
    try:
        c.feed(text)
        c.close()
    except Exception:
        # Lenient like the Go tokenizer: keep whatever was produced.
        c._flush()
    return c.toks


class TokenCursor:
    """Go tokenizer cursor: ``token()`` = current token (zero token before the
    first ``next()``), ``next()`` advances and returns the new token type
    (ERROR at/after EOF, and ``token()`` then also returns the zero token)."""

    __slots__ = ("toks", "pos")

    def __init__(self, toks_or_text) -> None:
        self.toks = (
            tokenize(toks_or_text) if isinstance(toks_or_text, str) else toks_or_text
        )
        self.pos = -1

    def token(self) -> Tok:
        if 0 <= self.pos < len(self.toks):
            return self.toks[self.pos]
        return _ZERO

    def next(self) -> int:
        self.pos += 1
        if self.pos >= len(self.toks):
            self.pos = len(self.toks)
            return ERROR
        return self.toks[self.pos].type
