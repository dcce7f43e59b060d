"""HTTP fetch post-processing — MIME sniffing and response-header parsing.

A crawl wave lands raw (payload bytes, header text) pairs; before anything
downstream touches them the engine must decide WHAT each payload is (route
HTML to the parsers, media to the multimodal lane, junk to the bit bucket)
and pull the caching/freshness fields (ETag, Last-Modified) that feed
`frontier.schedule.recrawl_schedule`. The reference never needs either —
it fetches only known-HTML SEC pages (page.go:21-28) — but an open-web
frontier without content-type routing parses GIFs as HTML.

Both operators are pure column expressions: the magic-byte table compiles
to a codegen'd CASE over a hex prefix, header fields to anchored multiline
regex extracts. Zero shuffles, zero Python — at 100 TB these run inside
the fetch wave's existing scan and cost only the bytes they touch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (uppercase hex prefix of the payload) -> MIME type; first match wins.
# WHATWG-sniffing-inspired subset: the unambiguous byte-pattern table.
MAGIC_TABLE: list[tuple[str, str]] = [
    ("89504E47", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("474946383761", "image/gif"),
    ("474946383961", "image/gif"),
    ("255044462D", "application/pdf"),
    ("504B0304", "application/zip"),
    ("1F8B", "application/gzip"),
    ("4F676753", "application/ogg"),
    ("424D", "image/bmp"),
]

# bytes 0x09 0x0A 0x0D and 0x20-0x7E as uppercase hex pairs — the
# "printable ASCII" test runs on the hex string so it never decodes
# arbitrary bytes (hex() is total; decode() is not).
_PRINTABLE_HEX_RE = (
    "^(09|0A|0D|2[0-9A-F]|3[0-9A-F]|4[0-9A-F]|5[0-9A-F]|6[0-9A-F]|7[0-9A-E])*$"
)


def sniff_mime_col(payload: Column, window: int = 64) -> Column:
    """MIME type of a binary payload from its first ``window`` bytes.

    Precedence: magic-byte table (incl. the RIFF/WAVE, RIFF/AVI and MP4
    ``ftyp`` container checks at their fixed offsets) → printable-ASCII
    text fallback (leading ``<`` after whitespace ⇒ ``text/html``, else
    ``text/plain``) → ``application/octet-stream``.

    The decode in the text branch is guarded by the hex-level printable
    check, so the expression never decodes invalid bytes on either
    engine (DuckDB's ``decode`` throws on malformed UTF-8; CASE branches
    evaluate lazily in both).
    """
    head_hex = F.hex(F.substring(payload, 1, window))
    expr = None
    for prefix, mime in MAGIC_TABLE:
        cond = head_hex.startswith(prefix)
        expr = F.when(cond, mime) if expr is None else expr.when(cond, mime)
    # containers with a type tag at a fixed offset
    riff_tag = F.hex(F.substring(payload, 9, 4))
    expr = expr.when(
        head_hex.startswith("52494646") & (riff_tag == "57415645"), "audio/wav"
    ).when(
        head_hex.startswith("52494646") & (riff_tag == "41564920"), "video/avi"
    ).when(
        # ftyp is gated on a plausible big-endian box size (first two
        # bytes zero, per WHATWG's size sanity check) — otherwise plain
        # text containing 'ftyp' at offset 5 would route as video
        head_hex.startswith("0000")
        & (F.hex(F.substring(payload, 5, 4)) == "66747970"),
        "video/mp4",
    )
    printable = head_hex.rlike(_PRINTABLE_HEX_RE)
    head_txt = F.decode(F.substring(payload, 1, window), "UTF-8")
    # regex skip, not ltrim: ltrim strips spaces only, HTML pages indent
    # with tabs/newlines too
    return (
        expr.when(printable & head_txt.rlike(r"^[ \t\r\n]*<"), "text/html")
        .when(printable, "text/plain")
        .otherwise("application/octet-stream")
    )


def sniff_mime(
    df: DataFrame, payload_col: str = "payload", window: int = 64
) -> DataFrame:
    """Add a ``mime`` column sniffed from ``payload_col``'s leading bytes."""
    return df.withColumn("mime", sniff_mime_col(F.col(payload_col), window))


def _header(raw: Column, name: str) -> Column:
    """Value of the first ``name:`` header line, case-insensitive, or NULL."""
    return F.nullif(
        F.trim(F.regexp_extract(raw, rf"(?im)^{name}[ \t]*:[ \t]*([^\r\n]*)", 1)),
        F.lit(""),
    )


def parse_http_headers(df: DataFrame, raw_col: str = "raw") -> DataFrame:
    """Parse a raw HTTP/1.x response head into typed columns.

    Adds: ``status`` (int, NULL when the status line is absent),
    ``content_type``, ``content_length`` (bigint), ``etag``,
    ``last_modified``, ``location`` (each NULL when missing) and
    ``n_headers`` (count of ``Name:`` lines). Header names match
    case-insensitively per RFC 9110; values are trimmed with CR kept out
    via the ``[^\\r\\n]`` value class, so CRLF and LF framings parse
    identically.

    ``etag``/``last_modified`` feed conditional-revisit scheduling
    (`frontier.schedule.recrawl_schedule`); ``location`` feeds redirect
    resolution (`operators.graph.resolve_redirects`).
    """
    raw = F.col(raw_col)
    return (
        df.withColumn(
            "status",
            F.nullif(
                F.regexp_extract(raw, r"^HTTP/[0-9.]+[ \t]+([0-9]{3})", 1), F.lit("")
            ).cast("int"),
        )
        .withColumn("content_type", _header(raw, "content-type"))
        .withColumn(
            "content_length", _header(raw, "content-length").cast("bigint")
        )
        .withColumn("etag", _header(raw, "etag"))
        .withColumn("last_modified", _header(raw, "last-modified"))
        .withColumn("location", _header(raw, "location"))
        .withColumn(
            "n_headers",
            F.size(
                F.regexp_extract_all(
                    raw, F.lit(r"(?m)^[A-Za-z][A-Za-z0-9-]*[ \t]*:"), F.lit(0)
                )
            ),
        )
    )
