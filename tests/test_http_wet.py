"""Unit tests for fetch post-processing (sources/http.py) and WET/WAT
derivation (parse/wet.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _payload_df(spark, payloads: list[bytes]):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(payloads)), "payload": payloads})
    )


def test_sniff_mime_magic_table(spark):
    from edgar_spark.sources.http import sniff_mime

    cases = [
        (b"\x89PNG\r\n\x1a\nrest", "image/png"),
        (b"\xff\xd8\xff\xe1exif", "image/jpeg"),
        (b"GIF87a.....", "image/gif"),
        (b"GIF89a.....", "image/gif"),
        (b"%PDF-1.7 blah", "application/pdf"),
        (b"PK\x03\x04zipzip", "application/zip"),
        (b"\x1f\x8b\x08gz", "application/gzip"),
        (b"OggS\x00vorbis", "application/ogg"),
        (b"BM\x36\x00bmp", "image/bmp"),
        (b"RIFF\x04\x00\x00\x00WAVEfmt ", "audio/wav"),
        (b"RIFF\x04\x00\x00\x00AVI LIST", "video/avi"),
        (b"\x00\x00\x00\x18ftypisom", "video/mp4"),
        # 'ftyp' at offset 5 WITHOUT a plausible box size is not video
        (b"1234ftyp notes follow", "text/plain"),
        (b"plain words here", "text/plain"),
        (b"  \t\n<!DOCTYPE html><p>x</p>", "text/html"),
        (b"<html><body>y", "text/html"),
        (b"\x00\x01\x02junk", "application/octet-stream"),
        # RIFF with an unknown tag is neither wav nor avi; the binary
        # size bytes make it unprintable -> octet-stream
        (b"RIFF\x04\x00\x00\x00XXXX", "application/octet-stream"),
    ]
    out = sniff_mime(_payload_df(spark, [c[0] for c in cases]))
    got = {r["doc_id"]: r["mime"] for r in out.collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: {got[i]} != {want}"


def test_sniff_mime_window_bounds_text_check(spark):
    from edgar_spark.sources.http import sniff_mime

    # printable inside the 8-byte window, junk after it: the sniff only
    # reads the window, so this is text/plain by contract
    p = b"abcdefgh" + b"\x00\xff" * 8
    out = sniff_mime(_payload_df(spark, [p]), window=8).collect()
    assert out[0]["mime"] == "text/plain"


def test_parse_http_headers_fields_and_framing(spark):
    from edgar_spark.sources.http import parse_http_headers

    crlf_head = (
        "HTTP/1.1 301 Moved Permanently\r\n"
        "content-TYPE: text/html; charset=ISO-8859-1\r\n"
        "Content-Length: 219\r\n"
        'ETag: "abc123"\r\n'
        "Last-Modified: Wed, 01 Mar 2023 00:00:00 GMT\r\n"
        "Location: https://example.com/new\r\n"
    )
    lf_head = "HTTP/1.0 200 OK\nContent-Type: text/plain\n"
    no_status = "X-Only: 1\n"
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "raw": [crlf_head, lf_head, no_status]})
    )
    rows = {r["doc_id"]: r for r in parse_http_headers(df).collect()}
    r0 = rows[0]
    assert r0["status"] == 301
    # CR never leaks into values under CRLF framing
    assert r0["content_type"] == "text/html; charset=ISO-8859-1"
    assert r0["content_length"] == 219
    assert r0["etag"] == '"abc123"'
    assert r0["last_modified"] == "Wed, 01 Mar 2023 00:00:00 GMT"
    assert r0["location"] == "https://example.com/new"
    assert r0["n_headers"] == 5
    r1 = rows[1]
    assert r1["status"] == 200 and r1["content_type"] == "text/plain"
    assert r1["etag"] is None and r1["location"] is None
    assert r1["n_headers"] == 1
    r2 = rows[2]
    assert r2["status"] is None and r2["n_headers"] == 1


def test_html_to_text_rules(spark):
    from edgar_spark.parse.wet import html_to_text

    html = (
        "<html><head><title>T</title>"
        "<style>p { a: b; }</style>"
        "<script>if (1 < 2) { alert('<p>'); }</script>"
        "</head><body><!-- secret -->"
        "<h1>Head</h1><p>one &amp; two &lt;three&gt;</p>"
        "<p>a  b\tc</p><br><br><br><br>"
        "<div>&quot;q&#39;&nbsp;end</div></body></html>"
    )
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "html": [html]}))
    row = html_to_text(df).collect()[0]
    txt = row["wet_text"]
    assert "secret" not in txt  # comment dropped
    assert "alert" not in txt  # script body dropped
    assert "a: b" not in txt  # style body dropped
    assert "one & two <three>" in txt  # entities decode once
    assert "a b c" in txt  # whitespace collapsed
    assert "\"q'" in txt and " " not in txt
    assert "\n\n\n" not in txt  # blank-run cap
    # block closes keep Head / paragraphs on separate lines
    lines = txt.split("\n")
    assert lines[0] == "T" and "Head" in lines[1]
    assert row["wet_chars"] == len(txt)


def test_html_to_text_custom_element_is_not_br(spark):
    """<brand-header> must take the generic-tag path (space), not the
    <br> newline rule."""
    from edgar_spark.parse.wet import html_to_text

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0],
                "html": ["<brand-header>Acme</brand-header> makes<br>widgets"],
            }
        )
    )
    txt = html_to_text(df).collect()[0]["wet_text"]
    assert txt == "Acme makes\nwidgets"


def test_extract_links_resolution(spark):
    from edgar_spark.parse.wet import extract_links

    html = (
        '<a href="https://other.com/abs?a=1&amp;b=2">Abs <b>link</b></a>'
        '<A HREF="//cdn.com/x.js">proto</A>'
        '<a href="/root">root</a>'
        '<a href="sub/page.html">rel</a>'
        '<a href="#frag">skip</a>'
        '<a href="javascript:void(0)">skip</a>'
        '<a href="MAILTO:a@b.c">skip</a>'
        '<a name="no-href">skip</a>'
        "<a href='sq.html'>sq</a>"
    )
    df = spark.createDataFrame(
        pd.DataFrame({"url": ["https://Example.com/a/b/c.html"], "html": [html]})
    )
    rows = extract_links(df).orderBy("dst_url").collect()
    got = {r["dst_url"]: r["anchor"] for r in rows}
    assert got == {
        "https://other.com/abs?a=1&b=2": "Abs link",  # &amp; unescaped, tags stripped
        "https://cdn.com/x.js": "proto",  # page scheme adopted
        "https://example.com/root": "root",  # host lowercased
        "https://example.com/a/b/sub/page.html": "rel",  # dir-relative
        "https://example.com/a/b/sq.html": "sq",  # single-quoted href
    }


def test_extract_links_bare_host_dir(spark):
    from edgar_spark.parse.wet import extract_links

    df = spark.createDataFrame(
        pd.DataFrame(
            {"url": ["https://h.com"], "html": ['<a href="x.html">x</a>']}
        )
    )
    rows = extract_links(df).collect()
    # empty page path resolves relative links against "/"
    assert rows[0]["dst_url"] == "https://h.com/x.html"


def test_cache_freshness_precedence(spark):
    """RFC 9111 lifetime precedence with explicit heads: s-maxage beats
    max-age, no-store/private kill cacheability even with a max-age,
    Expires−Date clamps at zero when already past, a PRESENT but
    unparsable Expires means already-stale (never the heuristic), the
    Date−Last-Modified heuristic divides by 10, Age debits fresh_until,
    and absurd-length numerics clamp instead of ANSI-crashing."""
    from edgar_spark.sources.http import cache_freshness

    rows = [
        (1, "HTTP/1.1 200 OK\r\nCache-Control: max-age=100\r\n\r\n"),
        (2, "HTTP/1.1 200 OK\r\nCache-Control: s-maxage=7, max-age=100\r\n\r\n"),
        (3, "HTTP/1.1 200 OK\r\nCache-Control: private, max-age=100\r\n\r\n"),
        (4, "HTTP/1.1 200 OK\r\nDate: Mon, 01 Jan 2024 00:00:00 GMT\r\n"
            "Expires: Sun, 31 Dec 2023 00:00:00 GMT\r\n\r\n"),
        (5, "HTTP/1.1 200 OK\r\nDate: Mon, 01 Jan 2024 00:00:00 GMT\r\n"
            "Expires: Mon, 01 Jan 2024 00:02:00 GMT\r\n\r\n"),
        (6, "HTTP/1.1 200 OK\r\nAge: 30\r\nDate: Mon, 01 Jan 2024 01:00:00 GMT\r\n"
            "Last-Modified: Mon, 01 Jan 2024 00:00:00 GMT\r\n\r\n"),
        (7, "HTTP/1.1 200 OK\r\nDate: NOT A DATE\r\n"
            "Expires: Mon, 01 Jan 2024 00:02:00 GMT\r\n\r\n"),
        (8, "HTTP/1.1 200 OK\r\n\r\n"),
        (9, "HTTP/1.1 200 OK\r\nExpires: 0\r\n"
            "Date: Mon, 01 Jan 2024 01:00:00 GMT\r\n"
            "Last-Modified: Mon, 01 Jan 2024 00:00:00 GMT\r\n\r\n"),
        (10, "HTTP/1.1 200 OK\r\n"
             "Cache-Control: max-age=99999999999999999999\r\n\r\n"),
        (11, "HTTP/1.1 200 OK\r\nAge: 99999999999999999999\r\n"
             "Cache-Control: max-age=60\r\n\r\n"),
    ]
    df = spark.createDataFrame(
        [(i, raw, 1_000_000) for i, raw in rows],
        "doc_id long, raw string, fetched_at long",
    )
    out = {r["doc_id"]: r for r in cache_freshness(df).collect()}
    assert (out[1]["lifetime_s"], out[1]["freshness_source"]) == (100, "cache-control")
    assert out[2]["lifetime_s"] == 7
    assert (out[3]["cacheable"], out[3]["lifetime_s"], out[3]["freshness_source"]) == (False, 0, "none")
    assert (out[4]["lifetime_s"], out[4]["freshness_source"]) == (0, "expires")
    assert out[5]["lifetime_s"] == 120
    r6 = out[6]
    assert (r6["lifetime_s"], r6["age_s"], r6["freshness_source"]) == (360, 30, "heuristic")
    assert r6["fresh_until"] == 1_000_000 + 360 - 30
    # Expires PRESENT but Date unusable: already stale via the expires
    # branch — never falls through to 'none' or the heuristic
    assert (out[7]["lifetime_s"], out[7]["freshness_source"]) == (0, "expires")
    assert (out[8]["cacheable"], out[8]["freshness_source"]) == (True, "none")
    # 'Expires: 0' (the do-not-cache idiom) = past per RFC 9111 §5.3 —
    # must NOT fall to the Last-Modified heuristic
    assert (out[9]["lifetime_s"], out[9]["freshness_source"]) == (0, "expires")
    # 20-digit max-age: no ANSI crash, clamps to the one-year cap
    assert (out[10]["lifetime_s"], out[10]["freshness_source"]) == (
        31_536_000, "cache-control")
    # 20-digit Age: clamps HIGH so the entry reads long-stale
    assert out[11]["lifetime_s"] == 60
    assert out[11]["fresh_until"] < 0


def test_extract_links_nofollow_aware(spark):
    from edgar_spark.parse.wet import extract_links

    html = (
        '<html><head><meta name="robots" content="noindex"></head><body>'
        '<a href="/a">plain</a>'
        '<a rel="nofollow" href="/b">sponsored</a>'
        "<a href='/c' rel='ugc nofollow'>ugc</a>"
        '<a rel="nofollower" href="/d">trap</a>'
        "</body></html>"
    )
    html_page_nf = html.replace('content="noindex"',
                                'content="noindex, NOFOLLOW"')
    df = spark.createDataFrame(
        [("https://h.example.com/x", html),
         ("https://h2.example.com/x", html_page_nf)],
        "url string, html string",
    )
    got = {
        (r["src"], r["dst_url"]): r["nofollow"]
        for r in extract_links(df, nofollow_aware=True).collect()
    }
    assert len(got) == 8
    # per-anchor rel (word boundary: 'nofollower' must NOT gate)
    assert got[("https://h.example.com/x", "https://h.example.com/a")] is False
    assert got[("https://h.example.com/x", "https://h.example.com/b")] is True
    assert got[("https://h.example.com/x", "https://h.example.com/c")] is True
    assert got[("https://h.example.com/x", "https://h.example.com/d")] is False
    # page-level robots-meta nofollow flags every link (case-folded)
    for path in "abcd":
        assert got[("https://h2.example.com/x",
                    f"https://h2.example.com/{path}")] is True


def test_soft404_branches(spark):
    from edgar_spark.sources.http import soft404

    long_pad = "lorem ipsum dolor " * 20
    rows = [
        (1, 200, "<html><title>Fine</title><body>" + long_pad + "</body>"),
        (2, 200, "<html><title>404 Not Found</title><body>"
         + long_pad + "</body>"),
        (3, 200, "<html><title>ok</title><body>Page not found. "
         + long_pad + "</body>"),
        (4, 200, "<html><body>gone</body></html>"),           # tiny
        (5, 404, "<html><title>404 Not Found</title></html>"),  # hard 404
        # title wins over body when both match (first-match reason)
        (6, 200, "<html><title>404</title><body>error 404 "
         + long_pad + "</body>"),
        # body phrase PAST the 2048-char window does not flag
        (7, 200, "<html><title>ok</title><body>" + "x" * 2100
         + " page not found</body>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, status int, html string")
    got = {r["doc_id"]: (r["soft404"], r["soft404_reason"])
           for r in soft404(df).collect()}
    assert got[1] == (False, None)
    assert got[2] == (True, "title")
    assert got[3] == (True, "body")
    assert got[4] == (True, "tiny")
    assert got[5] == (False, None)
    assert got[6] == (True, "title")
    assert got[7] == (False, None)
