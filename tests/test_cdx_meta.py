"""Unit tests for the SURT/CDX capture index (frontier/canonical.py)
and HTML head-metadata extraction (parse/headmeta.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _surt(spark, urls: list[str]) -> list[str]:
    from edgar_spark.frontier.canonical import surt_key

    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    return [r["s"] for r in df.select(surt_key(F.col("url")).alias("s")).collect()]


def test_surt_key_forms(spark):
    got = _surt(
        spark,
        [
            "https://WWW.Example.com/a/b?b=2&a=1",
            "http://example.com/a/b?a=1&b=2",
            "https://example.com",
            "https://sub.example.co.uk:8443/x",
            "https://www.example.com/a#frag",
            # www2 is a distinct label — only a single leading "www." drops
            "https://www2.example.com/",
            # '?' INSIDE the fragment is not a query string
            "https://example.com/a#sec?tab=1",
        ],
    )
    assert got[0] == "com,example)/a/b?a=1&b=2"
    assert got[1] == "com,example)/a/b?a=1&b=2"  # scheme-invariant
    assert got[2] == "com,example)/"  # bare host -> "/"
    assert got[3] == "uk,co,example,sub:8443)/x"
    assert got[4] == "com,example)/a"  # fragment ignored
    assert got[5] == "com,example,www2)/"
    assert got[6] == "com,example)/a"  # fragment-embedded '?' ignored


def test_cdx_latest_picks_latest_and_counts(spark):
    from edgar_spark.frontier.canonical import cdx_latest

    caps = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [
                    "https://www.a.com/p?x=1&y=2",
                    "https://a.com/p?y=2&x=1",  # same surt, later ts
                    "https://a.com/q",  # separate entry
                ],
                "warc_ts": [10, 20, 5],
                "digest": ["d1", "d2", "d3"],
            }
        )
    )
    rows = {r["surt"]: r for r in cdx_latest(caps).collect()}
    assert set(rows) == {"com,a)/p?x=1&y=2", "com,a)/q"}
    p = rows["com,a)/p?x=1&y=2"]
    assert (p["url"], p["last_ts"], p["digest"]) == (
        "https://a.com/p?y=2&x=1",
        20,
        "d2",
    )
    assert (p["n_captures"], p["n_distinct_digests"]) == (2, 2)
    q = rows["com,a)/q"]
    assert (q["n_captures"], q["n_distinct_digests"]) == (1, 1)


def test_cdx_latest_static_page_one_digest(spark):
    from edgar_spark.frontier.canonical import cdx_latest

    caps = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["https://s.com/x"] * 3,
                "warc_ts": [1, 2, 3],
                "digest": ["same", "same", "same"],
            }
        )
    )
    (row,) = cdx_latest(caps).collect()
    assert row["last_ts"] == 3
    assert (row["n_captures"], row["n_distinct_digests"]) == (3, 1)


def _meta_rows(spark, htmls: list[str]):
    from edgar_spark.parse.headmeta import extract_meta

    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(htmls)), "html": htmls})
    )
    return extract_meta(df).orderBy("i").collect()


def test_extract_meta_fields(spark):
    rows = _meta_rows(
        spark,
        [
            # everything present, attribute order forward
            '<head><title> A\n  Title </title>'
            '<meta name="description" content="desc one">'
            '<meta charset="UTF-8">'
            '<link rel="canonical" href="https://c.com/1">'
            '<meta name="robots" content="noindex, nofollow"></head>',
            # reversed attribute orders + http-equiv charset
            '<META CONTENT="rev desc" NAME="description">'
            '<meta http-equiv="Content-Type"'
            ' content="text/html; charset=ISO-8859-1">'
            '<link href="https://c.com/2" rel="canonical">'
            '<meta content="NOFOLLOW" name="robots">',
            # nothing present
            "<html><body>plain</body></html>",
            # word-boundary trap: "nonoindexed" must NOT set noindex
            '<meta name="robots" content="nonoindexed">',
        ],
    )
    r0 = rows[0]
    assert r0["title"] == "A Title"
    assert r0["meta_description"] == "desc one"
    assert r0["charset"] == "utf-8"
    assert r0["canonical_url"] == "https://c.com/1"
    assert (r0["noindex"], r0["nofollow"]) == (True, True)

    r1 = rows[1]
    assert r1["title"] is None
    assert r1["meta_description"] == "rev desc"
    assert r1["charset"] == "iso-8859-1"
    assert r1["canonical_url"] == "https://c.com/2"
    assert (r1["noindex"], r1["nofollow"]) == (False, True)

    r2 = rows[2]
    assert r2["title"] is None
    assert r2["meta_description"] is None
    assert r2["charset"] is None
    assert r2["canonical_url"] is None
    assert (r2["noindex"], r2["nofollow"]) == (False, False)

    assert (rows[3]["noindex"], rows[3]["nofollow"]) == (False, False)


def test_sniff_charset_precedence():
    """BOM > transport > meta > utf-8, unknown labels fall through, the
    meta prescan stops at 1024 bytes."""
    from edgar_spark.parse.charset import decode_bytes, sniff_charset

    # BOMs are authoritative — even over a conflicting transport label
    assert sniff_charset(b"\xef\xbb\xbfhi", "windows-1252") == "utf-8-sig"
    assert sniff_charset(b"\xff\xfeh\x00", "windows-1252") == "utf-16"
    assert sniff_charset(b"\xfe\xff\x00h", None) == "utf-16"
    # transport beats meta
    assert (
        sniff_charset(b'<meta charset="utf-8">', "ISO-8859-1") == "latin-1"
    )
    # quoted / spaced / http-equiv meta forms all hit
    assert sniff_charset(b"<meta charset = 'Windows-1252'>") == "cp1252"
    assert (
        sniff_charset(
            b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=UTF-16LE">'
        )
        == "utf-16-le"
    )
    # unknown labels fall through: bogus transport -> meta; bogus meta
    # -> utf-8 default
    assert sniff_charset(b'<meta charset="utf-8">', "klingon-8") == "utf-8"
    assert sniff_charset(b'<meta charset="klingon-8">x') == "utf-8"
    assert sniff_charset(b"plain bytes") == "utf-8"
    # prescan window: a meta past byte 1024 is not seen
    late = b" " * 1025 + b'<meta charset="windows-1252">'
    assert sniff_charset(late) == "utf-8"
    # decode posture: mojibake replaces, NULL passes through
    codec, text = decode_bytes(b"ok \xff\xfe\xfa garbage")  # invalid utf-8
    assert codec == "utf-8" and "�" in text and text.startswith("ok ")
    assert decode_bytes(None) == (None, None)
    # utf-16 BOM is consumed, not leaked into the text
    codec, text = decode_bytes(b"\xff\xfe" + "héllo".encode("utf-16-le"))
    assert (codec, text) == ("utf-16", "héllo")


def test_decode_html_mixed_corpus(spark):
    from edgar_spark.parse.charset import decode_html

    rows_in = [
        (1, bytearray("père €".encode("cp1252")), "windows-1252"),
        (2, bytearray(b"\xef\xbb\xbf" + "№✓".encode("utf-8")), None),
        (3, None, "utf-8"),  # NULL payload -> NULL row, not a task kill
    ]
    df = spark.createDataFrame(
        rows_in, "doc_id long, html binary, transport string"
    )
    got = {
        r["doc_id"]: r
        for r in decode_html(df, transport_col="transport").collect()
    }
    assert (got[1]["charset_used"], got[1]["text"]) == ("cp1252", "père €")
    assert (got[2]["charset_used"], got[2]["text"]) == ("utf-8-sig", "№✓")
    assert (got[3]["charset_used"], got[3]["text"]) == (None, None)


def test_registered_domain_psl_rules(spark):
    from edgar_spark.frontier.canonical import registered_domain

    hosts = [
        "WWW.Example.CO.UK",          # case + www are just labels
        "a.b.deep.example.com",       # gTLD, multiple subdomains
        "user-site.github.io",        # private registry suffix
        "sub.host.unknowntld",        # implicit '*' rule
        "co.uk",                      # IS a public suffix -> NULL
        "github.io",                  # private suffix itself -> NULL
        "bucket.s3.amazonaws.com:443",  # 3-label suffix + port strip
        "com",                        # bare TLD -> NULL
    ]
    df = spark.createDataFrame(pd.DataFrame({"host": hosts}))
    got = [
        r["d"]
        for r in df.select(
            registered_domain(F.col("host")).alias("d")
        ).collect()
    ]
    assert got == [
        "example.co.uk",
        "example.com",
        "user-site.github.io",
        "host.unknowntld",
        None,
        None,
        "bucket.s3.amazonaws.com",
        None,
    ]


def test_nfc_normalize_composes(spark):
    from edgar_spark.parse.charset import nfc_normalize

    # unambiguous escapes: decomposed combining marks in, NFC-composed out
    decomposed = "Cafe\u0301 A\u030a"
    composed = "Caf\u00e9 \u00c5"
    df = spark.createDataFrame(
        [(1, decomposed), (2, "plain ascii"), (3, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in nfc_normalize(df).collect()}
    assert got[1]["norm_text"] == composed and got[1]["changed"]
    assert got[2]["norm_text"] == "plain ascii" and not got[2]["changed"]
    assert got[3]["norm_text"] is None and got[3]["changed"] is None


def test_strip_tracking_params(spark):
    from edgar_spark.frontier.canonical import strip_tracking_params

    urls = [
        # survivors keep order/spelling; utm stripped case-insensitively
        "https://h/p?utm_source=tw&id=9&UTM_Campaign=x&b=2",
        "https://h/a;JSESSIONID=deadbeef?x=1",
        "https://h/p?fbclid=abc",            # all stripped -> no '?'
        "https://h/p?id=1#frag",             # clean query + fragment kept
        "https://h/plain",                   # no query at all
        "https://h/p?sidebar=1&sid=9",       # 'sidebar' is NOT 'sid'
        "https://h/p?a=utm_source%3D1",      # tracking NAME only, not value
        # jsessionid inside a query VALUE must not swallow '&b=1'
        "https://h/p?next=/a;jsessionid=X&b=1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r["s"]
        for r in df.select(
            strip_tracking_params(F.col("url")).alias("s")
        ).collect()
    ]
    assert got == [
        "https://h/p?id=9&b=2",
        "https://h/a?x=1",
        "https://h/p",
        "https://h/p?id=1#frag",
        "https://h/plain",
        "https://h/p?sidebar=1",
        "https://h/p?a=utm_source%3D1",
        "https://h/p?next=/a&b=1",
    ]


def test_canonical_collapse_rep_selection(spark):
    import pandas as pd

    def page(url, canonical=None, rev=False):
        if canonical is None:
            link = ""
        elif rev:
            link = f'<link href="{canonical}" rel="canonical"/>'
        else:
            link = f'<link rel="canonical" href="{canonical}"/>'
        return (url, f"<html><head>{link}</head><body/></html>")

    rows = [
        # group 1: self-canonical rep exists but sorts LAST — must win
        page("https://e.com/z-main", "https://e.com/z-main"),
        page("https://e.com/a-amp", "https://e.com/z-main"),
        page("https://e.com/b-print", "https://e.com/z-main", rev=True),
        # group 2: no self-canonical member -> lexicographic first
        page("https://e.com/v2", "https://e.com/gone"),
        page("https://e.com/v1", "https://e.com/gone"),
        # implicit self-canonical: no link at all -> own group, rep
        page("https://e.com/solo"),
    ]
    from edgar_spark.parse.headmeta import canonical_collapse

    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "html"]))
    out = canonical_collapse(df).toPandas().set_index("url")
    g1 = out[out["canonical_target"] == "https://e.com/z-main"]
    assert len(g1) == 3 and int(g1["group_size"].iloc[0]) == 3
    assert bool(out.loc["https://e.com/z-main", "is_rep"])
    assert not bool(out.loc["https://e.com/a-amp", "is_rep"])
    assert not bool(out.loc["https://e.com/b-print", "is_rep"])
    # reversed-attribute extraction produced the same target
    assert (
        out.loc["https://e.com/b-print", "canonical_target"]
        == "https://e.com/z-main"
    )
    assert bool(out.loc["https://e.com/v1", "is_rep"])
    assert not bool(out.loc["https://e.com/v2", "is_rep"])
    assert bool(out.loc["https://e.com/solo", "is_rep"])
    assert int(out.loc["https://e.com/solo", "group_size"]) == 1
