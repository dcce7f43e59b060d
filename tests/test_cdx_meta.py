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
