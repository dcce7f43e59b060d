"""Sitemap ingestion — the frontier's bulk URL discovery source.

The reference discovers fetchable documents by parsing filing-index pages
(parser.go:86-127: each index page lists the filing's document URLs); the
web-scale analog is sitemaps.org XML — a host publishes ``<url><loc>…
</loc><lastmod>…</lastmod></url>`` entries and the crawler folds them
into the frontier with a freshness hint.

Extraction is deliberately ALL-JVM: two ``regexp_extract_all`` passes
(entry blocks, then fields) instead of an XML library or a Python UDF —
sitemap XML is machine-generated and flat, the regex subset is the
documented fast path, and the whole operator stays inside whole-stage
codegen: one scan, explode amplification only (no shuffle at all until
the caller joins the URLs against the URL-seen filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_sitemaps", "parse_sitemap_index"]


def parse_sitemap_index(
    df: "DataFrame", xml_col: str = "xml", host_col: str = "host"
) -> "DataFrame":
    """Explode sitemap INDEX documents (``<sitemapindex>`` files — the
    protocol's nesting level for hosts whose URL set exceeds the 50k/50MB
    per-file cap) into (host, sitemap_url, lastmod) rows: each row is a
    CHILD sitemap to fetch and feed back through ``parse_sitemaps``.
    Same (?s)-flagged all-JVM extraction and ``\\s*``-trimmed captures
    as the URL-level parser; entries without a ``<loc>`` are dropped."""
    block = F.explode(
        F.regexp_extract_all(
            F.col(xml_col), F.lit("(?s)<sitemap>(.*?)</sitemap>"), F.lit(1)
        )
    ).alias("_entry")
    entries = df.select(host_col, block)
    loc = F.regexp_extract(F.col("_entry"), r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
    lastmod = F.regexp_extract(
        F.col("_entry"), r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", 1
    )
    return entries.select(
        host_col,
        loc.alias("sitemap_url"),
        F.nullif(lastmod, F.lit("")).alias("lastmod"),
    ).filter(F.col("sitemap_url") != "")


# sitemaps.org <changefreq> value -> revisit-interval seed (seconds);
# 'always' = 0 (every wave), 'never' maps to NULL (archived URL — the
# recrawl scheduler should not revisit on a timer at all)
CHANGEFREQ_SECONDS = {
    "always": 0,
    "hourly": 3_600,
    "daily": 86_400,
    "weekly": 604_800,
    "monthly": 2_592_000,
    "yearly": 31_536_000,
}


def parse_sitemaps(
    df: DataFrame, xml_col: str = "xml", host_col: str = "host"
) -> DataFrame:
    """Explode sitemap XML documents into (host, loc, lastmod, priority,
    changefreq, changefreq_s) URL rows.

    ``lastmod`` is NULL when the entry omits it (it is optional in the
    protocol). Entries without a ``<loc>`` are dropped — a sitemap entry
    with no URL schedules nothing. Input rows with NULL xml yield no rows.

    ``priority`` is the protocol's [0.0, 1.0] crawl-priority hint as a
    double — present-but-invalid values (anything not matching
    ``0.x``/``1.0``-shaped digits) become NULL rather than an ANSI cast
    failure. ``changefreq`` is the lowercased hint token; ``changefreq_s``
    maps it through :data:`CHANGEFREQ_SECONDS` as the revisit-interval
    SEED the recrawl scheduler starts from before observation-driven
    backoff (`frontier.schedule.recrawl_schedule`) takes over —
    ``never`` and unknown tokens map to NULL (no timer).

    All patterns carry ``(?s)`` so ``.*?`` crosses newlines: real-world
    sitemaps are pretty-printed with line breaks between tags, and a
    non-DOTALL lazy dot would silently extract zero entries from them.
    (Java regex and DuckDB RE2 both honor the inline flag, so the DuckDB
    oracle mirrors it verbatim.) Whitespace around the ``<loc>``/
    ``<lastmod>`` values is trimmed by ``\\s*`` inside the capture — XML
    pretty-printers indent tag contents, and Spark's ``trim`` would only
    strip spaces, not the newlines.
    """
    block = F.explode(
        F.regexp_extract_all(
            F.col(xml_col), F.lit("(?s)<url>(.*?)</url>"), F.lit(1)
        )
    ).alias("_entry")
    entries = df.select(host_col, block)
    loc = F.regexp_extract(F.col("_entry"), r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
    lastmod = F.regexp_extract(
        F.col("_entry"), r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", 1
    )
    prio_raw = F.regexp_extract(
        F.col("_entry"), r"(?s)<priority>\s*(.*?)\s*</priority>", 1
    )
    # validate the numeric shape BEFORE casting: ANSI mode would fail the
    # task on junk like <priority>high</priority>
    priority = F.when(
        prio_raw.rlike(r"^(0(\.[0-9]+)?|1(\.0+)?)$"), prio_raw.cast("double")
    )
    changefreq = F.nullif(
        F.lower(
            F.regexp_extract(
                F.col("_entry"), r"(?s)<changefreq>\s*(.*?)\s*</changefreq>", 1
            )
        ),
        F.lit(""),
    )
    freq_map = F.create_map(
        *[F.lit(x) for kv in sorted(CHANGEFREQ_SECONDS.items()) for x in kv]
    )
    return entries.select(
        host_col,
        loc.alias("loc"),
        F.nullif(lastmod, F.lit("")).alias("lastmod"),
        priority.alias("priority"),
        changefreq.alias("changefreq"),
        freq_map[changefreq].cast("bigint").alias("changefreq_s"),
    ).filter(F.col("loc") != "")
