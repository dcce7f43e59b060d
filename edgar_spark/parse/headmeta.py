"""HTML ``<head>`` metadata extraction (headmeta) — the WAT-metadata
sibling of `parse/wet.extract_links`.

A crawl frontier consumes page metadata three ways: ``link rel=canonical``
collapses URL aliases before URL-seen dedup (`frontier.canonical`), the
robots ``<meta>`` directives gate indexing/outlink-following per page
(complementing the host-level robots.txt gate in `frontier.robots` —
REP defines both layers), and title/description/charset feed corpus
quality signals. The reference parses head-less EDGAR fragments and
needs none of this (parser.go:34-53 goes straight to body tables).

Every field is an anchored case-insensitive regex extract over the raw
html — pure codegen projections, RE2-safe (no lookaround), shuffle-free,
and replayed verbatim in the DuckDB oracle. Attribute order in ``<meta>``
/ ``<link>`` tags is not fixed by HTML, so each field coalesces a
name-then-content extract with a content-then-name extract. Attribute
values are matched in their double-quoted form only (the dominant form
in generated head markup); single-quoted/unquoted attributes fall back
to NULL/false — a documented under-extraction, never a wrong value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_meta", "canonical_collapse"]


def _ws_collapse(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def _meta_content(html: Column, name: str) -> Column:
    """content="…" of <meta name="NAME" …>, either attribute order."""
    fwd = F.regexp_extract(
        html,
        rf'(?is)<meta\s[^>]*name\s*=\s*"{name}"[^>]*content\s*=\s*"([^"]*)"',
        1,
    )
    rev = F.regexp_extract(
        html,
        rf'(?is)<meta\s[^>]*content\s*=\s*"([^"]*)"[^>]*name\s*=\s*"{name}"',
        1,
    )
    return F.nullif(F.when(fwd != "", fwd).otherwise(rev), F.lit(""))


def extract_meta(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Add head-metadata columns extracted from ``html_col``.

    Adds ``title`` (whitespace-collapsed, NULL when absent),
    ``meta_description``, ``charset`` (lowercased; one extract matches
    both ``<meta charset=…>`` and the legacy ``http-equiv`` content
    form — the first ``<meta … charset=`` in document order wins),
    ``canonical_url`` (``<link rel="canonical" href=…>``, either
    attribute order), and the robots-directive booleans ``noindex`` /
    ``nofollow`` (word-boundary match inside ``<meta name="robots">``
    content, so ``noindex,nofollow`` and ``NOINDEX`` both gate but
    ``nonoindexed`` does not). Missing string fields are NULL; the
    booleans default false — a page without directives is crawlable.
    """
    html = F.col(html_col)
    title = _ws_collapse(
        F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title\s*>", 1)
    )
    charset_attr = F.regexp_extract(
        html, r"(?is)<meta\s[^>]*charset\s*=\s*[\"']?([A-Za-z0-9_.:-]+)", 1
    )
    canon_fwd = F.regexp_extract(
        html,
        r'(?is)<link\s[^>]*rel\s*=\s*"canonical"[^>]*href\s*=\s*"([^"]*)"',
        1,
    )
    canon_rev = F.regexp_extract(
        html,
        r'(?is)<link\s[^>]*href\s*=\s*"([^"]*)"[^>]*rel\s*=\s*"canonical"',
        1,
    )
    robots = F.lower(F.coalesce(_meta_content(html, "robots"), F.lit("")))
    return (
        df.withColumn("title", F.nullif(title, F.lit("")))
        .withColumn("meta_description", _meta_content(html, "description"))
        .withColumn("charset", F.nullif(F.lower(charset_attr), F.lit("")))
        .withColumn(
            "canonical_url",
            F.nullif(
                F.when(canon_fwd != "", canon_fwd).otherwise(canon_rev),
                F.lit(""),
            ),
        )
        .withColumn("noindex", robots.rlike(r"\bnoindex\b"))
        .withColumn("nofollow", robots.rlike(r"\bnofollow\b"))
    )

def canonical_collapse(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Collapse fetched pages by their DECLARED canonical target — the
    ``<link rel=canonical>`` consolidation step search engines and
    crawl pipelines run after fetch (print/mobile/tracking variants of
    one article all declare the same canonical, and only one copy
    should survive into the corpus).

    Per page: ``canonical_target`` = the declared canonical href, or
    the page's own URL when none is declared (self-canonical is the
    spec default). Within each target group the representative is the
    SELF-canonical page when present (the copy the site says is real),
    else the lexicographically-first URL — a deterministic rule both
    engines replay. Returns every input row with ``canonical_target``,
    ``group_size``, and ``is_rep``; downstream keeps ``is_rep`` rows.

    Run URL canonicalization (`frontier.canonical.canonicalize_url`)
    upstream so target strings compare equal — this operator collapses
    by string identity, by design (declared-canonical semantics are a
    statement about the EXACT target URL).

    Plan: the extract is the same codegen regex chain as
    :func:`extract_meta`; grouping is ONE window shuffle on the target
    (alias groups are small — a handful of variants per article — so
    per-partition window state stays bounded; no join, no second
    shuffle for the group size)."""
    meta = extract_meta(df, html_col)
    tgt = F.coalesce(F.col("canonical_url"), F.col(url_col))
    from pyspark.sql import Window

    w = Window.partitionBy("canonical_target")
    self_rank = F.when(F.col(url_col) == F.col("canonical_target"), 0).otherwise(1)
    rep = F.min(F.struct(self_rank.alias("r"), F.col(url_col).alias("u"))).over(w)
    return (
        meta.withColumn("canonical_target", tgt)
        .withColumn("group_size", F.count("*").over(w))
        .withColumn("is_rep", F.col(url_col) == rep["u"])
        .drop(
            "title", "meta_description", "charset", "noindex", "nofollow"
        )
    )
