"""WET/WAT-style derivation — visible-text extraction and outlink
extraction from raw HTML, as pure column expressions.

Common-Crawl pipelines derive two artifacts from every WARC capture: the
WET record (visible text only) and the WAT record (metadata + outlinks).
The reference extracts text with a full token walk because it needs
byte-identical financial-table semantics (parser.go:326-347; our port of
that walk lives in `parse/tokenizer.py` + `parse/docs.py`). Corpus-scale
text derivation has the opposite trade-off: a fixed, regex-expressible
transform that stays entirely inside whole-stage codegen beats an Arrow
kernel — no Python workers, no batch transfer, and the whole WET pass
fuses into the scan projection. Both operators here are shuffle-free;
at 100 TB they cost exactly one pass over the html bytes.

Every regex is RE2-compatible (no backreferences, no lookaround) so the
identical pattern strings run on DuckDB for the oracle keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered (pattern, replacement) chain — applied top to bottom, global.
# Entity unescapes run after tag stripping; &amp; is rewritten LAST so
# double-escaped entities decode one level only, like html.UnescapeString
# applied once.
WET_RULES: list[tuple[str, str]] = [
    (r"(?s)<!--.*?-->", " "),  # comments
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),  # raw-text elements
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),
    # block-level boundaries become newlines so paragraphs survive
    (r"(?i)</(p|div|li|tr|h[1-6]|ul|ol|table|blockquote|title)\s*>", "\n"),
    # \b keeps custom elements like <brand-header> on the generic-tag
    # path (space), reserving the newline for real <br>/<br/>/<br …>
    (r"(?i)<br\b[^>]*>", "\n"),
    (r"(?s)<[^>]*>", " "),  # every remaining tag
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&amp;", "&"),
    (r"[ \t]+", " "),  # collapse runs
    (r" ?\n ?", "\n"),
    (r"\n{3,}", "\n\n"),
]


def html_to_text_col(html: Column) -> Column:
    """Visible text of an HTML string via the `WET_RULES` chain."""
    out = html
    for pat, repl in WET_RULES:
        out = F.regexp_replace(out, pat, repl)
    return F.trim(out)


def html_to_text(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Add ``wet_text`` (visible text) and ``wet_chars`` (its length)."""
    txt = html_to_text_col(F.col(html_col))
    return df.withColumn("wet_text", txt).withColumn(
        "wet_chars", F.length("wet_text")
    )


# one <a …href=…>…</a> element, non-greedy body; href may be double- or
# single-quoted (unquoted attribute values are not extracted)
_ANCHOR_RE = (
    r"(?is)<a\s[^>]*href\s*=\s*(\"[^\"]*\"|'[^']*')[^>]*>.*?</a\s*>"
)
_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"


def extract_links(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    nofollow_aware: bool = False,
) -> DataFrame:
    """Outlinks with anchor text — the WAT derivation that feeds
    `operators.graph.pagerank` / `anchor_text_topk` and frontier
    discovery.

    Each ``<a href="…">`` / ``<a href='…'>`` element (quoted either
    way; unquoted href values are skipped) yields one row ``(src,
    dst_url, anchor)`` with ``dst_url`` resolved against the page URL
    under the
    deterministic RFC-3986 subset a frontier needs: absolute kept,
    ``//`` adopts the page scheme, ``/`` is host-relative, anything else
    is directory-relative; fragments and ``javascript:``/``mailto:``/
    ``tel:`` pseudo-links drop. ``&amp;`` in hrefs unescapes (HTML
    attribute encoding), matching `parse/tables.py`'s hyperlink
    extractor semantics (parser.go:205-244).

    Plan: one `regexp_extract_all` + explode per page — Generate over
    the scan, no shuffle; dedup/aggregation is the caller's choice
    downstream.

    With ``nofollow_aware=True`` a ``nofollow`` boolean column is added:
    true when the anchor carries a ``rel`` containing the ``nofollow``
    token (either quote style, word-boundary — ``rel="external
    nofollow"`` gates, ``rel="nofollowed"`` does not) OR the page
    carries a robots-meta ``nofollow`` (`parse/headmeta.extract_meta`'s
    directive — REP's per-page layer: a nofollow page vouches for none
    of its outlinks, the rule real frontiers apply before enqueueing
    discovered URLs). The ``X-Robots-Tag`` response header is the third
    REP layer and lives with the header parser (`sources/http.py`);
    callers OR it in when headers are available. Still a pure Generate
    over the scan — the flags are two more codegen regex columns.
    """
    src = F.col(url_col)
    scheme = F.lower(F.regexp_extract(src, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(src, _SCHEME_RE + r"([^/?#]+)", 1))
    # page directory: path with the last segment dropped; empty path -> /
    path = F.regexp_extract(src, _SCHEME_RE + r"[^/?#]+([^?#]*)", 1)
    page_dir = F.when(path == "", "/").otherwise(
        F.regexp_replace(path, r"[^/]*$", "")
    )

    base_cols = [
        src.alias("src"),
        scheme.alias("_scheme"),
        host.alias("_host"),
        page_dir.alias("_dir"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(_ANCHOR_RE), F.lit(0))
        ).alias("_a"),
    ]
    if nofollow_aware:
        from edgar_spark.parse.headmeta import extract_meta

        df = extract_meta(df, html_col=html_col)
        base_cols.append(F.col("nofollow").alias("_page_nf"))
    elems = df.select(*base_cols)
    href_d = F.regexp_extract(F.col("_a"), r'(?is)href\s*=\s*"([^"]*)"', 1)
    href_s = F.regexp_extract(F.col("_a"), r"(?is)href\s*=\s*'([^']*)'", 1)
    href = F.regexp_replace(
        F.when(href_d != "", href_d).otherwise(href_s), r"&amp;", "&"
    )
    anchor = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_extract(F.col("_a"), r"(?is)>(.*)</a\s*>$", 1),
                r"(?s)<[^>]*>",
                " ",
            ),
            r"\s+",
            " ",
        )
    )
    dst = (
        F.when(href == "", F.lit(None).cast("string"))
        .when(href.startswith("#"), F.lit(None).cast("string"))
        .when(href.rlike(r"(?i)^(javascript|mailto|tel):"), F.lit(None))
        .when(href.rlike(_SCHEME_RE), href)
        .when(href.startswith("//"), F.concat(F.col("_scheme"), F.lit(":"), href))
        .when(
            href.startswith("/"),
            F.concat(F.col("_scheme"), F.lit("://"), F.col("_host"), href),
        )
        .otherwise(
            F.concat(
                F.col("_scheme"), F.lit("://"), F.col("_host"), F.col("_dir"), href
            )
        )
    )
    out_cols = ["src", dst.alias("dst_url"), anchor.alias("anchor")]
    if nofollow_aware:
        rel_nf = F.col("_a").rlike(
            r'(?is)rel\s*=\s*"[^"]*\bnofollow\b[^"]*"'
        ) | F.col("_a").rlike(r"(?is)rel\s*=\s*'[^']*\bnofollow\b[^']*'")
        out_cols.append((F.col("_page_nf") | rel_nf).alias("nofollow"))
    return elems.select(*out_cols).filter(F.col("dst_url").isNotNull())


# block-level boundary: any open or close of a structural element.
# \b rejects longer tag names extending a listed one with word chars
# (<brand>, <header2>); hyphenated custom elements whose prefix is a
# listed tag (<p-card>) still split — a benign extra boundary, unlike
# the <br>-newline case where the match would corrupt text.
_BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|ul|ol|li|h[1-6]|table|tr|td|nav|footer|header|"
    r"section|article|blockquote|br)\b[^>]*>"
)
_ANCHOR_BODY_RE = r"(?is)<a\s[^>]*>(.*?)</a\s*>"


def block_density(
    df: DataFrame,
    id_col: str = "url",
    html_col: str = "html",
    min_chars: int = 20,
    max_link_density_pct: int = 20,
) -> DataFrame:
    """jusText/Boilerpipe-style block classification by link density —
    the boilerplate-removal stage between WET extraction and curation:
    navigation/footer blocks are mostly anchor text, content blocks are
    mostly prose. One row per non-empty block: (id, block_idx, n_chars,
    n_link_chars, is_boilerplate) where a block is boilerplate when it
    is short (< ``min_chars``) or its anchor-char share exceeds
    ``max_link_density_pct``% — the ratio test is cross-multiplied
    integer arithmetic, so the verdict is engine-exact.

    Plan: the html splits on structural-tag boundaries into a bound
    block array; per-block text and anchor-char sums are nested HOFs
    over the lambda variable only (nothing re-evaluates per element);
    posexplode is a Generate over the scan — zero Python, zero
    shuffles, linear in the html bytes.
    """
    blocks = F.split(F.col(html_col), _BLOCK_SPLIT_RE)
    per_block = F.transform(
        blocks,
        lambda b: F.struct(
            F.length(
                F.trim(
                    F.regexp_replace(
                        F.regexp_replace(b, r"(?s)<[^>]*>", " "), r"\s+", " "
                    )
                )
            ).alias("n_chars"),
            F.aggregate(
                F.regexp_extract_all(b, F.lit(_ANCHOR_BODY_RE), F.lit(1)),
                F.lit(0),
                lambda acc, a: acc
                + F.length(
                    F.trim(
                        F.regexp_replace(
                            F.regexp_replace(a, r"(?s)<[^>]*>", " "),
                            r"\s+",
                            " ",
                        )
                    )
                ),
            ).alias("n_link_chars"),
        ),
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(per_block).alias("block_idx", "_b")
    ).select(
        id_col,
        "block_idx",
        F.col("_b.n_chars").alias("n_chars"),
        F.col("_b.n_link_chars").alias("n_link_chars"),
    )
    boiler = (F.col("n_chars") < min_chars) | (
        F.col("n_link_chars") * 100
        > F.col("n_chars") * max_link_density_pct
    )
    return exploded.filter(F.col("n_chars") > 0).withColumn(
        "is_boilerplate", boiler
    )


# any tag/comment/doctype open — the markup-event census used by the
# density gate ('<' followed by a letter, '/', or '!'); bare '<' in
# prose (e.g. "1 < 2") is not a markup event
_TAG_START_RE = r"<[A-Za-z!/]"
# raw-text element bodies (script/style) — bytes a browser never renders;
# the same two patterns WET_RULES drops, combined so one extract_all pass
# measures them
_RAWTEXT_RE = (
    r"(?is)<script\b[^>]*>.*?</script\s*>|<style\b[^>]*>.*?</style\s*>"
)


def markup_density(
    df: DataFrame,
    id_col: str = "url",
    html_col: str = "html",
    min_text_permille: int = 250,
    max_script_permille: int = 500,
) -> DataFrame:
    """Text-to-markup density — the page-level quality gate crawl
    pipelines apply before spending WET/parse effort: link farms, tag
    soup, and script-shell SPA pages carry almost no visible text per
    raw byte, while prose pages are mostly text (the page-grain
    counterpart of `block_density`'s block-grain link test; C4/
    RefinedWeb apply both). The reference never needs this — it fetches
    a curated archive where every page is worth parsing; an open-web
    frontier that skips the gate decodes gigabytes of junk.

    Per page: ``total_chars`` (raw html length), ``tag_count`` (markup
    events: ``<`` + letter//!), ``script_chars`` (script/style body
    chars, the never-rendered share), ``text_chars`` (visible text via
    the `WET_RULES` chain), the two integer permille ratios, and
    ``is_contentful`` — true when visible text ≥ ``min_text_permille``‰
    of the raw bytes AND script/style ≤ ``max_script_permille``‰. Both
    ratio tests are cross-multiplied integers: engine-exact, no float.

    Plan: every column is a regex census over the one bound html value —
    the whole gate fuses into the scan projection (zero shuffles, zero
    Python); at 100 TB it costs the WET pass it was already going to
    ride.
    """
    from edgar_spark.operators.text import bind

    def feats(h: Column) -> Column:
        total = F.length(h)
        tag_count = F.size(
            F.regexp_extract_all(h, F.lit(_TAG_START_RE), F.lit(0))
        )
        script_chars = F.aggregate(
            F.regexp_extract_all(h, F.lit(_RAWTEXT_RE), F.lit(0)),
            F.lit(0),
            lambda acc, x: acc + F.length(x),
        )
        text_chars = F.length(html_to_text_col(h))
        return F.struct(
            total.alias("total_chars"),
            tag_count.alias("tag_count"),
            script_chars.alias("script_chars"),
            text_chars.alias("text_chars"),
        )

    out = df.withColumn("_md", bind(F.col(html_col), feats)).select(
        id_col,
        F.col("_md.total_chars").alias("total_chars"),
        F.col("_md.tag_count").alias("tag_count"),
        F.col("_md.script_chars").alias("script_chars"),
        F.col("_md.text_chars").alias("text_chars"),
    )
    nz = F.greatest(F.col("total_chars"), F.lit(1)).cast("bigint")  # empty -> 0‰
    return out.selectExpr(
        "*",
        "CAST(text_chars AS BIGINT) * 1000 div greatest(total_chars, 1)"
        " AS text_permille",
        "CAST(script_chars AS BIGINT) * 1000 div greatest(total_chars, 1)"
        " AS script_permille",
    ).withColumn(
        "is_contentful",
        (F.col("text_chars").cast("bigint") * 1000 >= F.lit(min_text_permille) * nz)
        & (F.col("script_chars").cast("bigint") * 1000 <= F.lit(max_script_permille) * nz),
    )
