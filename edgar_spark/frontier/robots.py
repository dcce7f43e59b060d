"""robots.txt gating as a broadcast-joined rules table.

The reference has no robots handling (its ``getPage`` is a bare http.Get —
page.go:21-28); this is a north-rule capability. Rules are tiny relative to
the frontier, so gating is two broadcast semi/anti joins — the frontier side
is never shuffled.

Semantics: REP longest-match — among the rules matching a URL (same host;
literal rules prefix-match, ``*``/``$`` rules match via a linear greedy
glob fold), the longest ORIGINAL pattern wins, ties go to Allow;
unmatched hosts/paths default to allowed.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

ROBOTS_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("path_prefix", StringType(), False),
        StructField("allowed", BooleanType(), False),
        StructField("crawl_delay_ms", IntegerType(), True),
        # REP precedence length of the ORIGINAL pattern (NULL ⇒ use
        # length(path_prefix)). A wildcard Disallow is matched by its
        # truncated prefix but must keep its full pattern length for
        # longest-match, or a longer literal Allow would out-rank it and
        # UNDER-block.
        StructField("pattern_len", IntegerType(), True),
        # the ORIGINAL pattern for rules containing '*' or a trailing
        # '$' (exact REP wildcard semantics, matched by a linear greedy
        # glob fold in split_robots — never a backtracking regex, since
        # robots.txt content is untrusted); NULL ⇒ plain prefix match
        StructField("pattern", StringType(), True),
    ]
)


def split_robots(
    frontier: DataFrame, robots: DataFrame, url_col: str = "url"
) -> Tuple[DataFrame, DataFrame]:
    """(allowed, blocked) split with the public robots.txt precedence rule:
    among the rules matching a URL (same host, path prefix), the LONGEST
    path wins; on a length tie Allow beats Disallow; a URL matching no rule
    is allowed. ``Allow: /private/public/`` therefore punches a hole in
    ``Disallow: /private/`` exactly as the spec's longest-match demands.

    Shuffle-free: the (tiny) rules table collapses to one array per host,
    broadcast-joins on host, and the winner is folded per row with a
    higher-order ``aggregate`` — the frontier side never moves.
    """
    if "pattern_len" not in robots.columns:  # older callers' rule tables
        robots = robots.withColumn("pattern_len", F.lit(None).cast("int"))
    if "pattern" not in robots.columns:
        robots = robots.withColumn("pattern", F.lit(None).cast("string"))
    # pre-derive the glob shape per rule: end anchor + '*'-split segments
    # (consecutive '*' leave empty middle segments; the fold skips them)
    core = F.when(
        F.col("pattern").endswith("$"),
        F.expr("substring(pattern, 1, length(pattern) - 1)"),
    ).otherwise(F.col("pattern"))
    rules_per_host = robots.groupBy("host").agg(
        F.collect_list(
            F.struct(
                F.coalesce(
                    F.col("pattern_len"), F.length("path_prefix").cast("int")
                ).alias("plen"),
                F.col("path_prefix").alias("prefix"),
                F.col("allowed").alias("allowed"),
                F.when(F.col("pattern").isNotNull(), F.split(core, r"\*", -1))
                .otherwise(F.lit(None).cast("array<string>"))
                .alias("segs"),
                F.coalesce(F.col("pattern").endswith("$"), F.lit(False)).alias(
                    "anchored"
                ),
            )
        ).alias("_rules")
    )
    with_path = frontier.withColumn(
        "_path",
        # A bare-host URL (https://example.com, no trailing slash) extracts
        # an empty path that would match no rule — not even "Disallow: /".
        # The REP resolves such URLs as "/", so coalesce before matching.
        F.when(
            F.regexp_extract(F.col(url_col), r"^https?://[^/]+(/.*)$", 1)
            == "",
            F.lit("/"),
        ).otherwise(
            F.regexp_extract(F.col(url_col), r"^https?://[^/]+(/.*)$", 1)
        ),
    ).join(F.broadcast(rules_per_host), "host", "left")

    init = F.struct(
        F.lit(-1).cast("int").alias("plen"), F.lit(True).alias("allowed")
    )

    def glob_match(path, segs, anchored):
        """Linear greedy REP glob match of ``path`` against pattern
        segments ``segs`` (the pattern split on '*'; a trailing '$' sets
        ``anchored``). Greedy leftmost placement of each inner segment is
        optimal for '*'-only globs, so this is exact — and it is pure
        startswith/locate/endswith arithmetic, O(|path|·|pattern|) with
        NO regex engine, so hostile many-wildcard robots patterns cannot
        trigger catastrophic backtracking in the crawl gate."""
        n = F.size(segs)
        first, last = segs[0], F.element_at(segs, -1)
        # scan position (1-based) after consuming the first segment
        pos0 = F.when(
            path.startswith(first), F.length(first) + 1
        ).otherwise(F.lit(-1))
        # greedily place each middle segment at its earliest occurrence
        pos = F.aggregate(
            F.slice(segs, 2, F.greatest(n - 2, F.lit(0))),
            pos0,
            lambda acc, seg: F.when(acc < 0, F.lit(-1)).otherwise(
                F.when(F.length(seg) == 0, acc).otherwise(
                    F.when(
                        F.call_function("locate", seg, path, acc) > 0,
                        F.call_function("locate", seg, path, acc)
                        + F.length(seg),
                    ).otherwise(F.lit(-1))
                )
            ),
        )
        one_seg = n == 1  # no '*' at all: pattern is anchored-literal
        return F.when(
            one_seg,
            F.when(anchored, path == first).otherwise(path.startswith(first)),
        ).otherwise(
            (pos >= 0)
            & F.when(
                anchored,
                # the last segment must sit at the very end, at or after
                # the greedy scan position
                path.endswith(last)
                & (F.length(path) - F.length(last) + 1 >= pos),
            ).otherwise(
                (F.length(last) == 0)
                | (F.call_function("locate", last, path, pos) > 0)
            ),
        )

    def fold(acc, r):
        # wildcard/$ rules match by the linear glob fold, plain rules by
        # prefix — both JVM-side
        matched = F.when(
            r["segs"].isNotNull(),
            glob_match(F.col("_path"), r["segs"], r["anchored"]),
        ).otherwise(F.col("_path").startswith(r["prefix"]))
        wins = matched & (
            (r["plen"] > acc["plen"])
            | ((r["plen"] == acc["plen"]) & r["allowed"])
        )
        return F.when(
            wins, F.struct(r["plen"].alias("plen"), r["allowed"].alias("allowed"))
        ).otherwise(acc)

    decision = F.aggregate(
        F.coalesce(F.col("_rules"), F.array().cast(
            "array<struct<plen:int,prefix:string,allowed:boolean,"
            "segs:array<string>,anchored:boolean>>"
        )),
        init,
        fold,
    )["allowed"]
    with_decision = with_path.withColumn("_ok", decision).drop("_path", "_rules")
    allowed = with_decision.filter(F.col("_ok")).drop("_ok")
    blocked = with_decision.filter(~F.col("_ok")).drop("_ok")
    return allowed, blocked


def rules_from_robots_pages(
    pages: DataFrame, user_agent: str = "edgar-spark"
) -> DataFrame:
    """Distributed robots.txt ingestion: select the corpus rows whose url is
    ``<scheme>://<host>/robots.txt``, parse each body on executors
    (Arrow-batched), and emit ROBOTS_SCHEMA rule rows — the self-contained
    way a crawler acquires its own gating rules from the crawl corpus."""
    import re
    from typing import Iterator

    import pandas as pd

    robots_pages = pages.filter(
        F.col("url").rlike(r"^https?://[^/]+/robots\.txt$")
    ).select("url", "text")

    def gen(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                host = re.match(r"^https?://([^/]+)/", t.url).group(1)
                rows.extend(parse_robots_txt(host, t.text or "", user_agent))
            yield pd.DataFrame(
                rows,
                columns=[
                    "host", "path_prefix", "allowed", "crawl_delay_ms",
                    "pattern_len", "pattern",
                ],
            )

    return robots_pages.mapInPandas(gen, ROBOTS_SCHEMA)


def parse_robots_txt(
    host: str, text: str, user_agent: str = "edgar-spark"
) -> list:
    """Parse a robots.txt body into ROBOTS_SCHEMA rows for ``host``,
    following the public REP semantics: directives group under consecutive
    ``User-agent`` lines; the crawler obeys the group(s) naming its own
    agent token when any exist, else the ``*`` groups; ``Allow``/
    ``Disallow`` carry path prefixes (an empty Disallow means allow-all and
    emits nothing); ``Crawl-delay`` seconds become crawl_delay_ms attached
    to the group's rows (clamped to int32, inf/nan/negatives ignored).
    Wildcards are EXACT: ``*`` matches any character run and a trailing
    ``$`` anchors at the end of the path — such rules ship their ORIGINAL
    pattern (``pattern``) and are matched by ``split_robots``'s linear
    greedy glob fold (no regex engine touches the untrusted pattern);
    precedence still ranks by the ORIGINAL pattern length
    (``pattern_len``). Literal rules stay prefix-matched (``pattern``
    NULL).
    """
    groups: list = []  # (agents, rules=[(path, allowed)], delay_ms)
    agents: list = []
    rules: list = []
    delay = None
    in_rules = False

    def flush():
        nonlocal agents, rules, delay, in_rules
        if agents:
            groups.append((agents, rules, delay))
        agents, rules, delay, in_rules = [], [], None, False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                flush()
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_rules = True
            if val == "":
                continue  # empty Disallow = allow everything: no rule row
            if "*" in val or val.endswith("$"):
                # exact REP wildcard semantics: '*' matches any character
                # run, a trailing '$' anchors at the end of the path.
                # The ORIGINAL pattern ships in the rule row; matching is
                # a linear greedy glob fold (split_robots), so a hostile
                # robots.txt cannot smuggle in a catastrophic-backtracking
                # pattern. Allow wildcards are kept (no truncation).
                end = val.endswith("$")
                core = val[:-1] if end else val
                prefix = core.split("*", 1)[0] or "/"
                # precedence still uses the ORIGINAL pattern length
                rules.append((prefix, key == "allow", len(val), val))
            else:
                rules.append((val, key == "allow", len(val), None))
        elif key == "crawl-delay":
            in_rules = True
            try:
                ms = float(val) * 1000
                # clamp to int32 (inf → max politeness); nan/negatives drop
                if ms == ms and ms >= 0:
                    delay = int(min(ms, 2**31 - 1))
            except (ValueError, OverflowError):
                pass
    flush()

    ua = user_agent.lower()
    chosen = [g for g in groups if ua in g[0]]
    if not chosen:
        chosen = [g for g in groups if "*" in g[0]]
    rows = []
    for _, grules, gdelay in chosen:
        for path, is_allow, plen, pattern in grules:
            rows.append(
                {
                    "host": host,
                    "path_prefix": path,
                    "allowed": is_allow,
                    "crawl_delay_ms": gdelay,
                    "pattern_len": plen,
                    "pattern": pattern,
                }
            )
        if not grules and gdelay is not None:
            rows.append(
                {
                    "host": host,
                    "path_prefix": "/",
                    "allowed": True,
                    "crawl_delay_ms": gdelay,
                    "pattern_len": 1,
                    "pattern": None,
                }
            )
    return rows


def sitemap_urls(
    pages, host_col: str = "host", body_col: str = "body"
):
    """Extract ``Sitemap:`` directives from robots.txt bodies — the REP's
    bulk-discovery pointer (sitemaps.org protocol §"informing search
    engines"; the directive is group-independent and its key is
    case-insensitive). Feeds :func:`frontier.sitemap.parse_sitemaps`.

    Pure-JVM: one multiline regexp_extract_all per page, no shuffle.
    Output: (host, sitemap_url), one row per directive.
    """
    from pyspark.sql import functions as F

    return pages.select(
        host_col,
        F.explode(
            F.regexp_extract_all(
                F.col(body_col),
                F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"),
                F.lit(1),
            )
        ).alias("sitemap_url"),
    )
