"""robots.txt gating as a broadcast-joined rules table.

The reference has no robots handling (its ``getPage`` is a bare http.Get —
page.go:21-28); this is a north-rule capability. Rules are tiny relative to
the frontier, so gating is two broadcast semi/anti joins — the frontier side
is never shuffled.

Semantics: a URL is blocked iff any rule row with ``allowed = false`` matches
(same host, ``path_prefix`` is a prefix of the URL path). Unmatched hosts
default to allowed.
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
    rules_per_host = robots.groupBy("host").agg(
        F.collect_list(
            F.struct(
                F.coalesce(
                    F.col("pattern_len"), F.length("path_prefix").cast("int")
                ).alias("plen"),
                F.col("path_prefix").alias("prefix"),
                F.col("allowed").alias("allowed"),
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

    def fold(acc, r):
        wins = F.col("_path").startswith(r["prefix"]) & (
            (r["plen"] > acc["plen"])
            | ((r["plen"] == acc["plen"]) & r["allowed"])
        )
        return F.when(
            wins, F.struct(r["plen"].alias("plen"), r["allowed"].alias("allowed"))
        ).otherwise(acc)

    decision = F.aggregate(
        F.coalesce(F.col("_rules"), F.array().cast(
            "array<struct<plen:int,prefix:string,allowed:boolean>>"
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
                    "pattern_len",
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
    Wildcards: a ``Disallow`` path truncates at the first ``*`` and an
    ``Allow`` containing ``*`` is dropped — both choices only ever
    OVER-block (a truncated Allow could out-length a Disallow in
    longest-match and widen the allow, so it must not be kept); ``$``
    anchors are not modeled.
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
            if "*" in val:
                if key == "allow":
                    # truncating an Allow pattern would WIDEN the allow and
                    # could out-length a Disallow in longest-match — drop
                    # it instead: losing an allow only over-blocks, which
                    # is the safe direction
                    continue
                path = val.split("*", 1)[0] or "/"
            else:
                path = val
            # precedence uses the ORIGINAL pattern length: a truncated
            # wildcard Disallow must still out-rank any shorter literal
            # Allow it overlaps, else the allow would punch an unsafe hole
            rules.append((path, key == "allow", len(val)))
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
        for path, is_allow, plen in grules:
            rows.append(
                {
                    "host": host,
                    "path_prefix": path,
                    "allowed": is_allow,
                    "crawl_delay_ms": gdelay,
                    "pattern_len": plen,
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
                }
            )
    return rows
