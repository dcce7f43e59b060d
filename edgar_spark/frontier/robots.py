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
    ]
)


def split_robots(
    frontier: DataFrame, robots: DataFrame, url_col: str = "url"
) -> Tuple[DataFrame, DataFrame]:
    """(allowed, blocked) split via broadcast semi/anti joins (no shuffle of
    the frontier side; multi-rule matches collapse for free in the semi
    join)."""
    blocked_rules = robots.filter(~F.col("allowed")).select(
        F.col("host").alias("_r_host"), F.col("path_prefix").alias("_r_prefix")
    )
    with_path = frontier.withColumn(
        "_path", F.regexp_extract(F.col(url_col), r"^https?://[^/]+(/.*)$", 1)
    )
    cond = (F.col("host") == F.col("_r_host")) & F.col("_path").startswith(
        F.col("_r_prefix")
    )
    blocked = with_path.join(F.broadcast(blocked_rules), cond, "left_semi").drop("_path")
    allowed = with_path.join(F.broadcast(blocked_rules), cond, "left_anti").drop("_path")
    return allowed, blocked
