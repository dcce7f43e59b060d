"""As-of join: for each left row, attach the most recent right row with
``right.ts <= left.ts`` per join key.

Spark-first design — no range-join explosion, no per-row Python:

1. union left and right with a ``side`` tag (right sorts *before* left at
   equal ts, giving inclusive at-or-before semantics);
2. ONE window per key ordered by (ts, side, order_col):
   ``last(value, ignorenulls)`` over ``rowsBetween(unboundedPreceding,
   currentRow)`` carries the latest right value forward onto each left
   row. Right rows sharing (key, ts) sort ascending by the tie-break
   column, so the greatest-tie-break row is the one ``last`` sees — the
   same winner an explicit dedup would pick, without its extra shuffle.

Cost at scale: a single hash shuffle on the key + one sort — the same
price as the sort-merge join Spark would pick anyway, with no candidate
blow-up (a naive ``left.ts >= right.ts`` range join is O(n·m) per key).
The reference has no as-of operator; this is a training-pipeline addition
(SURVEY.md §2.6-adjacent) in the same first-wins/window family as
data_def.go:205's zero-guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    out_col: str = "asof_value",
    right_order_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row gains ``out_col`` = the
    ``value_col`` of the latest ``right`` row at-or-before its ``ts``
    (NULL when no prior right row exists).

    ``right_order_col`` breaks ties among right rows sharing (key, ts):
    the row with the greatest value wins (deterministic across engines).
    """
    order = right_order_col or value_col
    # the carried value rides inside a struct so a right ROW whose value is
    # NULL still counts as a match (last(..., ignorenulls) skips only absent
    # rows, never a present row with a NULL value — the ASOF LEFT JOIN
    # semantics the oracle implements)
    r = right.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.struct(F.col(value_col).alias("v")).alias("_rv"),
        F.col(order).alias("_ord"),
    )

    lcols = left.columns
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        F.lit(None).cast(r.schema["_ord"].dataType).alias("_ord"),
        F.struct(*lcols).alias("_row"),
    )
    r_tagged = r.select(
        "_k",
        "_ts",
        F.lit(0).alias("_side"),
        "_rv",
        "_ord",
        F.lit(None).cast(l_tagged.schema["_row"].dataType).alias("_row"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows at equal (_k, _ts) sort ascending by _ord, so last() sees
    # the greatest tie-break row — the dedup winner, minus the dedup shuffle
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", F.col("_ord").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_asof", F.last("_rv", ignorenulls=True).over(w))
    return carried.filter(F.col("_side") == 1).select(
        *[F.col("_row")[c].alias(c) for c in lcols],
        F.col("_asof")["v"].alias(out_col),
    )
