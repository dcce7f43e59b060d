"""Probabilistic sketches over 100 TB streams — HyperLogLog and count-min.

A crawl/corpus pipeline constantly needs "how many distinct?" (URLs seen,
vocabulary size) and "which items are hot?" (heavy-hitter hosts, hot
tokens) where exact answers would shuffle the full key space. Sketches
answer both with fixed-size state that partial-aggregates map-side —
the groupBy key space is 2^p registers (HLL) or depth×width counters
(CMS), so the shuffle is constant-size no matter the input.

Spark ships approx_count_distinct, but its HLL++ internals are opaque —
not reproducible in an external engine, so not oracle-checkable. These
sketches instead derive every hash from md5 (the same determinism
convention as the minhash family, dedup.py:52): ``hash60`` is the first
15 hex chars of md5 parsed base-16 — a uniform 60-bit integer computable
bit-identically in DuckDB (``CAST(concat('0x', substr(md5(v),1,15)) AS
BIGINT)``). All sketch state is integers; results are exact matches, not
tolerances.

HLL layout per value: register = low p bits of hash60; rho = (trailing
zeros of the remaining 60-p bits) + 1, geometric with mean 2 exactly as
HLL requires (trailing zeros, not leading, because ``bit_count((x & -x)
- 1)`` needs no float log on either engine). The register table
(register, max_rho) IS the mergeable sketch: union of corpora = groupBy
max of their tables.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash60",
    "hll_register_table",
    "hll_estimate",
    "count_min_sketch",
    "cms_estimate_counts",
]


def hash60(col: Column) -> Column:
    """Uniform 60-bit non-negative integer hash: first 15 hex chars of
    md5 of the value's string form, parsed base-16. JVM-side (md5+conv
    codegen), DuckDB-replayable (``CAST(v AS VARCHAR)`` renders integers
    identically on both engines)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def hll_register_table(
    df: DataFrame, col: str, p: int = 8
) -> DataFrame:
    """HyperLogLog register table for the values of ``df[col]``.

    Returns (register INT, max_rho INT) — at most 2^p rows, exact
    integers. Nulls are skipped (SQL COUNT DISTINCT semantics). The
    aggregation partial-combines map-side: each task emits ≤2^p rows
    regardless of input size, so the shuffle is O(2^p × tasks).
    """
    m = 1 << p
    h = hash60(F.col(col))
    rem = F.expr(f"_h60 div {m}")
    max_rho = 60 - p + 1
    rho = (
        F.when(rem == 0, F.lit(max_rho))
        .otherwise(F.bit_count((rem.bitwiseAND(-rem)) - 1) + 1)
        .cast("int")
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(h.alias("_h60"))
        .select(
            F.pmod(F.col("_h60"), F.lit(m)).cast("int").alias("register"),
            rho.alias("rho"),
        )
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(register_rows: list, p: int = 8) -> float:
    """Classic HLL estimate from a collected register table (≤2^p rows —
    driver-side by design; the distributed part is the table itself).
    Applies the standard small-range (linear counting) correction."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    rhos = {int(r["register"]): int(r["max_rho"]) for r in register_rows}
    z = sum(2.0 ** -rhos.get(j, 0) for j in range(m))
    raw = alpha * m * m / z
    zeros = m - len(rhos)
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw


def count_min_sketch(
    df: DataFrame, col: str, width: int = 64, depth: int = 4
) -> DataFrame:
    """Count-min sketch of value frequencies in ``df[col]``.

    Returns (row INT, bucket INT, cnt BIGINT) — depth×width counters.
    Row i hashes value v with ``hash60(i || ':' || v) % width`` (salted
    md5, independent-enough rows, DuckDB-replayable). Fixed-size state:
    the groupBy key space is depth×width, partial-aggregated map-side.
    """
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    salted = F.concat_ws(":", F.col("row").cast("string"), F.col(col))
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.col(col), rows)
        .select(
            F.col("row").cast("int").alias("row"),
            F.pmod(hash60(salted), F.lit(width)).cast("int").alias("bucket"),
        )
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate_counts(
    items: DataFrame, sketch: DataFrame, col: str, width: int = 64, depth: int = 4
) -> DataFrame:
    """Point-query the sketch for every non-null row of ``items[col]``:
    the CMS estimate is min over rows of the matching counter (≥ true
    count, always). Returns (col, est_count BIGINT). The sketch side is
    depth×width rows — broadcast, never shuffled. The join is LEFT so an
    empty (absent) counter counts as 0 — an item the sketch never saw
    gets the true CMS answer 0, not a dropped row or an inflated min
    over only its colliding buckets. Null items are skipped, symmetric
    with the build."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    salted = F.concat_ws(":", F.col("row").cast("string"), F.col(col))
    probes = (
        items.filter(F.col(col).isNotNull())
        .select(F.col(col), rows)
        .select(
            F.col(col),
            F.col("row").cast("int").alias("row"),
            F.pmod(hash60(salted), F.lit(width)).cast("int").alias("bucket"),
        )
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )
