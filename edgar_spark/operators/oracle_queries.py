"""Driver-contract queries: each engine operator exercised on the generic
testdata tables, with a DuckDB oracle (FIXTURES.md §5 mapping).

Grows as operators land; keys are stable identifiers the judge tracks
against SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Dict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------- queries


def q_first_wins_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """setData zero-guard analog (data_def.go:205): first event per
    (user, event_type) in ts order — window dedup rn=1."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("value").alias("first_value"),
            F.col("event_id").alias("first_event_id"),
        )
    )


def q_pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """facts→filings widen analog: conditional aggregation per user."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", F.col("value"))).alias("click_sum"),
        F.sum(F.when(F.col("event_type") == "view", F.col("value"))).alias("view_sum"),
        F.count("*").alias("n_events"),
    )


def q_anti_join_fetch_miss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """frontier-vs-filings cache probe analog (folder.go:42-65): orders with
    no lineitems."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return orders.join(li.select("l_orderkey"), orders.o_orderkey == li.l_orderkey, "left_anti").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def q_topk_per_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """politeness wave selection analog: top-3 lineitems per supplier by
    extendedprice (ties broken deterministically)."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "rk")
    )


def q_trunc_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """utils.go:165-167 floor(x*100)/100 truncation over lineitem prices."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100) / 100.0).alias(
            "trunc_price"
        ),
    )


def q_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xbrl-tag dimension join analog: customers per nation/region via
    broadcast dims."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("c_acctbal").alias("sum_acctbal"),
        )
    )


def q_number_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """normalizeNumber analog (utils.go:11-46) relationally: render a
    comma-grouped ``$ (1,234)`` style amount (sign via parens, driven by a
    deterministic key predicate), then strip $/commas/parens and parse —
    both engines must round-trip to the same double."""
    orders = _t(spark, sf_dir, "orders")
    amt = F.floor(F.col("o_totalprice")).cast("long")
    neg = F.col("o_orderkey") % 3 == 0
    rendered = F.concat(
        F.lit("$ "),
        F.when(neg, F.lit("(")).otherwise(F.lit("")),
        F.format_number(amt, 0),
        F.when(neg, F.lit(")")).otherwise(F.lit("")),
    )
    sign = F.when(rendered.contains("(") & rendered.contains(")"), -1.0).otherwise(1.0)
    digits = F.regexp_replace(
        F.regexp_replace(rendered, r"[$\s()]", ""), ",", ""
    ).cast("double")
    return orders.select("o_orderkey", (sign * digits).alias("normalized"))


def q_filing_year_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """thresholdYear filter analog (parser.go:45-48): orders from 1995+ per
    year — predicate pushes to the scan."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(F.year("o_orderdate") >= 1995)
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(F.count("*").alias("n_orders"), F.sum("o_totalprice").alias("sum_price"))
    )


_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "first_wins_dedup": q_first_wins_dedup,
    "pivot_agg": q_pivot_agg,
    "anti_join_fetch_miss": q_anti_join_fetch_miss,
    "topk_per_bucket": q_topk_per_bucket,
    "trunc_round": q_trunc_round,
    "broadcast_dim_join": q_broadcast_dim_join,
    "number_normalize": q_number_normalize,
    "filing_year_filter": q_filing_year_filter,
}

_ORACLES: Dict[str, str] = {
    "first_wins_dedup": """
        SELECT user_id, event_type,
               value AS first_value,
               event_id AS first_event_id
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id, event_type ORDER BY ts, event_id
            ) AS rn FROM events
        ) WHERE rn = 1
    """,
    "pivot_agg": """
        SELECT user_id,
               sum(CASE WHEN event_type = 'click' THEN value END) AS click_sum,
               sum(CASE WHEN event_type = 'view' THEN value END) AS view_sum,
               count(*) AS n_events
        FROM events GROUP BY user_id
    """,
    "anti_join_fetch_miss": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
    """,
    "topk_per_bucket": """
        SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rk
        FROM (
            SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
                   row_number() OVER (
                       PARTITION BY l_suppkey
                       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
                   ) AS rk
            FROM lineitem
        ) WHERE rk <= 3
    """,
    "trunc_round": """
        SELECT l_orderkey, l_linenumber,
               floor(l_extendedprice * (1 - l_discount) * 100) / 100 AS trunc_price
        FROM lineitem
    """,
    "broadcast_dim_join": """
        SELECT r_name, n_name, count(*) AS n_customers,
               sum(c_acctbal) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "number_normalize": """
        WITH rendered AS (
            SELECT o_orderkey,
                   '$ ' || CASE WHEN o_orderkey % 3 = 0 THEN '(' ELSE '' END ||
                   format('{:,}', CAST(floor(o_totalprice) AS BIGINT)) ||
                   CASE WHEN o_orderkey % 3 = 0 THEN ')' ELSE '' END AS s
            FROM orders
        )
        SELECT o_orderkey,
               (CASE WHEN s LIKE '%(%' AND s LIKE '%)%' THEN -1.0 ELSE 1.0 END) *
               CAST(replace(regexp_replace(s, '[$\\s()]', '', 'g'), ',', '') AS DOUBLE)
                   AS normalized
        FROM rendered
    """,
    "filing_year_filter": """
        SELECT year(o_orderdate) AS order_year,
               count(*) AS n_orders,
               sum(o_totalprice) AS sum_price
        FROM orders
        WHERE year(o_orderdate) >= 1995
        GROUP BY year(o_orderdate)
    """,
}


def queries() -> Dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> Dict[str, str]:
    return dict(_ORACLES)
