#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline workload:
  * ``crawl`` — the flagship pipeline: synthetic corpus (sf-scaled company
    count) crawled by the wave scheduler, facts consolidated to filings.
    Also reported as ``pages_per_sec`` (the BASELINE.json north metric).
  * representative engine operators on the generic sf tables (window dedup,
    conditional-agg widen, broadcast dim join, trunc-round projection,
    minhash near-dup, brute-force cosine top-k, quality scoring).

Scaling protocol (BASELINE.md): run this file twice — SPARK_GRAFT_CPUS=8 and
=32 — on the same input; efficiency = (T8/T32)/4 by wall time (or the
pages/sec ratio /4). ``--scaling`` automates both runs and writes
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def build_session(cpus: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("edgar_spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # let AQE re-coalesce downstream of persisted plans (off by default;
        # without it every stage below the cached fetch join keeps the full
        # static shuffle-partition count even when the wave is tiny)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def sf_of(sf_dir: str) -> float:
    tail = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        return float(tail)
    except ValueError:
        return 0.1


def crawl_bench(spark, sf: float) -> dict:
    from edgar_spark.frontier.crawler import CrawlConfig, Crawler
    from edgar_spark.synth.corpus import build_pages, build_seeds

    n_companies = max(4, int(1000 * sf))
    t0 = time.time()
    pages = build_pages(spark, n_companies, n_filings=10).persist()
    n_pages = pages.count()
    t1 = time.time()
    res = Crawler(
        spark, pages, build_seeds(spark, n_companies), config=CrawlConfig(max_waves=4)
    ).run()
    n_filings = res.filings.count()
    t2 = time.time()
    fetched = sum(m["fetched"] for m in res.metrics)
    facts = res.metrics[-1]["facts"] if res.metrics else 0
    pages.unpersist()
    return {
        "corpus_pages": n_pages,
        "corpus_build_sec": round(t1 - t0, 3),
        "crawl_sec": round(t2 - t1, 3),
        "pages_fetched": fetched,
        "pages_per_sec": round(fetched / (t2 - t1), 2),
        "facts": facts,
        "filings": n_filings,
    }


OPERATOR_KEYS = [
    "first_wins_dedup",
    "pivot_agg",
    "topk_per_bucket",
    "trunc_round",
    "broadcast_dim_join",
    "exact_dedup",
    "minhash_near_dups",
    "quality_score",
    "cosine_topk",
    "events_window_agg",
    "sessionize_gap",
    "tpch_q1",
    "asof_join_last_click",
    "cosine_near_dups",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_of(sf_dir)
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from edgar_spark.operators import oracle_queries

    t_start = time.time()
    timings: dict = {}

    crawl = crawl_bench(spark, sf)
    timings["crawl"] = crawl["crawl_sec"]

    qs = oracle_queries.queries()
    for name in OPERATOR_KEYS:
        t0 = time.time()
        # count() forces full evaluation without driver-side materialization
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    total = round(time.time() - t_start, 3)
    out = {
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(cpus),
        "pages_per_sec": crawl["pages_per_sec"],
        "crawl": crawl,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        import subprocess

        results = {}
        for cpus in ("8", "32"):
            env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
            proc = subprocess.run(
                [sys.executable, __file__], env=env, capture_output=True, text=True
            )
            line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
            results[cpus] = json.loads(line)
            print(f"# cpus={cpus}: {line}", file=sys.stderr)
        t8, t32 = results["8"]["value"], results["32"]["value"]
        p8, p32 = results["8"]["pages_per_sec"], results["32"]["pages_per_sec"]
        eff_time = (t8 / t32) / 4
        eff_pages = (p32 / p8) / 4
        summary = {
            "t8_sec": t8,
            "t32_sec": t32,
            "pages_per_sec_8": p8,
            "pages_per_sec_32": p32,
            "efficiency_wall": round(eff_time, 3),
            "efficiency_pages": round(eff_pages, 3),
        }
        print(json.dumps(summary))
    else:
        main()
