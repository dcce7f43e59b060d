"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline: a deterministic synthetic EDGAR
page corpus (sized off the sf0.001 ``documents`` table, plus the reference's
own sample pages as a golden company) is crawled by the wave scheduler
(politeness-bucketed frontier, bloom URL-seen, icelite checkpoints) and the
extracted facts are consolidated into the wide ``filings`` table.

``queries()``/``oracle_sql()`` expose the engine's relational operators over
the driver's generic testdata tables for DuckDB cross-checking.
"""

from __future__ import annotations

import pathlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"
_SAMPLES = pathlib.Path(__file__).parent / "tests" / "fixtures" / "samples"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: crawl the synthetic corpus and return consolidated
    filings (one row per (cik, filing_type, filing_date, accession) with the
    27-getter surface; driver checks rows>0)."""
    import datetime

    import pandas as pd
    from pyspark.sql import functions as F

    from edgar_spark.frontier.crawler import CrawlConfig, Crawler
    from edgar_spark.frontier.robots import ROBOTS_SCHEMA, rules_from_robots_pages
    from edgar_spark.synth import corpus

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n_companies = max(2, min(4, docs.count() // 200))
    samples = str(_SAMPLES) if _SAMPLES.exists() else None
    pages = corpus.build_pages(
        spark, n_companies, n_filings=2, samples_dir=samples
    )
    seeds = corpus.build_seeds(spark, n_companies, include_golden=samples is not None)
    # robots gate exercised on the flagship path, SELF-CONTAINED: the
    # corpus carries a /robots.txt page disallowing company 0's query URL;
    # the crawler parses its own rules from the corpus (REP group
    # semantics), so company 0's filings never enter the crawl
    # (robots_blocked metric rows; the golden company is unaffected)
    robots_body = (
        "User-agent: edgar-spark\n"
        "Disallow: /cgi-bin/browse-edgar?action=getcompany"
        f"&CIK={corpus.ticker_of(0)}\n"
    )
    robots_page = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "url": "https://www.sec.gov/robots.txt",
                    "warc_ts": datetime.datetime(2020, 1, 1),
                    "html": robots_body.encode("utf-8"),
                    "text": robots_body,
                    "lang": "en",
                }
            ]
        )
    ).select(*pages.columns)
    pages = pages.unionByName(
        robots_page.select(
            *[F.col(f.name).cast(f.dataType) for f in pages.schema.fields]
        )
    )
    # materialize the (tiny) parsed rules once: leaving them lazy would put
    # the whole corpus build + parse in the lineage of every per-wave
    # broadcast that re-reads the rules table. pandas → Arrow gives a JVM
    # LocalTableScan (a plain row list builds a Python-RDD-backed plan that
    # re-spawns Python workers on every job touching it)
    rule_rows = rules_from_robots_pages(pages, user_agent="edgar-spark").collect()
    robots = spark.createDataFrame(
        pd.DataFrame(
            [r.asDict() for r in rule_rows],
            columns=[f.name for f in ROBOTS_SCHEMA.fields],
        ),
        ROBOTS_SCHEMA,
    )
    cfg = CrawlConfig(max_waves=4)
    result = Crawler(spark, pages, seeds, robots=robots, config=cfg).run()
    from edgar_spark.model.consolidate import getters_view

    return getters_view(result.filings).orderBy(
        "ticker", "filing_type", F.col("filing_date").desc()
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Alias every computed/aggregate column so names match ``oracle_sql``.
    """
    from edgar_spark.operators import oracle_queries

    return oracle_queries.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents for each ``queries()`` key."""
    from edgar_spark.operators import oracle_queries

    return oracle_queries.oracle_sql()
