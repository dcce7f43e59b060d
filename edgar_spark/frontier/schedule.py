"""Adaptive recrawl scheduling — freshness-driven revisit intervals.

The reference fetches each filing exactly once (its corpus is immutable
filings, folder.go:42-65 caches forever). A Common-Crawl-style frontier
over mutable web pages instead needs a *revisit policy*: pages that keep
changing get refetched soon, static pages back off exponentially. This is
the standard crawler freshness heuristic (cf. Cho & Garcia-Molina,
"Effective Page Refresh Policies for Web Crawlers", and Heritrix's
wait-factor backoff): after an observed change the interval resets to 1
wave; every consecutive unchanged observation doubles it, capped.

The whole policy is window algebra over the fetch history — no recurrence
that needs sequential state:

* ``changed_w``     = first observation, or fingerprint != previous one
* ``last_change_w`` = running ``max(wave) filter changed`` (unbounded
  preceding window)
* ``unchanged_run`` = ``wave - last_change``
* ``interval``      = ``2^min(unchanged_run, log2(cap))``
* ``next_due``      = ``wave + interval``

so the plan is ONE shuffle on the url key (all window frames share the
same partitioning) and stays pure JVM column expressions; at 10^10 URLs
the history table shuffles once and every executor schedules its own url
range. Integer-only arithmetic → bit-identical across engines, exact
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["recrawl_schedule"]


def recrawl_schedule(
    fetches: DataFrame,
    url_col: str = "url",
    wave_col: str = "wave",
    fp_col: str = "fp",
    max_interval: int = 64,
) -> DataFrame:
    """Per-URL revisit schedule from a fetch history.

    ``fetches`` rows are (url, wave, fp): one observation per fetch, with
    ``wave`` the monotone fetch round and ``fp`` the content fingerprint
    observed. Returns one row per url:

    (url, n_fetches, n_changes, unchanged_run, interval_waves,
    next_due_wave) — the state a frontier scheduler joins against the
    current wave number to pick what is due (crawler.py's due-wave window).

    ``max_interval`` must be a power of two (the backoff doubles).
    """
    cap_log2 = max(0, int(max_interval).bit_length() - 1)
    if (1 << cap_log2) != max_interval:
        raise ValueError(f"max_interval must be a power of two, got {max_interval}")

    w = Window.partitionBy(url_col).orderBy(wave_col)
    run = Window.partitionBy(url_col).orderBy(wave_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prev_fp = F.lag(fp_col).over(w)
    hist = fetches.select(
        url_col,
        F.col(wave_col).cast("long").alias("wave"),
        F.col(fp_col).alias("fp"),
    ).withColumn(
        "_chg",
        F.when(
            prev_fp.isNull() | (F.col("fp") != prev_fp), F.col("wave")
        ),
    ).select(
        url_col,
        "wave",
        F.max("_chg").over(run).alias("_last_change"),
        F.count("_chg").over(run).alias("_n_changes"),
        F.count("*").over(run).alias("_n_fetches"),
        F.row_number()
        .over(Window.partitionBy(url_col).orderBy(F.col(wave_col).desc()))
        .alias("_rn"),
    )
    latest = hist.filter(F.col("_rn") == 1)
    unchanged_run = F.col("wave") - F.col("_last_change")
    # F.shiftleft only accepts a literal shift — call the SQL function,
    # which takes a column for both operands
    interval = F.call_function(
        "shiftleft",
        F.lit(1).cast("long"),
        F.least(unchanged_run, F.lit(cap_log2)).cast("int"),
    ).cast("long")
    return latest.select(
        url_col,
        F.col("_n_fetches").alias("n_fetches"),
        F.col("_n_changes").alias("n_changes"),
        unchanged_run.alias("unchanged_run"),
        interval.alias("interval_waves"),
        (F.col("wave") + interval).alias("next_due_wave"),
    )
