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

__all__ = [
    "recrawl_schedule",
    "failure_backoff",
    "conditional_fetch",
    "change_rate",
    "crawl_tiers",
]


def failure_backoff(
    attempts: DataFrame,
    url_col: str = "url",
    wave_col: str = "wave",
    ok_col: str = "ok",
    max_backoff: int = 32,
    give_up_after: int = 5,
) -> DataFrame:
    """Per-URL retry policy from a fetch-attempt log — the error-side twin
    of ``recrawl_schedule`` (which schedules SUCCESSES by freshness; this
    schedules FAILURES by exponential backoff, the standard crawler
    politeness-on-errors rule: a host throwing 5xx must not be hammered
    every wave).

    ``attempts`` rows are (url, wave, ok). Returns one row per url:
    (url, n_attempts, fail_streak, backoff_waves, next_attempt_wave,
    dead) where ``fail_streak`` counts consecutive failures since the
    last success, ``backoff_waves = 2^min(fail_streak, log2(cap))`` (1
    after a success — normal scheduling), ``next_attempt_wave`` = last
    wave + backoff, and ``dead`` marks URLs past ``give_up_after``
    consecutive failures (dropped from the frontier; a later evict/
    re-discover can resurrect them).

    Same scale shape as recrawl_schedule: ONE shuffle on the url key,
    every window frame shares that partitioning, integer-only arithmetic
    ⇒ exact SQL replay.
    """
    cap_log2 = max(0, int(max_backoff).bit_length() - 1)
    if (1 << cap_log2) != max_backoff:
        raise ValueError(f"max_backoff must be a power of two, got {max_backoff}")
    hist = attempts.select(
        url_col, wave_col, F.col(ok_col).cast("boolean").alias("_ok")
    )
    # fail_streak = attempts after the last success (all of them are
    # failures by construction) — one agg + one conditional count, both
    # sharing the url partitioning
    per_url = hist.groupBy(url_col).agg(
        F.count("*").alias("n_attempts"),
        F.max(F.when(F.col("_ok"), F.col(wave_col))).alias("_last_ok"),
        F.max(wave_col).alias("_last_w"),
    )
    streaked = (
        hist.join(per_url, url_col)
        .groupBy(url_col, "n_attempts", "_last_w")
        .agg(
            F.sum(
                F.when(
                    F.col("_last_ok").isNull()
                    | (F.col(wave_col) > F.col("_last_ok")),
                    1,
                ).otherwise(0)
            ).alias("fail_streak")
        )
    )
    backoff = F.expr(
        f"cast(shiftleft(1, cast(least(fail_streak, {cap_log2}) as int)) "
        "as bigint)"
    )
    return streaked.select(
        url_col,
        "n_attempts",
        "fail_streak",
        backoff.alias("backoff_waves"),
        (F.col("_last_w") + backoff).alias("next_attempt_wave"),
        (F.col("fail_streak") >= give_up_after).alias("dead"),
    )


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


def change_rate(
    fetches: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    fp_col: str = "fp",
    min_interval_sec: int = 3600,
    max_interval_sec: int = 30 * 86400,
) -> DataFrame:
    """Per-URL Poisson change-rate estimate from an irregular fetch
    history — the model-based counterpart to `recrawl_schedule`'s
    geometric backoff (Cho & Garcia-Molina, "Estimating Frequency of
    Change": pages change as a Poisson process with rate λ; from n
    re-observations of which X showed a changed fingerprint, the
    bias-reduced survival estimate is r̂ = (n−X+0.5)/(n+0.5) and
    λ̂ = −ln(r̂)/Δ̄ for mean inter-fetch gap Δ̄). The reference never
    revisits — its corpus is immutable filings (folder.go:42-65); a
    mutable-web frontier budgets refetches by λ̂.

    Like the rest of this module (and `retrieval`'s quantized idf), the
    output is **exact BIGINT arithmetic, no floats**: a float −ln(r̂)
    summed/compared across engines is not reproducible, so no exact
    oracle could exist. Instead:

    * ``survival_permille`` = ``(2·(n−X)+1)·1000 div (2·n+1)`` — r̂ in
      exact permille;
    * ``est_interval_sec`` = ``Δ̄ · r̂/(1−r̂)`` in permille integers,
      clamped to [min, max] — the odds form is the first-order stand-in
      for 1/λ̂ = Δ̄/(−ln r̂) (exact as r̂→1, the stable-page regime that
      dominates a real crawl; monotone in r̂ everywhere, which is all a
      scheduler ranks on);
    * ``next_due_ts`` = last fetch + interval.

    ``fetches`` rows are (url, ts, fp): ts integer epoch seconds, unique
    per url (observation order must be well-defined); fp the content
    fingerprint observed. URLs with a single observation carry no rate
    information and are dropped (seed them via `recrawl_schedule`).

    Returns one row per url: (url, n_obs, n_changes, span_sec,
    avg_gap_sec, survival_permille, est_interval_sec, next_due_ts).

    Plan: ONE shuffle on the url key — the lag window and the groupBy
    share the same hash partitioning, so Catalyst reuses the exchange;
    everything downstream is codegen integer expressions. At 10^10 URLs
    the history shuffles once and each executor estimates its own url
    range; products are bounded (gap ≤ ~2^31 s times permille ≤ 2^10
    fits BIGINT with 20+ bits to spare).
    """
    if not 0 < min_interval_sec <= max_interval_sec:
        raise ValueError(
            f"need 0 < min ({min_interval_sec}) <= max ({max_interval_sec})"
        )
    w = Window.partitionBy(url_col).orderBy("_ts")
    prev_fp = F.lag("_fp").over(w)
    obs = fetches.select(
        url_col,
        F.col(ts_col).cast("long").alias("_ts"),
        F.col(fp_col).alias("_fp"),
    ).withColumn(
        "_chg",
        F.when(prev_fp.isNull(), F.lit(None).cast("long")).otherwise(
            (F.col("_fp") != prev_fp).cast("long")
        ),
    )
    agg = (
        obs.groupBy(url_col)
        .agg(
            F.count("*").alias("n_obs"),
            F.coalesce(F.sum("_chg"), F.lit(0).cast("long")).alias("n_changes"),
            F.min("_ts").alias("_first_ts"),
            F.max("_ts").alias("_last_ts"),
        )
        .filter(F.col("n_obs") >= 2)
    )
    span = F.col("_last_ts") - F.col("_first_ts")
    avg_gap = F.expr("(_last_ts - _first_ts) div (n_obs - 1)")
    survival = F.expr(
        "((2 * (n_obs - 1 - n_changes) + 1) * 1000) div (2 * (n_obs - 1) + 1)"
    )
    raw_interval = F.expr(
        "(((_last_ts - _first_ts) div (n_obs - 1)) * _surv)"
        " div greatest(1L, 1000 - _surv)"
    )
    with_surv = agg.withColumn("_surv", survival)
    interval = F.least(
        F.lit(max_interval_sec).cast("long"),
        F.greatest(F.lit(min_interval_sec).cast("long"), raw_interval),
    )
    return with_surv.select(
        url_col,
        "n_obs",
        "n_changes",
        span.alias("span_sec"),
        avg_gap.alias("avg_gap_sec"),
        F.col("_surv").alias("survival_permille"),
        interval.alias("est_interval_sec"),
        (F.col("_last_ts") + interval).alias("next_due_ts"),
    )


def crawl_budget(
    pending: DataFrame,
    budget: int,
    host_col: str = "host",
    n_col: str = "n_pending",
    n_buckets: int = 64,
) -> DataFrame:
    """Proportional-fair allocation of a global per-wave fetch budget
    across hosts — largest-remainder (Hamilton) apportionment, the exact
    integer form of "each host gets budget * its share of pending URLs".
    The reference needs no budget (one host, sec.gov, folder.go:68-97); a
    web frontier must split a politeness-bounded global wave across ~10^7
    hosts so that ``sum(alloc) == budget`` exactly and no host is starved
    by rounding.

    * demand fits (``total <= budget``): every host gets its demand;
    * scarcity: ``base = budget*n div total`` plus +1 for the hosts with
      the ``budget - sum(base)`` largest remainders (ties by host name).

    All-integer → bit-identical across engines (exact DuckDB oracle).
    Overflow bound: ``budget * n_pending`` must fit int64 — fine for any
    real (budget ≤ 10^9, per-host pending ≤ 10^9) wave.

    The only global order needed is the remainder rank. A naive
    ``Window.orderBy(rem)`` funnels every host through ONE reducer — the
    same scale cliff :func:`curation.global_token_offsets` avoids, solved
    the same way: approxQuantile range-buckets (boundaries only affect
    balance, never the result), per-bucket local ranks, ≤``n_buckets``
    bucket counts to the driver, broadcast offsets back.
    """
    from pyspark.sql import Window

    total_df = pending.agg(F.sum(n_col).cast("long").alias("_total"))
    b = pending.crossJoin(F.broadcast(total_df)).select(
        host_col,
        n_col,
        "_total",
        F.expr(f"(CAST({budget} AS BIGINT) * {n_col}) div _total").alias(
            "_base"
        ),
        ((F.lit(budget).cast("long") * F.col(n_col)) % F.col("_total")).alias(
            "_rem"
        ),
    )
    leftover_df = b.agg(
        (F.lit(budget) - F.sum("_base")).cast("long").alias("_leftover")
    )
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(set(b.stat.approxQuantile("_rem", qs, 0.001))) if qs else []
    if not bounds and b.first() is None:
        return pending.select(
            host_col, n_col, F.lit(0).cast("long").alias("alloc")
        )
    barr = (
        F.array(*[F.lit(x) for x in bounds])
        if bounds
        else F.array().cast("array<double>")
    )
    bucket = F.size(F.filter(barr, lambda v: F.col("_rem") >= v))
    local = b.withColumn("_bucket", bucket).withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("_bucket").orderBy(
                F.col("_rem").desc(), F.col(host_col)
            )
        ),
    )
    counts = {
        r["_bucket"]: r["_c"]
        for r in local.groupBy("_bucket").agg(F.count("*").alias("_c")).collect()
    }
    offs, acc = {}, 0
    for j in sorted(counts, reverse=True):  # higher bucket = higher rem
        offs[j] = acc
        acc += counts[j]
    off_map = F.create_map(
        *[x for j, o in offs.items() for x in (F.lit(j), F.lit(o).cast("long"))]
    )
    ranked = local.withColumn("_rank", off_map[F.col("_bucket")] + F.col("_rn"))
    return ranked.crossJoin(F.broadcast(leftover_df)).select(
        host_col,
        n_col,
        F.when(F.col("_total") <= budget, F.col(n_col))
        .otherwise(
            F.col("_base")
            + F.when(F.col("_rank") <= F.col("_leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    digest_col: str = "digest",
) -> DataFrame:
    """Incremental-crawl diff between two capture snapshots —
    (key, status ∈ {added, gone, changed, unchanged}, old_digest,
    new_digest).

    This is the change-detection join an incremental pipeline runs every
    wave: ``changed``+``added`` feed re-extraction and downstream
    recomputation, ``changed`` resets `recrawl_schedule`'s backoff,
    ``gone`` drives tombstoning. The reference never diffs — its corpus
    is append-only immutable filings (folder.go:42-65).

    Plan: ONE full-outer join on the key; both sides shuffle on url
    unless the snapshot tables are already bucketed/sorted on it (the
    icelite layout), where it degrades to a zip of co-located partitions.
    Status is a codegen CASE over null-ness + digest equality — no
    second pass, nothing driver-resident, and the output is linear in
    the union of the snapshots.
    """
    # explicit presence flags, NOT digest null-ness: a capture may carry
    # a legitimately NULL digest (failed checksum) and must still count
    # as present on its side
    o = old.select(
        F.col(key_col).alias("k"),
        F.col(digest_col).alias("old_digest"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(key_col).alias("k"),
        F.col(digest_col).alias("new_digest"),
        F.lit(True).alias("_in_new"),
    )
    joined = o.join(n, "k", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "gone")
        .when(
            F.col("old_digest").eqNullSafe(F.col("new_digest")), "unchanged"
        )
        .otherwise("changed")
    )
    return joined.select(
        F.col("k").alias(key_col),
        status.alias("status"),
        "old_digest",
        "new_digest",
    )


def conditional_fetch(
    store: DataFrame,
    responses: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """HTTP conditional-revalidation merge (RFC 9110 §13.1 / §15.4.5):
    decide, per fetched URL, whether the stored copy is reusable and
    which validators to carry forward — the operator that turns a
    recrawl wave into mostly-free 304s instead of full transfers (the
    reference refetches unconditionally; its corpus is immutable,
    folder.go:42-65).

    ``store`` is the crawler's validator cache: one row per previously
    captured URL with ``etag``, ``last_modified`` (either may be NULL)
    and ``digest`` (content fingerprint, non-NULL — it defines "stored").
    ``responses`` is the wave's fetch results: (url, status, etag,
    last_modified, digest) — exactly what `sources.http
    .parse_http_headers` extracts plus a body digest; a 304 carries no
    body, so its ``digest`` is NULL.

    One row per response:

    * ``action`` — ``'error'`` (no/1xx/4xx/5xx status, or a protocol-
      violating 304 with nothing stored: keep the stored entry),
      ``'revalidated'`` (304: reuse the stored body for free),
      ``'redirect'`` (other 3xx: the entry is NOT content — keep the
      stored copy untouched and let `graph.resolve_redirects` chase the
      Location), ``'skipped'`` (2xx with no body digest, e.g. 204: a
      bodyless success must not erase the stored entry), ``'new'``
      (content 2xx, nothing stored), ``'unchanged'`` (content 2xx whose
      body digest equals the stored one — the server ignored our
      validators but transferred identical bytes; recrawl backoff
      treats it as unchanged), ``'updated'`` (content 2xx, different
      body);
    * ``digest``/``etag``/``last_modified`` — the EFFECTIVE entry to
      store back: a 304 keeps the stored digest and lets the 304's
      headers refresh the validators (RFC 9110 §15.4.5 allows metadata
      updates), errors/redirects/bodyless responses keep everything
      stored, a content 2xx replaces all three;
    * ``sent_if_none_match`` / ``sent_if_modified_since`` — the request
      hints this wave derived from the store (what made the 304
      possible), for per-wave revalidation-rate metrics.

    Plan: ONE left join of the wave against the store on url — at
    10^10 URLs that is the same url-keyed MERGE shuffle every state
    transition already pays; every decision is a codegen CASE, no
    Python, no extra exchange. All comparisons are NULL-safe string
    equality → exact in any engine.
    """
    s = store.select(
        F.col(url_col),
        F.col("etag").alias("_s_etag"),
        F.col("last_modified").alias("_s_lm"),
        F.col("digest").alias("_s_digest"),
    )
    j = responses.join(s, url_col, "left")
    status = F.col("status")
    stored = F.col("_s_digest").isNotNull()
    err = (
        status.isNull()
        | (status < 200)
        | (status >= 400)
        | ((status == 304) & ~stored)
    )
    redirect = ~err & (status >= 300) & (status != 304)
    bodyless = ~err & ~redirect & (status != 304) & F.col("digest").isNull()
    action = (
        F.when(err, F.lit("error"))
        .when(status == 304, F.lit("revalidated"))
        .when(redirect, F.lit("redirect"))
        .when(bodyless, F.lit("skipped"))
        .when(~stored, F.lit("new"))
        .when(F.col("digest").eqNullSafe(F.col("_s_digest")), F.lit("unchanged"))
        .otherwise(F.lit("updated"))
    )
    keep = err | redirect | bodyless
    digest = F.when(keep | (status == 304), F.col("_s_digest")).otherwise(
        F.col("digest")
    )
    etag = (
        F.when(keep, F.col("_s_etag"))
        .when(status == 304, F.coalesce(F.col("etag"), F.col("_s_etag")))
        .otherwise(F.col("etag"))
    )
    lm = (
        F.when(keep, F.col("_s_lm"))
        .when(status == 304, F.coalesce(F.col("last_modified"), F.col("_s_lm")))
        .otherwise(F.col("last_modified"))
    )
    return j.select(
        F.col(url_col),
        action.alias("action"),
        digest.alias("digest"),
        etag.alias("etag"),
        lm.alias("last_modified"),
        F.col("_s_etag").isNotNull().alias("sent_if_none_match"),
        (F.col("_s_etag").isNull() & F.col("_s_lm").isNotNull()).alias(
            "sent_if_modified_since"
        ),
    )


def crawl_tiers(
    df: DataFrame,
    n_tiers: int = 4,
    wave_sec: int = 86400,
    url_col: str = "url",
    importance_col: str = "importance",
    interval_col: str = "est_interval_sec",
) -> DataFrame:
    """Tiered recrawl assignment — the policy layer a tiered crawl runs
    on top of its signals: cross page IMPORTANCE (pagerank / opic /
    hits, any BIGINT score) with the page's estimated CHANGE interval
    (`change_rate` / `recrawl_schedule`) into a fetch tier, where tier
    ``n_tiers-1`` is refetched every wave and each tier below doubles
    the revisit period (the Heritrix/Common-Crawl "hot list vs monthly
    sweep" shape).

    Importance tiers are **log2-magnitude buckets relative to the corpus
    max** — ``imp_tier = max(0, (n_tiers-1) - (bitlen(max) -
    bitlen(imp)))`` — computed as ``length(bin(x))``, identical in Spark
    and DuckDB, so NO global sort and no quantile pass: page importance
    is Zipfian, so each lost bit of magnitude is a genuine class drop.
    The change signal then adjusts ±1: pages changing faster than a wave
    (interval ≤ wave_sec) move UP one tier, pages slower than
    ``2^(n_tiers-1)`` waves move DOWN one, clamped to [0, n_tiers-1].

    Returns (url, imp_tier, chg_adj, tier, revisit_waves =
    ``2^(n_tiers-1-tier)``). All-integer → exact oracle.

    Scale shape: ONE 1-row max aggregate broadcast back (the only
    non-map step), then pure codegen projections — at 10^10 URLs the
    assignment is a single scan. NULL interval (never re-observed, e.g.
    single-fetch URLs `change_rate` drops) gets chg_adj 0 — scheduled
    on importance alone.
    """
    if n_tiers < 2:
        raise ValueError(f"need n_tiers >= 2, got {n_tiers}")
    top = n_tiers - 1
    imp = F.greatest(F.col(importance_col).cast("long"), F.lit(0))
    bl = F.length(F.bin(imp))
    mx = df.agg(
        F.max(F.length(F.bin(F.greatest(F.col(importance_col).cast("long"), F.lit(0)))))
        .alias("_blmax")
    )
    slow_sec = (2**top) * wave_sec
    chg = (
        F.when(F.col(interval_col).isNull(), F.lit(0))
        .when(F.col(interval_col) <= wave_sec, F.lit(1))
        .when(F.col(interval_col) > slow_sec, F.lit(-1))
        .otherwise(F.lit(0))
    )
    return (
        df.crossJoin(F.broadcast(mx))
        .select(
            url_col,
            F.greatest(
                F.lit(0), F.lit(top) - (F.col("_blmax") - bl)
            ).cast("long").alias("imp_tier"),
            chg.cast("long").alias("chg_adj"),
        )
        .select(
            url_col,
            "imp_tier",
            "chg_adj",
            F.least(
                F.lit(top),
                F.greatest(F.lit(0), F.col("imp_tier") + F.col("chg_adj")),
            ).cast("long").alias("tier"),
        )
        .withColumn(
            "revisit_waves",
            # F.shiftleft needs a literal shift — SQL function takes columns
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.lit(top) - F.col("tier")).cast("int"),
            ).cast("long"),
        )
    )
