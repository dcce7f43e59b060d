"""The batch-wave crawl scheduler (EP1/EP2/EP3 of SURVEY.md §3).

Replaces the reference's blocking fetch loop (folder.go:42-97 goroutine
fan-out, page.go:21-28 bare GETs) with a partitioned frontier driven by
DataFrame ops:

wave k:
  1. robots gate (broadcast semi/anti join — frontier side never shuffled);
  2. due selection: ``row_number() OVER (PARTITION BY host, bucket ORDER BY
     seed_seq, type_seq, date_sort, doc_seq, url) <= tokens_per_bucket`` —
     the politeness token budget per salted host bucket;
  3. "fetch" = join due URLs against the ``pages`` corpus (no live HTTP in
     this sandbox; on a cluster this stage is the HTTP/WARC reader);
  4. parse by kind (query → filing links, index → doc links, report → facts)
     via the Arrow-batched kernels;
  5. discovered URLs: canonicalize → in-batch dedup (keep best priority) →
     bloom prefilter (definitely-new skips the anti-join) → exact
     ``left_anti`` vs the frontier (byte-exact URL-seen per the rule);
  6. frontier state transitions + append; snapshot commit (icelite) so every
     wave is a resume point; per-wave metrics row.

Crawl ordering: priority = (seed_seq, type_seq, date_sort, doc_seq, url) —
per-ticker seed order, per filing type, filing dates DESC (the reference's
AvailableFilings order, folder.go:128-131), doc pages in the pinned canonical
order Entity,BS,CF,Ops,Inc,notes. The reference fetches docs concurrently
with a shared-struct race (parser.go:373-388); the pinned order is the
documented deterministic target (SURVEY.md §7 risk 2). When two doc types
map to one URL the highest-priority doc type claims it (the reference is
nondeterministic there too).

Scale notes (10^10 frontier): the frontier lives in snapshots (never in
driver memory — per-wave state is pure DataFrame lineage + parquet);
politeness bucketing salts the single-host key before the window shuffle
(no one-reducer skew); the due→pages join is a shuffle join on url that AQE
re-plans (with Iceberg it becomes storage-partition-pruned by url bucket);
the bloom is maintained incrementally (only new URLs hashed each wave).
"""

from __future__ import annotations

import tempfile
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from edgar_spark.frontier.bloom import ShardedBloom
from edgar_spark.frontier.canonical import canonicalize, host_of, politeness_bucket
from edgar_spark.frontier.robots import split_robots
from edgar_spark.icelite import IceliteCatalog
from edgar_spark.model.consolidate import consolidate_facts
from edgar_spark.model.schemas import FACTS_SCHEMA, FRONTIER_SCHEMA
from edgar_spark.operators.udfs import (
    parse_index_pages,
    parse_query_pages,
    parse_report_pages,
)

QUERY_URL_TEMPLATE = (
    "https://www.sec.gov/cgi-bin/browse-edgar?action=getcompany"
    "&CIK=%s&type=%s&dateb=&owner=exclude&count=10"
)  # page.go:13-14 (count=10 ⇒ only the 10 most recent filings are discoverable)

PRIORITY_COLS = ["seed_seq", "type_seq", "date_sort", "doc_seq", "url"]


@dataclass
class CrawlConfig:
    filing_types: Tuple[str, ...] = ("10-K", "10-Q")
    politeness_buckets: int = 32
    tokens_per_bucket: int = 100_000
    max_waves: int = 12
    # snapshot file fan-in: small fixed file count at sandbox scale (coalesce
    # before the parquet write); at 10^10 scale this becomes write-partitioning
    # by politeness bucket instead of a coalesce
    snapshot_partitions: int = 8
    checkpoint_dir: Optional[str] = None
    use_bloom: bool = True
    bloom_shards: int = 4
    bloom_bits_per_shard: int = 1 << 22  # ~4 Mbit/shard; size up per SURVEY §7.5
    bloom_hashes: int = 5


@dataclass
class CrawlResult:
    filings: DataFrame
    frontier: DataFrame
    facts: DataFrame
    metrics: List[dict] = field(default_factory=list)
    catalog: Optional[IceliteCatalog] = None


def _empty(spark: SparkSession, schema) -> DataFrame:
    return spark.createDataFrame([], schema)


class Crawler:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        seeds: DataFrame,
        robots: Optional[DataFrame] = None,
        config: Optional[CrawlConfig] = None,
    ) -> None:
        self.spark = spark
        self.pages = pages
        self.seeds = seeds
        self.robots = robots
        self.cfg = config or CrawlConfig()
        self.catalog = IceliteCatalog(
            self.cfg.checkpoint_dir or tempfile.mkdtemp(prefix="edgar_spark_ckpt_")
        )
        self._bloom = (
            ShardedBloom(
                self.cfg.bloom_shards,
                self.cfg.bloom_bits_per_shard,
                self.cfg.bloom_hashes,
            )
            if self.cfg.use_bloom
            else None
        )

    # ------------------------------------------------------------ seeding

    def seed_frontier(self) -> DataFrame:
        """EP1 seeding (fetcher.go:16-32): one query URL per (ticker, type),
        priority = (seed order, type order)."""
        types = list(self.cfg.filing_types)
        tdf = F.posexplode(F.array(*[F.lit(t) for t in types])).alias(
            "type_seq", "filing_type"
        )
        df = self.seeds.select("ticker", "cik", "seed_seq", tdf)
        url = F.format_string(QUERY_URL_TEMPLATE, F.col("ticker"), F.col("filing_type"))
        return df.select(
            url.alias("url"),
            F.lit("query").alias("kind"),
            F.col("cik"),
            F.col("ticker"),
            F.col("filing_type"),
            F.lit(None).cast("string").alias("accession"),
            F.lit(None).cast("string").alias("filing_date"),
            F.lit(None).cast("string").alias("doc_type"),
            F.col("seed_seq"),
            F.col("type_seq"),
            F.lit(0).cast("long").alias("date_sort"),
            F.lit(0).alias("doc_seq"),
            F.lit("pending").alias("state"),
            F.lit(None).cast("int").alias("wave"),
            F.lit(-1).alias("wave_added"),
            host_of(url).alias("host"),
            politeness_bucket(url, self.cfg.politeness_buckets).alias("bucket"),
        )

    # ------------------------------------------------------------ one wave

    def _frontier_row(
        self, df: DataFrame, kind: str, url_col, extra: dict, wave_no: int
    ) -> DataFrame:
        url = canonicalize(url_col)
        cols = {
            "url": url,
            "kind": F.lit(kind),
            "cik": F.col("cik"),
            "ticker": F.col("ticker"),
            "filing_type": F.col("filing_type"),
            "accession": extra["accession"],
            "filing_date": extra["filing_date"],
            "doc_type": extra["doc_type"],
            "seed_seq": F.col("seed_seq"),
            "type_seq": F.col("type_seq"),
            "date_sort": extra["date_sort"],
            "doc_seq": extra["doc_seq"],
            "state": F.lit("pending"),
            "wave": F.lit(None).cast("int"),
            "wave_added": F.lit(wave_no),
            "host": host_of(url),
            "bucket": politeness_bucket(url, self.cfg.politeness_buckets),
        }
        return df.select(*[c.alias(n) for n, c in cols.items()])

    def run_wave(
        self, frontier: DataFrame, facts: DataFrame, wave_no: int
    ) -> Tuple[DataFrame, DataFrame, dict]:
        spark = self.spark
        cfg = self.cfg
        pending = frontier.filter(F.col("state") == "pending")
        settled = frontier.filter(F.col("state") != "pending")

        if self.robots is not None:
            allowed, blocked = split_robots(pending, self.robots)
        else:
            allowed, blocked = pending, _empty(spark, FRONTIER_SCHEMA)

        w = Window.partitionBy("host", "bucket").orderBy(*PRIORITY_COLS)
        ranked = allowed.withColumn("_rn", F.row_number().over(w))
        due = ranked.filter(F.col("_rn") <= cfg.tokens_per_bucket).drop("_rn")
        deferred = ranked.filter(F.col("_rn") > cfg.tokens_per_bucket).drop("_rn")

        # "fetch": inner join for hits (AQE can broadcast the small due wave —
        # a left-outer here would force a sort-merge shuffle of the whole
        # corpus every wave since only the big side could be broadcast) and a
        # url-only left-anti for misses (right side is one pruned column, so
        # it broadcasts). Persist — three parse kinds + the state update all
        # reuse the fetched rows.
        fetched = due.join(self.pages.select("url", "text"), "url", "inner").persist()
        missing = due.join(self.pages.select("url"), "url", "left_anti")

        # parse per kind (Sparser-style cheap prefilters before Python)
        q_out = parse_query_pages(
            fetched.filter(
                (F.col("kind") == "query")
                & F.col("text").contains("interactiveDataBtn")
            )
        )
        ix_out = parse_index_pages(
            fetched.filter(
                (F.col("kind") == "index") & F.col("text").contains("var reports")
            )
        )
        new_facts = parse_report_pages(
            fetched.filter((F.col("kind") == "report") & F.col("text").contains("defref"))
        )

        new_index = self._frontier_row(
            q_out,
            "index",
            F.col("viewer_url"),
            {
                "accession": F.regexp_extract(
                    F.col("viewer_url"), r"accession_number=([0-9\-]+)", 1
                ),
                "filing_date": F.col("filing_date"),
                "doc_type": F.lit(None).cast("string"),
                "date_sort": -F.unix_date(F.to_date(F.col("filing_date"))).cast("long"),
                "doc_seq": F.lit(0),
            },
            wave_no,
        )
        new_reports = self._frontier_row(
            ix_out,
            "report",
            F.col("report_url"),
            {
                "accession": F.col("accession"),
                "filing_date": F.col("filing_date"),
                "doc_type": F.col("doc_type"),
                "date_sort": -F.unix_date(F.to_date(F.col("filing_date"))).cast("long"),
                "doc_seq": F.col("doc_seq"),
            },
            wave_no,
        )
        candidates = new_index.unionByName(new_reports)

        # in-batch dedup: best (highest-priority) row per canonical URL
        wd = Window.partitionBy("url").orderBy(
            "seed_seq", "type_seq", "date_sort", "doc_seq"
        )
        candidates = (
            candidates.withColumn("_rn", F.row_number().over(wd))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

        # URL-seen: bloom prefilter, exact anti-join for the maybes.
        # One action covers both control-flow counts (candidates, bloom-new).
        probed = None
        if self._bloom is not None:
            probed = self._bloom.probe(candidates, "url").persist()
            stats = probed.agg(
                F.count("*").alias("n"),
                F.coalesce(
                    F.sum(F.when(~F.col("maybe_seen"), 1).otherwise(0)), F.lit(0)
                ).alias("new"),
            ).collect()[0]
            n_candidates, n_bloom_passed = stats["n"], int(stats["new"])
            candidates = probed.drop("maybe_seen")
            if n_candidates == 0:
                new_rows = candidates  # empty — skip anti-join jobs entirely
            else:
                definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
                maybe_seen = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
                confirmed_new = maybe_seen.join(
                    frontier.select("url"), "url", "left_anti"
                )
                new_rows = definitely_new.unionByName(confirmed_new)
        else:
            candidates = candidates.persist()
            n_candidates = candidates.count()
            n_bloom_passed = 0
            if n_candidates == 0:
                new_rows = candidates
            else:
                new_rows = candidates.join(frontier.select("url"), "url", "left_anti")

        due_fetched = (
            fetched.drop("text")
            .withColumn("state", F.lit("fetched"))
            .withColumn("wave", F.lit(wave_no))
        )
        due_missing = missing.withColumn("state", F.lit("missing")).withColumn(
            "wave", F.lit(wave_no)
        )
        blocked_rows = blocked.withColumn("state", F.lit("robots_blocked")).withColumn(
            "wave", F.lit(wave_no)
        )

        frontier_next = (
            settled.unionByName(due_fetched)
            .unionByName(due_missing)
            .unionByName(blocked_rows)
            .unionByName(deferred)
            .unionByName(new_rows)
        )
        facts_next = facts.unionByName(new_facts)

        # snapshot commit = materialization + resume point
        nsp = cfg.snapshot_partitions
        self.catalog.commit_snapshot(
            {"frontier": frontier_next.coalesce(nsp), "facts": facts_next.coalesce(nsp)},
            meta={"wave": wave_no},
        )
        frontier_next = self.catalog.read(spark, "frontier")
        facts_next = self.catalog.read(spark, "facts")

        # metrics: one groupBy pass over the materialized snapshot
        counts = {
            (r["state"], r["wave"], r["wave_added"]): r["n"]
            for r in frontier_next.groupBy("state", "wave", "wave_added")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        n_new = sum(
            n for (s, _, wa), n in counts.items() if s == "pending" and wa == wave_no
        )
        n_pending_next = sum(n for (s, _, _), n in counts.items() if s == "pending")

        def _wave_count(state: str) -> int:
            return sum(n for (s, w, _), n in counts.items() if s == state and w == wave_no)
        metrics = {
            "wave": wave_no,
            "fetched": _wave_count("fetched"),
            "missing": _wave_count("missing"),
            "robots_blocked": _wave_count("robots_blocked"),
            "discovered": n_candidates,
            "deduped": n_candidates - n_new,
            "bloom_candidates": n_candidates,
            "bloom_passed": n_bloom_passed,
            "facts": facts_next.count(),
            "pending_next": n_pending_next,
        }

        # incremental bloom maintenance: hash only this wave's new URLs
        if self._bloom is not None and n_new > 0:
            added = ShardedBloom.build(
                frontier_next.filter(
                    (F.col("state") == "pending") & (F.col("wave_added") == wave_no)
                ).select("url"),
                "url",
                self.cfg.bloom_shards,
                self.cfg.bloom_bits_per_shard,
                self.cfg.bloom_hashes,
                n_hint=n_new,
            )
            self._bloom.merge(added)
        if probed is not None:
            probed.unpersist()
        else:
            candidates.unpersist()
        fetched.unpersist()
        return frontier_next, facts_next, metrics

    # ------------------------------------------------------------ full runs

    def run(self) -> CrawlResult:
        frontier = self.seed_frontier()
        facts = _empty(self.spark, FACTS_SCHEMA)
        if self._bloom is not None:
            self._bloom.merge(
                ShardedBloom.build(
                    frontier.select("url"),
                    "url",
                    self.cfg.bloom_shards,
                    self.cfg.bloom_bits_per_shard,
                    self.cfg.bloom_hashes,
                )
            )
        return self._loop(frontier, facts, start_wave=0, metrics=[])

    @classmethod
    def resume(
        cls,
        spark: SparkSession,
        checkpoint_dir: str,
        pages: DataFrame,
        seeds: DataFrame,
        robots: Optional[DataFrame] = None,
        config: Optional[CrawlConfig] = None,
    ) -> CrawlResult:
        """EP3 (fetcher.go:35-60): restart from the latest snapshot — parsed
        state is reused, remaining frontier re-drives the waves."""
        cfg = config or CrawlConfig()
        cfg.checkpoint_dir = checkpoint_dir
        self = cls(spark, pages, seeds, robots, cfg)
        frontier = self.catalog.read(spark, "frontier")
        facts = self.catalog.read(spark, "facts")
        last_wave = self.catalog.snapshot_meta().get("wave", -1)
        if self._bloom is not None:
            self._bloom.merge(
                ShardedBloom.build(
                    frontier.select("url"),
                    "url",
                    cfg.bloom_shards,
                    cfg.bloom_bits_per_shard,
                    cfg.bloom_hashes,
                )
            )
        return self._loop(frontier, facts, start_wave=last_wave + 1, metrics=[])

    def _loop(
        self, frontier: DataFrame, facts: DataFrame, start_wave: int, metrics: List[dict]
    ) -> CrawlResult:
        wave = start_wave
        n_pending = frontier.filter(F.col("state") == "pending").count()
        while wave < self.cfg.max_waves and n_pending > 0:
            frontier, facts, m = self.run_wave(frontier, facts, wave)
            metrics.append(m)
            n_pending = m["pending_next"]
            wave += 1
        filings = consolidate_facts(facts)
        nsp = self.cfg.snapshot_partitions
        self.catalog.commit_snapshot(
            {
                "frontier": frontier.coalesce(nsp),
                "facts": facts.coalesce(nsp),
                "filings": filings.coalesce(nsp),
            },
            meta={"wave": wave - 1, "final": True},
        )
        filings = self.catalog.read(self.spark, "filings")
        return CrawlResult(
            filings=filings,
            frontier=frontier,
            facts=facts,
            metrics=metrics,
            catalog=self.catalog,
        )
