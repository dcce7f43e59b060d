"""Sharded Bloom filter URL-seen set (+ a cuckoo filter for deletable
entries), built distributively with mapInPandas.

Design scale (north rule: 10^10-URL frontier): a single bloom at 1% fpp for
10^10 keys needs ~12 GB — too big for one broadcast. We shard by
``crc32(url) % n_shards``: each shard covers ~N/n_shards keys, shards are
built per-partition as numpy bit arrays and OR-merged (associative, so the
merge tree can run on executors at scale; at sandbox scale the driver OR is
fine and exact). Probing broadcasts only the shards a partition needs.

Usage contract (exactness): ``contains == False`` ⇒ definitely unseen (skip
the expensive anti-join); ``contains == True`` ⇒ maybe seen ⇒ exact
``left_anti`` join against the frontier decides. The bloom is a prefilter,
never the source of truth — byte-exact URL-seen membership per the rule.

Hashes: blake2b(url) → two independent 64-bit values → k double-hashed probes
(Kirsch–Mitzenmacher). No external hash libs needed.
"""

from __future__ import annotations

import hashlib
import math
import zlib
from typing import Iterator, List

import numpy as np
import pandas as pd


def _hash_pair(url: str) -> tuple:
    d = hashlib.blake2b(url.encode("utf-8"), digest_size=16).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little")


def optimal_bits(n_keys: int, fpp: float) -> int:
    return max(64, int(-n_keys * math.log(fpp) / (math.log(2) ** 2)))


def optimal_hashes(bits: int, n_keys: int) -> int:
    return max(1, int(round(bits / max(n_keys, 1) * math.log(2))))


class ShardedBloom:
    def __init__(self, n_shards: int, bits_per_shard: int, n_hashes: int) -> None:
        self.n_shards = n_shards
        self.bits = bits_per_shard
        self.k = n_hashes
        self.shards: List[np.ndarray] = [
            np.zeros((bits_per_shard + 7) // 8, dtype=np.uint8)
            for _ in range(n_shards)
        ]

    # -- core bit ops -------------------------------------------------
    def _positions(self, url: str) -> tuple:
        h1, h2 = _hash_pair(url)
        shard = zlib.crc32(url.encode("utf-8")) % self.n_shards
        return shard, [(h1 + i * h2) % self.bits for i in range(self.k)]

    def add(self, url: str) -> None:
        shard, pos = self._positions(url)
        arr = self.shards[shard]
        for p in pos:
            arr[p >> 3] |= 1 << (p & 7)

    def contains(self, url: str) -> bool:
        shard, pos = self._positions(url)
        arr = self.shards[shard]
        return all(arr[p >> 3] & (1 << (p & 7)) for p in pos)

    def merge(self, other: "ShardedBloom") -> "ShardedBloom":
        assert (self.n_shards, self.bits, self.k) == (
            other.n_shards,
            other.bits,
            other.k,
        )
        for i in range(self.n_shards):
            np.bitwise_or(self.shards[i], other.shards[i], out=self.shards[i])
        return self

    # -- spark build / probe -------------------------------------------
    @classmethod
    def build(
        cls,
        df,
        url_col: str,
        n_shards: int,
        bits_per_shard: int,
        n_hashes: int,
        n_hint: int | None = None,
    ):
        """Distributed build with two strategies picked by expected key count:

        * **positions** (default): each partition emits the (shard, bit)
          pairs its URLs set — cost ∝ n_urls·k, independent of partition
          count. Right for incremental per-wave maintenance (a wave adds
          thousands-to-millions of URLs).
        * **bitmaps**: each partition emits full shard bitmaps, OR-merged —
          cost ∝ n_partitions·n_shards·bits/8. Only wins for bulk builds
          where n_urls·k approaches the total bitmap size (≳ bits·n_shards/64
          keys, e.g. rebuilding the seen-set from a 10^9-row frontier); at
          that scale the merge runs as an RDD ``treeReduce`` so the driver
          sees one bitmap set, not one per partition.
        """
        params = (n_shards, bits_per_shard, n_hashes)
        use_bitmaps = (
            n_hint is not None and n_hint * n_hashes > (n_shards * bits_per_shard) // 64
        )
        if use_bitmaps:
            def to_filter(it):
                partial = cls(*params)
                for row in it:
                    u = row[0]
                    if u is not None:
                        partial.add(u)
                yield partial.shards

            def or_shards(a, b):
                for x, y in zip(a, b):
                    np.bitwise_or(x, y, out=x)
                return a

            merged = (
                df.select(url_col)
                .rdd.mapPartitions(to_filter)
                .treeReduce(or_shards, depth=3)
            )
            out = cls(*params)
            out.shards = list(merged)
            return out

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            probe = cls(*params)
            for pdf in batches:
                shards, bits = [], []
                for u in pdf[url_col]:
                    if u is not None:
                        shard, pos = probe._positions(u)
                        for p in pos:
                            shards.append(shard)
                            bits.append(p)
                yield pd.DataFrame({"shard": shards, "pos": np.array(bits, dtype=np.int64)})

        parts = df.select(url_col).mapInPandas(gen, schema="shard int, pos long")
        out = cls(*params)
        for row in parts.collect():  # (shard, bit-position) pairs, never URLs
            arr = out.shards[row["shard"]]
            p = row["pos"]
            arr[p >> 3] |= 1 << (p & 7)
        return out

    def probe(self, df, url_col: str, flag_col: str = "maybe_seen"):
        """Append a boolean ``maybe_seen`` column (vectorized per batch; the
        filter shards ride to executors inside the closure — at design scale
        this becomes a broadcast variable per shard group)."""
        bloom = self

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf[flag_col] = [
                    bool(u is not None and bloom.contains(u)) for u in pdf[url_col]
                ]
                yield pdf

        from pyspark.sql.types import BooleanType, StructField, StructType

        schema = StructType(df.schema.fields + [StructField(flag_col, BooleanType())])
        return df.mapInPandas(gen, schema=schema)


class CuckooFilter:
    """Minimal cuckoo filter (Fan et al., CoNEXT'14 public algorithm):
    4-slot buckets, 16-bit fingerprints, supports delete — the fallback the
    north rule names for re-crawlable URL-seen entries.

    Seen-filter contract: ``contains == False`` ⇒ DEFINITELY unseen. A
    plain cuckoo filter breaks this when full (a failed insert evicts a
    resident fingerprint that is then lost). Two guards keep the contract:

    * homeless fingerprints land in a bounded **stash** (checked by
      ``contains``/``delete``), so no insert silently loses a resident;
    * if the stash itself fills, the filter flips to **saturated** and
      reports every probe as maybe-seen — degraded precision, never a
      false negative; the crawler's exact anti-join then decides.
    """

    def __init__(
        self, n_buckets: int = 1 << 16, max_kicks: int = 500, stash_max: int = 512
    ) -> None:
        self.n = n_buckets
        self.max_kicks = max_kicks
        self.table = np.zeros((n_buckets, 4), dtype=np.uint16)
        self.stash: set = set()  # (bucket, fp) pairs with no table slot
        self.stash_max = stash_max
        self.saturated = False

    def _fp(self, item: str) -> int:
        return (zlib.crc32(item.encode("utf-8")) & 0xFFFF) or 1

    def _i1(self, item: str) -> int:
        h, _ = _hash_pair(item)
        return h % self.n

    def _i2(self, i1: int, fp: int) -> int:
        h, _ = _hash_pair(str(fp))
        return (i1 ^ h) % self.n

    def _insert_at(self, i: int, fp: int) -> bool:
        row = self.table[i]
        for s in range(4):
            if row[s] == 0:
                row[s] = fp
                return True
        return False

    def add(self, item: str) -> bool:
        return self.add_pair(self._i1(item), self._fp(item))

    def add_pair(self, i1: int, fp: int) -> bool:
        """Insert a precomputed (primary bucket, fingerprint) pair — the
        distributed-build entry point: executors hash, the driver (which
        owns the mutable table) only inserts small ints."""
        i2 = self._i2(i1, fp)
        if self._insert_at(i1, fp) or self._insert_at(i2, fp):
            return True
        import random

        rng = random.Random(fp)
        i = rng.choice([i1, i2])
        for _ in range(self.max_kicks):
            s = rng.randrange(4)
            fp, self.table[i][s] = int(self.table[i][s]), fp
            i = self._i2(i, fp)
            if self._insert_at(i, fp):
                return True
        # table full: the held fp is a displaced RESIDENT (i is one of its
        # two homes — _i2 is an involution). Stash it so it is never lost;
        # past the stash bound, degrade to always-maybe-seen.
        if len(self.stash) < self.stash_max:
            self.stash.add((i, fp))
            return True
        self.saturated = True
        return False

    def add_positions(self, df, url_col: str = "url") -> None:
        """Distributed build: executors compute (bucket, fingerprint) pairs
        per partition (mapInPandas, same hashes as ``add``); only the small
        int pairs cross to the driver — never URL strings — and the
        kick-loop insertion stays driver-side where the table lives. The
        cuckoo twin of ShardedBloom.build's 'positions' strategy."""
        n = self.n

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                i1s, fps = [], []
                for u in pdf[url_col]:
                    if u is not None:
                        fp = (zlib.crc32(u.encode("utf-8")) & 0xFFFF) or 1
                        h, _ = _hash_pair(u)
                        i1s.append(h % n)
                        fps.append(fp)
                yield pd.DataFrame(
                    {
                        "i1": np.array(i1s, dtype=np.int64),
                        "fp": np.array(fps, dtype=np.int64),
                    }
                )

        pairs = df.select(url_col).mapInPandas(gen, schema="i1 long, fp long")
        for row in pairs.collect():
            self.add_pair(int(row["i1"]), int(row["fp"]))

    def contains(self, item: str) -> bool:
        if self.saturated:
            return True  # degraded: exact anti-join downstream decides
        fp = self._fp(item)
        i1 = self._i1(item)
        i2 = self._i2(i1, fp)
        return bool(
            (self.table[i1] == fp).any()
            or (self.table[i2] == fp).any()
            or (i1, fp) in self.stash
            or (i2, fp) in self.stash
        )

    def probe(self, df, url_col: str, flag_col: str = "maybe_seen"):
        """Same vectorized probe surface as ShardedBloom.probe, so the
        crawler can use either seen-filter implementation."""
        filt = self

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf[flag_col] = [
                    bool(u is not None and filt.contains(u)) for u in pdf[url_col]
                ]
                yield pdf

        from pyspark.sql.types import BooleanType, StructField, StructType

        schema = StructType(df.schema.fields + [StructField(flag_col, BooleanType())])
        return df.mapInPandas(gen, schema=schema)

    def add_all(self, urls) -> None:
        for u in urls:
            self.add(u)

    def delete(self, item: str) -> bool:
        fp = self._fp(item)
        for i in (self._i1(item), self._i2(self._i1(item), fp)):
            row = self.table[i]
            hits = np.where(row == fp)[0]
            if len(hits):
                row[hits[0]] = 0
                return True
            if (i, fp) in self.stash:
                self.stash.discard((i, fp))
                return True
        return False
