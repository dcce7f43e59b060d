"""Similarity search over an embedding column (``array<float>``).

* **brute-force cosine top-k** — the exact baseline: query set × corpus via
  a crossJoin pruned to the broadcastable query side, dot/norm computed with
  ``F.zip_with``/``F.aggregate`` (stays in codegen, no Python), window top-k.
* **LSH-bucketed ANN** — the scale path: deterministic random-hyperplane
  signs bucket the corpus; queries only scan their bucket (plus optional
  multi-probe neighbors). At 100 TB the corpus side shuffles once on bucket;
  queries broadcast.
* **embedding near-dup** — same machinery at threshold: pairs with cosine ≥
  t inside a bucket.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query row.

    ``queries`` must be small (it is broadcast); the corpus streams through
    one codegen stage — no Python in the loop. Self-matches excluded.
    Output: (query_id, neighbor_id, cos_sim, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: unit-free sign projections
    seeded by (plane, dim) splitmix — identical on every executor with no
    RNG state shipped."""
    from edgar_spark.operators.dedup import _splitmix64

    idx = np.arange(n_planes * dim, dtype=np.uint64)
    vals = _splitmix64(idx).astype(np.float64) / 2**64 - 0.5
    return vals.reshape(n_planes, dim)


def hyperplanes_sql_literal(dim: int, n_planes: int) -> str:
    """The deterministic hyperplane matrix as a SQL list-of-lists literal
    (``repr`` floats are shortest-round-trip, so DuckDB parses back the
    identical doubles) — lets the oracle reproduce bucket assignment."""
    planes = _hyperplanes(dim, n_planes)
    return (
        "["
        + ",".join(
            "[" + ",".join(repr(float(v)) for v in row) + "]" for row in planes
        )
        + "]"
    )


def lsh_bucket_ids(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, bucket): sign-pattern of the vector against n_planes hyperplanes,
    computed vectorized per Arrow batch (one matmul per batch)."""
    planes = _hyperplanes(dim, n_planes)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.vstack(pdf[vec_col].to_numpy())
            proj = mat @ planes.T  # (rows, n_planes)
            bits = (proj > 0).astype(np.int64)
            bucket = (bits * (1 << np.arange(n_planes, dtype=np.int64))).sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "bucket": bucket})

    return df.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} long, bucket long"
    )


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 10,
    round_dp: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    exact cosine within the bucket. Ranked on the ``round_dp``-rounded
    similarity with a neighbor-id tie-break so the output is fully
    deterministic and cross-engine reproducible (same contract as
    ``brute_force_topk``'s oracled wrapper)."""
    cb = lsh_bucket_ids(corpus, dim, n_planes, vec_col, id_col)
    qb = lsh_bucket_ids(queries, dim, n_planes, vec_col, id_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    ).join(cb.select(F.col(id_col).alias("neighbor_id"), "bucket"), "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).join(qb.select(F.col(id_col).alias("query_id"), "bucket"), "query_id")
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), round_dp).alias("cos_sim_r"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim_r").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    centroid_ids: np.ndarray,
    n_probe: int = 1,
    round_dp: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, centroid_id, probe_rank): each vector's ``n_probe`` nearest
    coarse centroids by cosine, vectorized (one matmul per Arrow batch).
    Ties break on centroid id via rounded similarity, so the assignment is
    reproducible in SQL."""
    cmat = np.asarray(centroids, dtype=np.float64)
    cids = np.asarray(centroid_ids, dtype=np.int64)
    cnorm = np.linalg.norm(cmat, axis=1)
    npb = int(n_probe)
    dp = int(round_dp)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            sims = (mat @ cmat.T) / np.outer(np.linalg.norm(mat, axis=1), cnorm)
            sims = np.round(sims, dp)
            # sort by (-sim, centroid_id): centroid rows are already
            # id-ordered, and argsort is stable → lowest id wins ties
            order = np.argsort(-sims, axis=1, kind="stable")[:, :npb]
            ids = np.repeat(pdf[id_col].to_numpy(), npb)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "centroid_id": cids[order].ravel(),
                    "probe_rank": np.tile(np.arange(1, npb + 1), len(pdf)),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} long, centroid_id long, probe_rank int"
    )


def kmeans_centroids(
    corpus: DataFrame,
    k: int,
    n_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mean_round_dp: int | None = None,
) -> np.ndarray:
    """Deterministic distributed Lloyd's k-means for the IVF coarse
    quantizer: seeds = the k lowest-id vectors, fixed ``n_iter`` rounds.
    Each round is one assignment pass (vectorized matmul per Arrow batch)
    plus one mean update computed DISTRIBUTED — posexplode to
    (cluster, dim_pos, value), partial-agg'd avg, and only the k×dim means
    cross to the driver. Empty clusters keep their previous centroid.
    Deterministic given the corpus (no RNG), so an index built twice is
    identical.

    ``mean_round_dp`` rounds each iteration's means (SQL ROUND semantics,
    via ``F.round``): float mean order varies across engines in the last
    ulp, so quantizing the per-round centroids makes the whole trainer
    byte-reproducible in the DuckDB oracle (the ``ivf_assign`` driver
    key unrolls these exact iterations in SQL)."""
    seed_rows = (
        corpus.select(id_col, F.col(vec_col).cast("array<double>").alias("_v"))
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    cmat = np.array([r["_v"] for r in seed_rows], dtype=np.float64)
    cids = np.arange(len(cmat), dtype=np.int64)
    for _ in range(n_iter):
        assign = ivf_assign(
            corpus, cmat, cids, n_probe=1, vec_col=vec_col, id_col=id_col
        )
        mean_expr = (
            F.avg("x")
            if mean_round_dp is None
            else F.round(F.avg("x"), mean_round_dp)
        )
        means = (
            corpus.select(id_col, F.col(vec_col).cast("array<double>").alias("_v"))
            .join(assign.select(id_col, "centroid_id"), id_col)
            .select("centroid_id", F.posexplode("_v").alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(mean_expr.alias("m"))
            .collect()
        )
        nxt = cmat.copy()  # clusters absent from `means` keep their centroid
        for r in means:
            nxt[r["centroid_id"], r["pos"]] = r["m"]
        cmat = nxt
    return cmat


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    round_dp: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-Flat approximate top-k: a coarse quantizer partitions the corpus
    into inverted lists; queries scan only their ``n_probe`` nearest lists
    with exact (rounded) cosine. The 100 TB shape: the corpus shuffles once
    on centroid_id, queries broadcast, and each list is a dense scan.

    The quantizer here is DETERMINISTIC and oracle-able — centroids are the
    ``n_centroids`` lowest-id corpus vectors. A production index swaps in
    k-means centroids; every stage downstream (assignment, inverted lists,
    probe, in-list exact scoring) is identical machinery.
    """
    cent_rows = (
        corpus.select(id_col, F.col(vec_col).cast("array<double>").alias("_v"))
        .orderBy(id_col)
        .limit(n_centroids)
        .collect()
    )
    cmat = np.array([r["_v"] for r in cent_rows], dtype=np.float64)
    cids = np.array([r[id_col] for r in cent_rows], dtype=np.int64)

    ca = ivf_assign(corpus, cmat, cids, n_probe=1, round_dp=round_dp,
                    vec_col=vec_col, id_col=id_col)
    qa = ivf_assign(queries, cmat, cids, n_probe=n_probe, round_dp=round_dp,
                    vec_col=vec_col, id_col=id_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    ).join(
        ca.select(F.col(id_col).alias("neighbor_id"), "centroid_id"), "neighbor_id"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).join(qa.select(F.col(id_col).alias("query_id"), "centroid_id"), "query_id")
    scored = (
        c.join(F.broadcast(q), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), round_dp).alias("cos_sim_r"),
        )
        # no dedup needed: each corpus vector lives in exactly one list, so
        # a (query, neighbor) pair can match at most one probed centroid
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim_r").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def blocked_cosine_pairs(
    corpus: DataFrame,
    threshold: float,
    n_blocks: int | None = None,
    round_dp: int = 6,
    target_block_rows: int = 1024,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """EXACT all-pairs cosine ≥ threshold via block outer products.

    The naive pairwise plan (crossJoin + per-pair higher-order-function
    cosine) evaluates O(n²·d) scalar lambda calls — tens of seconds for
    5k×64 on 8 cores. This operator is algebraically identical but runs the
    O(n²·d) flops as numpy matmuls: rows are packed into ``n_blocks``
    row-blocks, the B·(B+1)/2 block pairs become DataFrame rows, and one
    Arrow-batched matmul per block pair emits the qualifying (id_a, id_b,
    cos) triples. This is also the 100 TB shape: block size is the memory
    knob, block pairs are the parallelism unit, and each task is a dense
    GEMM instead of n² tuple evaluations.

    Output: (id_a, id_b, cos_sim_r) with id_a < id_b, cosine rounded to
    ``round_dp`` before thresholding (same boundary call as the oracle).

    ``n_blocks=None`` (default) sizes the blocking ADAPTIVELY from the
    corpus count: at most ~``target_block_rows`` vectors per block (1024 ×
    64-dim doubles ≈ 512 KB per packed row), so the per-task memory bound
    holds at ANY corpus size — a fixed block count would let block size
    grow with n until a task OOMs. A parallelism floor (≥16 blocks → ≥136
    block-pair tasks once the corpus has ≥1k rows) keeps small corpora from
    collapsing to one task. The sizing count() is one cheap id-column scan.
    """
    if n_blocks is None:
        n = corpus.select(id_col).count()
        by_memory = -(-n // target_block_rows)  # ceil: caps rows per block
        by_parallelism = min(16, -(-n // 64))  # floor: enough tasks
        n_blocks = max(1, by_memory, by_parallelism)
    packed = (
        corpus.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
            F.pmod(F.col(id_col), F.lit(n_blocks)).alias("_b"),
        )
        .groupBy("_b")
        .agg(
            F.collect_list("_id").alias("_ids"),
            F.collect_list("_v").alias("_vecs"),
        )
    )
    a = packed.select(
        F.col("_b").alias("_ba"), F.col("_ids").alias("_ids_a"), F.col("_vecs").alias("_vecs_a")
    )
    b = packed.select(
        F.col("_b").alias("_bb"), F.col("_ids").alias("_ids_b"), F.col("_vecs").alias("_vecs_b")
    )
    pairs = a.crossJoin(b).filter(F.col("_ba") <= F.col("_bb"))

    thr = float(threshold)
    dp = int(round_dp)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                ids_a = np.asarray(row["_ids_a"], dtype=np.int64)
                ids_b = np.asarray(row["_ids_b"], dtype=np.int64)
                ma = np.vstack(row["_vecs_a"])
                mb = np.vstack(row["_vecs_b"])
                na = np.linalg.norm(ma, axis=1)
                nb = np.linalg.norm(mb, axis=1)
                # cosine denominator exactly as the scalar form: ||a||*||b||
                sims = (ma @ mb.T) / np.outer(na, nb)
                sims = np.round(sims, dp)
                keep = sims >= thr
                if row["_ba"] == row["_bb"]:
                    # intra-block: the full matrix holds each pair twice
                    keep &= ids_a[:, None] < ids_b[None, :]
                ii, jj = np.nonzero(keep)
                lo = np.minimum(ids_a[ii], ids_b[jj])
                hi = np.maximum(ids_a[ii], ids_b[jj])
                yield pd.DataFrame(
                    {"id_a": lo, "id_b": hi, "cos_sim_r": sims[ii, jj]}
                )

    return pairs.mapInPandas(gen, schema="id_a long, id_b long, cos_sim_r double")


def embedding_near_dups(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 10,
    round_dp: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold, bucketed by LSH so only
    same-bucket pairs are scored. Cosine is rounded to ``round_dp`` before
    thresholding so both engines make the same boundary call."""
    b = lsh_bucket_ids(corpus, dim, n_planes, vec_col, id_col)
    v = corpus.select(id_col, F.col(vec_col).cast("array<double>").alias("_v")).join(
        b, id_col
    )
    left = v.select(
        F.col(id_col).alias("id_a"), F.col("_v").alias("_va"), "bucket"
    )
    right = v.select(
        F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"), "bucket"
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("_va"), F.col("_vb")), round_dp).alias("cos_sim_r"),
        )
        .filter(F.col("cos_sim_r") >= threshold)
    )


def pq_train(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 4,
    n_iter: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mean_round_dp: int | None = 9,
) -> "np.ndarray":
    """Train the (m, k, dim/m) PQ codebook stack: one deterministic
    Lloyd's run (``kmeans_centroids``) per contiguous subspace slice.
    The driver holds only m·k·(dim/m) floats — the codebook."""
    w = dim // m
    if w * m != dim:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    vecs = corpus.select(
        id_col, F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    cmats = []
    for s in range(m):
        sub = vecs.select(
            id_col, F.slice(F.col(vec_col), s * w + 1, w).alias(vec_col)
        )
        cmats.append(
            kmeans_centroids(
                sub, k=k, n_iter=n_iter, vec_col=vec_col, id_col=id_col,
                mean_round_dp=mean_round_dp,
            )
        )
    return np.stack(cmats)


def pq_encode(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 4,
    n_iter: int = 1,
    round_dp: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mean_round_dp: int | None = 9,
    books: "np.ndarray" = None,
) -> DataFrame:
    """Product quantization (Jégou et al. 2011, spherical variant): the
    embedding splits into ``m`` contiguous subspaces of ``dim/m`` dims; a
    per-subspace codebook of ``k`` centroids is trained with the same
    deterministic Lloyd's trainer as the IVF coarse quantizer
    (``kmeans_centroids`` — seeds = lowest-id subvectors, round-quantized
    means), and each vector's code is its nearest sub-centroid per
    subspace by round-``round_dp`` cosine (ties → lowest centroid id;
    'spherical' because assignment matches the rest of this module's
    cosine geometry rather than classic L2). Output: one row per vector,
    (vec_id, code_0..code_{m-1}) — the m·log2(k)-bit code that compresses
    a 10^10-vector corpus into RAM-resident ANN storage.

    Scale shape: training touches only sliced sub-frames through the
    existing kmeans path (driver holds m·k·(dim/m) floats — the
    codebook); encoding is ONE mapInPandas pass that scores all m
    subspaces per Arrow batch against the broadcast codebook — no joins,
    no shuffle, map-only over the corpus scan."""
    w = dim // m
    if w * m != dim:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    vecs = corpus.select(
        id_col, F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    if books is None:
        books = pq_train(
            corpus, dim, m=m, k=k, n_iter=n_iter, vec_col=vec_col,
            id_col=id_col, mean_round_dp=mean_round_dp,
        )
    books = np.asarray(books, dtype=np.float64)  # (m, k, w)
    bnorms = np.linalg.norm(books, axis=2)  # (m, k)
    dp = int(round_dp)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            cols = {id_col: pdf[id_col]}
            for s in range(m):
                sub = mat[:, s * w : (s + 1) * w]
                sims = (sub @ books[s].T) / np.outer(
                    np.linalg.norm(sub, axis=1), bnorms[s]
                )
                sims = np.round(sims, dp)
                cols[f"code_{s}"] = np.argsort(
                    -sims, axis=1, kind="stable"
                )[:, 0].astype(np.int64)
            yield pd.DataFrame(cols)

    schema = f"{id_col} long, " + ", ".join(
        f"code_{s} long" for s in range(m)
    )
    return vecs.mapInPandas(gen, schema=schema)


def pq_topk(
    corpus: DataFrame,
    query_rows: "np.ndarray",
    query_ids: "np.ndarray",
    books: "np.ndarray",
    k: int = 5,
    round_dp: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ asymmetric-distance search (ADC, Jégou et al. 2011 §III) — the
    payoff of the code compression: per query, a tiny m×k_codebook
    lookup table of round-``round_dp`` query-subvector↔centroid cosines
    is computed ONCE on the driver, and the corpus is scanned as CODES
    ONLY — score = Σ_s lut[s][code_s], four element_at lookups into plan
    literals per row, no vector arithmetic, no join. At 10^10 vectors
    the scan reads m bytes per vector instead of dim floats (a 64-dim
    float corpus shrinks 64×), which is what makes RAM-speed ANN over a
    disk-scale corpus possible.

    ``corpus`` here is the ENCODED frame (``pq_encode`` output:
    id + code_0..code_{m-1}); queries are a small driver-side array
    (the broadcast-queries convention of ``brute_force_topk``). Output:
    (query_id, rank, vec_id, score) — ties rank by vec_id; score sums in
    fixed subspace order so the float total is engine-reproducible."""
    books = np.asarray(books, dtype=np.float64)
    m, _kc, w = books.shape
    bnorms = np.linalg.norm(books, axis=2)
    scored_parts = []
    for qid, qv in zip(query_ids, np.asarray(query_rows, dtype=np.float64)):
        luts = []
        for s in range(m):
            sub = qv[s * w : (s + 1) * w]
            sims = (books[s] @ sub) / (np.linalg.norm(sub) * bnorms[s])
            luts.append([float(x) for x in np.round(sims, round_dp)])
        score = None
        for s in range(m):
            term = F.element_at(
                F.lit(luts[s]), F.col(f"code_{s}").cast("int") + 1
            )
            score = term if score is None else score + term
        scored_parts.append(
            corpus.select(
                F.lit(int(qid)).cast("long").alias("query_id"),
                F.col(id_col),
                score.alias("score"),
            )
        )
    scored = scored_parts[0]
    for p in scored_parts[1:]:
        scored = scored.unionByName(p)
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "score")
    )


def semdedup(
    corpus: DataFrame,
    centroids: "np.ndarray",
    centroid_ids: "np.ndarray",
    threshold: float = 0.92,
    round_dp: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup by clustering then
    within-cluster cosine pruning — the composition of the k-means coarse
    quantizer (``kmeans_centroids`` → ``ivf_assign``) with an exact
    cluster-scoped near-dup prune. A vector is DROPPED when a lower-id
    vector in the SAME cluster has cosine ≥ threshold with it (the
    deterministic keep-lowest-id rule; rounded at ``round_dp`` before the
    boundary call so SQL replays it exactly).

    Output: (vec_id, centroid_id, keep) — one row per corpus vector.

    Scale shape: this is WHY SemDeDup clusters first — the quadratic
    pair space is bounded per cluster instead of per corpus. The plan
    pays one mapInPandas assignment pass (vectorized matmul per Arrow
    batch against the k×dim broadcast centroid matrix), one shuffle on
    centroid_id for the within-cluster self-join, and a pruned-id
    anti-join; with k sized so clusters run ~|corpus|/k vectors, the
    join is (|corpus|²/k) work spread across k independent keys — at
    10^9 vectors and k = 10^5 that is ~10^13 comparisons of ~10^4-row
    partitions, embarrassingly parallel, no all-pairs blowup. Skewed
    clusters are the known SemDeDup failure mode; cap them upstream by
    raising k (the paper's posture) or pre-splitting hot centroids."""
    assign = ivf_assign(
        corpus, centroids, centroid_ids,
        n_probe=1, round_dp=round_dp, vec_col=vec_col, id_col=id_col,
    ).select(id_col, "centroid_id")
    v = corpus.select(
        id_col, F.col(vec_col).cast("array<double>").alias("_v")
    ).join(assign, id_col)
    left = v.select(
        F.col(id_col).alias("id_a"), F.col("_v").alias("_va"), "centroid_id"
    )
    right = v.select(
        F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"), "centroid_id"
    )
    pruned = (
        left.join(right, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.round(cosine(F.col("_va"), F.col("_vb")), round_dp)
            >= F.lit(threshold)
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return (
        v.join(pruned.withColumn("_drop", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "centroid_id",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"),
        )
    )


def rp_project(
    df: DataFrame,
    dim: int,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int = 6,
) -> DataFrame:
    """Johnson–Lindenstrauss random projection to ``k`` dimensions using
    the engine's deterministic hyperplane matrix (`_hyperplanes` — the
    same splitmix-seeded planes the LSH family embeds as SQL literals).
    Dimensionality reduction ahead of ANN / clustering: downstream
    distance work touches k floats instead of dim, and because the
    matrix is derived from (plane, dim) indices there is no RNG state to
    ship — every executor and every engine regenerates it identically.

    Output (id, proj ARRAY<DOUBLE>[k]); each coordinate is the fold-left
    dot product rounded to ``round_dp`` (the family convention that
    absorbs sub-1e-6 summation-order ulps across engines).

    Plan: per-row zip_with/aggregate against k literal rows — pure
    codegen HOFs fused into the scan, zero shuffle, zero Python. At
    10^10 vectors this is a map-only pass; k×dim literals live in the
    plan, not in a join side.
    """
    planes = _hyperplanes(dim, k)
    vec = F.col(vec_col)
    comps = [
        F.round(
            _dot(vec, F.array(*[F.lit(float(v)) for v in row])), round_dp
        )
        for row in planes
    ]
    return df.select(F.col(id_col), F.array(*comps).alias("proj"))


def nsw_build(
    corpus: DataFrame,
    m: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int = 6,
) -> DataFrame:
    """Deterministic single-layer NSW adjacency (the layer-0 graph of
    HNSW, Malkov & Yashunin): node ``i`` links to its top-``m`` exact
    neighbors among PREVIOUSLY-INSERTED nodes (``j < i`` — insertion
    order fixed by id), ranked by ``round_dp``-rounded cosine with id
    tiebreaks, plus the reverse edges (the bidirectional closure NSW
    insertion creates). Because neighbor selection is exact and the
    insertion order is the id order, the graph is a pure function of
    the corpus — no RNG, no sequential state — and replays in SQL.

    The prefix-kNN scoring runs as blocked GEMM (the
    :func:`blocked_cosine_pairs` shape — block pairs are the
    parallelism unit, each task one dense matmul, never per-pair HOF
    lambdas), and each block pair emits only its LOCAL top-``m`` per
    node, so the final global window ranks n_blocks·m candidates per
    node, not n. Top-m of unioned per-block top-m is exactly the global
    top-m under the (rounded cosine, id) total order. A 10^10 build
    swaps candidate generation for LSH/IVF buckets (the operators
    above) while keeping the ranking rule and the search identical —
    the graph QUALITY degrades gracefully, the determinism does not.

    Output: directed edge list (src, dst), deduplicated.
    """
    n = corpus.select(id_col).count()
    n_blocks = max(1, -(-n // 1024), min(16, -(-n // 64)))
    packed = (
        corpus.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
            F.pmod(F.col(id_col), F.lit(n_blocks)).alias("_b"),
        )
        .groupBy("_b")
        .agg(
            F.collect_list("_id").alias("_ids"),
            F.collect_list("_v").alias("_vecs"),
        )
    )
    a = packed.select(
        F.col("_b").alias("_ba"),
        F.col("_ids").alias("_ids_a"),
        F.col("_vecs").alias("_vecs_a"),
    )
    b = packed.select(
        F.col("_b").alias("_bb"),
        F.col("_ids").alias("_ids_b"),
        F.col("_vecs").alias("_vecs_b"),
    )
    blk = a.crossJoin(b).filter(F.col("_ba") <= F.col("_bb"))
    dp = int(round_dp)
    mm = int(m)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def emit(ids_r, ids_c, sims):
            # local top-m per row over prefix candidates (col id < row id)
            out_i, out_j, out_s = [], [], []
            pref = ids_c[None, :] < ids_r[:, None]
            for r in range(len(ids_r)):
                cj = ids_c[pref[r]]
                if cj.size == 0:
                    continue
                cs = sims[r][pref[r]]
                order = np.lexsort((cj, -cs))[:mm]
                out_i.append(np.full(order.size, ids_r[r]))
                out_j.append(cj[order])
                out_s.append(cs[order])
            if not out_i:
                return None
            return pd.DataFrame(
                {
                    "_i": np.concatenate(out_i),
                    "_j": np.concatenate(out_j),
                    "_s": np.concatenate(out_s),
                }
            )

        for pdf in batches:
            for _, row in pdf.iterrows():
                ids_a = np.asarray(row["_ids_a"], dtype=np.int64)
                ids_b = np.asarray(row["_ids_b"], dtype=np.int64)
                ma = np.vstack(row["_vecs_a"])
                mb = np.vstack(row["_vecs_b"])
                na = np.linalg.norm(ma, axis=1)
                nb = np.linalg.norm(mb, axis=1)
                sims = np.round((ma @ mb.T) / np.outer(na, nb), dp)
                got = emit(ids_a, ids_b, sims)
                if got is not None:
                    yield got
                if row["_ba"] != row["_bb"]:
                    got = emit(ids_b, ids_a, sims.T)
                    if got is not None:
                        yield got

    cands = blk.mapInPandas(gen, schema="_i long, _j long, _s double")
    w = Window.partitionBy("_i").orderBy(F.col("_s").desc(), F.col("_j"))
    knn = (
        cands.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= m)
        .select("_i", "_j")
    )
    return (
        knn.select(F.col("_i").alias("src"), F.col("_j").alias("dst"))
        .union(knn.select(F.col("_j").alias("src"), F.col("_i").alias("dst")))
        .distinct()
    )


def nsw_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ef: int = 24,
    rounds: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int = 6,
) -> DataFrame:
    """Graph-ANN top-k by fixed-round BEAM search over the
    :func:`nsw_build` graph: the beam starts at the entry node (the
    min-id vector, HNSW's fixed entry point), and each round expands
    every beam member's adjacency, scores the unseen candidates, and
    keeps the ``ef`` best per query (rounded cosine desc, id asc).
    A fixed round count replaces best-first's data-dependent loop —
    that is what makes the search batch-parallel over all queries at
    once AND exactly SQL-replayable (one unrolled CTE per round).

    Scale: each round is one shuffle join of the beam (|Q|·ef rows)
    against the adjacency table plus a broadcast-query scoring pass —
    O(rounds) shuffles total, queries never leave the broadcast side,
    the corpus-scale adjacency shuffles on the node id it is already
    partitioned by. Self-matches are excluded from the final ranking
    (queries drawn from the corpus), matching ``cosine_topk``.

    Output: (query_id, neighbor_id, cos_sim_r, rank), rank <= k.
    """
    # the graph is referenced once per beam round and the beam chains on
    # itself — materialize both (connected_components-style eager local
    # checkpoints), or every round would recompute the whole build
    adj = nsw_build(
        corpus, m=m, vec_col=vec_col, id_col=id_col, round_dp=round_dp
    ).localCheckpoint(eager=True)
    vecs = corpus.select(
        F.col(id_col).alias("_n"),
        F.col(vec_col).cast("array<double>").alias("_nv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    entry = corpus.select(F.min(id_col).alias("_n")).join(vecs, "_n")
    beam = (
        q.crossJoin(F.broadcast(entry))
        .select(
            "query_id",
            F.col("_n").alias("node"),
            F.round(cosine(F.col("_qv"), F.col("_nv")), round_dp).alias("_s"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_s").desc(), F.col("node")
    )
    for _ in range(rounds):
        nbrs = (
            beam.join(adj, beam["node"] == adj["src"])
            .select("query_id", F.col("dst").alias("node"))
            .distinct()
            .join(beam.select("query_id", "node"), ["query_id", "node"],
                  "left_anti")
        )
        scored = (
            nbrs.join(vecs, nbrs["node"] == vecs["_n"])
            .join(F.broadcast(q), "query_id")
            .select(
                "query_id",
                "node",
                F.round(cosine(F.col("_qv"), F.col("_nv")), round_dp).alias(
                    "_s"
                ),
            )
        )
        beam = (
            beam.union(scored)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= ef)
            .drop("_rn")
            .localCheckpoint(eager=True)
        )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim_r").desc(), F.col("neighbor_id")
    )
    return (
        beam.filter(F.col("node") != F.col("query_id"))
        .select(
            "query_id",
            F.col("node").alias("neighbor_id"),
            F.col("_s").alias("cos_sim_r"),
        )
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
    )
