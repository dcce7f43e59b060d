"""Sparse text retrieval — inverted index and quantized TF-IDF top-k.

A training-data pipeline needs lexical retrieval next to the ANN family
(similarity.py): benchmark-decontamination lookups, nearest-neighbor
text audits, and corpus search all start from an inverted index. The
classic engine shape is postings lists; the Spark-first shape is the
*relational* postings table (term, doc_id, tf) — Catalyst then turns
term-key joins into the postings intersection a hand-built index would
do, with partial aggregation and broadcast of the (tiny) query side.

Scoring uses **quantized rational idf**: ``idf_scaled = (N * 1000) div
df`` — a monotone stand-in for log-idf in exact BIGINT arithmetic. Like
graph.pagerank and lm.lm_surprisal, integer scores are shuffle-order
invariant, so rankings are bit-identical across partitionings and
engines (a float log-idf sum is not exactly reproducible in a second
engine). Ties rank by doc_id for full determinism.

Scale design (10^10 docs):
- the index build pays ONE term-keyed shuffle (the exploded corpus
  hash-partitions into the (term, doc) partial-agg) — that is the cost
  of building an inverted index anywhere, paid once and amortized over
  every query against it; df is a second bounded agg over the postings
  (vocabulary-sized output);
- at query time nothing corpus-scale moves on a text key again: the
  tokenized query terms (idf pre-folded) **broadcast** to the postings
  join;
- top-k per query compiles to WindowGroupLimit (per-partition heaps
  prune before any global sort).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from edgar_spark.operators.text import alnum_terms

__all__ = [
    "index_terms", "postings", "postings_with_dl", "tfidf_topk",
    "bm25_topk", "positional_postings", "phrase_topk", "anchor_field_topk",
]

IDF_SCALE = 1000

# BM25 quantization scales (see bm25_topk): doc-length normalization and
# the tf saturation ratio each carry 3-4 decimal digits of precision
BM25_DL_SCALE = 1000  # L = (dl * N * 1000) div total_len ≈ 1000 · dl/avgdl
BM25_TF_SCALE = 10000  # tf_part ≤ (k1+1) · 10000 = 22000

# the shared indexing tokenizer (text.py) under its retrieval name
index_terms = alnum_terms


def postings(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Relational inverted index: (term, doc_id, tf). One explode, one
    partial-agg'd groupBy — the index build never sees a wide row."""
    return (
        df.select(F.col(id_col), F.explode(index_terms(F.col(text_col))).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count("*").alias("tf"))
    )


def tfidf_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """Top-k docs per query by quantized TF-IDF.

    score = Σ_terms  q_tf × tf × ((N × 1000) div df)  — exact BIGINT.
    Returns (query_id, rank, doc_id, score). Docs sharing a score rank by
    doc_id; queries with no matching terms return no rows.
    """
    post = postings(docs, id_col, text_col)
    n_docs = docs.agg(F.count("*").alias("_n"))
    idf = (
        post.groupBy("term")
        .agg(F.count("*").alias("_df"))
        .crossJoin(F.broadcast(n_docs))
        .select("term", F.expr(f"(_n * {IDF_SCALE}) div _df").alias("idf_scaled"))
    )
    q_terms = (
        queries.select(
            F.col(query_id_col),
            F.explode(index_terms(F.col(query_text_col))).alias("term"),
        )
        .groupBy(query_id_col, "term")
        .agg(F.count("*").alias("q_tf"))
    )
    # fold idf into the query terms first: both big tables (postings,
    # idf) then only ever join against a broadcast query-sized side —
    # neither shuffles, and a web-scale vocabulary never broadcasts
    weighted = idf.join(F.broadcast(q_terms), "term").select(
        query_id_col, "term", "q_tf", "idf_scaled"
    )
    scored = (
        post.join(F.broadcast(weighted), "term")
        .groupBy(query_id_col, id_col)
        .agg(F.sum(F.expr("q_tf * tf * idf_scaled")).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "score")
    )


def postings_with_dl(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id, tf, dl) — the inverted index with the document's
    token length riding along. dl is computed BEFORE the explode and
    carried through the term shuffle as an 8-byte payload column, so the
    length-normalized scorers (BM25) never pay a corpus-scale doc_id
    join to re-attach it: the one term-keyed shuffle postings() already
    pays is the whole cost."""
    terms = index_terms(F.col(text_col))
    return (
        df.select(
            F.col(id_col),
            F.size(terms).alias("_dl"),
            F.explode(terms).alias("term"),
        )
        .groupBy("term", id_col)
        .agg(F.count("*").alias("tf"), F.first("_dl").alias("dl"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """Top-k docs per query by quantized BM25 (k1 = 1.2, b = 0.75).

    Exact-integer reformulation of the standard scorer, in the same
    spirit as the rational idf of ``tfidf_topk`` — every step is BIGINT
    arithmetic with explicit ``div`` quantization, so rankings and
    scores are bit-identical across engines and partitionings:

    - idf: the BM25 idf argument ``(N - df + 0.5)/(df + 0.5)`` is the
      exact rational ``(2N - 2df + 1)/(2df + 1)``; the quantized stand-in
      (monotone in it, like tfidf's ``(N·1000) div df`` is in 1/df) is
      ``idf_scaled = ((2N - 2df + 1) · 1000) div (2df + 1)``.
    - doc-length norm: ``L = (dl · N · 1000) div Σdl ≈ 1000 · dl/avgdl``.
    - tf saturation: ``tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))`` with
      k1 = 6/5, b = 3/4 equals ``22·tf / (10·tf + 3 + 9·dl/avgdl)`` after
      multiplying through by 10; substituting dl/avgdl ≈ L/1000 and
      quantizing at scale 10⁴:
      ``tf_part = (22 · tf · 10⁷) div (10⁴·tf + 3·10³ + 9·L)`` — bounded
      by (k1+1)·10⁴ = 22000 regardless of tf.
    - per-term score = ``q_tf · idf_scaled · tf_part`` summed per
      (query, doc).

    Overflow bounds (BIGINT): ``dl·N·1000 < 2⁶³`` caps corpus token mass
    ×·max-doc-length around 10¹⁷ — at 10¹⁰ docs that allows ~1 M-token
    documents; idf_scaled ≤ (2N+1)·1000 times tf_part·q_tf stays under
    2⁶³ for q_tf into the thousands. All comfortably inside the 100 TB
    frame, and the same expressions run unpromoted in ANSI SQL.

    Plan shape = ``tfidf_topk``'s: one term-keyed shuffle building the
    dl-carrying postings, a vocabulary-bounded df agg, idf folded into
    the broadcast query side, and WindowGroupLimit top-k. Nothing
    corpus-scale shuffles twice; the global (N, Σdl) pair is collected
    once and embedded as literals (the kmeans-centroids pattern — a
    crossJoin'd 1-row agg would recompute its tokenize scan under every
    consumer).
    """
    post = postings_with_dl(docs, id_col, text_col)
    # the two corpus scalars (N, Σdl) come to the driver once and embed as
    # literals — the kmeans-centroids pattern. The crossJoin-broadcast
    # alternative recomputes this 1-row agg (a full tokenize scan) under
    # EACH of its two consumers; measured 4.9 s vs 1.4 s for tfidf at
    # sf0.1 before this change.
    srow = docs.select(
        F.size(index_terms(F.col(text_col))).alias("_dl")
    ).agg(F.count("*").alias("_n"), F.sum("_dl").alias("_total")).collect()[0]
    n_docs, total_dl = int(srow["_n"]), int(srow["_total"])
    idf = post.groupBy("term").agg(F.count("*").alias("_df")).select(
        "term",
        F.expr(
            f"((2 * {n_docs} - 2 * _df + 1) * {IDF_SCALE}) div (2 * _df + 1)"
        ).alias("idf_scaled"),
    )
    q_terms = (
        queries.select(
            F.col(query_id_col),
            F.explode(index_terms(F.col(query_text_col))).alias("term"),
        )
        .groupBy(query_id_col, "term")
        .agg(F.count("*").alias("q_tf"))
    )
    weighted = idf.join(F.broadcast(q_terms), "term").select(
        query_id_col, "term", "q_tf", "idf_scaled"
    )
    scored = (
        post.join(F.broadcast(weighted), "term")
        .withColumn(
            "_L",
            # dl is IntegerType (F.size); without the cast the product is
            # evaluated in 32-bit and overflows at dl·N ≥ 2³¹/1000 (~10k
            # docs × 215-token doc) — ANSI mode crashes, non-ANSI corrupts
            F.expr(
                f"(cast(dl as bigint) * {n_docs} * {BM25_DL_SCALE})"
                f" div {total_dl}"
            ),
        )
        .withColumn(
            "_tf_part",
            # (22·tf·10⁷) div (10⁴·tf + 3·10³ + 9·L): the 10⁴-scaled exact
            # rational of tf·(k1+1) / (tf + k1·(1-b) + k1·b·dl/avgdl)
            F.expr(
                f"(22 * tf * {BM25_TF_SCALE} * {BM25_DL_SCALE}) "
                f"div (10 * {BM25_DL_SCALE} * tf + 3 * {BM25_DL_SCALE} + 9 * _L)"
            ),
        )
        .groupBy(query_id_col, id_col)
        .agg(F.sum(F.expr("q_tf * idf_scaled * _tf_part")).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "score")
    )


def positional_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional inverted index: (term, doc_id, pos) with ``pos`` the
    0-based index in the `index_terms` token stream — the index layout
    phrase and proximity queries need. Pure explode over the scan; the
    caller owns any keyed aggregation downstream."""
    return df.select(
        F.col(id_col),
        F.posexplode(index_terms(F.col(text_col))).alias("pos", "term"),
    )


def phrase_topk(
    df: DataFrame,
    phrases: dict[str, str],
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase search over positional postings, top-k docs per
    phrase by occurrence count — the retrieval operator BM25 can't
    express (benchmark decontamination and quote tracing both need
    exact adjacency, not bag-of-words overlap).

    The scale-correct shape: instead of the textbook m-1 position
    self-joins, every posting that matches phrase slot ``i`` votes for
    the candidate START ``pos - i``; a start where all ``m`` distinct
    slots voted is a match. That is ONE broadcast join (postings ⋈
    phrase slots — the phrase table is a literal) and ONE partial-agged
    groupBy on (phrase, doc, start) — the corpus shuffles once, on a
    key whose cardinality is matched-postings, never a term-keyed
    self-join per phrase word. Duplicate words in a phrase ("table
    table") are exact: votes count DISTINCT slots, and the same posting
    legitimately votes for two different starts.

    Output: (phrase_id, doc_id, n_occurrences, rank) for the top ``k``
    docs per phrase (count DESC, id ASC — WindowGroupLimit prunes
    before any global sort). Phrases tokenize with `index_terms`, the
    corpus tokenizer, so "Fast, Table!" matches "fast table".
    """
    rows = []
    for pid, phrase in phrases.items():
        words = [w for w in re.split(r"[^a-z0-9]+", phrase.lower()) if w]
        if not words:
            raise ValueError(f"phrase {pid!r} has no indexable terms")
        for i, w in enumerate(words):
            rows.append((pid, i, w, len(words)))
    spark = df.sparkSession
    slots = F.broadcast(
        spark.createDataFrame(
            rows, "phrase_id string, slot int, term string, m int"
        )
    )
    pp = positional_postings(df, id_col, text_col)
    votes = pp.join(slots, "term").select(
        "phrase_id",
        id_col,
        (F.col("pos") - F.col("slot")).alias("start"),
        "slot",
        "m",
    )
    starts = (
        votes.filter(F.col("start") >= 0)
        .groupBy("phrase_id", id_col, "start")
        .agg(
            F.count_distinct("slot").alias("seen"),
            F.first("m").alias("m"),
        )
        .filter(F.col("seen") == F.col("m"))
    )
    counts = starts.groupBy("phrase_id", id_col).agg(
        F.count("*").alias("n_occurrences")
    )
    w = Window.partitionBy("phrase_id").orderBy(
        F.col("n_occurrences").desc(), F.col(id_col)
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def anchor_field_topk(
    docs: DataFrame,
    links: DataFrame,
    queries: DataFrame,
    k: int = 5,
    anchor_weight: int = 3,
    id_col: str = "url",
    text_col: str = "text",
    dst_col: str = "dst_url",
    anchor_col: str = "anchor",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """Fielded retrieval with inbound anchor text (BM25F-lite) — the
    web-search signal body text can't carry: a page is described by the
    words *other* pages use to link to it (how search engines find
    pages whose own text never says what they are). Term frequency per
    (term, doc) = ``tf_body + anchor_weight × tf_anchor`` where
    ``tf_anchor`` counts the term across ALL inbound anchors of the
    doc; idf counts docs matching in EITHER field; score is the same
    quantized ``q_tf × tf × ((N × 1000) div df)`` exact-BIGINT rational
    as `tfidf_topk`. A doc whose body never contains the query can
    still rank — by anchors alone (tested).

    Output: (query_id, rank, id, score), top-k per query (score DESC,
    id ASC).

    Plan: body and anchor postings each pay their one term-keyed
    partial-agged shuffle, then UNION + re-aggregate on the same key
    (no outer join — the union rides the existing partitioning); idf is
    a vocabulary-grain aggregate; queries (idf pre-folded) broadcast to
    the fielded postings; top-k prunes via WindowGroupLimit. Nothing
    corpus-scale ever joins on a text key against another corpus-scale
    side.
    """
    body = postings(docs, id_col, text_col).select(
        "term",
        F.col(id_col).alias("_id"),
        F.col("tf").alias("tf_body"),
        F.lit(0).cast("bigint").alias("tf_anchor"),
    )
    anchor = (
        links.select(
            F.col(dst_col).alias("_id"),
            F.explode(index_terms(F.col(anchor_col))).alias("term"),
        )
        .groupBy("term", "_id")
        .agg(F.count("*").alias("tf_anchor"))
        .select(
            "term",
            "_id",
            F.lit(0).cast("bigint").alias("tf_body"),
            "tf_anchor",
        )
    )
    fielded = (
        body.unionByName(anchor)
        .groupBy("term", "_id")
        .agg(
            (
                F.sum("tf_body")
                + F.lit(anchor_weight) * F.sum("tf_anchor")
            ).alias("tf_f")
        )
    )
    n_docs = docs.agg(F.count("*").alias("_n"))
    idf = (
        fielded.groupBy("term")
        .agg(F.count("*").alias("_df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term", F.expr(f"(_n * {IDF_SCALE}) div _df").alias("idf_scaled")
        )
    )
    q_terms = (
        queries.select(
            F.col(query_id_col),
            F.explode(index_terms(F.col(query_text_col))).alias("term"),
        )
        .groupBy(query_id_col, "term")
        .agg(F.count("*").alias("q_tf"))
    )
    weighted = idf.join(F.broadcast(q_terms), "term").select(
        query_id_col, "term", "q_tf", "idf_scaled"
    )
    scored = (
        fielded.join(F.broadcast(weighted), "term")
        .groupBy(query_id_col, "_id")
        .agg(F.sum(F.expr("q_tf * tf_f * idf_scaled")).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", F.col("_id").alias(id_col), "score")
    )
