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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from edgar_spark.operators.text import alnum_terms

__all__ = ["index_terms", "postings", "tfidf_topk"]

IDF_SCALE = 1000

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
