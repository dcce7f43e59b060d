"""Unit tests for lexical retrieval, line-quality filtering, and the
broadcast lexicon classifier."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _docs(spark):
    rows = [
        (1, "spark spark spark join"),
        (2, "spark join join table"),
        (3, "table table row column"),
        (4, "unrelated words entirely"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_postings_and_idf_shape(spark):
    from edgar_spark.operators.retrieval import postings

    post = postings(_docs(spark)).collect()
    tf = {(r["term"], r["doc_id"]): r["tf"] for r in post}
    assert tf[("spark", 1)] == 3
    assert tf[("join", 2)] == 2
    assert ("spark", 3) not in tf
    # empty doc contributes nothing
    assert not [r for r in post if r["doc_id"] == 5]


def test_tfidf_topk_ranking_and_ties(spark):
    from edgar_spark.operators.retrieval import tfidf_topk

    queries = spark.createDataFrame(
        [("q1", "spark"), ("q2", "row column"), ("q3", "absentterm")],
        ["query_id", "query_text"],
    )
    out = tfidf_topk(_docs(spark), queries, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    # q1: doc 1 (tf=3) above doc 2 (tf=1); docs without 'spark' absent
    q1 = sorted(by_q["q1"], key=lambda r: r["rank"])
    assert [r["doc_id"] for r in q1] == [1, 2]
    assert q1[0]["score"] == 3 * (5 * 1000 // 2)  # tf=3, N=5, df=2
    # q2: only doc 3 matches, both terms contribute
    assert [r["doc_id"] for r in by_q["q2"]] == [3]
    assert by_q["q2"][0]["score"] == 2 * (5 * 1000 // 1)
    # q3: no matches → no rows
    assert "q3" not in by_q


def test_tfidf_query_tf_weights(spark):
    from edgar_spark.operators.retrieval import tfidf_topk

    docs = _docs(spark)
    single = spark.createDataFrame([("q", "spark")], ["query_id", "query_text"])
    double = spark.createDataFrame(
        [("q", "spark spark")], ["query_id", "query_text"]
    )
    s1 = {r["doc_id"]: r["score"] for r in tfidf_topk(docs, single).collect()}
    s2 = {r["doc_id"]: r["score"] for r in tfidf_topk(docs, double).collect()}
    assert s2 == {d: 2 * v for d, v in s1.items()}


def test_line_quality_filter_rules(spark):
    from edgar_spark.operators.curation import line_quality_filter

    rows = [
        # 4 lines: good / too-few-words / low-alpha / blocklisted
        (1, "a good clean line\nab cd\n12 345 678 90\nplease accept cookie banner"),
        (2, ""),
        (3, "all lines here are fine\nthis one also survives easily"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in line_quality_filter(df).collect()}
    assert out[1]["n_lines"] == 4 and out[1]["n_kept"] == 1
    assert out[1]["text"] == "a good clean line"
    assert not out[1]["keep"]  # 1/4 < 50%
    assert out[2]["n_lines"] == 1 and out[2]["n_kept"] == 0
    assert out[2]["text"] == "" and not out[2]["keep"]
    assert out[3]["n_kept"] == 2 and out[3]["keep"]
    assert out[3]["text"] == rows[2][1]


def test_line_quality_filter_no_shuffle_plan(spark):
    import contextlib
    import io

    from edgar_spark.operators.curation import line_quality_filter

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        line_quality_filter(df).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_lexicon_classify(spark):
    from edgar_spark.operators.text import lexicon_classify

    lex = {
        "a": {"spark": 2, "join": 1},
        "b": {"table": 2, "row": 1},
    }
    df = _docs(spark)
    out = {r["doc_id"]: r for r in lexicon_classify(df, lex).collect()}
    assert out[1]["label"] == "a" and out[1]["score"] == 3 * 2 + 1
    assert out[3]["label"] == "b" and out[3]["score"] == 2 * 2 + 1
    # no lexicon hits → 'none', 0 — including the empty doc
    assert out[4]["label"] == "none" and out[4]["score"] == 0
    assert out[5]["label"] == "none" and out[5]["score"] == 0
    # tie breaks to the lexicographically first class
    tie = spark.createDataFrame([(9, "spark table")], ["doc_id", "text"])
    r = lexicon_classify(tie, lex).collect()[0]
    assert r["label"] == "a" and r["score"] == 2


def test_line_quality_filter_null_text(spark):
    from edgar_spark.operators.curation import line_quality_filter

    df = spark.createDataFrame(
        [(1, None), (2, "a perfectly fine line")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in line_quality_filter(df).collect()}
    # null text behaves as empty — counts and keep are non-null so the
    # doc lands in exactly one of keep / ~keep downstream
    assert out[1]["text"] == "" and out[1]["n_lines"] == 1
    assert out[1]["n_kept"] == 0 and out[1]["keep"] is False
    assert out[2]["keep"] is True


def test_pq_encode_topk_consistency(spark):
    """PQ codes + ADC search agree with a direct numpy replay: every
    (query, vec) score equals the sum of round-6 subspace cosines
    between the query slice and the vector's ASSIGNED centroid."""
    import numpy as np

    from edgar_spark.operators.similarity import pq_encode, pq_topk, pq_train

    rng = np.random.RandomState(5)
    vecs = rng.randn(12, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    books = pq_train(df, dim=8, m=2, k=3, n_iter=1)
    codes_df = pq_encode(df, dim=8, m=2, k=3, n_iter=1, books=books)
    codes = {r["vec_id"]: (r["code_0"], r["code_1"]) for r in codes_df.collect()}
    out = pq_topk(
        codes_df, vecs[:2], np.arange(2), books, k=12
    ).collect()
    assert len(out) == 24
    for r in out:
        q = vecs[r["query_id"]]
        exp = 0.0
        for s in range(2):
            c = books[s][codes[r["vec_id"]][s]]
            sub = q[s * 4 : (s + 1) * 4]
            exp += float(
                np.round(
                    (c @ sub) / (np.linalg.norm(sub) * np.linalg.norm(c)), 6
                )
            )
        assert abs(r["score"] - exp) < 1e-12
    # ranks are score-desc with vec_id ties, dense 1..12 per query
    for qid in (0, 1):
        rs = sorted(
            [r for r in out if r["query_id"] == qid], key=lambda r: r["rank"]
        )
        assert [r["rank"] for r in rs] == list(range(1, 13))
        assert all(
            rs[i]["score"] >= rs[i + 1]["score"] for i in range(len(rs) - 1)
        )


def test_bm25_long_doc_no_int_overflow(spark):
    """Regression: the doc-length norm dl·N·1000 must be BIGINT.

    dl is IntegerType (F.size), so without an explicit cast the product
    evaluates in 32-bit and overflows once dl·N ≥ ~2.1e6·1000 — here
    21 500 tokens × 100 docs × 1000 = 2.15e9 > 2³¹. Under ANSI mode
    (Spark 4 default) that crashed with ARITHMETIC_OVERFLOW before the
    cast; non-ANSI silently wrapped and corrupted scores.
    """
    from edgar_spark.operators.retrieval import bm25_topk

    long_doc = " ".join(["filler"] * 21_490 + ["needle"] * 10)
    rows = [(0, long_doc)] + [
        (i, "short doc text") for i in range(1, 100)
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    queries = spark.createDataFrame(
        pd.DataFrame([("q0", "needle")], columns=["query_id", "query_text"])
    )
    out = bm25_topk(docs, queries, k=3).collect()
    assert out[0]["doc_id"] == 0
    assert out[0]["score"] > 0


def test_nsw_graph_ann_recall_at_least_ivf(spark):
    """The graph-ANN search (deterministic NSW + fixed-round beam) must
    reach at least IVF's recall@5 against brute-force ground truth on
    the same corpus and query set — the quality bar for adding a graph
    index next to the LSH/IVF/PQ family."""
    from pyspark.sql import functions as F

    from edgar_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        nsw_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 10)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, qs, k=5).collect()
    }
    nsw = {
        (r["query_id"], r["neighbor_id"])
        for r in nsw_topk(emb, qs, k=5, m=8, ef=24, rounds=5).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, qs, k=5, n_centroids=8, n_probe=2).collect()
    }
    nsw_recall = len(nsw & truth) / len(truth)
    ivf_recall = len(ivf & truth) / len(truth)
    assert nsw_recall >= ivf_recall
    assert nsw_recall >= 0.9


def test_phrase_topk_exactness(spark):
    import pandas as pd
    from edgar_spark.operators.retrieval import phrase_topk

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "fast table scan beats slow table scan",
                "table table table",          # overlapping dup-term starts
                "Fast, Table! extra words",   # punctuation-insensitive
                "table fast",                 # reversed -> no match
            ],
        }
    )
    out = phrase_topk(
        spark.createDataFrame(docs),
        {"ts": "table scan", "tt": "table table", "ft": "fast table"},
        k=5,
    ).collect()
    got = {(r["phrase_id"], r["doc_id"]): r["n_occurrences"] for r in out}
    assert got[("ts", 1)] == 2          # two adjacent occurrences
    assert got[("tt", 2)] == 2          # starts 0 and 1 both match
    assert got[("ft", 1)] == 1 and got[("ft", 3)] == 1
    assert ("ft", 4) not in got         # order matters
    assert ("tt", 1) not in got         # "table ... table" not adjacent
    ranks = {(r["phrase_id"], r["rank"]): r["doc_id"] for r in out}
    assert ranks[("ts", 1)] == 1


def test_anchor_field_topk_anchor_only_reach(spark):
    import pandas as pd
    from edgar_spark.operators.retrieval import anchor_field_topk

    pages = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u1", "u2", "u3"],
                "text": [
                    "fast table scan notes",
                    "unrelated body words entirely",
                    "fast fast fast",
                ],
            }
        )
    )
    # u2's body never says 'homepage'; two inbound anchors do
    links = spark.createDataFrame(
        pd.DataFrame(
            {
                "dst_url": ["u2", "u2", "u3"],
                "anchor": ["official homepage", "project homepage", "fast"],
            }
        )
    )
    q = spark.createDataFrame(
        [("qa", "homepage"), ("qb", "fast")],
        "query_id string, query_text string",
    )
    out = anchor_field_topk(pages, links, q, k=3).collect()
    got = {(r["query_id"], r["rank"]): (r["url"], r["score"]) for r in out}
    # anchor-only reach: u2 found for 'homepage' despite body mismatch
    assert got[("qa", 1)][0] == "u2"
    assert len([k for k in got if k[0] == "qa"]) == 1
    # fielded tf: u3 has tf_body=3 + one weighted anchor (3*1) = 6 > u1's 1
    assert got[("qb", 1)][0] == "u3"
    assert got[("qb", 2)][0] == "u1"
    assert got[("qb", 1)][1] > got[("qb", 2)][1]
