"""Unit tests for asymmetric n-gram containment (operators/dedup.py)
and DSIR-style contrastive importance weights (operators/lm.py)."""

from __future__ import annotations

import pandas as pd


def test_ngram_containment_superset_pair(spark):
    from edgar_spark.operators.dedup import ngram_containment

    a = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1], "text": ["the quick brown fox jumps"]}
        )
    )
    b = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1],
                "text": [
                    "intro words here the quick brown fox jumps and more tail"
                ],
            }
        )
    )
    pairs = spark.createDataFrame(pd.DataFrame({"id_a": [1], "id_b": [1]}))
    (row,) = ngram_containment(a, b, n=3, pairs=pairs).collect()
    # every shingle of A appears in B -> full containment one way only
    assert row["containment_a"] == 1.0
    assert row["containment_b"] < 1.0
    assert row["inter"] == row["n_a"]


def test_ngram_containment_disjoint_and_consecutive_default(spark):
    from edgar_spark.operators.dedup import ngram_containment

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["aa bb cc dd", "xx yy zz ww"],
            }
        )
    )
    # default pairing: id_a + 1 == id_b
    (row,) = ngram_containment(docs, docs, n=3).collect()
    assert (row["id_a"], row["id_b"]) == (1, 2)
    assert row["inter"] == 0
    assert row["containment_a"] == 0.0


def test_contrastive_weights_separates_target_like_docs(spark):
    from edgar_spark.operators.lm import contrastive_weights
    from pyspark.sql import functions as F

    texts = (
        ["the cat sat on the mat and the dog ran over the hill today"] * 4
        + ["zzz qqq xxx vvv kkk zzz qqq xxx vvv kkk zzz qqq"] * 2
    )
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(6), "text": texts})
    )
    target = docs.filter(F.col("doc_id") < 4)
    rows = {
        r["doc_id"]: r
        for r in contrastive_weights(docs, target, "doc_id", "text").collect()
    }
    for i in range(4):  # target-like docs score positive
        assert rows[i]["delta_surprisal"] > 0
        assert rows[i]["keep"] is True
    for i in (4, 5):  # out-of-distribution docs score negative
        assert rows[i]["delta_surprisal"] < 0
        assert rows[i]["keep"] is False
    # exact-integer contract: same doc text -> identical scores
    assert rows[0]["delta_surprisal"] == rows[3]["delta_surprisal"]
