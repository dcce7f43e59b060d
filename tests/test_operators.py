"""Unit tests for the training-data-pipeline operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    base = " ".join(f"token{i}" for i in range(100))
    near = " ".join(f"token{i}" for i in range(97)) + " changed words here"
    english = "the quick brown fox jumps over the lazy dog " * 10
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, near),  # near dup of 1 (tail changed)
        (4, "completely different text about spark engines and parquet files"),
        (5, ""),
        (6, english),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(docs):
    from edgar_spark.operators.dedup import exact_dedup

    out = {r["doc_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert out[1] == 2  # doc 2 collapsed into doc 1
    assert 2 not in out
    assert out[3] == 1 and out[4] == 1


def test_minhash_near_dups(docs):
    from edgar_spark.operators.dedup import minhash_dedup_pairs

    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_dedup_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0  # identical docs: all signatures match
    assert (1, 3) in pairs  # near dup detected
    assert all(a != 4 and b != 4 for a, b in pairs)  # unrelated doc untouched


def test_dedup_representatives(docs, spark):
    from edgar_spark.operators.dedup import dedup_representatives, minhash_dedup_pairs

    pairs = minhash_dedup_pairs(docs, threshold=0.5)
    reps = {
        r["doc_id"]: r["representative"]
        for r in dedup_representatives(pairs, docs.select("doc_id")).collect()
    }
    assert reps[2] == 1 and reps[3] == 1
    assert reps[1] == 1 and reps[4] == 4


def test_simhash_similarity(docs):
    from edgar_spark.operators.dedup import simhash_signatures

    sig = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    assert sig[1] == sig[2]  # identical text, identical fingerprint

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(sig[1], sig[3]) < ham(sig[1], sig[4])  # near dup closer
    assert sig[5] == 0


def test_brute_force_vs_ann(spark):
    from edgar_spark.operators.similarity import ann_topk, brute_force_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, q, k=3)
    assert exact.count() == 15
    r = exact.filter("rank = 1").collect()
    assert all(-1.0 <= row["cos_sim"] <= 1.0 + 1e-9 for row in r)
    approx = ann_topk(emb, q, dim=len(emb.first()["embedding"]), k=3, n_planes=4)
    # approximate results are a subset of valid neighbors with correct shape
    assert set(approx.columns) == {"query_id", "neighbor_id", "cos_sim", "rank"}
    assert approx.filter("query_id = neighbor_id").count() == 0


def test_embedding_near_dups(spark):
    from edgar_spark.operators.similarity import embedding_near_dups

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.first()["embedding"])
    dups = embedding_near_dups(emb, dim=dim, threshold=0.99, n_planes=4)
    assert all(r["id_a"] < r["id_b"] for r in dups.collect())


def test_text_ops(docs):
    from edgar_spark.operators.text import (
        bpe_ish_token_count,
        fingerprint,
        lang_id,
        quality_score,
        token_count,
    )

    tc = {r["doc_id"]: r["n"] for r in docs.select("doc_id", token_count(F.col("text")).alias("n")).collect()}
    assert tc[6] == 90 and tc[5] == 0
    bp = {r["doc_id"]: r["n"] for r in docs.select("doc_id", bpe_ish_token_count(F.col("text")).alias("n")).collect()}
    assert bp[6] >= tc[6]  # subword pieces ≥ words
    langs = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
    assert langs[6] == "en" and langs[5] == "und"
    qs = {r["doc_id"]: r["quality_score"] for r in quality_score(docs).collect()}
    assert qs[6] > qs[5]
    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprint(docs).collect()}
    assert fp[1] == fp[2] and fp[1] != fp[3]


def test_multimodal_plumbing(spark):
    from edgar_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        byte_stats,
        decode_image,
        extract_features,
        fake_features,
        frame_sample_plan,
    )

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")

    media = spark.createDataFrame(
        [
            (1, "image", b"\x00\x01\x02\x03" * 100, "image/png", 10, 10, None),
            (2, "video", b"\xff" * 64, "video/mp4", 64, 48, 3500),
        ],
        MEDIA_SCHEMA,
    )
    feats = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    assert len(feats[1]) == 8
    assert abs(sum(feats[1]) - 1.0) < 1e-6
    assert feats[1] == list(fake_features(b"\x00\x01\x02\x03" * 100))  # deterministic
    stats = {r["media_id"]: r["n_bytes"] for r in byte_stats(media).collect()}
    assert stats[1] == 400 and stats[2] == 64
    plan = frame_sample_plan(media.filter("media_id = 2"), every_ms=1000)
    assert [r["frame_ts_ms"] for r in plan.collect()] == [0, 1000, 2000, 3000]


def test_asof_join(spark):
    from datetime import datetime as dt

    from edgar_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, 10, dt(2024, 1, 1, 0, 0)),   # before any right row -> NULL
            (2, 10, dt(2024, 1, 1, 1, 0)),   # exactly at right ts -> inclusive
            (3, 10, dt(2024, 1, 1, 3, 0)),   # between -> earlier right wins
            (4, 20, dt(2024, 1, 1, 5, 0)),   # other key
            (5, 30, dt(2024, 1, 1, 5, 0)),   # key with no right rows -> NULL
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (10, dt(2024, 1, 1, 1, 0), 100.0),
            (10, dt(2024, 1, 1, 1, 0), 150.0),  # same-ts dup: max value wins
            (10, dt(2024, 1, 1, 2, 0), 200.0),
            (20, dt(2024, 1, 1, 4, 0), 300.0),
        ],
        ["user_id", "ts", "value"],
    )
    out = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(
            left, right, key="user_id", ts="ts", value_col="value"
        ).collect()
    }
    assert out == {1: None, 2: 150.0, 3: 200.0, 4: 300.0, 5: None}


def test_asof_join_null_right_value(spark):
    """A right ROW with a NULL value still matches (ASOF LEFT JOIN
    semantics): NULL is attached, not skipped in favor of an older row."""
    from datetime import datetime as dt

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
        TimestampType,
    )

    from edgar_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, dt(2024, 1, 1, 3, 0))], ["event_id", "user_id", "ts"]
    )
    rschema = StructType(
        [
            StructField("user_id", IntegerType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    right = spark.createDataFrame(
        [(10, dt(2024, 1, 1, 1, 0), 100.0), (10, dt(2024, 1, 1, 2, 0), None)],
        rschema,
    )
    out = asof_join(left, right, key="user_id", ts="ts", value_col="value").collect()
    assert out[0]["asof_value"] is None  # the t2 row wins, value NULL
