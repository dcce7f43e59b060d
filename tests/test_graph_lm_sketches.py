"""Unit tests for the link-graph / LM-filter / sketch operators.

These three families share one design rule: all state is integer, so the
distributed result is bit-identical across partitionings and engines
(graph.py / lm.py / sketches.py module docstrings). The tests therefore
assert exact values against plain-Python references, not tolerances —
except the HLL *estimate*, which is an approximation by definition and
gets an error-bound assertion instead.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _pdf(spark, pdf):
    return spark.createDataFrame(pdf)


# ------------------------------------------------------------- pagerank


def _pagerank_ref(ids, edges, n_iter=5, scale=10**12, damping_pct=85):
    """Driver-side reference of the exact integer recurrence."""
    n = len(ids)
    init = scale // n
    base = ((100 - damping_pct) * init) // 100
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {i: init for i in ids}
    for _ in range(n_iter):
        incoming = {}
        for s, d in edges:
            incoming[d] = incoming.get(d, 0) + rank[s] // outdeg[s]
        rank = {
            i: base + (damping_pct * incoming.get(i, 0)) // 100 for i in ids
        }
    return rank


def test_pagerank_matches_integer_reference(spark):
    from edgar_spark.operators.graph import pagerank

    ids = list(range(6))
    # a hub (0), a sink (5, no out-edges → drops its mass), a multi-edge
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 0), (3, 4), (4, 0), (1, 2)]
    v = _pdf(spark, pd.DataFrame({"id": ids}))
    e = _pdf(spark, pd.DataFrame(edges, columns=["src", "dst"]))
    got = {
        r["id"]: r["rank_scaled"]
        for r in pagerank(v, e, n_iter=5).collect()
    }
    assert got == _pagerank_ref(ids, edges)
    # sink vertex 5 keeps exactly the teleport base every round
    assert got[5] == ((100 - 85) * (10**12 // 6)) // 100


def test_pagerank_checkpoint_equivalence(spark):
    from edgar_spark.operators.graph import pagerank

    ids = list(range(8))
    edges = [(i, (i * 3 + 1) % 8) for i in ids] + [(i, (i + 1) % 8) for i in ids]
    v = _pdf(spark, pd.DataFrame({"id": ids}))
    e = _pdf(spark, pd.DataFrame(edges, columns=["src", "dst"]))
    plain = sorted(
        pagerank(v, e, n_iter=4).collect(), key=lambda r: r["id"]
    )
    ck = sorted(
        pagerank(v, e, n_iter=4, checkpoint_every=2).collect(),
        key=lambda r: r["id"],
    )
    assert [tuple(r) for r in plain] == [tuple(r) for r in ck]


def test_pagerank_empty_graph(spark):
    from edgar_spark.operators.graph import pagerank

    v = spark.range(0).select(F.col("id"))
    e = spark.range(0).select(
        F.col("id").alias("src"), F.col("id").alias("dst")
    )
    assert pagerank(v, e).count() == 0


# ----------------------------------------------------------------- hits


def _hits_ref(ids, edges, n_iter, scale):
    """Driver-side reference of the exact integer L1-normalized HITS."""
    init = max(1, scale // len(ids))
    hub = {i: init for i in ids}
    auth = {i: 0 for i in ids}

    def half(scores, flip):
        raw = {}
        for s, d in edges:
            k_in, k_out = (s, d) if not flip else (d, s)
            raw[k_out] = raw.get(k_out, 0) + scores[k_in]
        total = max(1, sum(raw.values()))
        return {i: (raw.get(i, 0) * scale) // total for i in ids}

    for _ in range(n_iter):
        auth = half(hub, flip=False)
        hub = half(auth, flip=True)
    return hub, auth


def test_hits_matches_integer_reference(spark):
    from edgar_spark.operators.graph import hits

    ids = [1, 2, 3, 4]
    edges = [(1, 3), (2, 3), (3, 4)]
    v = _pdf(spark, pd.DataFrame({"id": ids}))
    e = _pdf(spark, pd.DataFrame(edges, columns=["src", "dst"]))
    got = {
        r["id"]: (r["hub_scaled"], r["auth_scaled"])
        for r in hits(v, e, n_iter=2, scale=1000).collect()
    }
    # hand-computed: round 1 hubs (400,400,200,0); round 2 auths
    # 3←800,4←200 (total exactly 1000), hubs 444/444/111/0
    assert got == {1: (444, 0), 2: (444, 0), 3: (111, 800), 4: (0, 200)}
    ref_hub, ref_auth = _hits_ref(ids, edges, n_iter=2, scale=1000)
    assert got == {i: (ref_hub[i], ref_auth[i]) for i in ids}


def test_hits_reference_parity_and_checkpoint(spark):
    from edgar_spark.operators.graph import hits

    ids = list(range(9))
    edges = [(i, (i * 5 + 2) % 9) for i in ids] + [
        (i, (i + 3) % 9) for i in ids
    ]
    v = _pdf(spark, pd.DataFrame({"id": ids}))
    e = _pdf(spark, pd.DataFrame(edges, columns=["src", "dst"]))
    got = {
        r["id"]: (r["hub_scaled"], r["auth_scaled"])
        for r in hits(v, e, n_iter=3).collect()
    }
    ref_hub, ref_auth = _hits_ref(ids, edges, n_iter=3, scale=10**9)
    assert got == {i: (ref_hub[i], ref_auth[i]) for i in ids}
    ck = {
        r["id"]: (r["hub_scaled"], r["auth_scaled"])
        for r in hits(v, e, n_iter=3, checkpoint_every=1).collect()
    }
    assert ck == got


def test_hits_guards(spark):
    from edgar_spark.operators.graph import hits

    v = spark.range(0).select(F.col("id"))
    e = v.select(F.col("id").alias("src"), F.col("id").alias("dst"))
    assert hits(v, e).count() == 0
    with pytest.raises(ValueError):
        hits(v, e, scale=10**10)
    # edge-free graph: every score collapses to zero after one round
    v2 = _pdf(spark, pd.DataFrame({"id": [1, 2]}))
    rows = hits(v2, e, n_iter=1).collect()
    assert {tuple(r) for r in rows} == {(1, 0, 0), (2, 0, 0)}


# ------------------------------------------------------------------ opic


def _opic_ref(ids, edges, n_iter=4, scale=10**6):
    """Driver-side reference of the exact integer OPIC recurrence."""
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    cash = {i: scale for i in ids}
    hist = {i: 0 for i in ids}
    for _ in range(n_iter):
        inflow = {}
        for s, d in edges:
            inflow[d] = inflow.get(d, 0) + cash[s] // outdeg[s]
        new = {}
        for i in ids:
            od = outdeg.get(i, 0)
            retained = cash[i] % od if od else cash[i]
            hist[i] += cash[i]
            new[i] = retained + inflow.get(i, 0)
        cash = new
    return cash, hist


def test_opic_matches_integer_reference_and_conserves_cash(spark):
    from edgar_spark.operators.graph import opic

    # star hub 0 <-> leaves 1..3, a duplicate edge (multi-edge counts
    # in outdeg), and node 4 dangling (no edges at all: retains forever)
    ids = [0, 1, 2, 3, 4]
    edges = [(0, 1), (0, 2), (0, 3), (1, 0), (2, 0), (3, 0), (1, 0)]
    n_iter, scale = 4, 10**6
    v = _pdf(spark, pd.DataFrame({"id": ids}))
    e = _pdf(spark, pd.DataFrame(edges, columns=["src", "dst"]))
    rows = {r["id"]: r for r in opic(v, e, n_iter=n_iter, scale=scale).collect()}
    cash, hist = _opic_ref(ids, edges, n_iter=n_iter, scale=scale)
    for i in ids:
        assert rows[i]["cash_scaled"] == cash[i], i
        assert rows[i]["hist_scaled"] == hist[i], i
        assert rows[i]["importance_scaled"] == cash[i] + hist[i], i
    # exact conservation: retained remainders mean NO mass is lost
    assert sum(r["cash_scaled"] for r in rows.values()) == len(ids) * scale
    # history banks total cash once per round
    assert (
        sum(r["hist_scaled"] for r in rows.values())
        == n_iter * len(ids) * scale
    )
    # the hub out-ranks every leaf; the dangling node only self-banks
    for i in (1, 2, 3, 4):
        assert rows[0]["importance_scaled"] > rows[i]["importance_scaled"]
    assert rows[4]["cash_scaled"] == scale
    assert rows[4]["hist_scaled"] == n_iter * scale


def test_opic_checkpoint_equivalence(spark):
    from edgar_spark.operators.graph import opic

    ids = list(range(8))
    edges = [(i, (i * 3 + 1) % 8) for i in ids] + [(i, (i + 5) % 8) for i in ids]
    v = _pdf(spark, pd.DataFrame({"id": ids}))
    e = _pdf(spark, pd.DataFrame(edges, columns=["src", "dst"]))
    plain = sorted(map(tuple, opic(v, e, n_iter=6).collect()))
    ckpt = sorted(map(tuple, opic(v, e, n_iter=6, checkpoint_every=2).collect()))
    assert plain == ckpt


# ------------------------------------------------------- label propagation


def test_label_propagation_chain_tie_and_clamp(spark):
    from edgar_spark.operators.graph import label_propagation

    # chain 0-1-2-3-4-5-6 with trust seed at 0, spam seed at 6: after 3
    # rounds the frontier meets at node 3 whose vote TIES (+1 from 2,
    # -1 from 4) and stays 0; node 7 is isolated (never reached); node 8
    # is a +1 seed wired to the spam seed — clamping keeps it +1.
    v = spark.createDataFrame(
        [(i, {0: 1, 6: -1, 8: 1}.get(i)) for i in range(9)],
        "id long, seed long",
    )
    e = _pdf(
        spark,
        pd.DataFrame(
            [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 8)],
            columns=["src", "dst"],
        ),
    )
    rows = {
        r["id"]: r for r in label_propagation(v, e, n_iter=3).collect()
    }
    expect = {0: 1, 1: 1, 2: 1, 3: 0, 4: -1, 5: -1, 6: -1, 7: 0, 8: 1}
    assert {i: rows[i]["label"] for i in expect} == expect
    assert rows[7]["seed"] is None and rows[0]["seed"] == 1


# -------------------------------------------------------------- sketches


def test_hll_estimate_within_bound(spark):
    from edgar_spark.operators.sketches import hll_estimate, hll_register_table

    n = 5000
    df = spark.range(n).select(F.col("id").cast("string").alias("v"))
    rows = hll_register_table(df, "v", p=8).collect()
    est = hll_estimate(rows, p=8)
    # standard error ~1.04/sqrt(256) = 6.5%; assert 4 sigma
    assert abs(est - n) / n < 0.26
    assert len(rows) <= 256


def test_hll_merge_is_union(spark):
    from edgar_spark.operators.sketches import hll_register_table

    df = spark.range(2000).select(F.col("id").cast("string").alias("v"))
    a = hll_register_table(df.filter("id % 2 = 0"), "v", p=6)
    b = hll_register_table(df.filter("id % 2 = 1"), "v", p=6)
    merged = (
        a.unionByName(b)
        .groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    full = hll_register_table(df, "v", p=6)
    got = sorted(tuple(r) for r in merged.collect())
    want = sorted(tuple(r) for r in full.collect())
    assert got == want


def test_cms_overestimates_only_and_fixed_size(spark):
    from edgar_spark.operators.sketches import (
        cms_estimate_counts,
        count_min_sketch,
    )

    # zipf-ish: value k appears ~200//(k+1) times — heavy head, long tail
    pdf = pd.DataFrame(
        {"v": [f"k{k}" for k in range(40) for _ in range(200 // (k + 1))]}
    )
    df = _pdf(spark, pdf)
    sketch = count_min_sketch(df, "v", width=32, depth=4)
    assert sketch.count() <= 32 * 4
    true = pdf["v"].value_counts().to_dict()
    est = cms_estimate_counts(
        df.select("v").distinct(), sketch, "v", width=32, depth=4
    ).collect()
    assert len(est) == len(true)
    for r in est:
        assert r["est_count"] >= true[r["v"]]
    # the heaviest key collides with at most the residual mass: with
    # depth 4 rows its estimate should stay well under 2x truth here
    top = next(r for r in est if r["v"] == "k0")
    assert top["est_count"] < 2 * true["k0"]


# ------------------------------------------------------------------- lm


def test_lm_surprisal_integers_and_ranking(spark):
    from edgar_spark.operators.lm import lm_surprisal

    common = "the quick brown fox jumps over the lazy dog. " * 6
    rows = [(i, common) for i in range(9)] + [(9, "zxqj vvkw qqpz zzzz xqxq")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in lm_surprisal(df, "doc_id", "text", keep_below_milli=6000)
        .collect()
    }
    assert len(out) == 10
    # identical docs score identically (exact integers, no float drift)
    firsts = {tuple(out[i])[1:] for i in range(9)}
    assert len(firsts) == 1
    # the gibberish outlier is more surprising than the common docs
    assert out[9]["avg_surprisal_milli"] > out[0]["avg_surprisal_milli"]
    assert out[0]["keep"] and not out[9]["keep"]
    # exactness invariant: avg = (total*1000) div n
    for r in out.values():
        assert (
            r["avg_surprisal_milli"]
            == r["total_surprisal"] * 1000 // r["n_trigrams"]
        )


def test_lm_short_docs_absent(spark):
    from edgar_spark.operators.lm import lm_surprisal

    df = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, "abcdef")], ["doc_id", "text"]
    )
    got = {r["doc_id"] for r in lm_surprisal(df, "doc_id", "text").collect()}
    assert got == {3}


def test_cms_unseen_and_null_items(spark):
    from edgar_spark.operators.sketches import (
        cms_estimate_counts,
        count_min_sketch,
    )

    df = _pdf(spark, pd.DataFrame({"v": ["a"] * 100 + ["b"] * 3}))
    sketch = count_min_sketch(df, "v", width=64, depth=4)
    items = spark.createDataFrame(
        [("a",), ("b",), ("never-seen",), (None,)], ["v"]
    )
    est = {
        r["v"]: r["est_count"]
        for r in cms_estimate_counts(items, sketch, "v").collect()
    }
    # unseen item: true CMS answer — min over its counters, which with a
    # sparse table must treat absent counters as 0, not drop the row
    assert est["never-seen"] == 0
    assert est["a"] >= 100 and est["b"] >= 3
    # null probe skipped, symmetric with the build
    assert None not in est and len(est) == 3


def test_anchor_text_topk(spark):
    from edgar_spark.operators.graph import anchor_text_topk

    links = spark.createDataFrame(
        [("t1", "spark")] * 3
        + [("t1", "engine")] * 3
        + [("t1", "fast"), ("t1", "query"), ("t2", "solo")],
        ["dst", "anchor"],
    )
    out = anchor_text_topk(links, k=2).orderBy("dst", "rank").collect()
    # t1: tie 3-3 between engine/spark -> lexicographic; 'fast'/'query' cut
    assert [(r["dst"], r["anchor"], r["n_links"], r["rank"]) for r in out] == [
        ("t1", "engine", 3, 1),
        ("t1", "spark", 3, 2),
        ("t2", "solo", 1, 1),
    ]


def test_resolve_redirects(spark):
    from edgar_spark.operators.graph import resolve_redirects

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "d"),      # 3-hop chain -> d
            ("x", "y"), ("y", "x"),                  # 2-cycle
            ("p", "q"),                              # direct
            ("m", "x"),                              # chain INTO a cycle
        ],
        ["src", "dst"],
    )
    out = {r["src"]: r for r in resolve_redirects(edges, max_hops=8).collect()}
    assert (out["a"]["target"], out["a"]["hops"], out["a"]["is_resolved"]) == ("d", 3, True)
    assert (out["b"]["target"], out["b"]["hops"]) == ("d", 2)
    assert (out["p"]["target"], out["p"]["hops"]) == ("q", 1)
    for cyc in ("x", "y", "m"):
        r = out[cyc]
        assert r["target"] is None and r["hops"] is None and not r["is_resolved"]


def test_resolve_redirects_hop_cap(spark):
    from edgar_spark.operators.graph import resolve_redirects

    # a 12-hop chain under an 8-hop cap stays unresolved; under 16 it lands
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["src", "dst"]
    )
    capped = {r["src"]: r for r in resolve_redirects(edges, max_hops=8).collect()}
    assert not capped[0]["is_resolved"]
    assert capped[5]["is_resolved"] and capped[5]["target"] == 12
    full = {r["src"]: r for r in resolve_redirects(edges, max_hops=16).collect()}
    assert full[0]["is_resolved"] and full[0]["target"] == 12 and full[0]["hops"] == 12
