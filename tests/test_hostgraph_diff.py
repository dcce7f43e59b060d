"""Unit tests for host-graph contraction (operators/graph.py) and
snapshot diffing (frontier/schedule.py)."""

from __future__ import annotations

import pandas as pd


def test_host_graph_contraction(spark):
    from edgar_spark.operators.graph import host_graph

    edges = spark.createDataFrame(
        pd.DataFrame(
            {
                "src": [
                    "https://A.com/p1",
                    "https://a.com/p1",  # same page, second link to b
                    "https://a.com/p2",
                    "https://b.com/x",
                ],
                "dst_url": [
                    "https://b.com/t",
                    "https://b.com/u",
                    "https://b.com/t",
                    "https://b.com/self",
                ],
            }
        )
    )
    rows = {(r["src_host"], r["dst_host"]): r for r in host_graph(edges).collect()}
    ab = rows[("a.com", "b.com")]
    # 3 links from 2 distinct pages (A.com/p1 vs a.com/p1 differ as strings
    # — canonicalize upstream owns case folding of the page URL itself)
    assert ab["n_links"] == 3
    assert ab["n_src_pages"] == 3
    assert ab["internal"] is False
    bb = rows[("b.com", "b.com")]
    assert (bb["n_links"], bb["n_src_pages"], bb["internal"]) == (1, 1, True)


def test_snapshot_diff_statuses(spark):
    from edgar_spark.frontier.schedule import snapshot_diff

    old = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u1", "u2", "u3"],
                "digest": ["d1", "d2", "d3"],
            }
        )
    )
    new = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u1", "u2", "u4"],
                "digest": ["d1", "d2x", "d4"],
            }
        )
    )
    rows = {r["url"]: r for r in snapshot_diff(old, new).collect()}
    assert rows["u1"]["status"] == "unchanged"
    assert rows["u2"]["status"] == "changed"
    assert (rows["u2"]["old_digest"], rows["u2"]["new_digest"]) == ("d2", "d2x")
    assert rows["u3"]["status"] == "gone"
    assert rows["u3"]["new_digest"] is None
    assert rows["u4"]["status"] == "added"
    assert rows["u4"]["old_digest"] is None


def test_snapshot_diff_between_icelite_snapshots(spark, tmp_path):
    """The intended composition: diff two time-traveled captures of the
    same icelite table — incremental crawl change detection against the
    engine's own snapshot layer."""
    from edgar_spark.frontier.schedule import snapshot_diff
    from edgar_spark.icelite import IceliteCatalog

    cat = IceliteCatalog(str(tmp_path / "pages"))
    wave0 = spark.createDataFrame(
        pd.DataFrame(
            {"url": ["u1", "u2", "u3"], "digest": ["d1", "d2", "d3"]}
        )
    )
    sid0 = cat.commit_snapshot({"pages": wave0}, meta={"wave": 0})
    wave1 = spark.createDataFrame(
        pd.DataFrame(
            {"url": ["u1", "u2", "u4"], "digest": ["d1", "d2x", "d4"]}
        )
    )
    cat.commit_snapshot({"pages": wave1}, meta={"wave": 1})
    diff = snapshot_diff(
        cat.read(spark, "pages", snap_id=sid0), cat.read(spark, "pages")
    )
    got = {r["url"]: r["status"] for r in diff.collect()}
    assert got == {
        "u1": "unchanged",
        "u2": "changed",
        "u3": "gone",
        "u4": "added",
    }


def test_snapshot_diff_null_digest_is_presence_not_absence(spark):
    """A capture with a NULL digest (failed checksum) is still PRESENT
    on its side — presence flags, not digest null-ness, drive status."""
    from edgar_spark.frontier.schedule import snapshot_diff

    old = spark.createDataFrame(
        pd.DataFrame({"url": ["u1", "u2"], "digest": [None, None]})
    )
    new = spark.createDataFrame(
        pd.DataFrame({"url": ["u1", "u2"], "digest": ["d1", None]})
    )
    rows = {r["url"]: r for r in snapshot_diff(old, new).collect()}
    # old NULL -> new d1: present both sides, digests differ -> changed
    assert rows["u1"]["status"] == "changed"
    # NULL == NULL null-safely -> unchanged, NOT added/gone
    assert rows["u2"]["status"] == "unchanged"


def test_mirror_hosts_containment_and_cap(spark):
    from edgar_spark.operators.graph import mirror_hosts

    # h1 ≡ h2 (full mirror, 4 fps), h3 ⊂ h1 (2 of 4: containment 1000
    # of the smaller side), h4 disjoint; 'boiler' sits on ALL hosts and
    # must be excluded by max_hosts_per_fp=3 (it would otherwise assert
    # every host mirrors every other)
    rows = []
    for k in range(4):
        rows.append(("h1", f"fp{k}"))
        rows.append(("h2", f"fp{k}"))
    rows += [("h3", "fp0"), ("h3", "fp1")]
    rows += [("h4", "zz0"), ("h4", "zz1")]
    rows += [(h, "boiler") for h in ["h1", "h2", "h3", "h4"]]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["host", "fp"]))

    got = {
        (r["host_a"], r["host_b"]): r
        for r in mirror_hosts(docs, max_hosts_per_fp=3).collect()
    }
    assert set(got) == {("h1", "h2"), ("h1", "h3"), ("h2", "h3")}
    full = got[("h1", "h2")]
    assert full["shared_fps"] == 4
    # boiler excluded from sizes too? NO — sizes count ALL fps a host
    # serves (5 incl. boiler); containment = 4*1000 div 5 = 800
    assert (full["n_fps_a"], full["n_fps_b"]) == (5, 5)
    assert full["containment_permille"] == 800 and full["is_mirror"]
    sub = got[("h1", "h3")]
    assert sub["shared_fps"] == 2 and sub["n_fps_b"] == 3
    assert sub["containment_permille"] == 2000 // 3  # 666, below 800
    assert not sub["is_mirror"]


def test_mirror_hosts_min_shared_filters_singletons(spark):
    from edgar_spark.operators.graph import mirror_hosts

    docs = spark.createDataFrame(
        pd.DataFrame(
            [("a", "x"), ("a", "y"), ("b", "x"), ("b", "z")],
            columns=["host", "fp"],
        )
    )
    assert mirror_hosts(docs, min_shared=2).count() == 0
    one = mirror_hosts(docs, min_shared=1).collect()
    assert len(one) == 1 and one[0]["shared_fps"] == 1


def test_link_farm_signatures(spark):
    import pandas as pd

    from edgar_spark.operators.graph import link_farm

    edges = [
        # reciprocal ring a<->b, heavy: reciprocity + concentration
        ("a.spam", "b.spam", 30),
        ("b.spam", "a.spam", 30),
        # funnel: everything at one host
        ("funnel.biz", "target.com", 25),
        # normal: volume spread over many hosts, no back-links
        *[("news.com", f"h{i}.org", 2) for i in range(15)],
        # tiny reciprocal pair under the evidence floor: unflagged
        ("blog1.net", "blog2.net", 3),
        ("blog2.net", "blog1.net", 3),
        # self-loop must be ignored entirely
        ("news.com", "news.com", 999),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src_host", "dst_host", "n_links"])
    )
    out = (
        link_farm(df, min_out=20, conc_min=5, recip_min_permille=500)
        .toPandas()
        .set_index("src_host")
    )
    assert bool(out.loc["a.spam", "is_farm"])
    assert int(out.loc["a.spam", "recip_permille"]) == 1000
    assert bool(out.loc["funnel.biz", "is_farm"])
    assert int(out.loc["funnel.biz", "concentration"]) == 25
    assert not bool(out.loc["news.com", "is_farm"])
    assert int(out.loc["news.com", "out_links"]) == 30  # self-loop dropped
    assert not bool(out.loc["blog1.net", "is_farm"])  # floor
    assert "target.com" not in out.index  # no outlinks, no row
