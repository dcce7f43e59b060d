"""Link-graph operators for the crawl frontier — fixed-point PageRank.

A web-scale crawler needs a page-importance signal to order its frontier
(the reference walks filings in fixed accession-date order,
folder.go:120-132; a Common-Crawl-style frontier instead prioritizes by
link authority). PageRank is the canonical choice, but a *verifiable*
distributed PageRank has a trap: floating-point contributions summed in
shuffle order are not associative, so two runs (or two engines) disagree
in the last ulps and no exact oracle can exist.

This implementation therefore runs in **fixed-point integer arithmetic**:
rank mass is a 64-bit integer in units of ``1/scale`` (default 1e-12),
per-edge contributions use integer division ``rank div outdeg``, and the
damping update is ``base + (damping_pct * sum) div 100``. Integer sums
are exact and order-invariant, so the result is bit-identical across
partitionings, retries, and engines — DuckDB replays the same recurrence
and must agree exactly. The small mass lost to integer division (< outdeg
units per vertex per round) is deterministic and bounded.

Scale design (100 TB / 10^10 vertices):
- edges are joined to their out-degree once, up front; each iteration is
  one hash join (ranks × edges on src) plus one partial-aggregated
  groupBy(dst) — the textbook 2-shuffle PageRank round. Ranks and edges
  can be pre-bucketed on the same key to drop the join shuffle.
- ranks stay (id: long, rank: long) — 16 bytes/vertex, no floats, no
  Python. The whole loop is JVM column expressions.
- lineage is cut with localCheckpoint every ``checkpoint_every`` rounds
  (same pattern as dedup.connected_components, dedup.py:595).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "pagerank",
    "hits",
    "opic",
    "label_propagation",
    "mirror_hosts",
    "link_farm",
]


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 5,
    scale: int = 10**12,
    damping_pct: int = 85,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Fixed-point PageRank over (vertices, edges).

    Returns (``id_col``, ``rank_scaled``): the PageRank mass of each
    vertex after ``n_iter`` synchronous rounds, as a BIGINT in units of
    ``1/scale``. Multi-edges contribute once each; vertices without
    in-edges keep the teleport base; vertices without out-edges (dangling)
    simply drop their mass — deterministic either way.

    ``checkpoint_every > 0`` truncates lineage with localCheckpoint every
    that many rounds (needed past ~10 rounds; the default 5-round call
    stays a single Catalyst plan).
    """
    n = vertices.count()  # one bounded driver scalar, like dedup's digest
    if n == 0:
        return vertices.select(
            F.col(id_col), F.lit(0).cast("long").alias("rank_scaled")
        )
    init = scale // n
    base = ((100 - damping_pct) * init) // 100

    outdeg = edges.groupBy(src_col).agg(F.count("*").alias("_outdeg"))
    # one up-front join; at scale both sides bucket on src_col
    e = edges.join(outdeg, src_col).select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"), "_outdeg"
    )

    ids = vertices.select(F.col(id_col).alias("_id"))
    ranks = ids.select("_id", F.lit(init).cast("long").alias("_rank"))

    for i in range(n_iter):
        contrib = (
            e.join(ranks, e["_src"] == ranks["_id"])
            .select(
                F.col("_dst"),
                F.expr("_rank div _outdeg").alias("_c"),
            )
            .groupBy("_dst")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = ids.join(contrib, ids["_id"] == contrib["_dst"], "left").select(
            "_id",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(_in, 0L)) div 100")
            ).cast("long").alias("_rank"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)

    return ranks.select(
        F.col("_id").alias(id_col), F.col("_rank").alias("rank_scaled")
    )


def hits(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 3,
    scale: int = 10**9,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Fixed-point HITS (Kleinberg, "Authoritative sources in a
    hyperlinked environment") over (vertices, edges) — the
    mutual-reinforcement counterpart to `pagerank`: a page is a good
    *authority* if good *hubs* link to it, a good hub if it links to
    good authorities. A crawl frontier wants both: pagerank finds
    globally endorsed hosts, HITS surfaces the directory/link-list hubs
    whose outlink sets are the cheapest route to fresh authorities
    (`frontier.crawler`'s authority-aware wave selection can seed from
    either).

    Returns (``id_col``, hub_scaled, auth_scaled) after ``n_iter``
    synchronous rounds, each value a BIGINT in units of ``1/scale``.
    Like `pagerank`, everything is **exact integer arithmetic** so a
    DuckDB unrolled-CTE oracle agrees bit-for-bit: the usual L2
    normalization is float, so each half-round instead L1-normalizes by
    the current total (``x·scale div total``, floor). Multi-edges
    contribute once each (same convention as `pagerank`); isolated
    vertices go to zero after one round.

    Bounds: after any normalization the total mass is ≤ ``scale``, so
    every raw sum is ≤ ``scale`` and the next rescale's product is
    ≤ ``scale²`` — the default ``scale=10^9`` keeps that under 2^63
    with 3 bits to spare. The initial hub mass is ``scale div n``
    (n = vertex count, ONE bounded driver scalar), which also requires
    ``n ≤ scale`` — HITS at web scale runs on the host graph or a root
    set's neighborhood, not 10^10 raw URLs.

    Plan shape per half-round: edges join the current score on one
    endpoint, groupBy the other, then a 1-row total broadcast-joined
    back — at scale the edge table buckets once on each endpoint; the
    only driver-side value is the vertex count. Because the raw sums
    feed TWO consumers (the global normalizer and the rescale), the
    logical plan would double every half-round left unchecked — so each
    half-round's per-vertex aggregate is lineage-truncated with a lazy
    localCheckpoint at that branch point (the standard iterative-graph
    pattern; it materializes one ≤|V|-row table per half-round on
    executor storage and keeps the plan depth constant).
    ``checkpoint_every`` is accepted for API symmetry with `pagerank`
    but redundant here — truncation is structural.
    """
    if scale * scale >= 2**63:
        raise ValueError(f"scale² must fit BIGINT, got scale={scale}")
    n = vertices.count()
    ids = vertices.select(F.col(id_col).alias("_id"))
    if n == 0:
        return ids.select(
            F.col("_id").alias(id_col),
            F.lit(0).cast("long").alias("hub_scaled"),
            F.lit(0).cast("long").alias("auth_scaled"),
        )
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    )
    init = max(1, scale // n)
    hub = ids.select("_id", F.lit(init).cast("long").alias("_s"))

    def _half(scores: DataFrame, key_in: str, key_out: str) -> DataFrame:
        raw = (
            e.join(scores, e[key_in] == scores["_id"])
            .groupBy(key_out)
            .agg(F.sum("_s").alias("_raw"))
        ).localCheckpoint(eager=False)
        total = raw.agg(
            F.greatest(F.lit(1).cast("long"), F.sum("_raw")).alias("_total")
        )
        return (
            ids.join(raw, ids["_id"] == raw[key_out], "left")
            .crossJoin(F.broadcast(total))
            .select(
                "_id",
                F.expr(
                    f"(coalesce(_raw, 0L) * {scale}) div _total"
                ).alias("_s"),
            )
        )

    auth = None
    for i in range(n_iter):
        auth = _half(hub, "_src", "_dst")
        hub = _half(auth, "_dst", "_src")

    return (
        hub.withColumnRenamed("_s", "hub_scaled")
        .join(
            auth.select(
                F.col("_id").alias("_id2"), F.col("_s").alias("auth_scaled")
            ),
            F.col("_id") == F.col("_id2"),
        )
        .select(
            F.col("_id").alias(id_col), "hub_scaled", "auth_scaled"
        )
    )


def opic(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 4,
    scale: int = 10**6,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Fixed-point OPIC — Online Page Importance Computation (Abiteboul,
    Preda & Cobéna, WWW 2003), the importance signal designed to be
    computed *while crawling*: each page holds **cash**, distributing it
    to out-neighbors on visit; the accumulated **history** of cash a
    page has held converges to its importance without waiting for a
    PageRank fixed point. A tiered crawl reads the frontier ordering off
    (history + cash) at ANY round — the "anytime" property PageRank
    lacks, and why OPIC is the classic frontier-prioritization choice
    next to `pagerank` (global endorsement) and `hits` (hub discovery).

    Deterministic synchronous variant, exact integer arithmetic
    (same contract as `pagerank`): every page starts with ``scale``
    cash units; each round, page p first banks its cash into history
    (``hist += cash``), then sends ``cash div outdeg`` to each
    out-neighbor and RETAINS ``cash mod outdeg`` — so total cash is
    conserved *exactly* (floor loss stays on the page), an invariant the
    tests assert. Dangling pages (outdeg 0) retain everything — the
    paper's virtual-root broadcast is replaced by a deterministic
    self-loop, the same dangling convention family as `pagerank`'s
    drop. Multi-edges contribute once each.

    Returns (``id_col``, cash_scaled, hist_scaled, importance_scaled =
    hist + cash) after ``n_iter`` rounds, BIGINT in ``1/scale`` units.

    Bounds: total cash is exactly ``n·scale`` forever (conservation), so
    per-page cash ≤ n·scale and hist ≤ n_iter·n·scale — at n = 10^10
    hosts and scale = 10^6, history stays < 2^63 through ~900 rounds.

    Scale shape: out-degree joins the edges ONCE up front and rides the
    state row, so each round is exactly one hash join (state × edges on
    src) plus one partial-aggregated groupBy(dst) — the same 2-shuffle
    round as `pagerank`, with NO driver-side scalar at all (`pagerank`
    needs a vertex count; OPIC's per-page constant init doesn't), so the
    whole loop is one Catalyst plan. State is (id, od, cash, hist) = 32
    bytes/vertex; ranks and edges pre-bucketed on the id key drop the
    join shuffle. Because state feeds two consumers per round (inflow
    and the retained-cash update), each round lineage-truncates state
    with a lazy localCheckpoint at the branch point (structural, as in
    `hits` — one ≤|V|-row, 32 B/row table per round on executor
    storage); ``checkpoint_every`` is accepted for API symmetry but
    redundant here.
    """
    outdeg = edges.groupBy(src_col).agg(F.count("*").alias("_od"))
    e = edges.join(outdeg, src_col).select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"), "_od"
    )
    ids = vertices.select(F.col(id_col).alias("_id"))
    state = ids.join(
        outdeg.select(F.col(src_col).alias("_id"), "_od"), "_id", "left"
    ).select(
        "_id",
        F.coalesce(F.col("_od"), F.lit(0)).cast("long").alias("_od"),
        F.lit(scale).cast("long").alias("_cash"),
        F.lit(0).cast("long").alias("_hist"),
    )

    for i in range(n_iter):
        # state feeds TWO consumers (inflow and the update), so the
        # logical plan would double per round left unchecked — truncate
        # at the branch point, the same structural pattern as `hits`
        state = state.localCheckpoint(eager=False)
        inflow = (
            e.join(
                state.select(F.col("_id").alias("_sid"), "_cash"),
                e["_src"] == F.col("_sid"),
            )
            .select("_dst", F.expr("_cash div _od").alias("_c"))
            .groupBy("_dst")
            .agg(F.sum("_c").alias("_in"))
        )
        state = state.join(
            inflow, state["_id"] == inflow["_dst"], "left"
        ).select(
            "_id",
            "_od",
            (
                F.when(F.col("_od") > 0, F.expr("_cash % _od")).otherwise(
                    F.col("_cash")
                )
                + F.coalesce(F.col("_in"), F.lit(0).cast("long"))
            ).cast("long").alias("_cash"),
            (F.col("_hist") + F.col("_cash")).cast("long").alias("_hist"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            state = state.localCheckpoint(eager=False)

    return state.select(
        F.col("_id").alias(id_col),
        F.col("_cash").alias("cash_scaled"),
        F.col("_hist").alias("hist_scaled"),
        (F.col("_hist") + F.col("_cash")).cast("long").alias(
            "importance_scaled"
        ),
    )


def label_propagation(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    seed_col: str = "seed",
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 3,
    symmetric: bool = True,
) -> DataFrame:
    """Semi-supervised label propagation over the (host) graph — the
    TrustRank-family spam/trust demotion move (Gyöngyi et al. 2004's
    insight that *spam links to spam, trust links to trust* propagates a
    small editorial seed set over the whole web graph), in the discrete
    clamped-seed form of Zhu & Ghahramani (2002): seeds never change,
    every other node takes the integer MAJORITY VOTE of its neighbors
    each synchronous round. A crawl frontier uses the result to demote
    (label -1) or boost (+1) hosts the seed list never named.

    ``seed_col`` is +1 (trusted) / -1 (spam) / NULL (unlabeled).
    Unlabeled nodes start at 0 and contribute 0 to votes until they take
    a side; a tie (vote sum 0) KEEPS the node's current label — so the
    fixture "two equally strong camps" is stable, not oscillating.
    All-integer, so the whole k-round propagation replays bit-exactly in
    an unrolled-CTE oracle. ``symmetric=True`` votes each directed edge
    both ways (web links are evidence in both directions for spam);
    multi-edges vote once each (the `pagerank` convention).

    Returns (``id_col``, ``seed_col``, label) with label ∈ {-1, 0, +1}
    (0 = never reached by any labeled component).

    Scale shape: per round ONE hash join (state × edges on src) + ONE
    partial-aggregated groupBy(dst) — vote sums are map-side combined,
    so a hub with 10^6 in-links costs its partition count, not its
    degree. State is (id, seed, label) ≈ 17 bytes/vertex; the
    dual-consumer branch (votes + keep-on-tie) lineage-truncates per
    round like `opic`/`hits`. Seeds are typically ~10^4 editorial rows
    against 10^8 hosts — they ride the vertex table, never broadcast.
    """
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    )
    if symmetric:
        e = e.union(
            edges.select(
                F.col(dst_col).alias("_src"), F.col(src_col).alias("_dst")
            )
        )
    state = vertices.select(
        F.col(id_col).alias("_id"),
        F.col(seed_col).cast("long").alias("_seed"),
        F.coalesce(F.col(seed_col).cast("long"), F.lit(0)).alias("_lab"),
    )

    for _ in range(n_iter):
        state = state.localCheckpoint(eager=False)
        votes = (
            e.join(
                state.select(F.col("_id").alias("_vid"), "_lab"),
                e["_src"] == F.col("_vid"),
            )
            .groupBy("_dst")
            .agg(F.sum("_lab").alias("_v"))
        )
        state = state.join(
            votes, state["_id"] == votes["_dst"], "left"
        ).select(
            "_id",
            "_seed",
            F.when(F.col("_seed").isNotNull(), F.col("_seed"))
            .when(F.coalesce(F.col("_v"), F.lit(0)) > 0, F.lit(1))
            .when(F.coalesce(F.col("_v"), F.lit(0)) < 0, F.lit(-1))
            .otherwise(F.col("_lab"))
            .cast("long")
            .alias("_lab"),
        )

    return state.select(
        F.col("_id").alias(id_col),
        F.col("_seed").alias(seed_col),
        F.col("_lab").alias("label"),
    )


def mirror_hosts(
    docs: DataFrame,
    host_col: str = "host",
    fp_col: str = "fp",
    max_hosts_per_fp: int = 64,
    min_shared: int = 2,
    mirror_threshold_permille: int = 800,
) -> DataFrame:
    """Detect mirrored hosts by content-set overlap — host pairs serving
    (near-)identical page sets. Real crawls are full of mirrors (apex vs
    www beyond the static alias map, CDN vanity hosts, ftp-style mirror
    networks); fetching both wastes the politeness budget twice on one
    origin, so crawlers fold mirrors into ONE identity (cf. Bharat &
    Broder, "Mirror, mirror on the Web"). The output's ``host_b →
    host_a`` pairs feed `frontier.canonical.fold_host`'s alias map, the
    same way the reference keys its cache by one canonical URL form
    (folder.go:42-65). Input: one row per captured page with its host
    and content fingerprint (e.g. md5 of the extracted text — exact
    dedup's key, dedup.py:92).

    One row per candidate pair (``host_a < host_b``, at least
    ``min_shared`` shared fingerprints): (host_a, host_b, shared_fps,
    n_fps_a, n_fps_b, containment_permille, is_mirror) where
    ``containment_permille = shared·1000 div min(|A|,|B|)`` — exact
    integer containment of the smaller host in the larger, ≥ threshold
    ⇒ ``is_mirror`` (containment, not Jaccard: a partial mirror that
    carries a subset of the origin is still the same origin).

    Scale/skew design (the LSH-banding argument, dedup.py:202): pairs
    are generated per-fingerprint via a self-join on fp, so the blowup
    is bounded by ``max_hosts_per_fp²`` per fp — and fingerprints shared
    by MORE than ``max_hosts_per_fp`` hosts are dropped outright, which
    is also the right semantics: a fp on hundreds of hosts is template
    boilerplate or an empty page, not mirror evidence (its pairs would
    assert every host mirrors every other). Host sizes still count ALL
    fingerprints — dropped fps can't contribute shared evidence but do
    stay in the denominator, so containment is a conservative lower
    bound for boilerplate-heavy hosts.

    Plan: the page-scale input is read ONCE per join side — sizes are a
    host-partitioned window over the SAME distinct (host, fp) relation
    (not a separate aggregate branch that would re-scan the input), and
    ride the fp-keyed shuffle into the pair groupBy as extra grouping
    keys (functionally dependent on the host keys, so the group is
    unchanged). Both self-join sides are byte-identical subtrees, which
    is exactly what AQE exchange reuse collapses at runtime: one scan,
    then (host,fp)-distinct → host-window → fp-window exchanges each
    computed once, the SMJ reusing the fp partitioning, one pair-keyed
    groupBy on top.
    """
    from pyspark.sql import Window

    hf = docs.select(
        F.col(host_col).alias("_host"), F.col(fp_col).alias("_fp")
    ).distinct()
    elig = (
        hf.withColumn(
            "_n_fps", F.count("*").over(Window.partitionBy("_host"))
        )
        .withColumn("_nh", F.count("*").over(Window.partitionBy("_fp")))
        .filter(F.col("_nh") <= max_hosts_per_fp)
        .drop("_nh")
    )
    a = elig.select(
        F.col("_host").alias("host_a"), "_fp",
        F.col("_n_fps").alias("n_fps_a"),
    )
    b = elig.select(
        F.col("_host").alias("host_b"), "_fp",
        F.col("_n_fps").alias("n_fps_b"),
    )
    pairs = (
        a.join(b, "_fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b", "n_fps_a", "n_fps_b")
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
    containment = F.expr(
        "(shared_fps * 1000) div least(n_fps_a, n_fps_b)"
    )
    return pairs.select(
        "host_a",
        "host_b",
        "shared_fps",
        "n_fps_a",
        "n_fps_b",
        containment.alias("containment_permille"),
        (containment >= mirror_threshold_permille).alias("is_mirror"),
    )


def anchor_text_topk(
    links: DataFrame,
    dst_col: str = "dst",
    anchor_col: str = "anchor",
    k: int = 3,
) -> DataFrame:
    """Anchor-text aggregation — the link-graph ranking signal every web
    index builds (the text OTHER pages use to link to a target describes
    the target better than its own body; classic BM25F anchor field).
    Input: one row per hyperlink (dst, anchor). Output: the top ``k``
    anchors per target by link count, ties broken lexicographically —
    (dst, anchor, n_links, rank).

    Plan: one groupBy(dst, anchor) with map-side partial agg (the raw link
    explosion never re-shuffles), then a per-dst top-k window that
    compiles to WindowGroupLimit — rank never materializes beyond k rows
    per target. At web scale anchors are heavily skewed toward popular
    targets; the pre-aggregation collapses duplicate (dst, anchor) pairs
    BEFORE the window sees them, so hot targets cost |distinct anchors|,
    not |in-links|.
    """
    from pyspark.sql import Window

    agg = links.groupBy(dst_col, anchor_col).agg(F.count("*").alias("n_links"))
    w = Window.partitionBy(dst_col).orderBy(
        F.col("n_links").desc(), F.col(anchor_col)
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 64,
) -> DataFrame:
    """Transitive redirect resolution — collapse 3xx chains to their final
    target before frontier insertion (a crawler that enqueues intermediate
    hops wastes fetches and splits per-URL state across aliases; the
    reference never redirects because sec.gov archive URLs are stable,
    page.go:21-28 — a web frontier cannot assume that).

    ``edges`` holds at most ONE out-edge per ``src`` (HTTP semantics: a
    URL redirects to exactly one location). Returns one row per src:
    (src, target, hops, is_resolved) — target/hops NULL when the chain
    does not reach a terminal within ``max_hops`` (a loop, or longer than
    the cap: browsers give up the same way).

    Plan: pointer doubling (path halving) — ``ceil(log2(max_hops))``
    rounds of self-composition ``S'(x) = S(S(x))`` with exact hop sums,
    each round ONE hash-join shuffle of the (src, cur, hops) state against
    itself. 10^8-long chains would need 27 rounds, real redirect chains
    are < 10 — the log-round shape is what survives 10^10 URLs, never a
    per-hop driver loop (cf. dedup.connected_components, dedup.py:587).
    """
    import math

    rounds = max(1, math.ceil(math.log2(max_hops)))
    state = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("cur"),
        F.lit(1).cast("long").alias("hops"),
    )
    for _ in range(rounds):
        nxt = state.select(
            F.col("src").alias("_nsrc"),
            F.col("cur").alias("_ncur"),
            F.col("hops").alias("_nhops"),
        )
        state = (
            state.join(nxt, state["cur"] == nxt["_nsrc"], "left")
            .select(
                "src",
                F.coalesce("_ncur", "cur").alias("cur"),
                (
                    F.col("hops") + F.coalesce("_nhops", F.lit(0))
                ).alias("hops"),
            )
        )
    srcs = edges.select(F.col(src_col).alias("cur")).distinct().withColumn(
        "_is_src", F.lit(True)
    )
    resolved = F.col("_is_src").isNull()
    return state.join(srcs, "cur", "left").select(
        "src",
        F.when(resolved, F.col("cur")).alias("target"),
        F.when(resolved, F.col("hops")).alias("hops"),
        resolved.alias("is_resolved"),
    )


def host_graph(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst_url"
) -> DataFrame:
    """Contract a page-level link graph to the weighted HOST graph —
    (src_host, dst_host, n_links, n_src_pages, internal).

    The host graph is the web-scale workhorse: 10^10 page edges collapse
    to ~10^8 host pairs, small enough to PageRank cheaply (`pagerank`
    runs unchanged on it — host authority then seeds frontier priority
    for every page on the host) and to drive crawl policy (an `internal`
    self-loop-heavy host is template navigation; cross-host mass is the
    discovery signal).

    Plan: hosts project in codegen from the URL strings; one
    ``groupBy(src_host, dst_host)`` carrying ``count(*)`` plus
    ``count_distinct(src)`` — Spark plans the distinct via a partial agg
    on (pair, src) first, so the raw edge set is collapsed map-side and
    only near-distinct rows shuffle. No joins, nothing driver-resident;
    host-pair skew (every page linking its own nav) is exactly the case
    the (pair, src) pre-aggregation absorbs.
    """
    host_re = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)"
    pairs = edges.select(
        F.lower(F.regexp_extract(F.col(src_col), host_re, 1)).alias("src_host"),
        F.lower(F.regexp_extract(F.col(dst_col), host_re, 1)).alias("dst_host"),
        F.col(src_col).alias("_src"),
    )
    return (
        pairs.groupBy("src_host", "dst_host")
        .agg(
            F.count("*").alias("n_links"),
            F.count_distinct("_src").alias("n_src_pages"),
        )
        .withColumn("internal", F.col("src_host") == F.col("dst_host"))
    )

def link_farm(
    host_edges: DataFrame,
    min_out: int = 20,
    conc_min: int = 5,
    recip_min_permille: int = 500,
) -> DataFrame:
    """Link-farm / reciprocal-link-scheme detection over the HOST graph
    (input = :func:`host_graph` output, or any (src_host, dst_host,
    n_links) edge list). Two classic spam signatures, both integer:

    - **concentration**: many outlinks funneled at few hosts —
      ``out_links div out_hosts >= conc_min`` (a host emitting 1000
      links to 3 targets is selling links; a newspaper emitting 1000
      links to 400 targets is a newspaper);
    - **reciprocity**: link-exchange rings — the fraction of outlinked
      hosts that link straight back, ``recip_hosts * 1000 div
      out_hosts >= recip_min_permille`` (organic link graphs are
      heavily asymmetric; >50% reciprocation at volume is a scheme).

    A host is flagged only above the ``min_out`` evidence floor, so
    small blogs trading links with two friends stay unflagged.

    Plan: self-loops drop first; the back-edge check is a LEFT SEMI
    self-join of the host graph on the reversed pair — host-pair scale
    (~10^8 rows where the page graph has 10^10), hash-partitioned on
    the join key; then ONE groupBy(src_host) with purely additive
    aggregates (map-side partials). Nothing touches page-level data.

    Returns (src_host, out_links, out_hosts, recip_hosts,
    concentration, recip_permille, is_farm).
    """
    ext = host_edges.filter(F.col("src_host") != F.col("dst_host")).select(
        "src_host", "dst_host", "n_links"
    )
    back = ext.select(
        F.col("dst_host").alias("src_host"),
        F.col("src_host").alias("dst_host"),
    )
    flagged = ext.join(
        back, ["src_host", "dst_host"], "left_semi"
    ).select("src_host", "dst_host")
    per_host = (
        ext.groupBy("src_host")
        .agg(
            F.sum("n_links").alias("out_links"),
            F.count("*").alias("out_hosts"),
        )
        .join(
            flagged.groupBy("src_host").agg(
                F.count("*").alias("recip_hosts")
            ),
            "src_host",
            "left",
        )
        .withColumn("recip_hosts", F.coalesce("recip_hosts", F.lit(0)))
    )
    conc = F.expr("out_links div out_hosts")
    recip = F.expr("recip_hosts * 1000 div out_hosts")
    return per_host.select(
        "src_host",
        "out_links",
        "out_hosts",
        "recip_hosts",
        conc.alias("concentration"),
        recip.alias("recip_permille"),
        (
            (F.col("out_links") >= min_out)
            & (
                (conc >= conc_min)
                | (recip >= recip_min_permille)
            )
        ).alias("is_farm"),
    )
