"""URL canonicalization as UDF-free column expressions.

The reference stores relative hrefs and naively prepends ``baseURL``
(page.go:59, parser.go:384), producing double-slash URLs like
``https://www.sec.gov//Archives/…`` (visible in its own live tests,
parser_test.go:331). Our canonical form resolves site-relative paths,
lowercases scheme+host, strips fragments, and collapses duplicate slashes in
the path — so the reference's URL-seen set maps 1:1 onto ours modulo this
normalization (documented target semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEC_BASE = "https://www.sec.gov"


def canonicalize(url: Column, base: str = SEC_BASE) -> Column:
    absolute = F.when(
        url.startswith("/"), F.concat(F.lit(base), url)
    ).otherwise(url)
    no_frag = F.regexp_replace(absolute, r"#.*$", "")
    # scheme matching is case-insensitive (RFC 3986 §3.1: scheme and host
    # compare case-insensitively) — without (?i), HTTPS://HOST/x would pass
    # through untouched and escape URL-seen dedup of https://host/x. The
    # authority ends at '/', '?', or '#' — [^/]+ alone would swallow (and
    # lowercase) the query string of a path-less URL.
    scheme_host = F.lower(
        F.regexp_extract(no_frag, r"^((?i:https?)://[^/?#]+)", 1)
    )
    rest = F.regexp_extract(no_frag, r"^(?i:https?)://[^/?#]+(.*)$", 1)
    # collapse duplicate slashes in the PATH only; the query string is
    # preserved verbatim (a '?next=https://x//y' value must not be mangled
    # — distinct query URLs would otherwise collapse in URL-seen dedup)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_replace(rest, r"^[^?]*", "")
    rest = F.concat(F.regexp_replace(path, r"//+", "/"), query)
    return F.when(scheme_host == "", no_frag).otherwise(F.concat(scheme_host, rest))


def host_of(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^(?i:https?)://(?:[^/?#@]*@)?([^/?#]+)", 1))


def fold_host(host: Column, aliases: "dict[str, str] | None" = None) -> Column:
    """Politeness IDENTITY of a hostname: strip ``:port``, fold a single
    leading ``www.`` onto the apex, then apply the known-alias map (DNS
    CNAMEs, mirrors, CDN vanity hosts) — so a crawler budgets one origin
    once instead of double-hitting it through every name it answers to.
    Real crawlers consolidate politeness state exactly this way (the
    SURT key above does the same www-fold for the CDX index).

    ``aliases`` maps alias host → canonical host; both sides are
    normalized with the same lowercase/port/www fold, and lookups miss
    to the host itself. The map is config-sized and embeds as a literal
    ``CASE``/map in the plan — pure codegen, no join, no shuffle, and
    the same expression replays in SQL. Alias CHAINS (a→b→c) must be
    pre-flattened (``graph.redirect_resolve`` does transitive pointer
    doubling if a raw CNAME log needs collapsing first).

    The column is lowercased HERE, not assumed pre-lowered: callers
    feed hosts from sources other than :func:`host_of` (e.g. robots
    rule tables carry the hostname verbatim from the robots.txt URL),
    and a case-sensitive www-strip or map lookup would silently miss —
    leaving a Disallow/Crawl-delay rule keyed on a never-matching host.
    """
    h = F.regexp_replace(
        F.regexp_extract(F.lower(host), r"^([^:]*)", 1), r"^www\.", ""
    )
    if aliases:
        def _norm(s: str) -> str:
            s = s.lower().split(":")[0]
            return s[4:] if s.startswith("www.") else s

        flat = {}
        for k, v in aliases.items():
            nk, nv = _norm(k), _norm(v)
            if nk != nv:
                flat[nk] = nv
        if flat:
            mapping = F.create_map(
                *[F.lit(x) for kv in sorted(flat.items()) for x in kv]
            )
            h = F.coalesce(mapping[h], h)
    return h


# Session/click-tracking query params that never change the response —
# utm_* (analytics), the ad-click ids, and the server-session ids. The
# name list is deliberately small and documented; matching is on the
# full param NAME (anchored through '='), never a substring.
TRACKING_PARAM_RE = (
    r"^(utm_[a-z0-9_]*|fbclid|gclid|dclid|msclkid|yclid|igshid|mc_eid|"
    r"mkt_tok|sessionid|phpsessid|jsessionid|sid)="
)


def strip_tracking_params(url: Column) -> Column:
    """URL minus tracking/session params — applied BEFORE URL-seen dedup
    so one page shared through N campaign links costs one fetch instead
    of N (and the dedup bloom holds one key instead of N; at 10^10 URLs
    the utm explosion is a real multiplier). Also strips the classic
    ``;jsessionid=…`` path suffix. Non-tracking params keep their order
    and spelling; a query that strips to nothing loses its ``?``; the
    fragment (kept by this op — `canonicalize` owns fragment policy)
    survives. Pure codegen: regexp extracts + a HOF filter over the
    split query — no UDF, no shuffle, replayed verbatim in the
    ``strip_tracking`` driver oracle.

    The ``;jsessionid`` value match stops at ``&`` as well as ``?``/``#``
    so a marker appearing inside a query VALUE (``?next=/a;jsessionid=X
    &b=1``) cannot swallow the following parameters."""
    u = F.regexp_replace(url, r"(?i);jsessionid=[^?#&]*", "")
    base = F.regexp_extract(u, r"^([^?#]*)", 1)
    query = F.regexp_extract(u, r"^[^?#]*\?([^#]*)", 1)
    frag = F.regexp_extract(u, r"(#.*)$", 1)
    kept = F.array_join(
        F.filter(
            F.split(query, "&"),
            lambda x: ~F.lower(x).rlike(TRACKING_PARAM_RE),
        ),
        "&",
    )
    return F.when(query == "", u).otherwise(
        F.concat(
            base,
            F.when(kept == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), kept)
            ),
            frag,
        )
    )


# Embedded public-suffix subset (seeded from the public PSL,
# publicsuffix.org — the canonical public dataset every crawler ships a
# snapshot of). Deliberately small and documented: common gTLDs/ccTLDs,
# the frequent 2-label registry suffixes, and a few 3-label private
# registries; everything else is covered by the PSL's implicit ``*``
# rule (an unknown last label acts as the public suffix).
_PSL_2 = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "ltd.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.au", "net.au", "org.au",
    "com.br", "net.br", "com.cn", "net.cn", "gov.cn", "com.mx",
    "co.in", "co.kr", "co.za", "com.sg", "com.tw",
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "appspot.com", "cloudfront.net",
)
_PSL_3 = ("s3.amazonaws.com", "compute.amazonaws.com", "k12.ma.us")


def registered_domain(host: Column) -> Column:
    """eTLD+1 (registered domain) under the embedded public-suffix
    subset — the site-level politeness identity real crawlers budget
    by. ``fold_host`` collapses EXPLICIT aliases of one origin;
    ``registered_domain`` collapses sibling subdomains of one SITE
    (``a.example.co.uk`` and ``b.example.co.uk`` → ``example.co.uk``),
    the right key when per-site (not per-origin) crawl budgets, host
    graphs, or dedup scopes are wanted.

    Longest-match PSL semantics: the longest trailing label group in
    the suffix set is the public suffix; the registered domain is that
    suffix plus one preceding label. A host that IS a public suffix
    yields NULL (nothing is registered under it yet). Unknown TLDs use
    the PSL's implicit ``*`` rule — the last label acts as the suffix,
    so ``x.unknowntld`` → ``x.unknowntld``. Everything is anchored
    ``regexp_extract`` + literal ``IN`` over the lowered host — pure
    codegen projections, shuffle-free, replayed verbatim in DuckDB by
    the ``registered_domain`` driver key."""
    h = F.regexp_extract(F.lower(host), r"^([^:]*)", 1)  # strip :port
    t2 = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    t3 = F.regexp_extract(h, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    t4 = F.regexp_extract(h, r"([^.]+\.[^.]+\.[^.]+\.[^.]+)$", 1)
    return (
        F.when(t3.isin(*_PSL_3), F.nullif(t4, F.lit("")))
        .when(t2.isin(*_PSL_2), F.nullif(t3, F.lit("")))
        .otherwise(F.nullif(t2, F.lit("")))
    )


def politeness_bucket(
    url: Column, n_buckets: int, hash_fn: str = "xxhash64"
) -> Column:
    """Salted politeness bucket: EDGAR is a single host, so a plain
    ``hash(host)`` key would send the whole frontier through one reducer.
    Salting by url hash spreads the per-host token accounting across
    ``n_buckets`` partitions (tokens are budgeted per (host, bucket)).

    ``hash_fn='xxhash64'`` (default) is the production path — fastest
    JVM hash. ``hash_fn='md5'`` derives the bucket from the md5-hex
    prefix instead (the engine's replayable-hash convention,
    sketches.py), giving identical bucketing semantics that a second
    engine can reproduce — the driver's ``politeness_bucket`` key
    oracles this mode; the crawl e2e tests cover the xxhash64 mode."""
    if hash_fn == "md5":
        from edgar_spark.operators.sketches import hash60

        return F.pmod(hash60(url), F.lit(n_buckets)).cast("int")
    return F.pmod(F.xxhash64(url), F.lit(n_buckets)).cast("int")


def shard_assign(url: Column, n_shards: int) -> Column:
    """Rendezvous (highest-random-weight) shard assignment: the URL goes
    to the shard with the largest ``hash60(url + '#s' + shard)`` weight
    (Thaler & Ravishankar, "Using name-based mappings to increase hit
    rates"). Unlike ``pmod(hash, n)`` — which remaps ~half the keyspace
    when the fleet resizes — growing or shrinking the fleet by its
    top shard id only moves the URLs owned by the added/removed shard
    (each shard's weight is independent of ``n_shards``), so a
    fetcher-fleet resize doesn't invalidate every node's politeness
    state, DNS cache, and robots cache at once.

    Pure column expression: ``n_shards`` md5 weights per row folded with
    ``array_max`` over (weight, shard) structs — codegen, NO shuffle and
    no explode; ties (a 60-bit collision) break to the larger shard id,
    the struct comparator's order, replayed identically in the oracle.
    Linear in ``n_shards`` per row: right for fleets up to ~10^3; a
    10^4+ fleet wants two rendezvous levels (rack, then node).

    ``hash60`` (md5-prefix, sketches.py) rather than ``xxhash64`` so a
    second engine can replay assignments exactly — this column decides
    WHERE work goes, and a resharding run driven by a different engine
    must agree byte-for-byte or the handoff double-fetches.
    """
    from edgar_spark.operators.sketches import hash60

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    weights = F.array(
        *[
            F.struct(
                hash60(F.concat(url, F.lit(f"#s{i}"))).alias("w"),
                F.lit(i).alias("s"),
            )
            for i in range(n_shards)
        ]
    )
    return F.array_max(weights)["s"].cast("int")


def url_pattern(url: Column) -> Column:
    """Generalized URL shape: lowercased host + path with every digit run
    collapsed to ``N`` (query/fragment dropped). Calendar pages, paginated
    listings, and session-id explosions — the classic spider traps — all
    share one pattern while real content spreads across many."""
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)", 1))
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(host, F.regexp_replace(path, "[0-9]+", "N"))


def surt_key(url: Column) -> Column:
    """Sort-friendly URI Reordering Transform (SURT) key — the Internet
    Archive / Common-Crawl CDX index sort key: host labels lowercased,
    a single leading ``www.`` dropped, labels reversed and comma-joined,
    ``:port`` kept after the labels, then ``)`` + path (empty → ``/``) +
    ``?`` + the query with parameters sorted — so
    ``https://WWW.Example.com/a?b=2&a=1`` and
    ``https://example.com/a?a=1&b=2`` share one key.

    Userinfo (``user:pass@``) is dropped from the authority — real
    SURT/CDX keys never carry it — via the ``(?:[^/?#@]*@)?`` skip shared
    by every authority extraction in this module and ``operators/graph``.

    Pure column expression: splits/reverses/sorts run in codegen, no
    Python — at index-build scale the key costs only the scan it rides.
    The param sort is a plain lexicographic ``array_sort`` over ``&``
    splits; values are not re-encoded (canonicalize() upstream owns
    escaping), which keeps the transform reproducible in ANSI SQL.
    """
    # fragment is stripped FIRST: an unanchored query extract over the
    # raw url would read a '?' inside the fragment as a query string
    # ('/a#sec?tab=1' must key identically to '/a')
    no_frag = F.regexp_extract(url, r"^([^#]*)", 1)
    hostport = F.lower(
        F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)", 1)
    )
    host = F.regexp_replace(F.regexp_extract(hostport, r"^([^:]*)", 1), r"^www\.", "")
    port = F.regexp_extract(hostport, r"(:[0-9]+)$", 1)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.regexp_extract(
        no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        rev,
        port,
        F.lit(")"),
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)),
    )


def cdx_latest(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    digest_col: str = "digest",
) -> DataFrame:
    """CDX-style capture index: collapse a capture log to one row per
    SURT key carrying the LATEST capture plus revisit statistics —
    (surt, url, last_ts, digest, n_captures, n_distinct_digests).
    ``n_distinct_digests`` is the change signal `schedule.recrawl_schedule`
    consumes (1 = static page, ≈n_captures = churning page).

    Plan: one shuffle on the surt key; the latest-pick rank and the
    capture/digest stats share that single Window partitioning — no
    second exchange, no join. (The unordered stats frames defeat Spark's
    WindowGroupLimit rewrite, so all capture rows of a key flow through
    the window — the per-key row count is the page's capture count,
    small by construction.) At 10^10 captures the surt key is
    near-unique per page so there is no skew; a hot key is a recrawl
    storm on ONE page and stays bounded by the politeness budget
    upstream.
    """
    from pyspark.sql import Window

    keyed = captures.select(
        surt_key(F.col(url_col)).alias("surt"),
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("ts"),
        F.col(digest_col).alias("digest"),
    )
    w = Window.partitionBy("surt").orderBy(
        F.col("ts").desc(), F.col("digest").desc(), F.col("url")
    )
    ws = Window.partitionBy("surt")
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_captures", F.count("*").over(ws))
        .withColumn(
            "n_distinct_digests", F.size(F.collect_set("digest").over(ws))
        )
        .filter(F.col("_rn") == 1)
        .select(
            "surt",
            "url",
            F.col("ts").alias("last_ts"),
            "digest",
            "n_captures",
            "n_distinct_digests",
        )
    )


def trap_hosts(
    urls: DataFrame,
    url_col: str = "url",
    min_urls: int = 100,
    share_pct: int = 80,
) -> DataFrame:
    """Spider-trap detection — hosts whose URL space collapses onto one
    generalized pattern (infinite calendars, faceted-search explosions).
    The reference crawls a finite archive (folder.go:120-132) and cannot
    trap; an open-web frontier that doesn't cap these spends its whole
    politeness budget inside one host's infinite subtree.

    A host is flagged when it has ≥ ``min_urls`` URLs and its top pattern
    holds ≥ ``share_pct``% of them (integer arithmetic — exact oracle).
    Output per host: (host, n_urls, n_patterns, top_pattern,
    top_pattern_urls, is_trap).

    Plan: one (host, pattern) partial-agg shuffle, then a per-host window
    whose top-1 compiles to WindowGroupLimit; host-level totals ride the
    same partitioning. Never a distinct over raw URLs.
    """
    from pyspark.sql import Window

    host = F.lower(
        F.regexp_extract(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)", 1)
    )
    pat = urls.select(
        host.alias("host"), url_pattern(F.col(url_col)).alias("pattern")
    )
    per_pat = pat.groupBy("host", "pattern").agg(F.count("*").alias("n"))
    w = Window.partitionBy("host").orderBy(F.col("n").desc(), "pattern")
    top = (
        per_pat.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_urls", F.sum("n").over(Window.partitionBy("host")))
        .withColumn(
            "n_patterns", F.count("*").over(Window.partitionBy("host"))
        )
        .filter(F.col("_rn") == 1)
    )
    return top.select(
        "host",
        "n_urls",
        "n_patterns",
        F.col("pattern").alias("top_pattern"),
        F.col("n").alias("top_pattern_urls"),
        (
            (F.col("n_urls") >= min_urls)
            & (F.col("n") * 100 >= F.lit(share_pct) * F.col("n_urls"))
        ).alias("is_trap"),
    )
