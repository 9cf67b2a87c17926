"""Link-graph analytics tests (operators/graph) + the link-extraction
channel (text.html_links / resolve_link)."""

import pytest
from pyspark.sql import functions as F

from da_transform_judgments_pipeline_spark.operators.graph import pagerank


def _g(spark, nodes, edges):
    return (
        spark.createDataFrame([(n,) for n in nodes], "node long"),
        spark.createDataFrame(edges, "src long, dst long"),
    )


def test_pagerank_hand_computed_and_mass_conserved(spark):
    """Two iterations on a 3-node cycle-with-chord, damping 0.5,
    hand-computed exactly (dyadic arithmetic); total mass is 1 at
    every damping."""
    nodes, edges = _g(
        spark, [0, 1, 2], [(0, 1), (1, 2), (2, 0), (0, 2)]
    )
    # deg: 0→2, 1→1, 2→1. r0 = 1/3 each.
    # it1: m(1) = r0(0)/2 = 1/6; m(2) = r0(0)/2 + r0(1) = 1/2;
    #      m(0) = r0(2) = 1/3
    # rank = 1/6 + 1/2·m → r1 = (1/3, 1/4, 5/12)
    r1 = {r["node"]: r["rank"] for r in
          pagerank(nodes, edges, n_iterations=1, damping=0.5).collect()}
    assert r1 == {0: 1 / 6 + 1 / 2 * (1 / 3),
                  1: 1 / 6 + 1 / 2 * (1 / 6),
                  2: 1 / 6 + 1 / 2 * (1 / 2)}
    out = pagerank(nodes, edges, n_iterations=7, damping=0.85)
    total = out.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9


def test_pagerank_dangling_mass_redistributed(spark):
    """A sink node's rank is redistributed uniformly — mass stays 1 and
    the sink still accumulates rank from its inlinks."""
    nodes, edges = _g(spark, [0, 1, 2], [(0, 2), (1, 2)])  # 2 is a sink
    out = {r["node"]: r["rank"] for r in
           pagerank(nodes, edges, n_iterations=4, damping=0.85).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-9
    assert out[2] > out[0] == out[1]
    # without inlinks AND without outlinks everything is symmetric
    nodes2, edges2 = _g(spark, [0, 1], [])
    out2 = {r["node"]: r["rank"] for r in
            pagerank(nodes2, edges2, n_iterations=3).collect()}
    assert out2[0] == pytest.approx(0.5) and out2[1] == pytest.approx(0.5)


def test_pagerank_personalized_and_convergence(spark):
    """Personalized PageRank: reset mass is biased to the seed set —
    hand-computed one iteration (dyadic: damping 0.5, power-of-two
    weights); a zero-weight node receives mass ONLY through links.
    Convergence early-exit: on a symmetric 2-cycle rank is stationary
    after the first iteration, so tol stops the loop immediately with
    the same result as the full run."""
    nodes, edges = _g(spark, [0, 1, 2], [(0, 1), (1, 2), (2, 0), (0, 2)])
    reset = spark.createDataFrame(
        [(0, 1.0), (1, 1.0)], "node long, weight double"
    )
    # r = (1/2, 1/2, 0); deg: 0→2, 1→1, 2→1; rank_0 = r
    # m(0) = rank(2) = 0; m(1) = rank(0)/2 = 1/4;
    # m(2) = rank(0)/2 + rank(1) = 3/4; dangling = 0
    # rank1 = 0.5·r + 0.5·m → (1/4, 1/4 + 1/8, 3/8)
    got = {r["node"]: r["rank"] for r in pagerank(
        nodes, edges, n_iterations=1, damping=0.5, reset=reset
    ).collect()}
    assert got == {0: 0.25, 1: 0.375, 2: 0.375}
    # mass conserved over more iterations + unnormalized weights
    reset2 = spark.createDataFrame(
        [(0, 3.0), (1, 1.0)], "node long, weight double"
    )
    out = pagerank(nodes, edges, n_iterations=5, damping=0.85,
                   reset=reset2)
    assert abs(out.agg(F.sum("rank")).collect()[0][0] - 1.0) < 1e-9
    with pytest.raises(ValueError, match="positive"):
        pagerank(nodes, edges, reset=spark.createDataFrame(
            [(0, 0.0)], "node long, weight double"
        ))
    # duplicate seed rows ADD weight (never multiply base rows)
    dup_reset = spark.createDataFrame(
        [(0, 0.5), (0, 0.5), (1, 1.0)], "node long, weight double"
    )
    got_dup = pagerank(
        nodes, edges, n_iterations=1, damping=0.5, reset=dup_reset
    ).collect()
    assert len(got_dup) == 3
    assert {r["node"]: r["rank"] for r in got_dup} == got
    # early-exit: 2-cycle is stationary from iteration 1
    n2, e2 = _g(spark, [0, 1], [(0, 1), (1, 0)])
    full = {r["node"]: r["rank"] for r in
            pagerank(n2, e2, n_iterations=9, damping=0.85).collect()}
    early = {r["node"]: r["rank"] for r in
             pagerank(n2, e2, n_iterations=9, damping=0.85,
                      tol=1e-12).collect()}
    assert early == full == {0: pytest.approx(0.5), 1: pytest.approx(0.5)}


def test_weighted_pagerank_and_weight_edges(spark):
    """weight_edges collapses duplicate (src, dst) rows into
    multiplicity weights (merging distinct planted edges that coincide);
    weighted pagerank sends rank proportional to each edge's weight
    share — hand-computed one iteration (dyadic), and unweighted ==
    weight-1 bit-exactly."""
    from da_transform_judgments_pipeline_spark.operators.graph import (
        weight_edges,
    )

    nodes, edges = _g(
        spark, [0, 1, 2],
        # 0 → 1 three times, 0 → 2 once; 1 → 2; 2 → 0
        [(0, 1), (0, 1), (0, 1), (0, 2), (1, 2), (2, 0)],
    )
    w = weight_edges(edges)
    got_w = {(r["src"], r["dst"]): r["weight"] for r in w.collect()}
    assert got_w == {(0, 1): 3.0, (0, 2): 1.0, (1, 2): 1.0, (2, 0): 1.0}
    # W(0)=4: contribs m(1) = r0(0)·3/4 = 1/4; m(2) = r0(0)/4 + r0(1)
    #       = 1/12 + 1/3 = 5/12; m(0) = r0(2) = 1/3
    # rank = 1/6 + 1/2·m → (1/4, 7/24, 3/8 + ... ) hand-compute:
    got = {r["node"]: r["rank"] for r in pagerank(
        nodes, w, n_iterations=1, damping=0.5, weight_col="weight"
    ).collect()}
    assert got == {
        0: 1 / 6 + 1 / 2 * (1 / 3),
        1: 1 / 6 + 1 / 2 * (1 / 4),
        2: 1 / 6 + 1 / 2 * (5 / 12),
    }
    # weight 1.0 everywhere == unweighted, bit-exact
    plain = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 2)], "src long, dst long"
    )
    unw = {r["node"]: r["rank"] for r in pagerank(
        nodes, plain, n_iterations=3, damping=0.5
    ).collect()}
    w1 = {r["node"]: r["rank"] for r in pagerank(
        nodes, plain.withColumn("weight", F.lit(1.0)),
        n_iterations=3, damping=0.5, weight_col="weight",
    ).collect()}
    assert unw == w1


def test_graph_jobs_per_iteration_budget(spark):
    """The d06 exchange-budget idea applied to DRIVER ACTIONS: the
    iterative jobs must stay at a constant action count per iteration
    (PageRank: 1 dangling collect + 1 localCheckpoint; HITS: 1 fused
    normalizer collect + 2 localCheckpoints) — a regression that adds a
    collect per iteration multiplies driver round-trips at 100x the
    edges. Pinned by counting Spark jobs for k=2 vs k=5."""
    from da_transform_judgments_pipeline_spark.operators.graph import hits

    tracker = spark.sparkContext.statusTracker()

    def jobs(fn):
        # job ids are monotonic; COUNTING retained ids breaks in a
        # long session once spark.ui.retainedJobs evicts old entries
        # (len() saturates and deltas go negative) — the id HIGH-WATER
        # delta is eviction-proof
        def high():
            ids = tracker.getJobIdsForGroup(None) or []
            return max(ids) if ids else 0

        before = high()
        fn()
        return high() - before

    # AQE splits one action into a variable number of runtime jobs
    # (±1-2 jitter per action between sessions), so the portable
    # invariant is BOUNDED NEAR-AFFINITY in k: iterations 3→5 may not
    # cost more than 2x the 2→3 delta plus jitter slack — a lineage-
    # truncation regression makes later iterations strictly MORE
    # expensive than earlier ones (superlinear job growth), which this
    # still catches. (Driver ACTIONS per iteration: PageRank 2 =
    # dangling collect + localCheckpoint; HITS 3 = the fused
    # normalizer collect + 2 localCheckpoints, down from 4 pre-fuse.)
    SLACK = 4
    nodes, edges = _g(spark, [0, 1, 2], [(0, 1), (1, 2), (2, 0)])
    j2 = jobs(lambda: pagerank(nodes, edges, n_iterations=2))
    j3 = jobs(lambda: pagerank(nodes, edges, n_iterations=3))
    j5 = jobs(lambda: pagerank(nodes, edges, n_iterations=5))
    per_iter = j3 - j2
    assert per_iter <= 12, (j2, j3)
    assert j5 - j3 <= 2 * per_iter + SLACK, (j2, j3, j5)
    h2 = jobs(lambda: hits(nodes, edges, n_iterations=2))
    h3 = jobs(lambda: hits(nodes, edges, n_iterations=3))
    h5 = jobs(lambda: hits(nodes, edges, n_iterations=5))
    h_per_iter = h3 - h2
    assert h_per_iter <= 30, (h2, h3)
    assert h5 - h3 <= 2 * h_per_iter + SLACK, (h2, h3, h5)


def test_hits_hand_computed_and_normalized(spark):
    """Unnormalized HITS = integer path counts (hand-computed on a
    3-node graph); the normalized variant keeps L1 mass 1 on both
    vectors and ranks the shared target highest."""
    from da_transform_judgments_pipeline_spark.operators.graph import hits

    nodes, edges = _g(spark, [0, 1, 2], [(0, 2), (1, 2), (2, 0)])
    # h0 = 1. a1 = in-degree: a(2)=2, a(0)=1, a(1)=0.
    # h1 = Σ a1 over out-edges: h(0)=a(2)=2, h(1)=2, h(2)=a(0)=1.
    out = {r["node"]: r for r in
           hits(nodes, edges, n_iterations=1, normalize=False).collect()}
    assert (out[0]["authority"], out[1]["authority"],
            out[2]["authority"]) == (1.0, 0.0, 2.0)
    assert (out[0]["hub"], out[1]["hub"], out[2]["hub"]) == (2.0, 2.0, 1.0)
    norm = hits(nodes, edges, n_iterations=4, normalize=True)
    rows = norm.collect()
    assert abs(sum(r["authority"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["hub"] for r in rows) - 1.0) < 1e-9
    # convergence early-exit: once the normalized vectors are
    # stationary, tol stops the loop with the full run's result (this
    # 3-node cycle is stationary well before 12 iterations — r15: was
    # 2×30 iterations, ~80 s of pure per-job floor for the same
    # contract)
    full = {r["node"]: (r["hub"], r["authority"]) for r in
            hits(nodes, edges, n_iterations=12).collect()}
    early = {r["node"]: (r["hub"], r["authority"]) for r in
             hits(nodes, edges, n_iterations=12, tol=1e-12).collect()}
    for k in full:
        assert early[k][0] == pytest.approx(full[k][0], abs=1e-9)
        assert early[k][1] == pytest.approx(full[k][1], abs=1e-9)
    byn = {r["node"]: r["authority"] for r in rows}
    assert byn[2] == max(byn.values())


def test_html_links_and_resolve(spark):
    from da_transform_judgments_pipeline_spark.operators.text import (
        html_links,
        resolve_link,
    )

    df = spark.createDataFrame(
        [(
            "https://h.example/dir/page",
            '<a href="https://a.example/x">1</a>'
            "<a href='/root'>2</a>"
            '<A HREF="//cdn.example/c">3</A>'
            '<a href="#f">4</a><a href="mailto:x@y">5</a>'
            '<a href="relative/path">6</a>'
            '<a data-x="1" href="HTTP://UP.example/">7</a>'
            "<a href=/unquoted/x>8</a>"
            '<img href="/not-an-anchor">',
        )],
        "base string, html string",
    )
    out = df.select(
        F.posexplode(html_links(F.col("html"))).alias("pos", "href")
    ).join(df.select("base")).select(
        "pos", "href",
        resolve_link(F.col("base"), F.col("href")).alias("r"),
    )
    got = {r["pos"]: (r["href"], r["r"]) for r in out.collect()}
    assert got[0] == ("https://a.example/x", "https://a.example/x")
    assert got[1] == ("/root", "https://h.example/root")
    assert got[2] == ("//cdn.example/c", "https://cdn.example/c")
    assert got[3] == ("#f", None)
    assert got[4] == ("mailto:x@y", None)
    assert got[5] == ("relative/path", None)  # default: documented drop
    assert got[6] == ("HTTP://UP.example/", "HTTP://UP.example/")
    # unquoted attribute value (legal HTML): extracted and resolved
    assert got[7] == ("/unquoted/x", "https://h.example/unquoted/x")
    assert len(got) == 8  # the <img href> is not an anchor
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan  # pure Catalyst
    # merge_relative=True: path-relative merges onto the base DIRECTORY
    # (RFC 3986 §5.3); dot segments are left for canonical_url's fold
    merged = df.select(
        resolve_link(
            F.col("base"), F.lit("relative/path"), merge_relative=True
        ).alias("r"),
        resolve_link(
            F.col("base"), F.lit("../up/x"), merge_relative=True
        ).alias("dots"),
        resolve_link(
            F.lit("https://h.example"), F.lit("a"), merge_relative=True
        ).alias("rootless"),
        resolve_link(
            F.col("base"), F.lit("mailto:x@y"), merge_relative=True
        ).alias("still_null"),
        resolve_link(
            F.lit("https://h.example/a/b?x=1"), F.lit("?page=2"),
            merge_relative=True,
        ).alias("qonly"),
        resolve_link(
            F.lit("https://h.example"), F.lit("?p"), merge_relative=True
        ).alias("qroot"),
    ).collect()[0]
    assert merged["r"] == "https://h.example/dir/relative/path"
    assert merged["dots"] == "https://h.example/dir/../up/x"
    # RFC 3986 §5.3: query-only refs keep the FULL base path and swap
    # only the query — not a directory merge
    assert merged["qonly"] == "https://h.example/a/b?page=2"
    assert merged["qroot"] == "https://h.example/?p"
    from da_transform_judgments_pipeline_spark.functions.strings import (
        canonical_url,
    )

    folded = spark.range(1).select(
        canonical_url(F.lit("https://h.example/dir/../up/x")).alias("u")
    ).collect()[0]["u"]
    assert folded == "https://h.example/up/x"  # the downstream fold
    assert merged["rootless"] == "https://h.example/a"
    assert merged["still_null"] is None


def test_bfs_depths_hand_computed(spark):
    from da_transform_judgments_pipeline_spark.operators.graph import (
        bfs_depths,
    )

    # 0→1→2→3→4 chain, 0→3 shortcut, 9 unreachable, 4→0 back-edge (cycle)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3), (4, 0)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["depth"]
           for r in bfs_depths(edges, seeds, max_hops=6).collect()}
    assert got == {0: 0, 1: 1, 3: 1, 2: 2, 4: 2}
    # hop cap truncates; early exit when the frontier drains
    capped = {r["node"]: r["depth"]
              for r in bfs_depths(edges, seeds, max_hops=1).collect()}
    assert capped == {0: 0, 1: 1, 3: 1}
    # multi-seed min-distance
    seeds2 = spark.createDataFrame([(0,), (2,)], "node long")
    got2 = {r["node"]: r["depth"]
            for r in bfs_depths(edges, seeds2, max_hops=6).collect()}
    assert got2 == {0: 0, 2: 0, 1: 1, 3: 1, 4: 2}


def test_pagerank_warm_start_continuation_and_savings(spark):
    """Warm start (round-12): (a) CONTINUATION — on a dyadic graph
    (damping 0.5, power-of-two N and out-degrees, no dangling) the
    warm vector's float sum is exactly 1.0, so warm-starting from a
    3-iteration result and running 3 more is BIT-identical to 6 cold
    iterations; (b) SAVINGS — with tol, a normalized warm start on a
    grown hub-skewed graph (the realistic crawl shape: rank far from
    uniform) converges in fewer iterations than cold, to the same
    fixed point; (c) coverage rules — stale warm nodes drop, new nodes
    seed at the reset value, zero/negative mass is a typed error."""
    nodes, edges = _g(
        spark, [0, 1, 2, 3],
        [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (2, 0)],
    )
    cold6 = {r["node"]: r["rank"] for r in
             pagerank(nodes, edges, n_iterations=6, damping=0.5)
             .collect()}
    half = pagerank(nodes, edges, n_iterations=3, damping=0.5)
    warm6 = {r["node"]: r["rank"] for r in
             pagerank(nodes, edges, n_iterations=3, damping=0.5,
                      initial_ranks=half).collect()}
    assert warm6 == cold6  # bit-identical, not approximately

    # grown hub graph: 32 leaves point at a hub that points back; two
    # NEW leaves join. The warm frame is the old graph's fixed point
    # (computed with the module docstring's arithmetic in plain
    # python — a fixture input, not an expected output); cold restarts
    # from uniform, far from the hub-skewed fixed point.
    N = 32
    old_nodes = list(range(N))
    old_edges = [(i, 0) for i in range(1, N)] + [
        (0, i) for i in range(1, N)
    ]
    prev = {v: 1.0 / N for v in old_nodes}
    for _ in range(120):
        contrib = {v: prev[0] / (N - 1) for v in range(1, N)}
        contrib[0] = sum(prev[i] for i in range(1, N))
        prev = {v: 0.5 / N + 0.5 * contrib[v] for v in old_nodes}
    prev_df = spark.createDataFrame(
        [(v, r) for v, r in prev.items()], "node long, rank double"
    )
    nodes2, edges2 = _g(
        spark, old_nodes + [N, N + 1],
        old_edges + [(N, 0), (N + 1, 0), (0, N)],
    )
    # r15: tol 1e-6 → 1e-4 — the contract (warm converges in strictly
    # fewer iterations than cold, to the same fixed point within 5·tol)
    # is scale-free in tol; the tighter setting bought ~10 more
    # iterations of per-job floor per run and nothing else
    tol = 1e-4
    st_cold: dict = {}
    fixed_cold = {r["node"]: r["rank"] for r in pagerank(
        nodes2, edges2, n_iterations=60, tol=tol, damping=0.5,
        stats=st_cold,
    ).collect()}
    st_warm: dict = {}
    fixed_warm = {r["node"]: r["rank"] for r in pagerank(
        nodes2, edges2, n_iterations=60, tol=tol, damping=0.5,
        initial_ranks=prev_df, stats=st_warm,
    ).collect()}
    assert 0 < st_warm["iterations"] < st_cold["iterations"]
    assert st_warm["l1_delta"] < tol
    assert set(fixed_warm) == set(fixed_cold)
    for n in fixed_cold:
        assert abs(fixed_warm[n] - fixed_cold[n]) < 5 * tol
    assert abs(sum(fixed_warm.values()) - 1.0) < 1e-9

    # stale nodes in the warm frame (node 9 left the graph) drop; a
    # warm frame covering NONE of the nodes degrades exactly to a
    # cold start (coalesce to _r0 then normalize by the exact sum 1)
    stale = spark.createDataFrame([(9, 0.5)], "node long, rank double")
    cold1 = {r["node"]: r["rank"] for r in
             pagerank(nodes, edges, n_iterations=1, damping=0.5)
             .collect()}
    warm1 = {r["node"]: r["rank"] for r in
             pagerank(nodes, edges, n_iterations=1, damping=0.5,
                      initial_ranks=stale).collect()}
    assert warm1 == cold1
    assert 9 not in warm1

    with pytest.raises(ValueError, match="positive total mass"):
        pagerank(
            nodes, edges, n_iterations=1,
            initial_ranks=spark.createDataFrame(
                [(0, 0.0), (1, 0.0), (2, 0.0), (3, 0.0)],
                "node long, rank double",
            ),
        )


def test_pagerank_graph_failed_build_leaves_no_cache(spark):
    """r15 (ADVICE): pagerank_graph persists raw/fan before the typed
    reset-total error can fire — a mid-build failure must unpersist
    them (the shared-graph path builds outside any release() scope)."""
    from da_transform_judgments_pipeline_spark.operators.graph import (
        pagerank_graph,
    )

    nodes, edges = _g(spark, [0, 1], [(0, 1)])
    bad = spark.createDataFrame(
        [(0, 0.0), (1, 0.0)], "node long, weight double"
    )
    cm = spark._jsparkSession.sharedState().cacheManager()
    was_empty = cm.isEmpty()
    with pytest.raises(ValueError, match="positive value"):
        pagerank_graph(nodes, edges, reset=bad)
    assert cm.isEmpty() or not was_empty


def test_pagerank_shared_graph_bit_identical(spark, tmp_path):
    """A shared :class:`PagerankGraph` (r14-opt, guide §1.3) is the
    per-call setup EXTRACTED, so chained calls over one shared setup
    reproduce independent calls bit-exactly: 3 warm-started on 3 ==
    6 cold (the s29 dyadic identity), crawl_wave_graph matches
    crawl_wave_ranks' own per-call build in both scopes, misuse
    (nodes/edges/reset alongside graph) is a typed error, and
    release() leaves every returned frame computable."""
    from da_transform_judgments_pipeline_spark.operators.graph import (
        pagerank_graph,
    )
    from da_transform_judgments_pipeline_spark.streaming.crawl_stream import (
        crawl_wave_graph,
        crawl_wave_ranks,
    )

    nodes, edges = _g(
        spark, [0, 1, 2, 3],
        [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (2, 0)],
    )
    cold6 = {r["node"]: r["rank"] for r in
             pagerank(nodes, edges, n_iterations=6, damping=0.5)
             .collect()}
    g = pagerank_graph(nodes, edges)
    try:
        r3 = pagerank(n_iterations=3, damping=0.5, graph=g)
        warm6 = {r["node"]: r["rank"] for r in
                 pagerank(n_iterations=3, damping=0.5, graph=g,
                          initial_ranks=r3).collect()}
        assert warm6 == cold6  # bit-identical, not approximately
        with pytest.raises(ValueError, match="pagerank_graph"):
            pagerank(nodes, edges, graph=g)
    finally:
        g.release()
    # the result of a released graph stays computable (checkpointed /
    # recomputable plans, no dangling cache reference)
    assert {r["node"]: r["rank"] for r in r3.collect()} == {
        r["node"]: r["rank"]
        for r in pagerank(nodes, edges, n_iterations=3, damping=0.5)
        .collect()
    }

    links = spark.createDataFrame(
        [
            ("p1", "p2"), ("p2", "p1"),
            ("p1", "x1"), ("p1", "x1"),
            ("p2", "x2"),
        ],
        "src string, dst string",
    )
    links.write.parquet(str(tmp_path / "links"))
    for scope in ("seen", "crawled"):
        # r15: 2 iterations prove shared == per-call just as well as 4
        per_call = {r["node"]: r["rank"] for r in crawl_wave_ranks(
            spark, str(tmp_path), damping=0.5, n_iterations=2,
            tol=None, scope=scope,
        ).collect()}
        wg = crawl_wave_graph(spark, str(tmp_path), scope=scope)
        try:
            shared = {r["node"]: r["rank"] for r in crawl_wave_ranks(
                spark, str(tmp_path), damping=0.5, n_iterations=2,
                tol=None, graph=wg,
            ).collect()}
            assert shared == per_call
            with pytest.raises(ValueError, match="crawl_wave_graph"):
                crawl_wave_ranks(
                    spark, str(tmp_path), graph=wg,
                    reset=spark.createDataFrame(
                        [("p1", 1.0)], "node string, weight double"
                    ),
                )
        finally:
            wg.release()

    # empty node set through the shared path: same empty frame
    en, ee = _g(spark, [], [])
    ge = pagerank_graph(en, ee)
    try:
        out = pagerank(n_iterations=2, graph=ge)
        assert out.columns == ["node", "rank"] and out.count() == 0
    finally:
        ge.release()


def test_bfs_seeds_distinct_claim_bit_identical(spark):
    """The pagerank nodes_distinct claim extended to bfs_depths
    (r14-opt, guide §2.1): with already-distinct seeds,
    seeds_distinct=True skips the defensive de-dup Exchange ahead of
    the depth-0 checkpoint (whose leaf forgets partitioning anyway)
    and returns the identical depth map. hits deliberately keeps its
    distinct — there it IS the persisted base's partitioning, reused
    by every per-iteration join."""
    from da_transform_judgments_pipeline_spark.operators.graph import (
        bfs_depths,
    )

    nodes, edges = _g(
        spark, list(range(8)),
        [(i, (i + 1) % 8) for i in range(8)]
        + [(i, (2 * i + 1) % 8) for i in range(8)],
    )
    seeds = nodes.filter(F.col("node").isin(0, 4))
    plain = {r["node"]: r["depth"] for r in
             bfs_depths(edges, seeds, max_hops=3).collect()}
    claimed = {r["node"]: r["depth"] for r in
               bfs_depths(edges, seeds, max_hops=3,
                          seeds_distinct=True).collect()}
    assert claimed == plain and plain[0] == 0 and plain[4] == 0


def test_crawl_wave_ranks_scopes(spark, tmp_path):
    """crawl_wave_ranks over a links sink: scope='seen' ranks link
    TARGETS too (dangling receivers — the one-wave-behind prioritizer
    shape), scope='crawled' ranks the induced subgraph of fetched
    pages only (out-weights count intra-corpus links only); anchor
    multiplicity collapses to edge weights; an invalid scope is a
    typed error."""
    import pytest as _pytest

    from da_transform_judgments_pipeline_spark.streaming.crawl_stream import (
        crawl_wave_ranks,
    )

    links = spark.createDataFrame(
        [
            ("p1", "p2"), ("p2", "p1"),
            ("p1", "x1"), ("p1", "x1"),  # multiplicity 2
            ("p2", "x2"),
        ],
        "src string, dst string",
    )
    links.write.parquet(str(tmp_path / "links"))

    seen = {r["node"]: r["rank"] for r in crawl_wave_ranks(
        spark, str(tmp_path), damping=0.5, n_iterations=4, tol=None
    ).collect()}
    assert set(seen) == {"p1", "p2", "x1", "x2"}
    assert seen["x1"] > seen["x2"] > 0  # weight-2 target outranks

    crawled = {r["node"]: r["rank"] for r in crawl_wave_ranks(
        spark, str(tmp_path), damping=0.5, n_iterations=4, tol=None,
        scope="crawled",
    ).collect()}
    # induced subgraph = the p1<->p2 cycle: uniform 1/2 is its exact
    # fixed point (x edges and their out-weight share drop entirely)
    assert crawled == {"p1": 0.5, "p2": 0.5}

    with _pytest.raises(ValueError, match="scope"):
        crawl_wave_ranks(spark, str(tmp_path), scope="everything")


def test_resolve_redirects_chains_cycles_and_caps(spark):
    """Redirect-chain resolution (round-12, pointer doubling): chains
    collapse to their final landing URL with exact hop counts in
    O(log L) self-joins; cycles and over-cap chains come back
    resolved=false with NULL final/hops (policy — never canonicalize
    onto a cycle member); duplicate redirect rows per source collapse
    deterministically to the bytewise-smallest target."""
    from da_transform_judgments_pipeline_spark.operators.graph import (
        resolve_redirects,
    )

    edges = [
        ("a", "b"), ("b", "c"), ("c", "final"),   # 3-hop chain
        ("solo", "landing"),                        # 1 hop
        ("x", "y"), ("y", "x"),                     # 2-cycle
        ("self", "self"),                           # self-loop
        ("dup", "t2"), ("dup", "t1"),               # duplicate source
    ]
    # a long chain: l0 -> l1 -> ... -> l9 -> done (10 hops)
    edges += [(f"l{i}", f"l{i+1}") for i in range(9)] + [("l9", "done")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["src"]: (r["final"], r["hops"], r["resolved"])
           for r in resolve_redirects(df, max_hops=16).collect()}
    assert got["a"] == ("final", 3, True)
    assert got["b"] == ("final", 2, True)
    assert got["c"] == ("final", 1, True)
    assert got["solo"] == ("landing", 1, True)
    assert got["x"] == (None, None, False)
    assert got["y"] == (None, None, False)
    assert got["self"] == (None, None, False)
    assert got["dup"] == ("t1", 1, True)
    assert got["l0"] == ("done", 10, True)
    assert got["l5"] == ("done", 5, True)
    # the cap is policy: with max_hops=4 the long chain's head is
    # refused while its tail still resolves
    capped = {r["src"]: (r["final"], r["hops"], r["resolved"])
              for r in resolve_redirects(df, max_hops=4).collect()}
    assert capped["l0"] == (None, None, False)
    assert capped["l7"] == ("done", 3, True)
    assert capped["a"] == ("final", 3, True)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_hops"):
        resolve_redirects(df, max_hops=0)
