"""Link-graph analytics over a crawled corpus — the ranking half of a
crawl pipeline (discovery finds pages; the link graph decides which are
worth keeping/fetching first). Public algorithms only: PageRank (Brin &
Page 1998) with damping + uniform dangling-mass redistribution, and the
degree surfaces a corpus report reads.

Spark-first shape: the classic iterative DataFrame job — each iteration
is one join (ranks onto the out-degree-annotated edge list), one
map-side division, one shuffle on the destination (the partial-agg sum
of contributions), and a left join back onto the node set. The driver
holds only k (the iteration count); the dangling-mass and
normalization scalars stay IN-PLAN as 1-row broadcast aggregates
(r13 — per-iteration driver collects serialized a second job each
round), and ranks are localCheckpoint'ed each round so the plan never
grows (the d05 label-propagation lineage rule). At 100 TB this is
exactly the GraphX/Pregel data layout without the RDD API."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame, src: str = "src") -> DataFrame:
    """(src, out_deg) — one shuffle, reused across every iteration."""
    return edges.groupBy(src).agg(F.count("*").alias("out_deg"))


def weight_edges(edges: DataFrame, src_col: str = "src",
                 dst_col: str = "dst") -> DataFrame:
    """Collapse duplicate (src, dst) rows into one WEIGHTED edge
    (weight = multiplicity) — the natural reduction of a crawl's
    ``out/links`` sink (a page linking a target three times votes
    three times) and the input shape for
    :func:`pagerank` ``weight_col="weight"``. One shuffle, and the
    weighted graph is |distinct pairs| instead of |anchors|."""
    return edges.groupBy(src_col, dst_col).agg(
        F.count("*").cast("double").alias("weight")
    )


class PagerankGraph:
    """Precomputed, persisted :func:`pagerank` setup — the node base
    (seeded with the reset distribution and the has-out-edges flag)
    and the degree-annotated edge fan. Build it once via
    :func:`pagerank_graph` and pass it to several ``pagerank(...,
    graph=...)`` calls that differ only in ``initial_ranks`` /
    ``damping`` / iteration budget (the crawl loop's chained
    warm-start shape ranks the SAME accreted graph twice per wave —
    rebuilding the weighted-edge collapse, node union and seeded base
    per call is pure duplicate work, r14-opt guide §1.3). The frames
    are persisted; call :meth:`release` after the last consuming call
    has materialized its result."""

    __slots__ = ("raw", "n", "fan", "base", "_extra")

    def __init__(self, raw, n, fan, base, extra=()):
        self.raw = raw
        self.n = n
        self.fan = fan
        self.base = base
        self._extra = list(extra)

    def adopt(self, df: DataFrame) -> None:
        """Tie another persisted frame's lifetime to this setup —
        :meth:`release` will unpersist it too (crawl_wave_graph pins
        the weighted-edge frame the setup's subtrees scan)."""
        self._extra.append(df)

    def release(self) -> None:
        """Unpersist every frame this setup pinned (idempotent)."""
        for df in (self.fan, self.base, self.raw, *self._extra):
            if df is not None:
                df.unpersist()


def pagerank_graph(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    reset: DataFrame | None = None,
    weight_col: str | None = None,
    nodes_distinct: bool = False,
) -> PagerankGraph:
    """Build :class:`PagerankGraph` for :func:`pagerank` ``graph=`` —
    parameters exactly as there. The arithmetic is identical to the
    inline setup (this IS the former setup, extracted), so sharing a
    graph across calls is bit-exact versus rebuilding it per call."""
    # ONE pass over the caller's node derivation (r14-opt, guide §1.3
    # duplicate work / §5 driver): ``nodes.count()`` used to execute
    # the node subtree once for the scalar and the persisted ``base``
    # re-executed it at first materialization — for crawl_wave_ranks
    # that subtree is a parquet read + weight agg + union + distinct.
    # Persisting the raw projection first makes the count materialize
    # the cache; everything below (distinct, seed/flag joins) scans
    # memory. ``n`` still counts RAW input rows (duplicates included),
    # bit-identical to the former ``nodes.count()``.
    raw = nodes.select(F.col(node_col).alias("node")).persist()
    # r15 (ADVICE): a mid-build failure (e.g. the typed reset-total
    # error below, raised AFTER raw/fan are persisted) must not leak
    # the already-persisted frames in the cache — the shared-graph
    # path builds outside any caller release() scope.
    try:
        return _pagerank_graph_body(
            raw, edges, src_col, dst_col, reset, weight_col,
            nodes_distinct,
        )
    except BaseException:
        raw.unpersist()
        raise


def _pagerank_graph_body(
    raw, edges, src_col, dst_col, reset, weight_col, nodes_distinct
) -> PagerankGraph:
    n = raw.count()
    if n == 0:
        return PagerankGraph(raw, 0, None, None)
    if weight_col is not None:
        deg = edges.groupBy(src_col).agg(
            F.sum(weight_col).alias("out_deg")
        )
        fan_src = edges.select(
            F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"),
            F.col(weight_col).alias("_w"),
        )
    else:
        deg = out_degrees(edges, src_col)
        fan_src = edges.select(
            F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"),
            F.lit(1.0).alias("_w"),
        )
    fan = fan_src.join(
        deg.select(
            F.col(src_col).alias("_src"), "out_deg"
        ),
        "_src",
    ).persist()  # scanned every iteration: pay the join once
    try:
        return _pagerank_graph_base(
            raw, n, fan, deg, src_col, reset, nodes_distinct
        )
    except BaseException:
        fan.unpersist()
        raise


def _pagerank_graph_base(
    raw, n, fan, deg, src_col, reset, nodes_distinct
) -> PagerankGraph:
    # nodes_distinct=True is the caller's claim that the node frame
    # carries no duplicate rows (crawl_wave_ranks passes .distinct()
    # outputs; the registry fixtures key on unique doc_ids), dropping
    # the defensive distinct — one Exchange + one shuffle stage per
    # call on a set that is identical either way (r14-opt, guide §2.1)
    base = raw if nodes_distinct else raw.distinct()
    if reset is not None:
        # sum per node first: duplicate seed rows must add weight, not
        # multiply base rows through the left join
        seeds = reset.groupBy("node").agg(F.sum("weight").alias("_w"))
        total = seeds.agg(F.sum("_w")).collect()[0][0]
        if not total or total <= 0:
            raise ValueError("reset weights must sum to a positive value")
        base = base.join(
            seeds.select("node", (F.col("_w") / total).alias("_r0")),
            "node", "left",
        ).select("node", F.coalesce("_r0", F.lit(0.0)).alias("_r0"))
    else:
        base = base.withColumn("_r0", F.lit(1.0 / n))
    # fold the has-out-edges flag INTO the node frame once (r14-opt):
    # the per-iteration dangling mass used to be an anti-join of the
    # full rank vector against the out-degree set — a join per
    # iteration at any scale. With ``_ho`` riding the rank rows the
    # dangling mass is a filter+agg over the just-checkpointed leaf;
    # the summed set is identical, so dyadic oracles are bit-exact.
    base = base.join(
        deg.select(
            F.col(src_col).alias("node"), F.lit(True).alias("_ho")
        ),
        "node", "left",
    ).select(
        "node", "_r0", F.coalesce("_ho", F.lit(False)).alias("_ho")
    )
    base = base.persist()
    return PagerankGraph(raw, n, fan, base)


def pagerank(
    nodes: DataFrame | None = None,
    edges: DataFrame | None = None,
    n_iterations: int = 10,
    damping: float = 0.85,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    tol: float | None = None,
    reset: DataFrame | None = None,
    weight_col: str | None = None,
    initial_ranks: DataFrame | None = None,
    stats: dict | None = None,
    nodes_distinct: bool = False,
    graph: PagerankGraph | None = None,
) -> DataFrame:
    """PageRank over (nodes, edges): rank_0 = r; per iteration
    rank'(v) = (1-d)·r(v) + d·(Σ_{u→v} rank(u)/out_deg(u) +
    dangling·r(v)) where ``dangling`` is the rank mass sitting on nodes
    with no out-edges (redistributed along the reset distribution — the
    standard correction; drop it and total mass leaks). ``r`` is
    uniform 1/N by default; pass ``reset`` (node, weight — weights are
    normalized here) for PERSONALIZED PageRank (Page et al. 1999 §6:
    random-walk-with-restart biased to the seed set; nodes absent from
    ``reset`` get r=0 and receive mass only through links). Returns
    (node, rank) with Σrank = 1.

    ``tol``: optional convergence early-exit — stop when the L1 delta
    Σ|rank'-rank| falls below it (one extra scalar aggregate per
    iteration, only when enabled); ``n_iterations`` stays the hard cap.

    ``initial_ranks``: optional WARM START — a (node, rank) frame,
    typically the PREVIOUS wave's output on a graph that has since
    grown. rank_0(v) = its rank (duplicates sum); nodes absent from it
    start at the reset value r(v); the assembled vector is then
    L1-NORMALIZED to mass 1. The normalization matters: the iteration
    is an affine contraction with a unique fixed point, but a mass
    excess (new nodes' seeds on top of a sum-1 warm vector) decays at
    exactly rate d — the same rate as the cold-start error — so an
    unnormalized warm start saves nothing (measured: 12 cold vs 14
    "warm" on a 33%-grown toy). Normalized, the remaining error is the
    GROWTH perturbation, not the uniform-to-fixed-point distance, and
    with ``tol`` a hub-skewed grown graph converges in measurably
    fewer iterations (re-ranking from uniform every crawl wave wastes
    most of them — the round-11 prioritizer gap). Continuation is
    exact: warm-starting from a k-iteration result of the SAME graph
    and running m more reproduces k+m cold iterations (bit-identical
    whenever the warm vector's float sum is exactly 1.0 — guaranteed
    on the dyadic oracle graphs, ~1 ulp otherwise).

    ``stats``: optional dict, filled on return with ``iterations``
    (executed count) and ``l1_delta`` (last measured delta, None when
    ``tol`` is off) — the warm-start savings are measurable.

    ``nodes_distinct``: the caller's claim that ``nodes`` has no
    duplicate rows, which skips the defensive de-dup (one Exchange per
    call). The ranked set is identical either way; duplicates with the
    flag wrongly set would double base rows through the seed join.

    ``weight_col``: optional WEIGHTED edges — each out-edge carries
    rank ∝ its weight share of the source's total outgoing weight
    (contribution = rank·w/W(u) instead of rank/out_deg(u)); feed
    :func:`weight_edges` output to rank a crawl's link graph by anchor
    multiplicity. Dyadic exactness extends: integer weights whose
    per-source SUM is a power of two keep w/W exact (the g04 oracle).

    Determinism note for oracles: with ``damping=0.5`` and power-of-two
    N and out-degrees, every intermediate is a dyadic rational well
    inside double precision, so two engines agree BIT-exactly no matter
    their summation order — the g01 driver query pins the operator that
    way (g03 the personalized form, power-of-two reset weights), while
    production keeps the usual 0.85.

    ``graph``: optional precomputed setup from :func:`pagerank_graph`
    (r14-opt, guide §1.3) — skips the node count, edge-fan build and
    seed normalization entirely, so chained calls over the same graph
    (warm-start waves) pay the setup once. ``nodes``/``edges``/
    ``reset`` must be omitted with it (they are encoded in the graph,
    as are ``weight_col``/``nodes_distinct``); the caller owns the
    graph's :meth:`PagerankGraph.release`.

    Each iteration: one broadcast-free join of ranks onto the
    PERSISTED degree-annotated edge list (built once — both sides
    hash-partition on ``src``), a map-side division, a partial-agg sum
    shuffled on ``dst``, and a left join back to the node set; the
    dangling mass is a 1-row aggregate BROADCAST into the update
    (r13 — formerly a driver-side scalar collect that serialized a
    second job per iteration), so each iteration without ``tol`` is
    exactly ONE Spark action. ``localCheckpoint`` keeps lineage
    constant across iterations."""
    own = graph is None
    if own:
        if nodes is None or edges is None:
            raise ValueError("pagerank needs nodes and edges, or graph")
        graph = pagerank_graph(
            nodes, edges, node_col=node_col, src_col=src_col,
            dst_col=dst_col, reset=reset, weight_col=weight_col,
            nodes_distinct=nodes_distinct,
        )
    elif nodes is not None or edges is not None or reset is not None:
        raise ValueError(
            "pagerank(graph=...) encodes nodes/edges/reset already — "
            "pass them to pagerank_graph instead"
        )
    if stats is not None:
        stats["iterations"] = 0
        stats["l1_delta"] = None
    if graph.n == 0:
        if own:
            graph.release()
        return graph.raw.select("node", F.lit(0.0).alias("rank"))
    fan, base = graph.fan, graph.base
    if initial_ranks is not None:
        # duplicate warm rows add (the reset-seeds rule); stale nodes
        # no longer in the graph drop via the inner base join; NEW
        # nodes (absent from the warm frame) start at their reset
        # value. Checkpointed: detached from whatever files/plan the
        # caller's previous wave left behind.
        warm = initial_ranks.groupBy("node").agg(
            F.sum("rank").alias("_ir")
        )
        warmed = base.join(warm, "node", "left").select(
            "node",
            F.coalesce(F.col("_ir"), F.col("_r0")).alias("_raw"),
            "_ho",
        )
        mass = warmed.agg(F.sum("_raw")).collect()[0][0]
        if not mass or mass <= 0:
            raise ValueError(
                "initial_ranks must carry positive total mass"
            )
        ranks = (
            warmed.select(
                "node", (F.col("_raw") / F.lit(mass)).alias("rank"),
                "_ho",
            )
            .localCheckpoint(eager=True)
        )
    else:
        ranks = base.select("node", F.col("_r0").alias("rank"), "_ho")
    try:
        for _it in range(n_iterations):
            if stats is not None:
                stats["iterations"] = _it + 1
            # the dangling mass stays IN-PLAN (r13): a 1-row aggregate
            # broadcast into the rank update, so the iteration runs as
            # ONE Spark action (the eager checkpoint below) instead of
            # a driver-side scalar collect serializing a second job —
            # arithmetically identical to the former F.lit(dangling).
            # r14-opt: a filter on the carried _ho flag, not an
            # anti-join — same summed set, one less join per iteration
            dangling = (
                ranks.filter(~F.col("_ho"))
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
            )
            contribs = (
                fan.join(
                    ranks.withColumnRenamed("node", "_src"), "_src"
                )
                .select(
                    F.col("_dst").alias("node"),
                    # weighted share; _w is exactly 1.0 when unweighted
                    # (multiplying by 1.0 is bit-exact, so the g01
                    # oracle is unaffected)
                    (F.col("rank") * F.col("_w") / F.col("out_deg"))
                    .alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("m"))
            )
            new_ranks = (
                base.join(contribs, "node", "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "node",
                    (
                        F.lit(1.0 - damping) * F.col("_r0")
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("m"), F.lit(0.0))
                            + F.col("_dm") * F.col("_r0")
                        )
                    ).alias("rank"),
                    "_ho",
                )
                .localCheckpoint(eager=True)
            )
            if tol is not None:
                delta = (
                    new_ranks.join(
                        ranks.withColumnRenamed("rank", "_prev"), "node"
                    )
                    .agg(F.sum(F.abs(F.col("rank") - F.col("_prev"))))
                    .collect()[0][0]
                )
                ranks = new_ranks
                if stats is not None:
                    stats["l1_delta"] = delta
                if delta is not None and delta < tol:
                    break
            else:
                ranks = new_ranks
    finally:
        if own:
            graph.release()
    return ranks.drop("_ho")


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    n_iterations: int = 10,
    normalize: bool = True,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    tol: float | None = None,
) -> DataFrame:
    """HITS (Kleinberg 1999) hubs-and-authorities over (nodes, edges):
    per iteration ``auth(v) = Σ_{u→v} hub(u)`` then
    ``hub(u) = Σ_{u→v} auth(v)``, both starting at 1. Returns
    (node, hub, authority). ``tol``: optional convergence early-exit —
    stop when the combined L1 delta of both vectors falls below it
    (one extra scalar action per iteration, meaningful with
    ``normalize=True``; raw sums grow without bound).

    ``normalize=True`` (production) L1-normalizes both vectors each
    iteration — float division, the usual form. ``normalize=False``
    keeps the RAW sums: after k iterations ``authority(v)`` is the
    INTEGER count of directed paths of a fixed alternating shape ending
    at v, exactly representable and engine-order-independent — the g02
    oracle trick (the g01 dyadic-damping idea, integer edition; DuckDB
    recomputes via unrolled join/aggregate CTEs). Each iteration is two
    hash-partitioned join+agg shuffles; lineage is truncated per round
    like :func:`pagerank`.

    No ``nodes_distinct`` escape here, deliberately (r14-opt,
    measured): unlike :func:`pagerank` — whose base is node-
    partitioned by its seed/flag joins regardless — this distinct IS
    what leaves the persisted base hash-partitioned on ``node``, and
    every per-iteration join reuses that Exchange; dropping it pushes
    a fresh Exchange into each consumer (plan evidence:
    plans/r14/g02_hits_{after,s4after}.txt, 10 → 15 Exchanges)."""
    base = nodes.select(F.col(node_col).alias("node")).distinct().persist()
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).persist()  # scanned twice per iteration: pay the read once
    hubs = base.withColumn("hub", F.lit(1.0))
    auths = base.withColumn("authority", F.lit(1.0))
    prev_auths = prev_hubs = None
    # r14-opt: with normalize=False and no tol (the integer path-count
    # regime) the auth vector is referenced exactly ONCE per iteration
    # (by the hub update) and once by the final join, so checkpointing
    # it buys nothing — keep it LAZY and halve the per-iteration
    # actions (2 → 1). Plan depth stays constant (each hub checkpoint
    # nests one lazy auth hop), and the values are bit-identical:
    # integer sums are summation-order independent, so the final
    # join's re-evaluation of auth_n agrees with the hub chain's. The
    # normalized/tol paths keep the eager checkpoint — their per-
    # iteration scalar aggregates and float division orders must read
    # one materialized vector.
    lazy_auths = not normalize and tol is None
    try:
        for _ in range(n_iterations):
            a = (
                e.join(hubs.withColumnRenamed("node", "src"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("hub").alias("authority"))
            )
            auths = base.join(a, "node", "left").select(
                "node",
                F.coalesce("authority", F.lit(0.0)).alias("authority"),
            )
            if not lazy_auths:
                auths = auths.localCheckpoint(eager=True)
            h = (
                e.join(auths.withColumnRenamed("node", "dst"), "dst")
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum("authority").alias("hub"))
            )
            hubs = base.join(h, "node", "left").select(
                "node", F.coalesce("hub", F.lit(0.0)).alias("hub")
            ).localCheckpoint(eager=True)
            if normalize:
                # the normalizers stay IN-PLAN (r13): one 1-row frame
                # (two scalar aggs over the just-checkpointed RAW
                # vectors, cross-joined) broadcast into both divisions
                # — no driver collect; each iteration runs as exactly
                # the two checkpoint actions. The raw updates are
                # checkpointed (not the normalized views) so the next
                # iteration's scans re-derive only a cheap scalar agg
                # + division over materialized rows.
                norms = (
                    auths.agg(F.sum("authority").alias("_a"))
                    .crossJoin(hubs.agg(F.sum("hub").alias("_h")))
                    .select(
                        F.when(
                            F.col("_a").isNull() | (F.col("_a") == 0.0),
                            F.lit(1.0),
                        ).otherwise(F.col("_a")).alias("_a"),
                        F.when(
                            F.col("_h").isNull() | (F.col("_h") == 0.0),
                            F.lit(1.0),
                        ).otherwise(F.col("_h")).alias("_h"),
                    )
                )
                auths = auths.crossJoin(F.broadcast(norms)).select(
                    "node",
                    (F.col("authority") / F.col("_a")).alias("authority"),
                )
                hubs = hubs.crossJoin(F.broadcast(norms)).select(
                    "node", (F.col("hub") / F.col("_h")).alias("hub")
                )
            if tol is not None and prev_auths is not None:
                # combined L1 delta over both vectors, ONE action
                delta = (
                    auths.join(
                        prev_auths.withColumnRenamed("authority", "_p"),
                        "node",
                    )
                    .agg(
                        F.sum(
                            F.abs(F.col("authority") - F.col("_p"))
                        ).alias("_d")
                    )
                    .crossJoin(
                        hubs.join(
                            prev_hubs.withColumnRenamed("hub", "_q"),
                            "node",
                        ).agg(
                            F.sum(
                                F.abs(F.col("hub") - F.col("_q"))
                            ).alias("_e")
                        )
                    )
                    .select((F.col("_d") + F.col("_e")).alias("_t"))
                    .collect()[0]["_t"]
                )
                if delta is not None and delta < tol:
                    break
            prev_auths, prev_hubs = auths, hubs
    finally:
        base.unpersist()
        e.unpersist()
    return hubs.join(auths, "node").select("node", "hub", "authority")


def bfs_depths(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    seeds_distinct: bool = False,
) -> DataFrame:
    """Minimum hop distance from a seed set — crawl DEPTH, the classic
    frontier-control signal (Mercator/Heritrix cap crawls by hops from
    the seeds; "crawl depth" is also a standard quality prior: pages
    far from any seed are disproportionately spam/calendar traps).

    Level-synchronous BFS as iterative DataFrames: each hop expands the
    CURRENT frontier along the edge list (one join), dedups the
    frontier (one aggregate), and anti-joins the already-visited set —
    so per-hop cost tracks the frontier, not the graph, and the driver
    holds only the hop counter and an is-empty scalar (early exit when
    the frontier drains before ``max_hops``).  The visited set is
    localCheckpoint'ed per hop (the pagerank lineage rule: plans must
    not grow with iteration count).  Unreachable nodes are simply
    absent from the result — at 100 TB you never materialize
    "everything minus reached".

    Returns (node, depth): depth 0 = seed rows themselves.

    ``seeds_distinct``: the caller's claim that ``seeds`` carries no
    duplicate rows, skipping the defensive de-dup (one Exchange per
    call — the :func:`pagerank` flag, r14-opt guide §2.1); the depth
    map is identical either way, but duplicates with the flag wrongly
    set would emit duplicate depth-0 rows."""
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).persist()
    try:
        visited = seeds.select(F.col(node_col).alias("node"))
        if not seeds_distinct:
            visited = visited.distinct()
        visited = (
            visited.withColumn("depth", F.lit(0))
            .localCheckpoint(eager=True)
        )
        frontier = visited
        for hop in range(1, max_hops + 1):
            nxt = (
                frontier.join(e, frontier["node"] == e["_s"])
                .select(F.col("_d").alias("node"))
                .distinct()
                .join(visited.select("node"), "node", "left_anti")
                .withColumn("depth", F.lit(hop))
            )
            nxt = nxt.localCheckpoint(eager=True)
            if nxt.isEmpty():
                break
            # the visited set is a UNION of already-checkpointed hop
            # leaves — re-materializing the whole accumulated set every
            # hop (r13 shape) re-copied hop 1's rows max_hops times.
            # Lazy union keeps the anti-join probe side a flat union of
            # ≤max_hops leaf relations (bounded, never re-derived) and
            # drops one full-set materialization per hop (r14-opt,
            # guide §1.2: don't recompute what you already hold).
            visited = visited.unionByName(nxt)
            frontier = nxt
    finally:
        e.unpersist()
    return visited


def resolve_redirects(
    edges: DataFrame,
    max_hops: int = 16,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Collapse HTTP redirect CHAINS to their final landing URL — the
    crawl-maintenance pass over the stream's ``out/redirects`` sink
    (a 301 at ``a`` pointing to ``b`` which 301s to ``c`` means every
    edge, index entry and dedup decision about ``a`` should really
    attach to ``c``; search engines follow up to ~10 hops then give
    up, the ``max_hops`` policy here).

    POINTER DOUBLING, not a per-hop walk: with f(v) = v's redirect
    target (identity elsewhere), each round joins the mapping with
    itself to compose f^(2^k) — a length-L chain resolves in ⌈log2 L⌉
    self-joins instead of L sequential ones, so at 100 TB the job is
    ~5 hash joins regardless of chain length, each localCheckpoint'ed
    (constant lineage, the pagerank rule). Duplicate redirect rows per
    source collapse to the bytewise-smallest target first
    (deterministic).

    Returns one row per redirecting URL: ``(src, final, hops,
    resolved)``. ``resolved`` is false for cycles (a → b → a never
    leaves the redirect set) and for chains longer than ``max_hops``;
    those rows carry NULL final/hops — policy, not best-effort, so a
    consumer can't accidentally canonicalize onto a cycle member."""
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    import math

    ptr = (
        edges.groupBy(F.col(src_col).alias("src"))
        .agg(F.min(dst_col).alias("next"))
        .withColumn("hops", F.lit(1).cast("long"))
        .localCheckpoint(eager=True)
    )
    rounds = max(1, math.ceil(math.log2(max_hops)) + 1)
    for _ in range(rounds):
        hop = ptr.select(
            F.col("src").alias("_s"),
            F.col("next").alias("_n"),
            F.col("hops").alias("_h"),
        )
        ptr = (
            ptr.join(hop, ptr["next"] == hop["_s"], "left")
            .select(
                "src",
                F.coalesce("_n", "next").alias("next"),
                (
                    F.col("hops") + F.coalesce(F.col("_h"), F.lit(0))
                ).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
    # a projection of the checkpointed ptr leaf — no separate
    # materialization needed (r14-opt: this eager checkpoint re-copied
    # the full pointer table once per call)
    srcs = ptr.select(F.col("src").alias("_rsrc"))
    out = ptr.join(srcs, ptr["next"] == srcs["_rsrc"], "left").select(
        "src",
        (
            F.col("_rsrc").isNull() & (F.col("hops") <= max_hops)
        ).alias("resolved"),
        F.col("next").alias("_final"),
        F.col("hops").alias("_hops"),
    )
    return out.select(
        "src",
        F.when(F.col("resolved"), F.col("_final")).alias("final"),
        F.when(F.col("resolved"), F.col("_hops")).alias("hops"),
        "resolved",
    )
