"""Embedding clustering: Lloyd's k-means as iterative DataFrame plans.

Beyond-reference LLM-pipeline operator (COVERAGE.md §LLM): clustering for
corpus curation — diversity sampling, topic balancing, per-cluster quality
cuts. The reference has no clustering; this is the idiomatic-Spark design:

- Centroids live DRIVER-SIDE (k·dim doubles — bytes, not data): the
  assignment step compiles them into a single literal expression, so
  assigning 10^9 rows is a MAP-SIDE pass with no join and no shuffle.
  This is the same structure MLlib's KMeans uses (collect-to-driver
  centroid update loop), re-expressed as pure DataFrame ops.
- One narrow shuffle per iteration for the centroid update
  (groupBy(cluster, dim) partial-agg), collecting only k·dim aggregates.
- Iterations are bounded and each materializes only k·dim values; the
  big table is scanned once per iteration — O(iterations · n · k · dim)
  flops, embarrassingly parallel.

Determinism contract (oracle-checkable): with `reproducible=True` the
centroid update folds member values in id order (sort_array(collect_list)
+ sequential aggregate), so the result is bit-identical across runs,
partitionings, AND engines — DuckDB's list(... ORDER BY id) +
list_reduce performs the exact same IEEE-754 double fold. With
`reproducible=False` (the 100 TB default) the update is a plain avg()
with map-side partial aggregation — faster and shuffle-light, at the cost
of last-ulp run-to-run drift inherent to parallel float summation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dist_sql(vec_col: str, centroid: list[float]) -> str:
    """Squared-euclidean distance to a literal centroid as a strict
    left-to-right array fold — the fixed evaluation order is what makes
    the number reproducible across engines (float addition isn't
    associative), and the fold matches an explicit ``t1 + t2 + ... + tn``
    sum bit-for-bit: ``aggregate`` folds ``((0.0 + t1) + t2) + ...`` and
    ``0.0 + t1 == t1`` exactly for the non-negative squared terms.
    Squares are explicit multiplies, not power(x, 2): pow is only
    1-ulp-accurate and its libm differs between engines, while an IEEE-754
    subtract+multiply is exactly rounded everywhere.

    Why a fold and not an unrolled term sum: k·dim inlined terms compile
    into ONE generated Java method; at k=16 × dim=64 (1,024 terms) that
    method exceeds Janino's 64 KiB limit and Spark silently falls back to
    interpreted evaluation for the whole projection (confirmed in the r4
    bench log). Higher-order functions are CodegenFallback by design —
    the surrounding projection stays codegen'd and the fold itself is a
    tight loop over the array, so the expression size is O(1) in dim."""
    lits = ", ".join(f"CAST({c!r} AS DOUBLE)" for c in centroid)
    return (
        f"aggregate(zip_with(CAST({vec_col} AS ARRAY<DOUBLE>), "
        f"array({lits}), (a, b) -> (a - b) * (a - b)), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _assign_blas(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
    keep_vec: bool = False,
) -> DataFrame:
    """Throughput formulation of the assignment: one Arrow-batched pandas
    UDF computing all k distances per batch as a single BLAS matrix
    product (``||x||² − 2·X·Cᵀ + ||c||²``) and taking the row argmin
    (numpy argmin = first minimum = the same lower-index tiebreak as the
    fold path). Distances agree with the fold path to within float
    summation reordering (last-ulp) — use ``method="fold"`` where
    bit-exact cross-engine reproducibility matters (kmeans
    reproducible=True); use this where throughput does (index builds:
    k·dim multiply-adds per row in BLAS instead of a per-element lambda).
    """
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)  # k × dim
    cn = (C * C).sum(axis=1)  # ||c||², length k

    proj = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    id_type = proj.schema["id"].dataType.simpleString()

    def nearest(batches):
        import numpy as np
        import pandas as pd

        for b in batches:
            if len(b) == 0:
                continue
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in b["v"]],
                dtype=np.float64,
            )  # n × dim (one Arrow batch)
            d = X @ C.T
            d *= -2.0
            d += (X * X).sum(axis=1)[:, None]
            d += cn[None, :]
            np.maximum(d, 0.0, out=d)  # clamp matmul-form negatives
            cl = d.argmin(axis=1)
            out = {"id": b["id"]}
            if keep_vec:
                out["v"] = b["v"]
            out["cluster"] = cl.astype("int32")
            out["dist"] = d[np.arange(len(cl)), cl]
            yield pd.DataFrame(out)

    vec_field = "v array<double>, " if keep_vec else ""
    return proj.mapInPandas(
        nearest, schema=f"id {id_type}, {vec_field}cluster int, dist double"
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "fold",
    keep_vec: bool = False,
) -> DataFrame:
    """(id[, v], cluster, dist) — nearest centroid per row, ties to the
    lower
    cluster index. Pure map-side either way — no join, no broadcast
    table, no shuffle; the centroids ride along as k·dim literals
    (``method="fold"``: array-fold distances + array_min argmin,
    bit-reproducible across engines) or a k×dim numpy matrix
    (``method="blas"``: one Arrow-batched matrix product per batch, the
    throughput path for index builds)."""
    if not centroids:
        raise ValueError("centroids must be non-empty")
    if method == "blas":
        return _assign_blas(df, centroids, id_col, vec_col, keep_vec)
    if method != "fold":
        raise ValueError(f"method must be 'fold' or 'blas', got {method!r}")
    pairs = ", ".join(
        f"struct({_dist_sql(vec_col, c)} AS dist, {i} AS cluster)"
        for i, c in enumerate(centroids)
    )
    # array_min on (dist, cluster) structs = argmin with deterministic
    # lower-index tiebreak (struct ordering is lexicographic). The argmin
    # struct is STAGED as its own projection before the field extraction:
    # `{best}.cluster` + `{best}.dist` inline would evaluate the whole
    # k-fold distance argmin twice per row (higher-order exprs get no
    # codegen subexpression elimination — the d04/x18 lesson).
    best = f"array_min(array({pairs}))"
    cols = [F.col(id_col).alias("id")]
    if keep_vec:
        # carrying the vector through lets consumers (centroid update,
        # index build) avoid a join back to the corpus on id
        cols.append(F.col(vec_col).cast("array<double>").alias("v"))
    staged = df.select(*cols, F.expr(best).alias("_best"))
    return staged.select(
        *[c for c in staged.columns if c != "_best"],
        F.col("_best.cluster").alias("cluster"),
        F.col("_best.dist").alias("dist"),
    )


def _update_centroids(
    assigned: DataFrame,
    reproducible: bool,
) -> list[list[float]]:
    """New centroid list (driver-side, k·dim doubles) from an assignment
    that carries the vector through (assign_clusters keep_vec=True — no
    join back to the corpus on id). Clusters that lost every member keep
    no entry and are dropped — the caller re-indexes, matching the
    oracle's dense re-ranking."""
    exploded = assigned.select(
        "cluster",
        "id",
        F.posexplode(F.col("v").cast("array<double>")).alias("pos", "val"),
    )
    if reproducible:
        # fold member values in id order: same IEEE-754 double additions in
        # the same sequence every run and in the oracle engine
        per_dim = exploded.groupBy("cluster", "pos").agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("id", "val"))),
                F.lit(0.0),
                lambda acc, s: acc + s["val"],
            ).alias("s"),
            F.count("*").alias("n"),
        )
    else:
        per_dim = exploded.groupBy("cluster", "pos").agg(
            F.sum("val").alias("s"), F.count("*").alias("n")
        )
    rows = (
        per_dim.select("cluster", "pos", (F.col("s") / F.col("n")).alias("m"))
        .groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("dims"))
        .collect()
    )
    by_cluster = {
        r["cluster"]: [d["m"] for d in r["dims"]] for r in rows
    }
    return [by_cluster[c] for c in sorted(by_cluster)]


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    updates: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reproducible: bool = False,
    method: str | None = None,
) -> list[list[float]]:
    """Fit-only k-means: returns the FINAL centroid list (driver-side,
    k·dim doubles) after ``updates`` assign+update rounds from the
    deterministic lowest-id seeding. The centroids are the model an IVF
    similarity index partitions on (see similarity.build_ivf_index);
    they are bytes, not data — safe to hold, ship, and inline into
    literal expressions.

    ``method`` picks the assignment formulation (see assign_clusters);
    the default routes reproducible=True to the bit-exact "fold" path and
    reproducible=False — which already tolerates parallel-summation drift
    in its avg() update — to the BLAS throughput path."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if updates < 0:
        raise ValueError(f"updates must be >= 0, got {updates}")
    if method is None:
        method = "fold" if reproducible else "blas"
    seeds = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy("id")
        .limit(k)
        .collect()
    )
    if not seeds:
        raise ValueError("kmeans input is empty")
    centroids = [[float(x) for x in r["v"]] for r in seeds]
    for _ in range(updates):
        assigned = assign_clusters(
            df, centroids, id_col, vec_col, method, keep_vec=True
        )
        centroids = _update_centroids(assigned, reproducible)
    return centroids


def cluster_balanced_sample(
    df: DataFrame,
    k: int = 8,
    per_cluster: int = 10,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reproducible: bool = True,
    method: str | None = None,
) -> DataFrame:
    """Diversity sampling for corpus curation: k-means the embeddings,
    then keep the ``per_cluster`` members CLOSEST to each centroid — a
    topic-balanced subset instead of the frequency-biased sample a
    uniform draw gives (the dominant topic stops drowning the tail).
    Deterministic end-to-end with reproducible=True (min-id seeding,
    id-ordered centroid folds, (dist, id) rank tie-break) — the whole
    selection is SQL-oracle-expressible.

    Output: (id_col, cluster, dist, rank) with rank 1..per_cluster.

    Scale shape: the k-means passes are map-side + one narrow update
    shuffle each (see kmeans); the per-cluster top-n is ONE window
    shuffle keyed on cluster. With small k the window key is
    low-cardinality — acceptable because each cluster's partition only
    sorts its own members; for huge corpora push k up (finer clusters =
    better balance AND better parallelism, the knobs align)."""
    if per_cluster < 1:
        raise ValueError(f"per_cluster must be >= 1, got {per_cluster}")
    from pyspark.sql.window import Window

    assigned = kmeans(
        df, k, iterations, id_col, vec_col, reproducible, method
    )
    w = Window.partitionBy("cluster").orderBy("dist", id_col)
    return (
        assigned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_cluster)
        .select(id_col, "cluster", "dist", "rank")
    )


def kmeans(
    df: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reproducible: bool = False,
    method: str | None = None,
) -> DataFrame:
    """Lloyd's k-means over an embedding column → (id, cluster, dist).

    Deterministic seeding: the k lowest ids' vectors are the initial
    centroids (no RNG — rerunnable and oracle-expressible; for quality on
    real corpora, pass data through a hash-shuffle first or seed with
    k-means|| offline). Each iteration: map-side nearest-centroid
    assignment against literal centroids (see assign_clusters), then one
    narrow centroid-update shuffle. The returned `cluster` is the index
    into the FINAL centroid ordering; `dist` is the squared euclidean
    distance to it.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if method is None:
        method = "fold" if reproducible else "blas"
    centroids = kmeans_fit(
        df, k, iterations - 1, id_col, vec_col, reproducible, method
    )
    assigned = assign_clusters(df, centroids, id_col, vec_col, method)
    return assigned.select(
        F.col("id").alias(id_col), "cluster", F.round("dist", 6).alias("dist")
    )


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "fold",
    max_cluster_size: int | None = None,
    n_anchors: int = 32,
) -> DataFrame:
    """Semantic (embedding-space) dedup, the cluster-then-prune shape of
    SemDeDup (Abbas et al. 2023, arXiv:2303.09540): assign every vector
    to its nearest centroid map-side, then compare pairs ONLY within a
    cluster — an item is PRUNED when some LOWER-id cluster-mate's cosine
    similarity clears ``threshold`` (the deterministic keep-lowest-id
    formulation, matching exact_dedup's keep-first semantics and making
    the whole decision oracle-expressible). Output: one row per input —
    (id, cluster, kept, pruned_by) with ``pruned_by`` = the lowest
    offending compared neighbor id (NULL when kept).

    Scale shape — the reason SemDeDup exists: the pairwise term is
    Σ|cluster|² instead of n², and it arrives via ONE shuffle on the
    int cluster key (both self-join sides partition identically, so AQE
    plans a single exchange per side). BUT Σ|c|² is still quadratic in
    the degenerate case dedup exists for — a near-dup-heavy corpus
    collapsing into one mega-cluster — and AQE skew-splitting only
    balances that work, it does not reduce it. ``max_cluster_size``
    bounds it: clusters at or under the cap keep EXACT full-pairwise
    semantics (so capped == uncapped whenever no cluster exceeds the
    cap); members of an oversized cluster are compared only against the
    cluster's ``n_anchors`` lowest-id members (its deterministic
    representatives — anchor-vs-anchor pairs included), making the
    oversized term |c|·n_anchors, linear in |c|. On the mega-cluster
    this cap targets — a ball of near-dups — the anchors are near-dups
    of every member, so the pruning decision is preserved; the
    approximation only loses pairs whose ONLY offender ranks past the
    anchor set, the same recall trade every banded method in this
    engine makes (and unlike those, it is exact below the cap). Both
    regimes run in ONE plan: the b-side filter
    ``(size <= cap) OR (rank <= n_anchors)`` needs a single
    row_number/count window on the same cluster key the join shuffles
    on. Cosine runs on double-cast arrays rounded to 6 dp — the
    established cross-engine float-parity recipe (e01/e02). Centroids
    are driver-held model bytes (kmeans_fit), inlined as literals: no
    broadcast table, no assignment join."""
    from .dedup import cosine_similarity

    from pyspark.sql.window import Window

    if max_cluster_size is not None and max_cluster_size < 1:
        raise ValueError(
            f"max_cluster_size must be >= 1, got {max_cluster_size}"
        )
    if n_anchors < 1:
        raise ValueError(f"n_anchors must be >= 1, got {n_anchors}")
    assigned = assign_clusters(
        df.select(id_col, vec_col), centroids, id_col, vec_col,
        method=method, keep_vec=True,
    )
    a = assigned.select(
        "cluster", F.col("id").alias("id_a"), F.col("v").alias("va")
    )
    if max_cluster_size is None:
        b = assigned.select(
            "cluster", F.col("id").alias("id_b"), F.col("v").alias("vb")
        )
    else:
        w_rank = Window.partitionBy("cluster").orderBy("id")
        w_size = Window.partitionBy("cluster")
        b = (
            assigned.withColumn("_rk", F.row_number().over(w_rank))
            .withColumn("_sz", F.count("*").over(w_size))
            .filter(
                (F.col("_sz") <= F.lit(max_cluster_size))
                | (F.col("_rk") <= F.lit(n_anchors))
            )
            .select(
                "cluster", F.col("id").alias("id_b"), F.col("v").alias("vb")
            )
        )
    pruned = (
        a.join(b, "cluster")
        .filter(F.col("id_a") > F.col("id_b"))
        .filter(
            F.round(cosine_similarity(F.col("va"), F.col("vb")), 6)
            >= F.lit(threshold)
        )
        .groupBy("id_a")
        .agg(F.min("id_b").alias("pruned_by"))
    )
    return (
        assigned.join(pruned, assigned["id"] == pruned["id_a"], "left")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            F.col("pruned_by").isNull().alias("kept"),
            "pruned_by",
        )
    )


def build_semantic_index(
    df: DataFrame,
    centroids: list[list[float]],
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    buckets: int = 32,
    path: str | None = None,
    mode: str = "overwrite",
    method: str = "fold",
) -> None:
    """Materialize the corpus's SemDeDup state once — the ingestion-time
    half of INCREMENTAL semantic dedup (the e13 analogue of
    text.build_substring_index / dedup.build_minhash_index): one row per
    corpus vector, ``(cluster, id, v, rk)`` with ``rk`` the id-rank
    within the cluster (the deterministic anchor order of
    :func:`semantic_dedup`'s capped path), bucketed on the int cluster
    key. Every later batch joins its cluster assignments against this
    table with NO corpus-side Exchange; appends never change existing
    ranks (new ids rank after old ones — enforced by
    :func:`append_to_semantic_index`). The state holds ALL corpus
    vectors, kept and pruned — cosine is not transitive, so a kept-only
    index would change decisions; the full table is the honest exact
    state, the same size class as the embedding column itself.
    Centroids are the frozen model (kmeans_fit) — production SemDeDup
    fixes its clustering at index build; re-fitting drifts every
    decision."""
    from pyspark.sql.window import Window

    from .scale import write_bucketed

    assigned = assign_clusters(
        df.select(id_col, vec_col), centroids, id_col, vec_col,
        method=method, keep_vec=True,
    )
    rk = F.row_number().over(Window.partitionBy("cluster").orderBy("id"))
    write_bucketed(
        assigned.select("cluster", "id", "v").withColumn("rk", rk),
        table, "cluster", buckets=buckets, mode=mode, path=path,
    )


def semantic_dedup_incremental(
    batch: DataFrame,
    spark,
    table: str,
    centroids: list[list[float]],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "fold",
    max_cluster_size: int | None = None,
    n_anchors: int = 32,
) -> DataFrame:
    """Semantic dedup of a NEW batch against the indexed corpus
    (build_semantic_index) — production embedding dedup is incremental,
    and this gives SemDeDup the same persisted-index lifecycle d06
    gives MinHash and d11 gives ExactSubstr. A batch vector is PRUNED
    when ANY corpus member of its cluster clears ``threshold`` (the
    corpus saw that content first — regardless of numeric id, the d11
    corpus-first rule) or when an EARLIER (lower-id) batch mate does;
    ``pruned_by`` is the minimum offending id across both. Output: one
    row per batch vector — (id, cluster, kept, pruned_by).

    ``max_cluster_size``/``n_anchors`` reproduce the capped regime
    against the index side: clusters whose CURRENT index size exceeds
    the cap compare only against their ``rk <= n_anchors`` lowest-id
    members (ranks are frozen at build/append, so the anchor set is
    stable); batch-internal comparisons stay exact (a batch is bounded
    by construction). Cluster sizes come from a groupBy on the bucketed
    table — itself Exchange-free — broadcast back as the filter.

    Scale shape: batch assignment is map-side (centroid literals — no
    join); the index join is an equi-join on the int cluster key into
    the table's bucketing, so the corpus side plans with ZERO Exchange
    (plan-asserted in tests) while the small batch side shuffles into
    the bucket layout; per-batch-item work is LINEAR in its cluster's
    index size (or n_anchors under the cap) — the quadratic Σ|c|² term
    exists only at index build, where semantic_dedup's cap bounds it."""
    from .dedup import cosine_similarity

    if max_cluster_size is not None and max_cluster_size < 1:
        raise ValueError(
            f"max_cluster_size must be >= 1, got {max_cluster_size}"
        )
    if n_anchors < 1:
        raise ValueError(f"n_anchors must be >= 1, got {n_anchors}")
    assigned = assign_clusters(
        batch.select(id_col, vec_col), centroids, id_col, vec_col,
        method=method, keep_vec=True,
    )
    a = assigned.select(
        "cluster", F.col("id").alias("id_a"), F.col("v").alias("va")
    )
    idx = spark.table(table)
    # REPLAY TOLERANCE: exclude the batch's own ids from the corpus
    # side. An at-least-once caller (run_semantic_stream's foreachBatch)
    # can re-process a batch AFTER it was appended to the index; without
    # this anti-join every replayed vector would match itself (cosine
    # 1.0) and batch mates would flip decisions through the corpus-first
    # rule. With it, decisions are a pure function of
    # (index minus batch, batch) — identical on every replay. The
    # broadcast anti-join keeps the index side's bucketed partitioning.
    idx = idx.join(
        F.broadcast(assigned.select("id")), "id", "left_anti"
    )
    if max_cluster_size is not None:
        counts = idx.groupBy("cluster").agg(F.count("*").alias("_sz"))
        idx = idx.join(F.broadcast(counts), "cluster").filter(
            (F.col("_sz") <= F.lit(max_cluster_size))
            | (F.col("rk") <= F.lit(n_anchors))
        )
    b_corpus = idx.select(
        "cluster", F.col("id").alias("id_b"), F.col("v").alias("vb")
    )
    hit = F.round(
        cosine_similarity(F.col("va"), F.col("vb")), 6
    ) >= F.lit(threshold)
    corpus_off = (
        a.join(b_corpus, "cluster")
        .filter(hit)
        .groupBy("id_a")
        .agg(F.min("id_b").alias("pruned_by"))
    )
    b_batch = assigned.select(
        "cluster", F.col("id").alias("id_b"), F.col("v").alias("vb")
    )
    batch_off = (
        a.join(b_batch, "cluster")
        .filter(F.col("id_a") > F.col("id_b"))
        .filter(hit)
        .groupBy("id_a")
        .agg(F.min("id_b").alias("pruned_by"))
    )
    pruned = (
        corpus_off.unionByName(batch_off)
        .groupBy("id_a")
        .agg(F.min("pruned_by").alias("pruned_by"))
    )
    return (
        assigned.join(pruned, assigned["id"] == pruned["id_a"], "left")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            F.col("pruned_by").isNull().alias("kept"),
            "pruned_by",
        )
    )


def append_to_semantic_index(
    batch: DataFrame,
    table: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "fold",
    buckets: int | None = None,
) -> None:
    """Add a processed batch's vectors to the semantic index — the
    state-update half of the incremental lifecycle. New rows rank AFTER
    the cluster's existing members (rk = existing max + batch-internal
    id rank), so anchor sets already referenced by earlier reads never
    reshuffle; bucket count is read from the catalog so the
    no-corpus-Exchange join plans survive appends. Compact small files
    with dedup_stream.compact_index_table."""
    from pyspark.sql.window import Window

    spark = batch.sparkSession
    if buckets is None:
        from ..streaming.dedup_stream import _table_buckets

        buckets = _table_buckets(spark, table) or 32
    from .scale import write_bucketed

    assigned = assign_clusters(
        batch.select(id_col, vec_col), centroids, id_col, vec_col,
        method=method, keep_vec=True,
    )
    # IDEMPOTENT append: drop batch rows whose id is already indexed
    # (an at-least-once replay re-appends the same batch — duplicate
    # rows would inflate cluster sizes and duplicate anchor ranks,
    # breaking the frozen-rank contract). The semi probe broadcasts the
    # small batch keys against the bucketed table: no index shuffle.
    existing = spark.table(table).join(
        F.broadcast(assigned.select("cluster", "id")),
        ["cluster", "id"],
        "leftsemi",
    ).select("id")
    fresh = assigned.join(F.broadcast(existing), "id", "left_anti")
    base_rk = spark.table(table).groupBy("cluster").agg(
        F.max("rk").alias("_base")
    )
    rk = F.row_number().over(Window.partitionBy("cluster").orderBy("id"))
    rows = (
        fresh.withColumn("_brk", rk)
        .join(F.broadcast(base_rk), "cluster", "left")
        .select(
            "cluster", "id", "v",
            (F.coalesce(F.col("_base"), F.lit(0)) + F.col("_brk"))
            .cast("int").alias("rk"),
        )
    )
    write_bucketed(rows, table, "cluster", buckets=buckets, mode="append")
