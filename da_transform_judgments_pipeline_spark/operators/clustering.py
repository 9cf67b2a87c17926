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
    """Squared-euclidean distance to a literal centroid, as one explicit
    left-to-right sum — the fixed evaluation order is what makes the
    number reproducible across engines (float addition isn't associative).
    Squares are explicit multiplies, not power(x, 2): pow is only
    1-ulp-accurate and its libm differs between engines, while an IEEE-754
    subtract+multiply is exactly rounded everywhere."""
    terms = []
    for i, c in enumerate(centroid):
        a = f"CAST(element_at({vec_col}, {i + 1}) AS DOUBLE)"
        b = f"CAST({c!r} AS DOUBLE)"
        terms.append(f"(({a} - {b}) * ({a} - {b}))")
    return "(" + " + ".join(terms) + ")"


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, dist) — nearest centroid per row, ties to the lower
    cluster index. Pure map-side: the centroid list is compiled into one
    least()-of-structs literal expression (k·dim literals), so there is no
    join, no broadcast table, and no shuffle — the scan streams through a
    single whole-stage-codegen projection."""
    if not centroids:
        raise ValueError("centroids must be non-empty")
    pairs = ", ".join(
        f"struct({_dist_sql(vec_col, c)} AS dist, {i} AS cluster)"
        for i, c in enumerate(centroids)
    )
    # array_min on (dist, cluster) structs = argmin with deterministic
    # lower-index tiebreak (struct ordering is lexicographic)
    best = f"array_min(array({pairs}))"
    return df.select(
        F.col(id_col).alias("id"),
        F.expr(f"{best}.cluster").alias("cluster"),
        F.expr(f"{best}.dist").alias("dist"),
    )


def _update_centroids(
    assigned: DataFrame,
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int,
    reproducible: bool,
) -> list[list[float]]:
    """New centroid list (driver-side, k·dim doubles) from an assignment.
    Clusters that lost every member keep no entry and are dropped — the
    caller re-indexes, matching the oracle's dense re-ranking."""
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    exploded = (
        assigned.select("id", "cluster")
        .join(vecs, "id")
        .select(
            "cluster",
            "id",
            F.posexplode(F.col("v").cast("array<double>")).alias(
                "pos", "val"
            ),
        )
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
) -> list[list[float]]:
    """Fit-only k-means: returns the FINAL centroid list (driver-side,
    k·dim doubles) after ``updates`` assign+update rounds from the
    deterministic lowest-id seeding. The centroids are the model an IVF
    similarity index partitions on (see similarity.build_ivf_index);
    they are bytes, not data — safe to hold, ship, and inline into
    literal expressions."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if updates < 0:
        raise ValueError(f"updates must be >= 0, got {updates}")
    seeds = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy("id")
        .limit(k)
        .collect()
    )
    if not seeds:
        raise ValueError("kmeans input is empty")
    centroids = [[float(x) for x in r["v"]] for r in seeds]
    dim = len(centroids[0])
    for _ in range(updates):
        assigned = assign_clusters(df, centroids, id_col, vec_col)
        centroids = _update_centroids(
            assigned, df, id_col, vec_col, dim, k, reproducible
        )
    return centroids


def kmeans(
    df: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reproducible: bool = False,
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
    centroids = kmeans_fit(
        df, k, iterations - 1, id_col, vec_col, reproducible
    )
    assigned = assign_clusters(df, centroids, id_col, vec_col)
    return assigned.select(
        F.col("id").alias(id_col), "cluster", F.round("dist", 6).alias("dist")
    )
