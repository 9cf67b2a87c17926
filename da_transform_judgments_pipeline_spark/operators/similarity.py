"""Similarity search over embedding columns (BASELINE.json north star).

Brute-force cosine top-k is the exact baseline; the scale path pre-buckets
with deterministic random-hyperplane LSH (signature computed map-side from
hash-seeded pseudo-random planes — no stored model, reproducible on any
cluster) and reranks exactly within buckets.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_similarity


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to one query vector.

    Map-side score + global top-k (Spark's TakeOrderedAndProject — no full
    sort, no shuffle of the table). Output (id, cosine) sorted desc.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col).alias("id"),
        F.round(
            cosine_similarity(F.col(vec_col).cast("array<double>"), q), 6
        ).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("id")).limit(k)


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    left_vec: str = "embedding",
    right_vec: str = "embedding",
    method: str = "lsh",
    **method_kwargs,
) -> DataFrame:
    """k-NN join — DEFAULT is the LSH-bucketed scale path
    (:func:`knn_join_lsh`): no crossJoin node, shuffle bounded by bucket
    collisions, safe at 100 TB. Approximate (recall tunes with
    ``probe_radius``/``n_planes`` passed through ``method_kwargs``).

    BEHAVIOR CHANGE (round 3): this name previously ran the exact
    brute-force join and now defaults to the approximate LSH path — left
    rows whose true neighbors fall outside the probe ball lose them. The
    routing is now EXPLICIT: pass ``method="exact"`` for the old exhaustive
    behavior (:func:`knn_join_exact`, O(|L|·|R|) — small corpora only) or
    ``method="lsh"`` (default). Output (id_l, id_r, cosine, rank)."""
    kwargs = dict(
        k=k,
        left_id=left_id,
        right_id=right_id,
        left_vec=left_vec,
        right_vec=right_vec,
        **method_kwargs,
    )
    if method == "exact":
        return knn_join_exact(left, right, **kwargs)
    if method != "lsh":
        raise ValueError(f"method must be 'lsh' or 'exact', got {method!r}")
    return knn_join_lsh(left, right, **kwargs)


def knn_join_exact(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    left_vec: str = "embedding",
    right_vec: str = "embedding",
) -> DataFrame:
    """Exact k-NN join: for every left row, its k nearest right rows by
    cosine. Brute-force cross-score + per-left-id window top-k; broadcast
    the smaller side when it fits. Output (id_l, id_r, cosine, rank).

    Small-scale ORACLE only — the crossJoin is O(|L|·|R|); beyond ~10⁵
    rows use :func:`knn_join` (LSH-bucketed, the default)."""
    l = left.select(
        F.col(left_id).alias("id_l"),
        F.col(left_vec).cast("array<double>").alias("vl"),
    )
    r = right.select(
        F.col(right_id).alias("id_r"),
        F.col(right_vec).cast("array<double>").alias("vr"),
    )
    scored = l.crossJoin(F.broadcast(r)).select(
        "id_l",
        "id_r",
        F.round(cosine_similarity(F.col("vl"), F.col("vr")), 6).alias(
            "cosine"
        ),
    ).filter(F.col("id_l") != F.col("id_r"))
    w = Window.partitionBy("id_l").orderBy(
        F.col("cosine").desc(), F.col("id_r")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def plane_weights(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic SRP plane weights in [-0.5, 0.5): md5(seed:plane:dim)
    derived, so any process (driver, executor, another engine) regenerates
    identical planes — no stored model to ship."""
    import hashlib

    out = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            row.append((int(h[:8], 16) % 10_000) / 10_000.0 - 0.5)
        out.append(row)
    return out


def _hyperplane_sig_sql(
    vec_sql: str, n_planes: int, dim: int, seed: int
) -> str:
    """SQL text for the SRP signature of a vector expression. Built as one
    string (weights inlined as array literals) instead of n_planes×dim
    Column objects — the py4j round-trips for 8×64 literal expressions cost
    seconds of pure driver time per call (same fix as dedup's MinHash)."""
    terms = []
    for p, row in enumerate(plane_weights(n_planes, dim, seed)):
        arr = ", ".join(f"{w}D" for w in row)
        dot = (
            f"aggregate(zip_with(array({arr}), {vec_sql},"
            " (w, x) -> w * x), 0.0D, (a, x) -> a + x)"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


#: process-wide Column caches (r14-opt): the signature SQL is a
#: ~n_planes·dim-term expression whose F.expr parse measured ~0.5 s at
#: 16×64, and a hamming ball at radius 4 over 16 planes is a 2517-int
#: literal crossing py4j element by element — both depend only on the
#: scalar parameters, so build each once per process.
_SIG_COL_CACHE: dict = {}
_MASK_COL_CACHE: dict = {}


def hyperplane_signature(
    vec_sql: str, n_planes: int = 16, dim: int = 64, seed: int = 42
) -> Column:
    """Random-hyperplane (SRP) LSH signature of a vector-typed SQL
    expression (e.g. ``"CAST(embedding AS array<double>)"``) as an INT
    bucket key: sign(dot(plane, vec)) per plane packs into bits."""
    key = (vec_sql, n_planes, dim, seed)
    col = _SIG_COL_CACHE.get(key)
    if col is None:
        col = F.expr(_hyperplane_sig_sql(vec_sql, n_planes, dim, seed))
        _SIG_COL_CACHE[key] = col
    return col


def hamming_ball_masks_col(n_planes: int, radius: int) -> Column:
    """:func:`hamming_ball_masks` as a cached array LITERAL Column —
    the probe-explode sites' building block."""
    key = (n_planes, radius)
    col = _MASK_COL_CACHE.get(key)
    if col is None:
        col = F.lit(hamming_ball_masks(n_planes, radius))
        _MASK_COL_CACHE[key] = col
    return col


def signature_of(vec: list[float], n_planes: int, seed: int = 42) -> int:
    """Driver-side signature of a literal query vector (same planes)."""
    sig = 0
    for p, row in enumerate(plane_weights(n_planes, len(vec), seed)):
        if sum(w * x for w, x in zip(row, vec)) >= 0:
            sig += 1 << p
    return sig


def hamming_ball_masks(n_planes: int, radius: int) -> list[int]:
    """All XOR masks with ≤ radius set bits over n_planes bits — the
    hamming-ball probe neighborhood (multi-probe LSH). Driver-side ints;
    size = Σ C(n_planes, 0..radius), so callers keep n_planes small (8-16)
    or radius tight when enumerating."""
    from itertools import combinations

    masks = []
    for r in range(radius + 1):
        for bits in combinations(range(n_planes), r):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    return masks


def probe_radius_for(
    threshold: float, n_planes: int, sigmas: float = 3.0
) -> int:
    """Probe radius giving ~recall-1 for pairs at cosine ≥ threshold.

    Per SRP theory a pair at angle θ flips each plane independently with
    p = θ/π, so its signature hamming is Binomial(n_planes, p); covering
    mean + `sigmas`·σ bounds the miss rate at the normal-tail level
    (~0.1% at 3σ) for pairs AT the threshold — tighter pairs are safer.
    Loose thresholds (θ → 90°) drive the radius toward n_planes: the ball
    then covers most of signature space and candidate count degrades
    toward the all-pairs COUNT (though never a materialized cross
    product); real near-dup thresholds (≥0.85) keep the ball tiny.
    """
    import math

    p = math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    mean = n_planes * p
    sd = math.sqrt(n_planes * p * (1.0 - p))
    return min(n_planes, int(math.ceil(mean + sigmas * sd)))


def build_ann_index(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize the SRP signature index ONCE: (id, vec) partitioned by
    the signature bucket on disk. The signature scan over the corpus is
    paid at build time; every subsequent query probes only the hamming-
    neighborhood partitions via partition pruning (the 100 TB design — a
    query must not pay a full-corpus scan; see ann_topk_indexed). Layout is
    one directory per sig value (≤ 2^n_planes dirs); at petabyte scale
    raise n_planes so per-bucket data stays executor-sized."""
    if dim is None:
        first = df.select(vec_col).first()
        dim = len(first[0])
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        hyperplane_signature(
            f"CAST({vec_col} AS array<double>)", n_planes, dim, seed
        ).alias("sig"),
    )
    base.write.mode(mode).partitionBy("sig").parquet(path)


def ann_topk_indexed(
    spark,
    index: str | DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    max_hamming: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k against a persisted SRP index (build_ann_index):
    the query's signature is a driver-side int, the probe reads ONLY the
    partitions within hamming ≤ max_hamming (partition pruning — the scan's
    PartitionFilters carries the sig IN (...) predicate), then exact cosine
    rerank within those buckets. Output schema matches ann_topk.

    ``index`` may be the index path or an already-loaded DataFrame over it:
    per-query ``spark.read.parquet`` re-runs partition discovery over every
    sig directory (~0.5 s of driver time at 256 partitions), so query loops
    should load the reader once and pass the DataFrame."""
    import math

    qsig = signature_of([float(x) for x in query_vec], n_planes, seed)
    probe_sigs = [
        qsig ^ m for m in hamming_ball_masks(n_planes, max_hamming)
    ]
    reader = (
        spark.read.parquet(index) if isinstance(index, str) else index
    )
    idx = reader.filter(F.col("sig").isin(probe_sigs))
    # whole scoring expression as ONE SQL string: the query vector inlines
    # as an array literal and its norm folds to a driver-side constant —
    # one expr parse instead of ~70 py4j Column round-trips per query
    # (~0.3 s driver time saved; same trick as dedup's MinHash builders).
    qarr = ", ".join(f"{float(x)!r}D" for x in query_vec)
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    if qnorm == 0.0:
        raise ValueError("query_vec has zero norm; cosine is undefined")
    dot = (
        f"aggregate(zip_with(vec, array({qarr}), (x, y) -> x * y),"
        " 0.0D, (a, x) -> a + x)"
    )
    vnorm = "sqrt(aggregate(vec, 0.0D, (a, x) -> a + x * x))"
    scored = idx.selectExpr(
        "id", f"round(({dot}) / (({vnorm}) * {qnorm!r}D), 6) AS cosine"
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("id")).limit(k)


def knn_join_lsh(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    probe_radius: int = 2,
    seed: int = 42,
    dim: int | None = None,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    left_vec: str = "embedding",
    right_vec: str = "embedding",
) -> DataFrame:
    """Approximate k-NN join via shared SRP bucketing — the scale path
    (and :func:`knn_join`'s default) replacing the crossJoin of
    :func:`knn_join_exact`. Both sides get the same
    map-side signature; the left side explodes over the hamming-ball probe
    masks as NARROW (id, probed-sig) rows, candidates come from the bucket
    equi-join (each pair collides via exactly one mask — no dedup pass),
    vectors join back by id only for candidates, and a per-left window
    keeps the top k. Left rows whose true neighbors fall outside the probe
    ball miss them (recall tunes with probe_radius/n_planes); rows with no
    candidate in the ball yield no output rows. Output (id_l, id_r,
    cosine, rank) like knn_join_exact."""
    if dim is None:
        first = left.select(left_vec).first()
        dim = len(first[0])
    masks_col = hamming_ball_masks_col(n_planes, probe_radius)
    l = left.select(
        F.col(left_id).alias("id_l"),
        F.col(left_vec).cast("array<double>").alias("vl"),
        hyperplane_signature(
            f"CAST({left_vec} AS array<double>)", n_planes, dim, seed
        ).alias("sig_l"),
    )
    r = right.select(
        F.col(right_id).alias("id_r"),
        F.col(right_vec).cast("array<double>").alias("vr"),
        hyperplane_signature(
            f"CAST({right_vec} AS array<double>)", n_planes, dim, seed
        ).alias("sig_r"),
    )
    probes = l.select(
        "id_l", "sig_l", F.explode(masks_col).alias("m")
    ).select("id_l", F.col("m").bitwiseXOR(F.col("sig_l")).alias("probe_sig"))
    candidates = (
        probes.join(
            r.select("id_r", "sig_r"),
            F.col("probe_sig") == F.col("sig_r"),
        )
        .filter(F.col("id_l") != F.col("id_r"))
        .select("id_l", "id_r")
    )
    scored = (
        candidates.join(l.select("id_l", "vl"), "id_l")
        .join(r.select("id_r", "vr"), "id_r")
        .select(
            "id_l",
            "id_r",
            F.round(cosine_similarity(F.col("vl"), F.col("vr")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("id_l").orderBy(
        F.col("cosine").desc(), F.col("id_r")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    max_hamming: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: SRP-bucket prefilter (signature hamming ≤
    max_hamming from the query's signature) then exact cosine rerank.

    At scale the signature column is precomputed/bucketed (partition by
    signature) so a query touches only nearby buckets instead of the full
    table; recall tunes with n_planes/max_hamming.
    """
    dim = len(query_vec)
    vec = F.col(vec_col).cast("array<double>")
    sig = hyperplane_signature(
        f"CAST({vec_col} AS array<double>)", n_planes, dim, seed
    )
    # the query vector is a literal — its signature is a plain int computed
    # on the driver, so the bucket filter is a constant comparison per row
    qsig = signature_of([float(x) for x in query_vec], n_planes, seed)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = (
        df.select(
            F.col(id_col).alias("id"),
            vec.alias("v"),
            sig.alias("sig"),
        )
        .filter(
            F.bit_count(
                F.col("sig").bitwiseXOR(F.lit(qsig)).cast("long")
            )
            <= max_hamming
        )
        .select(
            "id",
            F.round(cosine_similarity(F.col("v"), q), 6).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("id")).limit(k)


def build_ivf_index(
    df: DataFrame,
    path: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
    method: str = "blas",
) -> None:
    """Materialize an IVF (inverted-file) similarity index: every vector
    assigned to its nearest centroid (map-side argmin — see
    clustering.assign_clusters) and written partitioned by the cluster
    id. The complement to the SRP index (build_ann_index): SRP buckets
    are data-independent hyperplane signs, IVF cells follow the data's
    actual density (centroids from clustering.kmeans_fit), giving fewer,
    better-balanced probes on clustered corpora. A query then scans only
    ``nprobe`` cell directories via partition pruning — at 100 TB the
    full-corpus scan is paid once at build, never per query.

    Default ``method="blas"``: the build is the throughput-critical
    full-corpus pass and cell routing needs no bit-exact distances — a
    vector landing one cell over on a float tie only moves which probe
    set finds it, and the nprobe=n_cells exact endpoint (ivf_topk) is
    assignment-independent by construction."""
    from .clustering import assign_clusters

    # keep_vec carries the vector through the assignment, so the build is
    # ONE pass over the corpus straight into the partitioned write — no
    # join back on id (the r4 shape joined (id, cluster) against the
    # corpus again: a second scan + shuffle for nothing)
    assigned = assign_clusters(
        df, centroids, id_col, vec_col, method, keep_vec=True
    ).select("id", F.col("v").alias("vec"), "cluster")
    assigned.write.mode(mode).partitionBy("cluster").parquet(path)


def append_to_ivf_index(
    df: DataFrame,
    path: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "blas",
) -> None:
    """Incrementally grow a persisted IVF index: assign ONLY the new
    batch against the frozen centroid model and append its rows into the
    existing cluster directories — the ANN counterpart of the incremental
    dedup path (dedup.incremental_near_duplicates): ingestion touches
    batch-sized data, never the corpus. The centroids must be the ones
    the index was built with (the model is the partitioning contract);
    a probe after append sees old + new vectors in one partition-pruned
    scan. Re-fit centroids + rebuild only when drift degrades recall —
    the recall contract tests (tests/test_clustering.py) are the gauge.

    At 100 TB this is the serving-shape write path: appends are
    partition-local parquet adds (no compaction pass here; run one
    offline when small-file counts grow)."""
    build_ivf_index(df, path, centroids, id_col, vec_col, "append", method)


def compact_ivf_index(spark, path: str) -> dict:
    """Index-lifecycle maintenance for :func:`append_to_ivf_index`: every
    append adds one-or-more small parquet files per touched cluster
    directory, and after N batches a probe's ``nprobe`` cell scan opens
    N× more files than it needs. Rewrite the index to ONE file per
    cluster (hash-repartition on the partition column → each cluster
    lands in exactly one task → one file), preserving rows and therefore
    every query result bit-for-bit.

    Write-first, swap-last: the compacted copy is fully written (and
    row-count verified) into a ``_compacting`` sibling while the live
    index stays intact and readable; the swap is then two directory
    renames through the Hadoop FileSystem API (live → ``_precompact_*``
    trash, sibling → live) and the trash is deleted LAST, when it is
    already garbage. At no point is the ONLY copy of the index mid-write:
    a crash inside the two-rename window leaves the data in the sibling
    (and possibly the trash) — recovery is renaming ``_compacting`` back
    to ``path``. (On an object store a directory rename is an O(listing)
    server-side copy rather than a metadata op; the swap is still
    crash-redoable, just not atomic — run compaction in the same offline
    maintenance slot the append docstring prescribes; a lakehouse table
    format would make it atomic.)

    Returns {files_before, files_after, rows} for the caller's audit log.
    """
    reader = spark.read.parquet(path)
    files_before = len(reader.inputFiles())
    rows = reader.count()
    tmp = path.rstrip("/") + "_compacting"
    (
        reader.repartition("cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(tmp)
    )
    if spark.read.parquet(tmp).count() != rows:
        raise ValueError("compaction row-count mismatch; index left intact")
    jvm = spark._jvm
    hadoop_path = jvm.org.apache.hadoop.fs.Path
    fs = hadoop_path(path).getFileSystem(spark._jsc.hadoopConfiguration())
    trash = path.rstrip("/") + "_precompact_" + uuid.uuid4().hex[:8]
    if not fs.rename(hadoop_path(path), hadoop_path(trash)):
        raise IOError(f"could not move live index aside: {path} -> {trash}")
    if not fs.rename(hadoop_path(tmp), hadoop_path(path)):
        # put the live index back; compacted copy remains in `tmp`
        if not fs.rename(hadoop_path(trash), hadoop_path(path)):
            # the restore itself failed: be explicit about where the
            # live data actually sits, or the operator will follow the
            # normal recovery note and mistake the trash dir for garbage
            raise IOError(
                f"could not swap compacted index in AND could not "
                f"restore the original: the LIVE index data is at "
                f"{trash} (not {path}); the compacted copy is at {tmp}"
            )
        raise IOError(f"could not swap compacted index in: {tmp} -> {path}")
    fs.delete(hadoop_path(trash), True)
    files_after = len(spark.read.parquet(path).inputFiles())
    return {
        "files_before": files_before,
        "files_after": files_after,
        "rows": rows,
    }


def ivf_topk(
    spark,
    index: str | DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k against a persisted IVF index (build_ivf_index):
    rank the (driver-side, k·dim) centroids by distance to the query,
    scan ONLY the ``nprobe`` nearest cells (partition pruning carries
    `cluster IN (...)` into the file listing), exact cosine rerank
    within. With nprobe = len(centroids) the probe set is the whole
    corpus and the result equals exact cosine_topk — the recall knob is
    explicit. Output schema matches cosine_topk: (id, cosine).

    Note: centroids are ranked by squared-euclidean distance while the
    rerank is cosine — equivalent orderings for L2-normalized embeddings
    (the expected input); for unnormalized vectors the probed cells may
    not be the cosine-nearest ones."""
    import math

    q = [float(x) for x in query_vec]
    ranked = sorted(
        range(len(centroids)),
        key=lambda i: (
            sum((a - b) * (a - b) for a, b in zip(centroids[i], q)),
            i,
        ),
    )
    probe = ranked[: max(1, nprobe)]
    reader = spark.read.parquet(index) if isinstance(index, str) else index
    idx = reader.filter(F.col("cluster").isin(probe))
    qarr = ", ".join(f"{x!r}D" for x in q)
    qnorm = math.sqrt(sum(x * x for x in q))
    if qnorm == 0.0:
        raise ValueError("query_vec has zero norm; cosine is undefined")
    dot = (
        f"aggregate(zip_with(vec, array({qarr}), (x, y) -> x * y),"
        " 0.0D, (a, x) -> a + x)"
    )
    vnorm = "sqrt(aggregate(vec, 0.0D, (a, x) -> a + x * x))"
    scored = idx.selectExpr(
        "id", f"round(({dot}) / (({vnorm}) * {qnorm!r}D), 6) AS cosine"
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("id")).limit(k)


def mmr_rerank(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_candidates: int = 30,
    lambda_: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance rerank: the top-``n_candidates`` hits
    by cosine relevance are greedily re-ordered so each pick maximizes
    ``λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)`` — the classic
    diversity-aware retrieval head (Carbonell & Goldstein 1998) that
    stops a result page (or a RAG context window) filling with ten
    copies of the same document. Ties break on (score desc, id asc);
    the first pick is the pure-relevance argmax.

    Determinism contract (oracle-friendly): relevance and all pairwise
    sims are ROUNDED to 6 dp *before* the greedy loop — both engine and
    oracle compute scores from identical decimals, so argmax decisions
    cannot diverge on summation-order ulps. λ·a − (1−λ)·b on those
    rounded doubles is then bit-identical everywhere for λ=0.5.

    Scale shape: candidate generation is the e02 machinery — map-side
    score over the FULL corpus + TakeOrderedAndProject, no shuffle of
    the table. Only the C-row candidate set is collected; the C² sim
    matrix is computed ENGINE-side (a C×C self-join of the C-row frame
    — trivial) with the same fold expression as the corpus scoring, and
    the inherently-sequential greedy loop runs driver-side over C ids
    and C²/2 floats — control-plane, the same pattern as k-means'
    driver-held centroids. The corpus never feels k, C², or the loop.
    """
    spark = df.sparkSession
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cand = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("rel", F.round(cosine_similarity(F.col("v"), q), 6))
        .orderBy(F.col("rel").desc(), F.col("id"))
        .limit(n_candidates)
    )
    rows = cand.collect()
    rel = {r["id"]: r["rel"] for r in rows}
    a, b = cand.alias("a"), cand.alias("b")
    sim_rows = (
        a.crossJoin(b)
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("ia"),
            F.col("b.id").alias("ib"),
            F.round(
                cosine_similarity(F.col("a.v"), F.col("b.v")), 6
            ).alias("sim"),
        )
        .collect()
    )
    sim: dict[tuple, float] = {}
    for r in sim_rows:
        sim[(r["ia"], r["ib"])] = r["sim"]
        sim[(r["ib"], r["ia"])] = r["sim"]
    selected: list[tuple] = []
    remaining = sorted(rel)
    while remaining and len(selected) < k:
        best = None
        for c in remaining:
            if selected:
                max_sim = max(sim[(c, s[1])] for s in selected)
            else:
                max_sim = 0.0
            score = lambda_ * rel[c] - (1.0 - lambda_) * max_sim
            # argmax with id-asc tie-break: strictly-greater replaces
            if best is None or score > best[0] or (
                score == best[0] and c < best[1]
            ):
                best = (score, c)
        selected.append((len(selected) + 1, best[1]))
        remaining.remove(best[1])
    out = [
        (int(rank), rid, float(rel[rid])) for rank, rid in selected
    ]
    # The result's id field keeps the INPUT id column's type (string doc
    # ids, ints, ...) — the greedy loop is id-type-agnostic, so the
    # output schema must not hardcode long. r15-opt (guide §4): bind the
    # ≤k control-plane rows as JVM literals (session.local_df) — the
    # createDataFrame twin was a pickled Python-RDD leaf whose every
    # scan launched defaultParallelism Python worker tasks.
    from ..session import local_df

    id_type = df.schema[id_col].dataType
    return local_df(
        spark, out,
        f"rank long, id {id_type.simpleString()}, rel double",
    )


def pq_train(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    updates: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train Product-Quantization codebooks (Jégou et al., PAMI 2011):
    split the vector into ``m`` contiguous subspaces and k-means each
    independently. Returns m codebooks × k centroids × (dim/m) floats —
    driver-held model bytes (m·k·dim/m = k·dim doubles total, same
    footprint as one k-means), safe to inline into literal expressions
    exactly like the IVF centroids.

    Each subspace fit is the existing kmeans_fit machinery on a sliced
    projection — m small distributed fits, map-side assignment, one
    narrow update shuffle per round; the corpus is scanned m·updates
    times but never reshuffled on vectors.
    """
    from .clustering import kmeans_fit

    dim = len(df.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    books = []
    for s in range(m):
        sub = df.select(
            F.col(id_col).alias("vec_id"),
            F.slice(F.col(vec_col), s * dsub + 1, dsub).alias("embedding"),
        )
        books.append(kmeans_fit(sub, k=k, updates=updates))
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as m one-byte-ish codes (id, codes array<int>):
    nearest sub-centroid per subspace. Pure map-side — m fold-distance
    argmins over inlined literals, no shuffle, no Python; the encoded
    corpus is dim/m·(bytes/float) smaller than the raw vectors, which is
    the entire point at 100 TB (a 64-dim float corpus compresses 64×
    with m=4, k=16).
    """
    from .clustering import _dist_sql

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    # two staged projections: the k-distance arrays land in their own
    # columns FIRST, then argmin references the column twice — the same
    # stage-before-reference rule the text operators learned the hard
    # way (an inline array({dists}) under array_position AND array_min
    # would evaluate every fold twice per row)
    staged = df
    for s in range(m):
        sub = f"slice(CAST({vec_col} AS ARRAY<DOUBLE>), {s*dsub+1}, {dsub})"
        dists = ", ".join(_dist_sql(sub, c) for c in codebooks[s])
        staged = staged.withColumn(f"_pqd{s}", F.expr(f"array({dists})"))
    codes = F.array(
        *[
            (
                F.expr(f"array_position(_pqd{s}, array_min(_pqd{s}))") - 1
            ).cast("int")
            for s in range(m)
        ]
    )
    return staged.select(
        F.col(id_col).alias("id"), codes.alias("codes")
    )


def pq_topk(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Approximate top-k by Asymmetric Distance Computation: the query
    is NOT quantized — per subspace, a k-entry table of exact
    query-to-sub-centroid squared distances is computed driver-side
    (m·k doubles — model-scale, not data-scale) and inlined as literal
    arrays; each row's approx distance is the sum of m table lookups by
    its stored code. Pure map-side projection over the COMPRESSED corpus
    + TakeOrderedAndProject — the raw vectors are never read at query
    time, which is what PQ buys. Ties break on id. Approximate by
    design (quantization error): pair with an exact rerank over the
    top-C or the e02 exact scan as oracle; recall is a measured pytest
    contract."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    tables = []
    for s in range(m):
        q = query_vec[s * dsub : (s + 1) * dsub]
        tables.append(
            [
                sum((a - b) * (a - b) for a, b in zip(q, c))
                for c in codebooks[s]
            ]
        )
    terms = [
        F.element_at(
            F.array(*[F.lit(float(x)) for x in tables[s]]),
            F.element_at("codes", s + 1) + 1,
        )
        for s in range(m)
    ]
    dist = terms[0]
    for t in terms[1:]:
        dist = dist + t
    return (
        codes.select("id", F.round(dist, 6).alias("approx_dist"))
        .orderBy(F.col("approx_dist").asc(), F.col("id"))
        .limit(k)
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "qvec",
    bits: int = 8,
    scale_col: str = "scale",
    err_col: str = "max_abs_err",
) -> DataFrame:
    """Symmetric per-vector integer quantization — the storage/serving
    path of an embedding store (int8 vectors are 4x smaller than
    float32 and what ANN services ship over the wire; the public
    faiss/SQ8 convention): per vector, ``scale = max|x| / qmax`` with
    ``qmax = 2^(bits-1) - 1``, and each component maps to
    ``floor(x / max|x| * qmax + 0.5)`` — an EXPLICIT half-up rounding
    via floor, chosen over round() because engines disagree on
    half-even vs half-up tie behavior while floor(+0.5) is bit-defined
    everywhere (the oracle mirrors it verbatim). The all-zero vector
    quantizes to zeros with scale 0 (no divide-by-zero under ANSI).

    Adds ``out_col`` (array<int>), ``scale_col`` (double — dequantize
    as ``q * scale``) and ``err_col`` (double, the worst per-component
    reconstruction error — ≤ scale/2 by construction, a useful data
    quality gate). Raises if any output or working column name would
    silently clobber an existing input column (r13, per r12 ADVICE —
    ``withColumn`` replaces same-named columns without warning); pass
    ``scale_col``/``err_col``/``out_col`` to steer clear. Pure
    element-wise Catalyst + per-vector max selections: map-side, no
    shuffle, no UDF; every arithmetic step is order-independent, so
    results are bit-identical across engines."""
    if bits < 2 or bits > 31:
        raise ValueError(f"bits must be in [2, 31], got {bits}")
    tmp_col = f"_{out_col}_maxabs"
    clobbered = {out_col, scale_col, err_col, tmp_col} & set(df.columns)
    if clobbered:
        raise ValueError(
            "quantize_embeddings output columns already exist: "
            f"{sorted(clobbered)} — pass out_col/scale_col/err_col"
        )
    qmax = float((1 << (bits - 1)) - 1)
    v = F.col(vec_col)
    maxabs = F.array_max(
        F.transform(v, lambda x: F.abs(x.cast("double")))
    )
    out = df.withColumn(tmp_col, maxabs)
    m = F.col(tmp_col)
    qvec = F.when(m == 0.0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(
            v,
            lambda x: F.floor(
                x.cast("double") / m * F.lit(qmax) + F.lit(0.5)
            ).cast("int"),
        )
    )
    out = out.withColumn(out_col, qvec)
    scale = F.when(m == 0.0, F.lit(0.0)).otherwise(m / F.lit(qmax))
    out = out.withColumn(scale_col, scale)
    err = F.when(m == 0.0, F.lit(0.0)).otherwise(
        F.array_max(
            F.zip_with(
                v, F.col(out_col),
                lambda x, q: F.abs(
                    x.cast("double") - q.cast("double") * F.col(scale_col)
                ),
            )
        )
    )
    out = out.withColumn(err_col, err)
    return out.drop(tmp_col)
