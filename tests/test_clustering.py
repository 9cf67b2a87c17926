"""k-means clustering operator."""

import pytest
from pyspark.sql import functions as F

from da_transform_judgments_pipeline_spark.operators import clustering


def _blobs(spark):
    # two tight, well-separated 3-d blobs
    rows = []
    for i in range(10):
        rows.append((i, [0.0 + i * 0.01, 0.0, 0.0]))
    for i in range(10, 20):
        rows.append((i, [10.0 + i * 0.01, 10.0, 10.0]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_kmeans_separates_blobs(spark):
    df = _blobs(spark)
    out = clustering.kmeans(df, k=2, iterations=3).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster, set()).add(r.vec_id)
    assert sorted(map(len, by_cluster.values())) == [10, 10]
    assert set(range(10)) in by_cluster.values()


def test_kmeans_reproducible_mode_is_stable(spark):
    df = _blobs(spark)
    a = clustering.kmeans(df, k=2, iterations=2, reproducible=True).collect()
    b = clustering.kmeans(df, k=2, iterations=2, reproducible=True).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_kmeans_assignment_is_map_side(spark):
    """The assignment step must not shuffle: literal centroids compile to
    one projection over the scan (no Exchange in the plan)."""
    df = _blobs(spark)
    plan = clustering.assign_clusters(
        df, [[0.0, 0.0, 0.0], [10.0, 10.0, 10.0]]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_kmeans_input_validation(spark):
    df = _blobs(spark)
    with pytest.raises(ValueError, match="k must be"):
        clustering.kmeans(df, k=0)
    with pytest.raises(ValueError, match="empty"):
        clustering.kmeans(df.filter(F.col("vec_id") < 0), k=2)


def test_kmeans_fit_returns_final_centroids(spark):
    df = _blobs(spark)
    cent = clustering.kmeans_fit(df, k=2, updates=2)
    assert len(cent) == 2 and all(len(c) == 3 for c in cent)
    # after convergence on two tight blobs, centroids sit near the means
    lo = min(cent, key=lambda c: c[0])
    hi = max(cent, key=lambda c: c[0])
    assert abs(lo[1] - 0.0) < 0.5 and abs(hi[1] - 10.0) < 0.5


def test_ivf_index_full_probe_equals_exact(spark, tmp_path):
    """With nprobe = n_cells the IVF probe covers the whole corpus, so the
    result must EQUAL brute-force cosine_topk — the recall knob is
    explicit and its endpoint is exact."""
    from da_transform_judgments_pipeline_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cent = clustering.kmeans_fit(emb, k=4, updates=1)
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, path, cent)
    q = list(emb.filter("vec_id = 1").first().embedding)
    approx = similarity.ivf_topk(
        spark, path, cent, q, k=10, nprobe=len(cent)
    ).collect()
    exact = similarity.cosine_topk(emb, q, k=10).collect()
    key = lambda r: (r.id, r.cosine)  # noqa: E731
    assert [key(r) for r in approx] == [key(r) for r in exact]


def test_ivf_ann_recall_contract(spark, tmp_path):
    """e07's approximate IVF path gets a MEASURED recall contract:
    recall@10 vs exact top-10 (mean over the 10 lowest-vec_id queries,
    sf0.01, 500 vectors) at the serving default nprobe=4 of k=16 cells.
    Deterministic (min-id k-means seeding, fixed data); measured r5 =
    0.90 — the data-adaptive cells beat SRP's data-independent planes
    (0.37 at its default) at a quarter of the corpus probed. Floor just
    below the measured value so an assignment/build regression trips."""
    from da_transform_judgments_pipeline_spark.operators import similarity

    emb = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    ).persist()
    cent = clustering.kmeans_fit(emb, k=16, updates=1)
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, path, cent)
    idx = spark.read.parquet(path)
    recalls = []
    for r in emb.orderBy("vec_id").limit(10).collect():
        q = list(r["embedding"])
        exact = {x.id for x in similarity.cosine_topk(emb, q, k=10).collect()}
        approx = {
            x.id
            for x in similarity.ivf_topk(
                spark, idx, cent, q, k=10, nprobe=4
            ).collect()
        }
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.85
    emb.unpersist()


def test_ivf_probe_prunes_partitions(spark, tmp_path):
    """nprobe < n_cells must scan only the probed cell directories
    (partition pruning on cluster), a strict subset of the corpus."""
    from da_transform_judgments_pipeline_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cent = clustering.kmeans_fit(emb, k=8, updates=1)
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, path, cent)
    q = list(emb.filter("vec_id = 1").first().embedding)
    probe = similarity.ivf_topk(spark, path, cent, q, k=10, nprobe=2)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan
    rows = probe.collect()
    assert len(rows) == 10
    leaf = probe._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    metrics = leaf.metrics()
    assert metrics.apply("numPartitions").value() <= 2
    assert metrics.apply("numOutputRows").value() < emb.count()
    # the query's own vector lives in the nearest probed cell
    assert rows[0].id == 1 and rows[0].cosine == 1.0


def test_cluster_balanced_sample(spark):
    """Per-cluster cap holds, ranks start at 1 and order by distance, and
    every cluster with members is represented — the diversity contract a
    uniform sample can't give."""
    df = _blobs(spark)
    out = clustering.cluster_balanced_sample(
        df, k=2, per_cluster=3, iterations=2
    ).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster, []).append(r)
    assert set(by_cluster) == {0, 1}
    for members in by_cluster.values():
        ranks = sorted(m.rank for m in members)
        assert ranks == [1, 2, 3]
        dists = [m.dist for m in sorted(members, key=lambda m: m.rank)]
        assert dists == sorted(dists)


def test_cluster_balanced_sample_validates(spark):
    df = _blobs(spark)
    with pytest.raises(ValueError, match="per_cluster"):
        clustering.cluster_balanced_sample(df, k=2, per_cluster=0)


def test_ivf_incremental_append(spark, tmp_path):
    """Appending a batch against the frozen centroid model must make the
    new vectors findable by the partition-pruned probe, leave old results
    intact, and at nprobe=n_cells stay exactly equal to brute force over
    the grown corpus."""
    from da_transform_judgments_pipeline_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") < 400)
    batch = emb.filter(F.col("vec_id") >= 400)
    cent = clustering.kmeans_fit(base, k=4, updates=1)
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(base, path, cent)
    similarity.append_to_ivf_index(batch, path, cent)

    q = list(emb.filter("vec_id = 450").first().embedding)  # appended vec
    full = similarity.ivf_topk(
        spark, path, cent, q, k=10, nprobe=len(cent)
    ).collect()
    exact = similarity.cosine_topk(emb, q, k=10).collect()
    assert [(r.id, r.cosine) for r in full] == [
        (r.id, r.cosine) for r in exact
    ]
    # the appended vector itself tops its own query via the pruned probe
    probe = similarity.ivf_topk(spark, path, cent, q, k=1, nprobe=1).collect()
    assert probe[0].id == 450 and probe[0].cosine == 1.0


def test_mmr_rerank_prefers_diversity(spark):
    """A near-duplicate of the top hit must be displaced by a less
    relevant but diverse candidate, and the first pick is the pure
    relevance argmax. Verified against an independent numpy greedy
    reference on the same rounded inputs."""
    from da_transform_judgments_pipeline_spark.operators import similarity

    # query NOT in the corpus (a corpus member identical to the query
    # makes every λ=0.5 score collapse to 0 — rel(c) == sim(c, pick1)):
    # ids 1 and 2 are near-duplicates hugging the query, id 3 is diverse
    vecs = [
        (1, [0.95, 0.05, 0.0, 0.0]),
        (2, [0.94, 0.06, 0.0, 0.0]),    # near-duplicate of 1
        (3, [0.6, 0.0, 0.8, 0.0]),      # diverse, mid relevance
        (4, [0.0, 1.0, 0.0, 0.0]),      # orthogonal, rel ~0
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = [
        (r.rank, r.id)
        for r in similarity.mmr_rerank(
            df, [1.0, 0.0, 0.0, 0.0], k=3, n_candidates=4, lambda_=0.5
        ).collect()
    ]
    # pick 1: id 1 (max rel). pick 2: id 3's diversity (sim(3,1)≈0.60)
    # outscores the near-dup id 2 (sim(2,1)≈0.99999 → negative margin)
    assert out == [(1, 1), (2, 3), (3, 2)]


def test_mmr_rerank_matches_numpy_reference(spark):
    """Engine MMR vs an independent numpy implementation over random
    vectors — same candidates, same rounding, same greedy decisions."""
    import numpy as np

    from da_transform_judgments_pipeline_spark.operators import similarity

    rng = np.random.RandomState(7)
    mat = rng.randn(40, 16)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(40)],
        ["vec_id", "embedding"],
    )
    q = [float(x) for x in mat[0]]
    got = [
        (r.rank, r.id)
        for r in similarity.mmr_rerank(
            df, q, k=8, n_candidates=20, lambda_=0.5
        ).collect()
    ]

    def cos(a, b):
        return round(
            float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 6
        )

    rel = sorted(
        ((cos(mat[i], np.array(q)), i) for i in range(40)),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    relmap = {i: r for r, i in rel}
    chosen, remaining = [], sorted(relmap)
    while remaining and len(chosen) < 8:
        best = None
        for c in remaining:
            ms = max(
                (cos(mat[c], mat[s]) for s in chosen), default=0.0
            )
            score = 0.5 * relmap[c] - 0.5 * ms
            if best is None or score > best[0]:
                best = (score, c)
        chosen.append(best[1])
        remaining.remove(best[1])
    assert got == [(i + 1, c) for i, c in enumerate(chosen)]


def test_pq_recall_contract(spark):
    """PQ/ADC approximate top-k must place a measured floor of the TRUE
    euclidean top-10 inside its top-50 — the recall contract that makes
    'approximate by design' a tested property, same pattern as the
    SRP/IVF recall tests. Also: codes are valid (m entries in [0,k)),
    and the encoded corpus is complete."""
    import numpy as np

    from da_transform_judgments_pipeline_spark.operators import similarity

    rng = np.random.RandomState(11)
    mat = rng.randn(300, 16).astype(float)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(300)],
        ["vec_id", "embedding"],
    )
    q = [float(x) for x in mat[7]]
    books = similarity.pq_train(df, m=4, k=8, updates=2)
    assert len(books) == 4 and all(len(b) == 8 for b in books)
    codes = similarity.pq_encode(df, books)
    rows = codes.collect()
    assert len(rows) == 300
    assert all(
        len(r.codes) == 4 and all(0 <= c < 8 for c in r.codes)
        for r in rows
    )
    approx = [
        r.id for r in similarity.pq_topk(codes, books, q, k=50).collect()
    ]
    true_top = list(
        np.argsort(((mat - np.array(q)) ** 2).sum(axis=1))[:10]
    )
    recall = len(set(approx) & set(int(i) for i in true_top)) / 10.0
    # measured ~0.8-1.0 on gaussian data at these params; floor at 0.5
    assert recall >= 0.5, f"PQ recall@10-in-50 too low: {recall}"
    # the query vector's own row must always survive (distance ~0)
    assert 7 in approx[:10] or 7 in approx


def test_mmr_rerank_string_ids(spark):
    """Regression: the output schema must inherit the input id column's
    type — string doc ids used to crash createDataFrame against the
    hardcoded 'id long' schema."""
    from da_transform_judgments_pipeline_spark.operators import similarity

    vecs = [
        ("doc-a", [0.95, 0.05, 0.0, 0.0]),
        ("doc-b", [0.94, 0.06, 0.0, 0.0]),
        ("doc-c", [0.6, 0.0, 0.8, 0.0]),
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = [
        (r.rank, r.id)
        for r in similarity.mmr_rerank(
            df, [1.0, 0.0, 0.0, 0.0], k=2, n_candidates=3, lambda_=0.5
        ).collect()
    ]
    assert out == [(1, "doc-a"), (2, "doc-c")]
    assert dict(similarity.mmr_rerank(
        df, [1.0, 0.0, 0.0, 0.0], k=1, n_candidates=2
    ).dtypes)["id"] == "string"


def test_semantic_dedup_cluster_then_prune(spark):
    """SemDeDup semantics on controlled vectors: near-identical vectors
    in the same cluster prune to the lowest id; a high-cosine pair
    SPLIT across clusters is NOT pruned (the documented
    cluster-locality tradeoff that buys the sum-of-cluster-sizes-squared
    cost); orthogonal cluster-mates survive."""
    from da_transform_judgments_pipeline_spark.operators import clustering

    # two well-separated centroid directions in 4-d
    c0, c1 = [10.0, 0.0, 0.0, 0.0], [0.0, 10.0, 0.0, 0.0]
    rows = [
        (1, [10.0, 0.1, 0.0, 0.0]),   # cluster 0
        (2, [10.0, 0.11, 0.0, 0.0]),  # near-dup of 1, cluster 0 -> pruned by 1
        (3, [10.0, 0.12, 0.0, 0.0]),  # near-dup chain, cluster 0 -> pruned by 1
        (4, [0.0, 10.0, 0.2, 0.0]),   # cluster 1
        (5, [5.2, 5.0, 0.0, 0.0]),    # cosine~0.72 with id 1 BUT lands
                                      # cluster 0/1 boundary: make it land c1
        (6, [0.0, 0.0, 10.0, 0.0]),   # orthogonal, cluster 0 or 1, kept
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r
        for r in clustering.semantic_dedup(
            df, [c0, c1], threshold=0.95
        ).collect()
    }
    assert out[1]["kept"] and out[1]["pruned_by"] is None
    assert not out[2]["kept"] and out[2]["pruned_by"] == 1
    assert not out[3]["kept"] and out[3]["pruned_by"] == 1  # lowest, not 2
    assert out[4]["kept"]
    assert out[6]["kept"]
    # ids 1 and 5: cosine ~0.72 < threshold anyway; raise threshold
    # scenario: a >0.95 pair split across clusters is not pruned
    split = spark.createDataFrame(
        [(1, [10.0, 9.0, 0.0, 0.0]), (2, [9.0, 10.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    res = {
        r["vec_id"]: r
        for r in clustering.semantic_dedup(
            split, [c0, c1], threshold=0.9
        ).collect()
    }
    # cosine(v1, v2) = 180/181 ~ 0.994 > 0.9, but they sit in different
    # clusters -> both kept
    assert res[1]["cluster"] != res[2]["cluster"]
    assert res[1]["kept"] and res[2]["kept"]


def test_semantic_dedup_cap_is_exact_below_cap(spark):
    """capped == uncapped whenever no cluster exceeds max_cluster_size:
    the cap's gating predicate (size <= cap OR rank <= anchors) passes
    every row, so the pair set — and every pruning decision — is
    identical on a non-degenerate corpus."""
    from da_transform_judgments_pipeline_spark.operators import clustering

    c0, c1 = [10.0, 0.0, 0.0, 0.0], [0.0, 10.0, 0.0, 0.0]
    rows = [
        (1, [10.0, 0.1, 0.0, 0.0]),
        (2, [10.0, 0.11, 0.0, 0.0]),
        (3, [10.0, 0.12, 0.0, 0.0]),
        (4, [0.0, 10.0, 0.2, 0.0]),
        (5, [0.0, 10.0, 0.21, 0.0]),
        (6, [0.0, 0.0, 10.0, 0.0]),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    uncapped = sorted(
        map(tuple, clustering.semantic_dedup(df, [c0, c1], 0.95).collect())
    )
    capped = sorted(
        map(
            tuple,
            clustering.semantic_dedup(
                df, [c0, c1], 0.95, max_cluster_size=10, n_anchors=2
            ).collect(),
        )
    )
    assert capped == uncapped


def test_semantic_dedup_mega_cluster_anchor_bound(spark):
    """The planted mega-cluster the cap exists for: 120 near-identical
    vectors collapse into ONE cluster. With max_cluster_size=50 /
    n_anchors=8 the pair term is |c|*anchors (bounded linear), and on a
    ball of near-dups the decision is preserved: every member except the
    lowest id is pruned BY the lowest id (an anchor). The documented
    approximation is also pinned: a member whose only offender ranks
    past the anchor set stays kept under the cap."""
    from da_transform_judgments_pipeline_spark.operators import clustering

    c0, c1 = [10.0, 0.0, 0.0, 0.0], [0.0, 10.0, 0.0, 0.0]
    ball = [
        (i, [10.0, 0.001 * i, 0.0, 0.0]) for i in range(1, 121)
    ]
    # ids 200/201: a near-dup pair orthogonal to the ball, same cluster
    # (cluster 0 direction is x; put them on z so they land by tie in
    # cluster 0? no — land them in cluster 1, far from its centroid's
    # neighbors, so their only offenders are each other)
    pair = [(200, [0.0, 10.0, 9.0, 0.0]), (201, [0.0, 10.0, 9.01, 0.0])]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in ball + pair],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r
        for r in clustering.semantic_dedup(
            df, [c0, c1], 0.99, max_cluster_size=50, n_anchors=8
        ).collect()
    }
    # the ball: id 1 kept, everyone else pruned by 1 — identical to the
    # uncapped decision, at |c|*8 instead of |c|^2 pairs
    assert out[1]["kept"]
    for i in range(2, 121):
        assert not out[i]["kept"] and out[i]["pruned_by"] == 1
    # the isolated near-dup pair in the small cluster keeps exact
    # full-pairwise semantics (cluster 1 is under the cap)
    assert out[200]["kept"]
    assert not out[201]["kept"] and out[201]["pruned_by"] == 200

    # approximation pinned: push the pair INTO the oversized cluster as
    # ids ranking far past the anchor set — orthogonal to the ball so
    # their only offender is each other; under the cap they are no
    # longer compared, so both stay kept (uncapped would prune 261)
    deep = [(260, [10.0, 0.0, 9.0, 0.0]), (261, [10.0, 0.0, 9.01, 0.0])]
    df2 = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in ball + deep],
        "vec_id long, embedding array<float>",
    )
    capped = {
        r["vec_id"]: r
        for r in clustering.semantic_dedup(
            df2, [c0, c1], 0.99, max_cluster_size=50, n_anchors=8
        ).collect()
    }
    uncapped = {
        r["vec_id"]: r
        for r in clustering.semantic_dedup(df2, [c0, c1], 0.99).collect()
    }
    assert capped[260]["cluster"] == capped[1]["cluster"]  # in the ball
    assert capped[260]["kept"] and capped[261]["kept"]
    assert not uncapped[261]["kept"]


def test_semantic_dedup_validates_cap_params(spark):
    from da_transform_judgments_pipeline_spark.operators import clustering

    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="max_cluster_size"):
        clustering.semantic_dedup(df, [[1.0, 0.0]], max_cluster_size=0)
    with pytest.raises(ValueError, match="n_anchors"):
        clustering.semantic_dedup(
            df, [[1.0, 0.0]], max_cluster_size=5, n_anchors=0
        )


def test_semantic_dedup_incremental_lifecycle(spark, tmp_path):
    """The SemDeDup incremental lifecycle (build → incremental → append
    → incremental): with waves in id order and no cap, each wave's
    incremental decisions equal the full-corpus semantic_dedup
    restricted to that wave; corpus-first semantics holds even against
    a HIGHER-id corpus member; and the bucketed index join adds ZERO
    corpus-side Exchange."""
    from da_transform_judgments_pipeline_spark.operators.scale import (
        exchange_count,
    )

    c0, c1 = [10.0, 0.0, 0.0, 0.0], [0.0, 10.0, 0.0, 0.0]
    cents = [c0, c1]

    def mk(rows):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<float>",
        )

    wave1 = [
        (1, [10.0, 0.10, 0.0, 0.0]),
        (2, [10.0, 0.11, 0.0, 0.0]),   # pruned by 1 at build
        (4, [0.0, 10.0, 0.2, 0.0]),
        (6, [0.0, 0.0, 10.0, 0.0]),
    ]
    wave2 = [
        (10, [10.0, 0.12, 0.0, 0.0]),  # near-dup of corpus 1 → pruned
        (11, [0.0, 10.0, 9.0, 0.0]),   # novel in cluster 1 → kept
        (12, [0.0, 10.0, 9.01, 0.0]),  # near-dup of batch-mate 11
    ]
    wave3 = [
        (20, [0.0, 10.0, 9.02, 0.0]),  # near-dup of appended 11 → pruned
    ]
    table = "sem_idx_testinc"
    try:
        clustering.build_semantic_index(
            mk(wave1), cents, table, path=str(tmp_path / "semidx"),
            buckets=4,
        )

        inc2 = {
            r["vec_id"]: r
            for r in clustering.semantic_dedup_incremental(
                mk(wave2), spark, table, cents, threshold=0.95
            ).collect()
        }
        full = {
            r["vec_id"]: r
            for r in clustering.semantic_dedup(
                mk(wave1 + wave2), cents, threshold=0.95
            ).collect()
        }
        assert set(inc2) == {10, 11, 12}
        for vid in inc2:
            assert inc2[vid]["kept"] == full[vid]["kept"], vid
            assert inc2[vid]["pruned_by"] == full[vid]["pruned_by"], vid
        assert not inc2[10]["kept"] and inc2[10]["pruned_by"] == 1
        assert inc2[11]["kept"]
        assert not inc2[12]["kept"] and inc2[12]["pruned_by"] == 11

        # corpus-first: a batch id LOWER than its corpus offender still
        # prunes (temporal order beats numeric id — the d11 rule)
        early = {
            r["vec_id"]: r
            for r in clustering.semantic_dedup_incremental(
                mk([(0, [10.0, 0.10, 0.0, 0.0])]), spark, table, cents,
                threshold=0.95,
            ).collect()
        }
        assert not early[0]["kept"] and early[0]["pruned_by"] == 1

        clustering.append_to_semantic_index(mk(wave2), table, cents)
        inc3 = {
            r["vec_id"]: r
            for r in clustering.semantic_dedup_incremental(
                mk(wave3), spark, table, cents, threshold=0.95
            ).collect()
        }
        assert not inc3[20]["kept"] and inc3[20]["pruned_by"] == 11

        # ranks: appended rows rank after the cluster's existing members
        rks = {
            r["id"]: r["rk"] for r in spark.table(table).collect()
        }
        assert rks[11] > rks[4] and rks[12] > rks[11]

        # exchange budget: with broadcast disabled, the bucketed index
        # joins with zero corpus-side Exchange; an unbucketed copy of
        # the same rows pays one more
        spark.table(table).write.mode("overwrite").saveAsTable(
            f"{table}_flat"
        )
        saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            n_bucketed = exchange_count(
                clustering.semantic_dedup_incremental(
                    mk(wave3), spark, table, cents, threshold=0.95
                )
            )
            n_flat = exchange_count(
                clustering.semantic_dedup_incremental(
                    mk(wave3), spark, f"{table}_flat", cents,
                    threshold=0.95,
                )
            )
            # the CAPPED regime (the exact configuration e14 records)
            # adds a size groupBy + gate on the index side — assert it
            # stays Exchange-free on the bucketed table too
            n_capped = exchange_count(
                clustering.semantic_dedup_incremental(
                    mk(wave3), spark, table, cents, threshold=0.95,
                    max_cluster_size=50, n_anchors=16,
                )
            )
            n_capped_flat = exchange_count(
                clustering.semantic_dedup_incremental(
                    mk(wave3), spark, f"{table}_flat", cents,
                    threshold=0.95, max_cluster_size=50, n_anchors=16,
                )
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        assert n_flat == n_bucketed + 1, (n_bucketed, n_flat)
        # flat pays for the decision join AND the size groupBy
        assert n_capped_flat == n_capped + 2, (n_capped, n_capped_flat)
    finally:
        spark.sql("DROP TABLE IF EXISTS sem_idx_testinc")
        spark.sql("DROP TABLE IF EXISTS sem_idx_testinc_flat")


def test_semantic_dedup_incremental_replay_safe(spark, tmp_path):
    """At-least-once tolerance (the foreachBatch replay window): after
    a batch has ALREADY been appended to the index, re-running the
    incremental decision on that same batch returns the ORIGINAL
    decisions (no self-prunes, no corpus-first flips through batch
    mates), and re-appending adds ZERO rows (id-idempotent)."""
    cents = [[10.0, 0.0, 0.0, 0.0], [0.0, 10.0, 0.0, 0.0]]

    def mk(rows):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<float>",
        )

    corpus = [(1, [10.0, 0.1, 0.0, 0.0])]
    batch = [
        (10, [0.0, 10.0, 1.0, 0.0]),
        (11, [0.0, 10.0, 1.001, 0.0]),  # pruned by batch-mate 10
    ]
    table = "sem_idx_testreplay"
    try:
        clustering.build_semantic_index(
            mk(corpus), cents, table, path=str(tmp_path / "ridx"),
            buckets=2,
        )
        first = sorted(
            tuple(r)
            for r in clustering.semantic_dedup_incremental(
                mk(batch), spark, table, cents, threshold=0.99
            ).collect()
        )
        clustering.append_to_semantic_index(mk(batch), table, cents)
        # --- the replay: same batch, index already contains it
        replay = sorted(
            tuple(r)
            for r in clustering.semantic_dedup_incremental(
                mk(batch), spark, table, cents, threshold=0.99
            ).collect()
        )
        assert replay == first
        assert {r[0]: r[2] for r in replay} == {10: True, 11: False}
        clustering.append_to_semantic_index(mk(batch), table, cents)
        rows = spark.table(table).collect()
        assert len(rows) == 3  # 1 corpus + 2 batch, no duplicates
        # ranks stay dense and unique within each cluster
        by_cluster: dict = {}
        for r in rows:
            by_cluster.setdefault(r["cluster"], []).append(r["rk"])
        for rks in by_cluster.values():
            assert sorted(rks) == list(range(1, len(rks) + 1))
    finally:
        spark.sql("DROP TABLE IF EXISTS sem_idx_testreplay")


def test_semantic_dedup_incremental_cap_uses_frozen_anchors(spark, tmp_path):
    """Capped incremental regime: an oversized index cluster compares
    only against its rk <= n_anchors lowest-id members; an offender
    ranked past the anchor set is NOT seen (the documented recall
    trade), while anchor offenders still prune."""
    cents = [[10.0, 0.0, 0.0, 0.0], [0.0, 10.0, 0.0, 0.0]]
    # cluster 0: ids 1..5, mutually orthogonal-ish except none near the
    # probes; the probe's only offender is id 5 (rank 5)
    corpus = [
        (1, [10.0, 0.0, 1.0, 0.0]),
        (2, [10.0, 0.0, -1.0, 0.0]),
        (3, [10.0, 0.0, 0.0, 1.0]),
        (4, [10.0, 0.0, 0.0, -1.0]),
        (5, [10.0, 3.0, 0.0, 0.0]),
    ]
    probe = [(30, [10.0, 3.01, 0.0, 0.0])]  # near-dup of 5 only

    def mk(rows):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<float>",
        )

    table = "sem_idx_testcap"
    try:
        clustering.build_semantic_index(
            mk(corpus), cents, table, path=str(tmp_path / "capidx"),
            buckets=2,
        )
        kw = dict(threshold=0.999, max_cluster_size=3)
        # anchors cover rank 5 → offender seen
        seen = clustering.semantic_dedup_incremental(
            mk(probe), spark, table, cents, n_anchors=5, **kw
        ).collect()[0]
        assert not seen["kept"] and seen["pruned_by"] == 5
        # anchors stop at rank 4 → offender invisible, probe kept
        blind = clustering.semantic_dedup_incremental(
            mk(probe), spark, table, cents, n_anchors=4, **kw
        ).collect()[0]
        assert blind["kept"]
        # cap >= cluster size → exact regardless of anchors
        exact = clustering.semantic_dedup_incremental(
            mk(probe), spark, table, cents, n_anchors=1,
            threshold=0.999, max_cluster_size=5,
        ).collect()[0]
        assert not exact["kept"] and exact["pruned_by"] == 5
    finally:
        spark.sql("DROP TABLE IF EXISTS sem_idx_testcap")
