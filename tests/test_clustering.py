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
