"""Similarity search over embedding columns (BASELINE.json north star).

Brute-force cosine top-k is the exact baseline; the scale path pre-buckets
with deterministic random-hyperplane LSH (signature computed map-side from
hash-seeded pseudo-random planes — no stored model, reproducible on any
cluster) and reranks exactly within buckets.
"""

from __future__ import annotations

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
) -> DataFrame:
    """Exact k-NN join: for every left row, its k nearest right rows by
    cosine. Brute-force cross-score + per-left-id window top-k; broadcast
    the smaller side when it fits. Output (id_l, id_r, cosine, rank)."""
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


def hyperplane_signature(
    vec: Column, n_planes: int = 16, dim: int = 64, seed: int = 42
) -> Column:
    """Random-hyperplane (SRP) LSH signature as an INT bucket key.

    Plane weights are derived deterministically from (seed, plane, dim-index)
    via a hash → [-0.5, 0.5) float — no stored model; any executor computes
    identical planes. sign(dot(plane, vec)) per plane packs into bits.
    """
    bits = []
    for p in range(n_planes):
        # deterministic pseudo-random weights per (plane, dim)
        weights = F.array(
            *[
                (
                    F.pmod(
                        F.hash(F.lit(seed), F.lit(p), F.lit(d)).cast("long"),
                        F.lit(10_000),
                    ).cast("double")
                    / 10_000.0
                )
                - 0.5
                for d in range(dim)
            ]
        )
        dot = F.aggregate(
            F.zip_with(weights, vec, lambda w, x: w * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(
            F.when(dot >= 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


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
    sig = hyperplane_signature(vec, n_planes, dim, seed)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qsig = hyperplane_signature(q, n_planes, dim, seed)
    scored = (
        df.select(
            F.col(id_col).alias("id"),
            vec.alias("v"),
            sig.alias("sig"),
            qsig.alias("qsig"),
        )
        .filter(
            F.bit_count(
                F.col("sig").bitwiseXOR(F.col("qsig")).cast("long")
            )
            <= max_hamming
        )
        .select(
            "id",
            F.round(cosine_similarity(F.col("v"), q), 6).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("id")).limit(k)
