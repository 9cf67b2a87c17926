"""Scale utilities: skew-aware joins and bucketed co-location.

These are the knobs a 100 TB deployment reaches for when the default
hash-shuffle plan degrades (SURVEY.md §4 / BASELINE.json north star):

- :func:`salted_join` — when one join key carries a disproportionate share
  of the rows (hot consignments, hot users), a plain shuffle join lands the
  whole hot key on one task. Salting splits each key into ``salt`` synthetic
  sub-keys: the big side scatters uniformly, the small side replicates
  ``salt``×, and the join result is identical. AQE's skew-join handles
  moderate skew automatically; salting is the deterministic fallback for
  extreme single-key skew and for non-AQE environments.
- :func:`write_bucketed` / :func:`bucketed_table` — co-locate repeatedly
  joined tables on their join key so the join plans with ZERO exchanges:
  each bucket pair meets on the same executor. This is the Spark form of
  the reference's key-prefix partitioning convention (§1.1) applied to
  relational keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: identical result to ``big.join(small, on, how)``
    with the big side's hot keys spread over ``salt`` shuffle partitions.

    The big side gets a uniform per-row salt (hash of a per-row id — cheap,
    deterministic within a run); the small side is exploded ``salt``× so
    every (key, salt) bucket finds its match. Supported how: inner/left.
    Shuffle volume: big side unchanged, small side ×``salt`` (keep it for
    genuinely small-vs-huge joins; for two huge skewed sides prefer AQE
    skew handling)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    b = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast(
            "int"
        ),
    )
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = b.join(s, [on, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) on ``key``.
    Joins/aggregations between tables bucketed on the same key with the
    same bucket count plan with no Exchange — the shuffle is paid once at
    write time, then amortized over every downstream join. ``path`` makes
    it an external table (data outside the warehouse dir)."""
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan — the
    metric bucketing is meant to drive to zero (used by tests; handy when
    tuning a pipeline interactively)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln or "Exchange rangepartitioning" in ln
    )
