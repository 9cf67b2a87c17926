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


def keyed_prefix_rank(
    df: DataFrame,
    key_col: str,
    order_col: str,
    rank_name: str = "rank_in_key",
    range_partitions: int = 32,
) -> DataFrame:
    """0-based rank of each row WITHIN its key group, ordered by
    ``order_col`` — computed WITHOUT ``Window.partitionBy(key)``, for
    the low-cardinality/huge-group regime (modalities, languages,
    shards) where a keyed window would funnel each giant group through
    ONE task. High-cardinality keys don't need this: their groups are
    small, a plain keyed window is fine.

    Two-phase parallel prefix scan, generalized per key from
    text.sequence_pack_plan's global scan: (1) range-repartition on
    ``order_col`` alone — every key stays spread over ALL partitions;
    (2) partition-local per-key ranks via a window on
    (partition_id, key) — local panes, no cross-partition state;
    (3) per-(partition, key) COUNTS collect to the driver — P×K small
    integers, control-plane by the documented cardinality contract —
    and fold into per-(partition, key) prefix offsets added back as a
    literal map. The persist pins the sampled range partitioning so the
    subtotal job and the final pass see identical physical partitions
    (same pin rationale as sequence_pack_plan).

    Ties on ``order_col`` within one key break by physical order inside
    a partition — pass a unique order column (an id) for full
    determinism, as with sequence_pack_plan.
    """
    from pyspark.sql import Window

    from .dedup import _persist

    ranged = df.repartitionByRange(range_partitions, order_col).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid", key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = _persist(
        ranged.withColumn(
            "_local_rank", F.coalesce(F.count("*").over(w_local), F.lit(0))
        )
    )
    # Subtotals collect the ENGINE-rendered key string (CAST(key AS
    # STRING) evaluated by Spark), not a driver-side str(key): Python
    # str() disagrees with Spark's cast for booleans ('True' vs 'true'),
    # float formatting, and NULL (str(None)='None' vs concat_ws dropping
    # the null) — a mismatch would make the map lookup silently miss and
    # coalesce(..., 0) would return wrong ranks with no error. Using the
    # engine's own rendering makes driver and engine keys byte-identical.
    # Sort by pid first (ascending pid order per key is what makes the
    # prefix fold correct); the key component only groups, so NULLs sort
    # via a (is-null, value) pair to stay comparable with strings.
    subtotals = sorted(
        (
            (
                (r["_pid"], r["_keystr"]),
                r["c"],
            )
            for r in local.groupBy(
                F.col("_pid"),
                F.col(key_col).cast("string").alias("_keystr"),
            )
            .agg(F.count("*").alias("c"))
            .collect()
        ),
        key=lambda t: (t[0][0], t[0][1] is not None, t[0][1] or ""),
    )
    prefix: dict[tuple, int] = {}
    acc: dict = {}
    for (pid, keystr), c in subtotals:
        prefix[(pid, keystr)] = acc.get(keystr, 0)
        acc[keystr] = acc.get(keystr, 0) + c
    # Map keys replicate concat_ws semantics exactly: a NULL key is
    # DROPPED by concat_ws, leaving just the pid — mirror that here so
    # NULL-keyed rows also hit their offset.
    mapping = F.create_map(
        *[
            x
            for (pid, keystr), off in prefix.items()
            for x in (
                F.lit(
                    f"{pid}\x01{keystr}" if keystr is not None else str(pid)
                ),
                F.lit(off),
            )
        ]
    ) if prefix else F.create_map()
    lookup = F.concat_ws(
        "\x01", F.col("_pid").cast("string"), F.col(key_col).cast("string")
    )
    return (
        local.withColumn(
            rank_name,
            (
                F.coalesce(mapping[lookup], F.lit(0))
                + F.col("_local_rank")
            ).cast("long"),
        )
        .drop("_pid", "_local_rank")
    )


def zorder_index(x: "F.Column", y: "F.Column", bits: int = 16) -> "F.Column":
    """Morton/Z-order index of two non-negative integer columns: the low
    ``bits`` of each dimension bit-interleaved (x in even positions, y
    in odd) — the space-filling-curve key lakehouse layouts sort by so
    ONE sorted file order gives locality (and therefore footer-stat file
    pruning) on BOTH dimensions at once, where a lexicographic sort
    only prunes on its leading column.

    Pure integer shifts/masks — 2·bits cheap terms, whole-stage-codegen
    friendly, bit-identical in any engine (the oracle re-states the same
    formula). Pair with :func:`..sources.sinks.write_sorted_parquet`
    ordered by the index to materialize the layout.
    """
    xi = x.cast("long")
    yi = y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + (F.shiftright(xi, i).bitwiseAND(F.lit(1)) * (1 << (2 * i)))
            + (F.shiftright(yi, i).bitwiseAND(F.lit(1)) * (1 << (2 * i + 1)))
        )
    return z


def zorder_sql(x_sql: str, y_sql: str, bits: int = 16) -> str:
    """The identical Morton formula as SQL text (for oracles / other
    engines): generated from the same loop so the two constructions
    cannot drift."""
    terms = []
    for i in range(2 * bits):
        src = x_sql if i % 2 == 0 else y_sql
        bit = i // 2
        terms.append(
            f"(((CAST({src} AS BIGINT) >> {bit}) & 1) * {1 << i})"
        )
    return "(" + " + ".join(terms) + ")"


def hll_distinct_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Mergeable approximate distinct counts per group via Spark's
    Datasketches HLL builtins: (group, estimate, sketch) where `sketch`
    is the binary HLL state — the 100 TB cardinality primitive, because
    sketches MERGE: per-partition sub-aggregates union losslessly (the
    map-side combine the exact count-distinct's Expand can't give you),
    daily sketches roll into monthly ones without touching raw data, and
    the state is KB-scale regardless of cardinality. Relative error
    ≈ 1.04/√2^lgk (~1.6% at the default lgk=12) — approximate by
    design, so it gets a measured-error pytest contract instead of a
    hash oracle (the e03/e07/e12 pattern)."""
    sk = F.expr(f"hll_sketch_agg({value_col}, {lgk})")
    return (
        df.groupBy(group_col)
        .agg(sk.alias("sketch"))
        .select(
            group_col,
            F.expr("hll_sketch_estimate(sketch)").alias("approx_distinct"),
            "sketch",
        )
    )


def hll_union_estimate(sketches: DataFrame, sketch_col: str = "sketch"):
    """Union a column of HLL sketches into one corpus-wide estimate —
    the roll-up step (shards → global) that makes sketches worth
    keeping. Returns the estimated distinct count as a Python int."""
    row = sketches.agg(
        F.expr(f"hll_sketch_estimate(hll_union_agg({sketch_col}))").alias(
            "est"
        )
    ).first()
    return int(row["est"])
