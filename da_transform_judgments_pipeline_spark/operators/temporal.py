"""Temporal joins Spark has no native operator for: as-of join and
range-count join, built as compositions of existing DataFrame ops.

Both follow the same scale rule: never materialize the O(left × right)
theta-join a naive `l.ts BETWEEN ...` join plans. The as-of join is a
union + carry-forward window (ONE shuffle on the key, zero join); the
range join buckets time so each row meets only its own and the adjacent
bucket (shuffle on (key, bucket), candidate set linear in data for fixed
window/bucket ratio).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "right_",
    tiebreak: str | None = None,
) -> DataFrame:
    """For every left row, the single most recent right row with
    ``right.ts < left.ts`` on the same key (trades-vs-quotes semantics);
    unmatched left rows keep nulls.

    NOT a join at runtime: both sides union into one stream tagged by
    side, and a window over (key) ordered by (ts, side, tiebreak) carries
    the latest right payload forward with last(..., ignoreNulls) — each
    left row then reads the right row that preceded it. One shuffle on
    the key, linear state, no pair blow-up: the naive alternative (range
    theta join + per-left argmax) is O(left × right) per key and dies on
    hot keys at 100 TB. Left rows sort BEFORE right rows at equal ts, so
    the match is strictly-before. Ties among right rows at the same ts
    break on ``tiebreak`` (max wins; default: first of right_cols).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    tiebreak = tiebreak or right_cols[0]
    payload = F.struct(
        F.col(right_ts).alias("_ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ets"),
        F.lit(1).alias("_side"),
        F.col(tiebreak).cast("long").alias("_tb"),
        payload.alias("_payload"),
    )
    l = left.select(  # noqa: E741
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ets"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("_tb"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    r = r.withColumn(
        "_lrow", F.lit(None).cast(l.schema["_lrow"].dataType)
    )
    # right rows first at equal (ts, …)? No: LEFT first (side 0) so a
    # right row at the same instant is NOT visible to it (strict <);
    # among right rows, later ts then larger tiebreak wins last().
    w = (
        Window.partitionBy("_k")
        .orderBy("_ets", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    matched = (
        l.unionByName(r)
        .withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
        .filter(F.col("_side") == 0)
    )
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("_match._ts").alias(f"{prefix}{right_ts}"))
    out_cols.extend(
        F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in right_cols
    )
    return matched.select(*out_cols)


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    window_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    count_name: str = "n_in_range",
) -> DataFrame:
    """left + count of right rows with ``l.ts - window < r.ts < l.ts`` on
    the same key (e.g. "events by this user in the 5 minutes before each
    error").

    Bucketed range join: timestamps bucket at window width, each left row
    joins only (key, bucket) and (key, bucket-1) — every true match is in
    one of the two — then the exact interval filter prunes. The candidate
    set is linear in the data for a fixed window (two buckets per left
    row), where the naive theta join is quadratic per key. AQE's skew
    split handles hot (key, bucket) pairs.
    """
    bucket = lambda c: (  # noqa: E731
        F.floor(F.unix_micros(F.col(c)) / F.lit(window_seconds * 1_000_000))
    )
    l = left.withColumn("_b", bucket(left_ts))  # noqa: E741
    probes = l.withColumn(
        "_probe", F.explode(F.array(F.col("_b"), F.col("_b") - 1))
    )
    r = right.select(
        F.col(on).alias("_rk"),
        F.unix_micros(F.col(right_ts)).alias("_rus"),
        bucket(right_ts).alias("_rb"),
    )
    lus = F.unix_micros(F.col(left_ts))
    hits = (
        probes.join(
            r,
            (F.col(on) == F.col("_rk")) & (F.col("_probe") == F.col("_rb")),
        )
        .filter(
            (F.col("_rus") < lus)
            & (F.col("_rus") > lus - F.lit(window_seconds * 1_000_000))
        )
        .groupBy(*[F.col(c) for c in left.columns])
        .agg(F.count("*").alias(count_name))
    )
    return (
        l.drop("_b")
        .join(hits, left.columns, "left")
        .fillna({count_name: 0})
    )


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Gap-based batch sessionization: assign every row a per-key
    ``session_no`` (1-based) that increments whenever the gap to the
    previous event on the same key exceeds ``gap_seconds``.

    The classic two-window formulation: lag() marks session starts, a
    running sum over the same window ordering numbers them. ONE shuffle
    on the key; both windows and any downstream per-session groupBy
    reuse that partitioning (HashPartitioning(key) satisfies the
    clustered distribution of (key, session_no)), so session stats cost
    no second exchange. State is linear per key — no pair blow-up on hot
    keys, unlike a self-join formulation. The streaming twin is
    ``streaming/windows.py``'s native session_window; this is the batch/
    backfill path over historical data.

    ``order_cols`` breaks ordering ties at equal timestamps (default:
    none — pass the event id for full determinism).
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    gap_us = F.lit(int(gap_seconds) * 1_000_000)
    starts = (
        F.when(
            prev_us.isNull()
            | (F.unix_micros(F.col(ts_col)) - prev_us > gap_us),
            1,
        )
        .otherwise(0)
        .cast("long")
    )
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_no", F.sum(starts).over(running))


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_us: int = 7 * 24 * 3600 * 1_000_000,
) -> DataFrame:
    """Cohort retention matrix over an event stream: users grouped by the
    time bucket of their FIRST event (their cohort), counted in every
    later bucket they remain active — the standard product-analytics
    retention triangle, here as a batch operator over the events table.

    Buckets are fixed-width epoch intervals (``bucket_us`` microseconds,
    default one week): ``bucket = epoch_us(ts) div bucket_us`` — pure
    integer arithmetic, identical in any engine (no calendar/timezone
    date_trunc variance). Output: (cohort_bucket, bucket_offset, n_users)
    where offset 0 counts the cohort's size itself.

    Scale shape: (1) per-user min-bucket aggregate — one shuffle on user,
    map-side combined; (2) the distinct (user, bucket) activity set —
    same key, one shuffle; (3) cohort join back on user (co-keyed — AQE
    broadcasts the cohort side when small); (4) the (cohort, offset)
    count-distinct — users within one cohort-offset cell, map-side
    partial. No window over the full stream, no per-event state."""
    ub = F.expr(f"unix_micros({ts_col}) div {bucket_us}")
    ev = df.select(F.col(user_col).alias("u"), ub.alias("bucket"))
    cohorts = ev.groupBy("u").agg(F.min("bucket").alias("cohort_bucket"))
    active = ev.distinct()
    return (
        active.join(cohorts, "u")
        .groupBy(
            "cohort_bucket",
            (F.col("bucket") - F.col("cohort_bucket")).alias("bucket_offset"),
        )
        .agg(F.count_distinct("u").alias("n_users"))
    )


def funnel_depth(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_events_per_user: int = 100_000,
) -> DataFrame:
    """Ordered-funnel analysis: for each user, how far through the step
    sequence ``steps`` they progressed, where each step must occur at a
    STRICTLY LATER timestamp than the step before it (the standard
    product-analytics windowed-funnel semantics; reference analogue: the
    step-functions state machine's stage progression,
    `/root/reference/terraform/step-function-definition.json` — a record
    advances through named stages in order, never backwards).

    Semantics: depth d means there exist events e1..ed with
    ``type(ei) = steps[i]`` and ``ts(e1) < ts(e2) < ... < ts(ed)``;
    depth is the maximum such d. Equal timestamps never chain (strict
    inequality), so the result is insensitive to the scan order of
    same-timestamp events and bit-identical to the sequential
    min-timestamp formulation (t1 = min ts of step1; t2 = min ts of
    step2 with ts > t1; ...) — that simpler formulation IS the DuckDB
    oracle for this operator, making the two independent formulations
    cross-check each other.

    Scale shape: events not in ``steps`` are filtered out BEFORE the
    shuffle (usually the vast majority), then ONE groupBy-user shuffle
    collects each user's (ts, type) funnel events, sorts them per user
    (array_sort — per-group, not a global sort), and a single
    ``aggregate`` fold advances a (depth, last_ts) accumulator — one
    pass, no k self-joins, no window over the stream. The k-join
    formulation the oracle uses would be k co-keyed shuffles; the fold
    is one. Per-user funnel-event cardinality is bounded by
    ``max_events_per_user`` via slice() as an OOM guard (a user beyond
    it raises no error — excess latest events are ignored — documented
    contract for adversarial hot keys).
    """
    if not steps:
        raise ValueError("steps must be a non-empty list of event types")
    step_arr = ", ".join("'" + s.replace("'", "\\'") + "'" for s in steps)
    ev = df.filter(F.col(type_col).isin(steps)).select(
        F.col(user_col).alias("u"),
        F.struct(
            F.col(ts_col).alias("ts"), F.col(type_col).alias("tp")
        ).alias("e"),
    )
    per_user = ev.groupBy("u").agg(F.collect_list("e").alias("evs"))
    fold = F.expr(
        f"""
        aggregate(
          slice(array_sort(evs), 1, {max_events_per_user}),
          named_struct('depth', 0, 'last_ts', timestamp'0001-01-01'),
          (acc, e) -> IF(
            acc.depth < size(array({step_arr}))
              AND e.tp = element_at(array({step_arr}), acc.depth + 1)
              AND (acc.depth = 0 OR e.ts > acc.last_ts),
            named_struct('depth', acc.depth + 1, 'last_ts', e.ts),
            acc),
          acc -> acc.depth)
        """
    )
    return per_user.select(
        F.col("u").alias(user_col), fold.cast("long").alias("funnel_depth")
    )


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel conversion table on top of :func:`funnel_depth`: for each
    step 1..k, the number of users whose depth reached at least that
    step — the cumulative-conversion report every funnel dashboard
    renders, with every step present even when no user stops exactly
    there (an explicit 1..k spine, not the observed-depth histogram —
    a missing intermediate row would silently misreport conversion).
    The only data-scale cost is funnel_depth's single shuffle plus a
    ≤(k+1)-row depth histogram; the spine×histogram θ-join is k·(k+1)
    rows — control-plane, not data-plane."""
    depths = funnel_depth(df, steps, user_col, ts_col, type_col)
    hist = depths.groupBy("funnel_depth").agg(
        F.count("*").alias("n_at_depth")
    )
    spine = df.sparkSession.range(1, len(steps) + 1).select(
        F.col("id").alias("step_no")
    )
    return (
        spine.join(
            F.broadcast(hist),
            hist.funnel_depth >= spine.step_no,
            "left",
        )
        .groupBy("step_no")
        .agg(
            F.coalesce(F.sum("n_at_depth"), F.lit(0))
            .cast("long")
            .alias("n_users")
        )
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    start_col: str = "start",
    end_col: str = "end",
    bucket_width_s: int = 86_400,
    l_prefix: str = "l_",
    r_prefix: str = "r_",
) -> DataFrame:
    """Keyed interval-overlap join: all (left, right) pairs on the same
    key whose half-open time intervals ``[start, end)`` intersect
    (``l.start < r.end AND r.start < l.end``) — the third member of this
    module's temporal-join family (as-of = point-vs-latest, range-count
    = point-vs-window, this = interval-vs-interval).

    Never the O(L×R) theta join Spark would plan for the raw predicate:
    each interval is replicated to the fixed-width time buckets it
    spans, candidates meet through a plain equi-join on (key, bucket),
    and each true pair is counted EXACTLY once by keeping only the
    canonical bucket ``floor(max(l.start, r.start) / width)`` — for an
    overlapping pair that bucket provably lies inside both intervals'
    replicated ranges, and it is unique per pair, so no dropDuplicates
    shuffle is needed. The exact overlap predicate then prunes
    same-bucket false candidates. Cost: shuffle on (key, bucket) with
    replication factor 1 + span/width per row — linear for intervals
    bounded by a few buckets (pick ``bucket_width_s`` near the typical
    interval length; an interval ending exactly on a boundary carries
    one harmless extra replica).

    Output: key + ``l_``/``r_``-prefixed payload columns +
    ``overlap_us`` (exact integer microseconds of intersection,
    engine-portable — no float duration math).
    """
    w_us = bucket_width_s * 1_000_000

    def explode_buckets(df: DataFrame, prefix: str) -> DataFrame:
        s_us = F.unix_micros(F.col(start_col))
        e_us = F.unix_micros(F.col(end_col))
        payload = [
            F.col(c).alias(f"{prefix}{c}")
            for c in df.columns
            if c != on
        ]
        return df.select(
            F.col(on),
            s_us.alias(f"{prefix}s_us"),
            e_us.alias(f"{prefix}e_us"),
            F.explode(
                F.sequence(
                    F.floor(s_us / w_us), F.floor(e_us / w_us)
                )
            ).alias("bucket"),
            *payload,
        )

    lb = explode_buckets(left, l_prefix)
    rb = explode_buckets(right, r_prefix)
    ls, le = F.col(f"{l_prefix}s_us"), F.col(f"{l_prefix}e_us")
    rs, re_ = F.col(f"{r_prefix}s_us"), F.col(f"{r_prefix}e_us")
    canonical = F.floor(F.greatest(ls, rs) / w_us) == F.col("bucket")
    overlap = (ls < re_) & (rs < le)
    return (
        lb.join(rb, [on, "bucket"])
        .filter(overlap & canonical)
        .withColumn(
            "overlap_us", F.least(le, re_) - F.greatest(ls, rs)
        )
        .drop(
            "bucket",
            f"{l_prefix}s_us",
            f"{l_prefix}e_us",
            f"{r_prefix}s_us",
            f"{r_prefix}e_us",
        )
    )


def resample_gapfill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = None,
    bucket_s: int = 86_400,
    forward_fill: bool = False,
) -> DataFrame:
    """Regularize an event stream into a dense per-key time grid: one
    row per (key, bucket) for EVERY fixed-width bucket between the
    key's first and last event — gaps included — with the bucket's
    event count and (optionally) summed value, and optional
    carry-forward of the last observed sum across empty buckets. The
    resample-then-model step every time-series pipeline runs before
    windowed features; gap rows are what distinguish "no data" from
    "no row".

    Buckets are integer epoch intervals (``epoch_us div (bucket_s·10⁶)``
    — no calendar variance, same convention as retention_cohorts).
    Value sums are exact integer cents (decimal(18,2)→long·100), so
    aggregation order can't produce float drift.

    Scale shape: (1) per-(key, bucket) aggregate — ONE data shuffle,
    map-side combined; (2) per-key [min, max] bucket span from a
    same-key aggregate, then the dense spine fans out MAP-SIDE via
    sequence + explode (spine size = span/width per key — no
    driver-side calendar table, no cross join with a global spine
    covering keys' inactive eras); (3) spine LEFT JOIN aggregates,
    co-keyed on (key, bucket) — AQE broadcasts the smaller side at
    bench scale, co-partitions at 100 TB; (4) optional forward fill is
    a per-key last(ignorenulls) ordered window — state linear in
    buckets-per-key. A span cap is deliberately NOT imposed: span/width
    is bounded by data duration over bucket width, which the caller
    controls; one pathological key yields a long but narrow partition,
    not a blow-up.
    """
    w_us = bucket_s * 1_000_000
    bucket = F.floor(F.unix_micros(F.col(ts_col)) / w_us)
    val = (
        (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
        if value_col
        else F.lit(0).cast("long")
    )
    per_bucket = (
        df.select(
            F.col(key_col).alias("k"), bucket.alias("bucket"), val.alias("_v")
        )
        .groupBy("k", "bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("_v").alias("value_cents"),
        )
    )
    span = per_bucket.groupBy("k").agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    spine = span.select(
        "k", F.explode(F.sequence("_lo", "_hi")).alias("bucket")
    )
    dense = (
        spine.join(per_bucket, ["k", "bucket"], "left")
        .withColumn("n_events", F.coalesce("n_events", F.lit(0)))
        .withColumn(
            "value_cents", F.coalesce("value_cents", F.lit(0)).cast("long")
        )
    )
    if forward_fill:
        wf = (
            Window.partitionBy("k")
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = F.last(
            F.when(F.col("n_events") > 0, F.col("value_cents")),
            ignorenulls=True,
        ).over(wf)
        dense = dense.withColumn(
            "carried_cents", F.coalesce(filled, F.lit(0)).cast("long")
        )
    return dense.withColumnRenamed("k", key_col).withColumn(
        "n_events", F.col("n_events").cast("long")
    )


def ewma(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.5,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key exponentially-weighted moving average, final value per
    key: ``s₁ = x₁; sᵢ = (1−α)·sᵢ₋₁ + α·xᵢ`` over the time-ordered
    event stream — the standard smoothed-rate feature (and the seed
    convention shared by DuckDB's list_reduce, which makes the oracle a
    one-liner). For engine-bit-identical results pick an ``alpha`` with
    an exact binary representation (0.5, 0.25, 0.375, ...): then every
    step is two exactly-representable scalings and one rounding — the
    same IEEE ops in the same order on any engine. The recurrence is
    inherently sequential per key, so it runs as ONE groupBy-key shuffle
    collecting each key's (ts, tiebreak, value) structs, a per-group
    array_sort, and a single aggregate() fold — the funnel_depth
    pattern; no window over the stream, no per-event state.
    ``tiebreak_col`` orders equal timestamps (pass the event id for full
    determinism)."""
    fields = [F.col(ts_col).alias("ts")]
    if tiebreak_col:
        fields.append(F.col(tiebreak_col).alias("tb"))
    fields.append(F.col(value_col).cast("double").alias("v"))
    per_key = (
        df.select(F.col(key_col).alias("k"), F.struct(*fields).alias("e"))
        .groupBy("k")
        .agg(F.expr("array_sort(collect_list(e))").alias("evs"))
    )
    a = float(alpha)
    folded = F.expr(
        f"""
        aggregate(
          slice(evs, 2, greatest(size(evs) - 1, 0)),
          element_at(evs, 1).v,
          (acc, e) -> acc * {1.0 - a!r} + e.v * {a!r})
        """
    )
    return per_key.select(
        F.col("k").alias(key_col),
        F.round(folded, 6).alias("ewma"),
        F.size("evs").cast("long").alias("n_events"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key time-weighted average: each observation holds its value
    until the next one, so its weight is the microseconds until the
    key's next event (the last event carries no interval and drops) —
    the correct mean for irregularly-sampled state (sensor readings,
    account balances), where the plain mean over-weights bursts.

    Integer-exact until the final division: values become exact cents
    (decimal(18,2)→long), weights are integer microseconds from a lead()
    window, and the weighted sum is a long Σ cents·µs (map-side
    combinable, order-independent — no float drift anywhere). One
    shuffle on the key shared by the lead window and the aggregate.
    Output: numerator/denominator longs + twa = num/den/100 rounded to
    6 dp (one correctly-rounded double division on exact integers)."""
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    dur = (
        F.lead(F.unix_micros(F.col(ts_col))).over(w)
        - F.unix_micros(F.col(ts_col))
    )
    # the key keeps its IDENTITY (no alias) between the window and the
    # aggregate: an aliased key broke alias-aware partitioning propagation
    # here and re-shuffled the already-partitioned stream — plan-checked
    # in tests; the rename to the caller's name happens after the agg
    staged = df.select(
        F.col(key_col), cents.alias("_c"), dur.alias("_d")
    ).filter(F.col("_d").isNotNull())
    return (
        staged.groupBy(key_col)
        .agg(
            F.sum(F.col("_c") * F.col("_d")).alias("num_cents_us"),
            F.sum("_d").alias("den_us"),
        )
        .select(
            F.col(key_col),
            F.col("num_cents_us").cast("long").alias("num_cents_us"),
            F.col("den_us").cast("long").alias("den_us"),
            F.round(
                F.col("num_cents_us").cast("double")
                / F.col("den_us").cast("double")
                / 100.0,
                6,
            ).alias("twa"),
        )
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assemble slowly-changing-dimension type-2 history from a change
    stream: per key, consecutive observations with the SAME value merge
    into one validity interval ``[valid_from, valid_to)``; the current
    value's interval has ``valid_to = NULL``. The standard warehouse
    dimension-history shape, built from raw events in one pass.

    Run-compression is the classic gaps-and-islands formulation: a
    lag() marks change points, a running count over the same window
    numbers the runs (version_no), and one groupBy((key, run)) takes
    min/max bounds — ONE shuffle on the key, shared by both windows and
    the aggregate (the key keeps its identity throughout — see
    time_weighted_avg's alias note), no self-join, state linear per key.
    """
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    # lag() a one-field STRUCT, not the bare value: a bare lag() returns
    # NULL both for "no previous row" and "previous value was NULL", so
    # consecutive NULL-valued observations would split into separate
    # versions. The struct wrapper is NULL only when there is no previous
    # row; prev["v"] then carries the (possibly NULL) previous value for
    # a null-safe IS DISTINCT FROM comparison.
    prev = F.lag(F.struct(F.col(value_col).alias("v"))).over(w)
    is_change = (
        F.when(
            prev.isNull() | ~prev["v"].eqNullSafe(F.col(value_col)), 1
        )
        .otherwise(0)
        .cast("long")
    )
    numbered = df.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(value_col),
        F.sum(is_change).over(run).alias("version_no"),
    )
    runs = numbered.groupBy(key_col, "version_no").agg(
        F.first(F.col(value_col)).alias(value_col),
        F.min(ts_col).alias("valid_from"),
    )
    # valid_to = the NEXT run's valid_from (half-open intervals); the
    # current run has no successor → NULL. A max-of-next-event-ts inside
    # the run would be wrong: the final run's earlier rows point WITHIN
    # the run, masking the open interval. Same keyed partitioning as the
    # first window — no extra data shuffle.
    w2 = Window.partitionBy(key_col).orderBy("version_no")
    return runs.withColumn(
        "valid_to", F.lead("valid_from").over(w2)
    )
