"""As-of and range-count temporal joins (operators/temporal.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from da_transform_judgments_pipeline_spark.operators import temporal


def _ts(m, s=0, us=0):
    return datetime(2024, 1, 1, 0, m, s, us)


def test_as_of_join_strict_before_and_tiebreak(spark):
    clicks = spark.createDataFrame(
        [
            (100, 1, _ts(5)),   # after views 10, 11
            (101, 1, _ts(2)),   # exactly AT view 10's ts -> must not match it
            (102, 2, _ts(9)),   # user 2: one view before
            (103, 3, _ts(1)),   # user 3: no views at all
        ],
        ["click_id", "user_id", "click_ts"],
    )
    views = spark.createDataFrame(
        [
            (10, 1, _ts(2)),
            (11, 1, _ts(2)),    # same ts as view 10: max view_id wins
            (12, 1, _ts(7)),    # after every click -> never matched
            (13, 2, _ts(4)),
        ],
        ["view_id", "user_id", "ts"],
    )
    out = {
        r.click_id: r.view_id
        for r in temporal.as_of_join(
            clicks, views, on="user_id", left_ts="click_ts",
            right_cols=["view_id"], prefix="", tiebreak="view_id",
        ).collect()
    }
    assert out == {100: 11, 101: None, 102: 13, 103: None}


def test_as_of_join_plans_without_join(spark):
    """The as-of match is a window, not a join: exactly one shuffle on the
    key and no join operator anywhere in the plan."""
    clicks = spark.createDataFrame([(1, 1, _ts(1))], ["click_id", "user_id", "click_ts"])
    views = spark.createDataFrame([(2, 1, _ts(0))], ["view_id", "user_id", "ts"])
    plan = (
        temporal.as_of_join(
            clicks, views, on="user_id", left_ts="click_ts",
            right_cols=["view_id"],
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_count_join_window_boundaries(spark):
    errors = spark.createDataFrame(
        [(1, 7, _ts(10))], ["error_id", "user_id", "ts"]
    )
    events = spark.createDataFrame(
        [
            (20, 7, _ts(9, 59)),        # inside window
            (21, 7, _ts(5, 0, 1)),      # just inside (299.999999s before)
            (22, 7, _ts(5)),            # exactly window edge -> excluded
            (23, 7, _ts(10)),           # same instant -> excluded (strict <)
            (24, 7, _ts(11)),           # after -> excluded
            (25, 8, _ts(9, 59)),        # other user -> excluded
        ],
        ["event_id", "user_id", "ts"],
    )
    out = temporal.range_count_join(
        errors, events, on="user_id", window_seconds=300
    ).collect()
    assert [(r.error_id, r.n_in_range) for r in out] == [(1, 2)]


def test_range_count_join_zero_fill(spark):
    errors = spark.createDataFrame(
        [(1, 7, _ts(10))], ["error_id", "user_id", "ts"]
    )
    events = spark.createDataFrame(
        [(20, 9, _ts(9))], ["event_id", "user_id", "ts"]
    )
    out = temporal.range_count_join(
        errors, events, on="user_id", window_seconds=300
    ).collect()
    assert [(r.error_id, r.n_in_range) for r in out] == [(1, 0)]


def test_sessionize_gap_split_and_numbering(spark):
    from da_transform_judgments_pipeline_spark.operators.temporal import (
        sessionize,
    )

    rows = [
        # user 1: two sessions split by a >30min gap
        (1, 1, "2024-01-01 10:00:00"),
        (2, 1, "2024-01-01 10:10:00"),
        (3, 1, "2024-01-01 11:00:00"),  # 50min gap -> new session
        (4, 1, "2024-01-01 11:05:00"),
        # user 2: one session; gap exactly == 30min does NOT split
        (5, 2, "2024-01-01 10:00:00"),
        (6, 2, "2024-01-01 10:30:00"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "s"]).select(
        "event_id", "user_id", F.to_timestamp("s").alias("ts")
    )
    out = sessionize(
        df, "user_id", "ts", gap_seconds=1800, order_cols=["event_id"]
    ).collect()
    sess = {r.event_id: r.session_no for r in out}
    assert sess[1] == 1 and sess[2] == 1
    assert sess[3] == 2 and sess[4] == 2
    assert sess[5] == 1 and sess[6] == 1  # boundary gap stays together


def test_sessionize_single_shuffle_for_session_stats(spark):
    """Window + per-session aggregate must share ONE exchange: the
    groupBy(user, session_no) is satisfied by the window's
    HashPartitioning(user) (partial-key clustering)."""
    from da_transform_judgments_pipeline_spark.operators.temporal import (
        sessionize,
    )

    df = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00")], ["event_id", "user_id", "s"]
    ).select("event_id", "user_id", F.to_timestamp("s").alias("ts"))
    stats = (
        sessionize(df, "user_id", "ts", 1800, ["event_id"])
        .groupBy("user_id", "session_no")
        .agg(F.count("*").alias("n"))
    )
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_retention_cohorts(spark):
    """Fixed-width epoch buckets: user 1's first event pins the cohort,
    the offset-0 cell counts cohort size, later activity lands at its
    week offset, and duplicate events within one bucket count a user
    once."""
    from da_transform_judgments_pipeline_spark.operators.temporal import (
        retention_cohorts,
    )

    rows = [
        (1, "2024-01-01 00:00:00"),  # week W
        (1, "2024-01-01 05:00:00"),  # same bucket, same user — no double
        (1, "2024-01-09 00:00:00"),  # week W+1
        (2, "2024-01-02 00:00:00"),  # week W (same bucket as user 1)
        (3, "2024-01-09 12:00:00"),  # cohort W+1
    ]
    df = spark.createDataFrame(rows, ["user_id", "s"]).select(
        "user_id", F.to_timestamp("s").alias("ts")
    )
    out = {
        (r.bucket_offset, r.n_users): r.cohort_bucket
        for r in retention_cohorts(df).collect()
    }
    # cohort W: 2 users at offset 0, 1 retained at offset 1
    # cohort W+1: 1 user at offset 0
    offsets = sorted(
        (r.cohort_bucket, r.bucket_offset, r.n_users)
        for r in retention_cohorts(df).collect()
    )
    w = offsets[0][0]
    assert offsets == [(w, 0, 2), (w, 1, 1), (w + 1, 0, 1)]


def test_funnel_depth_strict_ordering(spark):
    """Funnel steps must occur at strictly increasing timestamps: a click
    BEFORE the first view doesn't advance; a click at the SAME instant
    as the view doesn't chain; a later out-of-order purchase without an
    intermediate click stalls at depth 1; noise event types are
    ignored."""
    from da_transform_judgments_pipeline_spark.operators.temporal import (
        funnel_depth,
    )

    rows = [
        # user 1: full ordered funnel (with noise interleaved)
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 00:00:30", "error"),
        (1, "2024-01-01 00:01:00", "click"),
        (1, "2024-01-01 00:02:00", "purchase"),
        # user 2: click precedes the only view → depth 1 (view only)
        (2, "2024-01-01 00:00:00", "click"),
        (2, "2024-01-01 00:01:00", "view"),
        # user 3: click at the SAME ts as view → equal ts never chains
        (3, "2024-01-01 00:00:00", "view"),
        (3, "2024-01-01 00:00:00", "click"),
        # user 4: purchase without click → depth 1
        (4, "2024-01-01 00:00:00", "view"),
        (4, "2024-01-01 00:01:00", "purchase"),
        # user 5: no funnel events at all → depth 0 row (user present)
        (5, "2024-01-01 00:00:00", "error"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "s", "event_type"]).select(
        "user_id", F.to_timestamp("s").alias("ts"), "event_type"
    )
    depths = {
        r.user_id: r.funnel_depth
        for r in funnel_depth(df, ["view", "click", "purchase"]).collect()
    }
    assert depths == {1: 3, 2: 1, 3: 1, 4: 1}
    # user 5 emitted nothing: all their events were filtered pre-shuffle
    assert 5 not in depths


def test_funnel_depth_late_restart_matches_min_formulation(spark):
    """A second view AFTER a click must not reset progress: the fold
    advances on the FIRST qualifying event per step (equivalent to the
    sequential-min oracle), so view@0, click@1, view@2, purchase@3 is a
    complete depth-3 funnel."""
    from da_transform_judgments_pipeline_spark.operators.temporal import (
        funnel_depth,
    )

    rows = [
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 00:01:00", "click"),
        (1, "2024-01-01 00:02:00", "view"),
        (1, "2024-01-01 00:03:00", "purchase"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "s", "event_type"]).select(
        "user_id", F.to_timestamp("s").alias("ts"), "event_type"
    )
    [r] = funnel_depth(df, ["view", "click", "purchase"]).collect()
    assert r.funnel_depth == 3


def test_funnel_counts_emits_every_step(spark):
    """funnel_counts must emit a row for EVERY step of the spine even
    when no user stops at an intermediate depth (here every funnel user
    converts fully: depth histogram has no 1 or 2 rows, yet steps 1-3
    all appear with the cumulative count)."""
    from da_transform_judgments_pipeline_spark.operators.temporal import (
        funnel_counts,
    )

    rows = [
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 00:01:00", "click"),
        (1, "2024-01-01 00:02:00", "purchase"),
        (2, "2024-01-02 00:00:00", "view"),
        (2, "2024-01-02 00:01:00", "click"),
        (2, "2024-01-02 00:02:00", "purchase"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "s", "event_type"]).select(
        "user_id", F.to_timestamp("s").alias("ts"), "event_type"
    )
    out = sorted(
        (r.step_no, r.n_users)
        for r in funnel_counts(df, ["view", "click", "purchase"]).collect()
    )
    assert out == [(1, 2), (2, 2), (3, 2)]


def test_funnel_counts_zero_users_step(spark):
    """Steps nobody reaches report 0, not a missing row."""
    from da_transform_judgments_pipeline_spark.operators.temporal import (
        funnel_counts,
    )

    rows = [(1, "2024-01-01 00:00:00", "view")]
    df = spark.createDataFrame(rows, ["user_id", "s", "event_type"]).select(
        "user_id", F.to_timestamp("s").alias("ts"), "event_type"
    )
    out = sorted(
        (r.step_no, r.n_users)
        for r in funnel_counts(df, ["view", "click", "purchase"]).collect()
    )
    assert out == [(1, 1), (2, 0), (3, 0)]


def test_interval_overlap_join_edges(spark):
    """Half-open semantics: touching intervals ([0,10) vs [10,20)) do
    NOT match; cross-bucket overlaps match exactly once even though both
    intervals replicate to multiple buckets; different keys never pair;
    overlap_us is the exact intersection length."""
    from da_transform_judgments_pipeline_spark.operators.temporal import (
        interval_overlap_join,
    )

    def mk(rows):
        return spark.createDataFrame(
            rows, ["user_id", "event_id", "s", "e"]
        ).select(
            "user_id",
            "event_id",
            F.to_timestamp("s").alias("start"),
            F.to_timestamp("e").alias("end"),
        )

    left = mk(
        [
            # spans two day-buckets; overlaps r1 across the boundary
            (1, 10, "2024-01-01 20:00:00", "2024-01-02 04:00:00"),
            # touches r2 exactly at its start — half-open, no match
            (1, 11, "2024-01-03 00:00:00", "2024-01-03 01:00:00"),
            (2, 12, "2024-01-01 00:00:00", "2024-01-01 12:00:00"),
        ]
    )
    right = mk(
        [
            (1, 20, "2024-01-02 02:00:00", "2024-01-02 06:00:00"),
            (1, 21, "2024-01-03 01:00:00", "2024-01-03 02:00:00"),
            # user 3: same times as user 2's interval, different key
            (3, 22, "2024-01-01 00:00:00", "2024-01-01 12:00:00"),
        ]
    )
    out = sorted(
        (r.user_id, r.l_event_id, r.r_event_id, r.overlap_us)
        for r in interval_overlap_join(left, right, "user_id").collect()
    )
    # exactly ONE pair: (10, 20) overlapping 02:00-04:00 = 2h
    assert out == [(1, 10, 20, 2 * 3600 * 1_000_000)]


def test_resample_gapfill_dense_grid_and_carry(spark):
    """Gaps materialize as zero rows between each key's first and last
    bucket; carried_cents forward-fills the last ACTIVE day's sum; keys
    don't leak into each other's spans."""
    from da_transform_judgments_pipeline_spark.operators.temporal import (
        resample_gapfill,
    )

    rows = [
        (1, "2024-01-01 10:00:00", 2.50),
        (1, "2024-01-01 11:00:00", 1.00),
        # gap on jan 2-3
        (1, "2024-01-04 09:00:00", 5.00),
        (2, "2024-01-10 00:00:00", 7.25),
    ]
    df = spark.createDataFrame(rows, ["user_id", "s", "value"]).select(
        "user_id", F.to_timestamp("s").alias("ts"), "value"
    )
    out = sorted(
        (r.user_id, r.bucket, r.n_events, r.value_cents, r.carried_cents)
        for r in resample_gapfill(
            df, value_col="value", forward_fill=True
        ).collect()
    )
    b0 = out[0][1]
    assert [(u, b - b0, n, v, c) for u, b, n, v, c in out if u == 1] == [
        (1, 0, 2, 350, 350),
        (1, 1, 0, 0, 350),
        (1, 2, 0, 0, 350),
        (1, 3, 1, 500, 500),
    ]
    u2 = [(n, v, c) for u, b, n, v, c in out if u == 2]
    assert u2 == [(1, 725, 725)]


def test_ewma_seed_and_order(spark):
    """EWMA seeds with the first value (list_reduce convention), folds in
    time order with event-id tie-break, and a single-event key returns
    its value unchanged."""
    from da_transform_judgments_pipeline_spark.operators.temporal import (
        ewma,
    )

    rows = [
        (1, "2024-01-01 00:00:00", 1, 1.0),
        (1, "2024-01-01 00:01:00", 2, 2.0),
        (1, "2024-01-01 00:02:00", 3, 4.0),
        (2, "2024-01-01 00:00:00", 4, 7.5),
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "s", "event_id", "value"]
    ).select(
        "user_id", F.to_timestamp("s").alias("ts"), "event_id", "value"
    )
    out = {
        r.user_id: (r.ewma, r.n_events)
        for r in ewma(df, alpha=0.5, tiebreak_col="event_id").collect()
    }
    # s1=1.0; s2=0.5+1.0=1.5; s3=0.75+2.0=2.75
    assert out[1] == (2.75, 3)
    assert out[2] == (7.5, 1)


def test_time_weighted_avg_interval_weights(spark):
    """Weights are the µs to the NEXT event; the last event drops; the
    numerator is exact integer cents·µs."""
    from da_transform_judgments_pipeline_spark.operators.temporal import (
        time_weighted_avg,
    )

    rows = [
        # value 10 held 1s, value 30 held 3s → twa = (10+90)/4 = 25
        (1, "2024-01-01 00:00:00", 1, 10.0),
        (1, "2024-01-01 00:00:01", 2, 30.0),
        (1, "2024-01-01 00:00:04", 3, 999.0),  # last: no interval
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "s", "event_id", "value"]
    ).select(
        "user_id", F.to_timestamp("s").alias("ts"), "event_id", "value"
    )
    [r] = time_weighted_avg(df, tiebreak_col="event_id").collect()
    assert r.den_us == 4_000_000
    assert r.num_cents_us == 1000 * 1_000_000 + 3000 * 3_000_000
    assert r.twa == 25.0


def test_scd2_intervals_runs_and_open_current(spark):
    """Consecutive same-value observations merge into one interval;
    a value flip opens a new version; the current version's valid_to is
    NULL even when its run has multiple rows (the max-of-next-ts trap);
    reverting to an earlier value starts a NEW version, never reopens."""
    from da_transform_judgments_pipeline_spark.operators.temporal import (
        scd2_intervals,
    )

    rows = [
        (1, "2024-01-01 00:00:00", 1, "A"),
        (1, "2024-01-02 00:00:00", 2, "A"),
        (1, "2024-01-03 00:00:00", 3, "B"),
        (1, "2024-01-04 00:00:00", 4, "A"),   # revert → version 3
        (1, "2024-01-05 00:00:00", 5, "A"),   # current run, 2 rows
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "s", "event_id", "value"]
    ).select(
        "user_id", F.to_timestamp("s").alias("ts"), "event_id", "value"
    )
    out = sorted(
        (r.version_no, r.value, str(r.valid_from), r.valid_to and str(r.valid_to))
        for r in scd2_intervals(df, tiebreak_col="event_id").collect()
    )
    assert out == [
        (1, "A", "2024-01-01 00:00:00", "2024-01-03 00:00:00"),
        (2, "B", "2024-01-03 00:00:00", "2024-01-04 00:00:00"),
        (3, "A", "2024-01-04 00:00:00", None),
    ]


def test_scd2_intervals_merges_consecutive_nulls(spark):
    """Regression: lag() on the bare value returns NULL both for 'no
    previous row' and 'previous value was NULL', which split consecutive
    NULL-valued observations into separate versions. The struct-lag form
    must merge them (IS DISTINCT FROM semantics) and treat NULL→value
    and value→NULL as real changes."""
    from da_transform_judgments_pipeline_spark.operators.temporal import (
        scd2_intervals,
    )

    rows = [
        (1, "2024-01-01 00:00:00", 1, None),
        (1, "2024-01-02 00:00:00", 2, None),   # same NULL run — merge
        (1, "2024-01-03 00:00:00", 3, "A"),
        (1, "2024-01-04 00:00:00", 4, None),   # A→NULL is a change
        (1, "2024-01-05 00:00:00", 5, None),   # merge into version 3
    ]
    df = spark.createDataFrame(
        rows, "user_id int, s string, event_id int, value string"
    ).select(
        "user_id", F.to_timestamp("s").alias("ts"), "event_id", "value"
    )
    out = sorted(
        (r.version_no, r.value, str(r.valid_from), r.valid_to and str(r.valid_to))
        for r in scd2_intervals(df, tiebreak_col="event_id").collect()
    )
    assert out == [
        (1, None, "2024-01-01 00:00:00", "2024-01-03 00:00:00"),
        (2, "A", "2024-01-03 00:00:00", "2024-01-04 00:00:00"),
        (3, None, "2024-01-04 00:00:00", None),
    ]
