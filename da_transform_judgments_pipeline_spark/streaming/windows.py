"""Event-time windowed aggregation with late-data handling.

The reference has no event-time semantics (SQS supplies ordering; SURVEY.md
§2.7), but the engine's streaming surface needs them for the
training-pipeline workloads (BASELINE.json north star): throughput rollups,
session construction, late-arrival tolerance. All three operators are
plan-identical for batch and streaming inputs — the watermark is a no-op in
batch mode, so batch tests pin the exact window semantics and a streaming
test covers the incremental plumbing.

Scale notes: windowed aggregation state is bounded by (watermark horizon ×
key cardinality); the watermark lets Spark drop state for closed windows.
Session windows use the native ``session_window`` operator (state merges
via gap coalescing, no custom applyInPandasWithState needed for this
shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` differs from ``window``)
    event-time aggregation: per (window, key) row count + value sum.
    Late rows older than ``watermark`` are dropped once the watermark
    passes; in batch mode the watermark is inert and every row counts."""
    w = (
        F.window(ts_col, window)
        if slide is None
        else F.window(ts_col, window, slide)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), F.col(key_col))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(value_col), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows per key: events within ``gap`` of each other merge
    into one session. Output: one row per (key, session) with bounds and
    event count."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("s"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def attribution_join(
    clicks: DataFrame,
    views: DataFrame,
    key_col: str = "user_id",
    clicks_ts: str = "ts",
    views_ts: str = "ts",
    within: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream attribution join: each click pairs with the view(s)
    by the same key in the preceding ``within`` interval — the canonical
    ad/referral-attribution shape and the engine's Structured Streaming
    stream-stream inner join surface.

    Both sides carry a watermark and the join predicate bounds the
    event-time distance in ONE direction range
    (``view.ts <= click.ts AND view.ts >= click.ts - within``), which is
    exactly what Spark needs to compute each side's state retention:
    view state is dropped once the watermark passes ``within`` behind,
    click state at the watermark itself — bounded state, no unbounded
    buffering (an unconstrained stream-stream join would buffer both
    streams forever). Works identically in batch mode (watermarks
    inert), which is how the exact pair semantics are unit-tested; the
    streaming test drives file-source microbatches through the same
    plan. Output: key, click_ts, view_ts, plus the payload columns of
    both sides prefixed ``click_`` / ``view_``.
    """
    c = clicks.select(
        F.col(key_col).alias("_k"),
        F.col(clicks_ts).alias("click_ts"),
        *[
            F.col(x).alias(f"click_{x}")
            for x in clicks.columns
            if x not in (key_col, clicks_ts)
        ],
    ).withWatermark("click_ts", watermark)
    v = views.select(
        F.col(key_col).alias("_vk"),
        F.col(views_ts).alias("view_ts"),
        *[
            F.col(x).alias(f"view_{x}")
            for x in views.columns
            if x not in (key_col, views_ts)
        ],
    ).withWatermark("view_ts", watermark)
    joined = c.join(
        v,
        (F.col("_k") == F.col("_vk"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (
            F.col("view_ts")
            >= F.col("click_ts") - F.expr(f"INTERVAL {within}")
        ),
    )
    return joined.drop("_vk").withColumnRenamed("_k", key_col)
