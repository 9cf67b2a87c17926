"""Event-time windows: exact tumbling/sliding/session semantics (batch) and
incremental execution with a watermark (streaming memory sink)."""

import datetime as dt
import json

from pyspark.sql import functions as F

from da_transform_judgments_pipeline_spark.streaming import windows


def _events(spark, rows):
    base = dt.datetime(2024, 1, 1, 10, 0)
    return spark.createDataFrame(
        [(base + dt.timedelta(minutes=m), k, v) for m, k, v in rows],
        "ts timestamp, event_type string, value double",
    )


def test_tumbling_window_counts(spark):
    ev = _events(
        spark,
        [(0, "a", 1.0), (30, "a", 2.0), (59, "b", 3.0), (61, "a", 4.0)],
    )
    got = {
        (r["window_start"].minute + 60 * r["window_start"].hour, r["event_type"]):
            (r["n"], r["total_value"])
        for r in windows.windowed_counts(ev, window="1 hour").collect()
    }
    # 10:00-11:00 holds the first three, 11:00-12:00 the last
    assert got[(600, "a")] == (2, 3.0)
    assert got[(600, "b")] == (1, 3.0)
    assert got[(660, "a")] == (1, 4.0)


def test_sliding_window_overlap(spark):
    ev = _events(spark, [(10, "a", 1.0)])
    rows = windows.windowed_counts(
        ev, window="1 hour", slide="30 minutes"
    ).collect()
    # a point lands in two overlapping 1h/30m windows
    assert len(rows) == 2 and all(r["n"] == 1 for r in rows)


def test_sessionize_gap_merge(spark):
    ev = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, 10, 0), 1),
            (dt.datetime(2024, 1, 1, 10, 10), 1),   # same session (gap 30m)
            (dt.datetime(2024, 1, 1, 11, 30), 1),   # new session
            (dt.datetime(2024, 1, 1, 10, 5), 2),
        ],
        "ts timestamp, user_id long",
    )
    rows = windows.sessionize(ev, gap="30 minutes").collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user[1]) == [1, 2]
    assert per_user[2] == [1]


def test_windowed_counts_streaming(spark, tmp_path):
    src = tmp_path / "stream-in"
    src.mkdir()
    for i, (minute, k) in enumerate([(0, "a"), (20, "a"), (70, "b")]):
        with open(src / f"{i}.json", "w") as f:
            f.write(
                json.dumps(
                    {
                        "ts": f"2024-01-01T10:{minute:02d}:00"
                        if minute < 60
                        else f"2024-01-01T11:{minute-60:02d}:00",
                        "event_type": k,
                        "value": 1.0,
                    }
                )
                + "\n"
            )
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .json(str(src))
    )
    agg = windows.windowed_counts(stream, window="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window_start"].hour, r["event_type"]): r["n"]
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        assert got == {(10, "a"): 2, (11, "b"): 1}
    finally:
        q.stop()
