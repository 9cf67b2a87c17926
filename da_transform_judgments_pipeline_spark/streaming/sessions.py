"""Streaming gap-sessionization as a custom stateful operator.

The batch twin (operators/temporal.py `sessionize`) computes sessions with
windows over a complete table; this is the same 30-min-gap semantics over
an UNBOUNDED stream: per-user state holds the one open session, a new
event either extends it or closes it (gap exceeded), and the WATERMARK
closes sessions for users who simply stop sending — the part batch can't
express and the part `groupBy(session_window(...))` hides: here the state
lifecycle is explicit (`applyInPandasWithState` + EventTimeTimeout), the
pattern any custom stateful operator at 100 TB follows.

Scale shape: state is one fixed-width tuple per LIVE user (open sessions
only — closed state is removed immediately), keyed shuffle on user only,
Arrow-batched transfer, and the event-time timeout bounds state lifetime:
a user's entry exists for at most gap_seconds past their last event's
watermark. Restart-safe via the checkpoint like any stateful query.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("start_us", T.LongType(), False),
        T.StructField("end_us", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), False),
        T.StructField("closed_by", T.StringType(), False),  # gap|timeout
    ]
)


def _make_sessionizer(gap_us: int):
    def _sessions(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cols = list(OUTPUT_SCHEMA.fieldNames())
        if state.hasTimedOut:
            # watermark passed last_event + gap with no new data: the open
            # session is definitively over — emit and drop the state
            start, last, n, s = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, start, last, n, s, "timeout")], columns=cols
            )
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = (rows["ts"].astype("int64") // 1000).tolist()
        values = rows["value"].astype("float64").tolist()
        st = tuple(state.get) if state.exists else None
        closed = []
        for t_us, v in zip(ts_us, values):
            if st is None:
                st = (t_us, t_us, 1, v)
            elif t_us - st[1] > gap_us:
                closed.append(
                    (user_id, st[0], st[1], st[2], st[3], "gap")
                )
                st = (t_us, t_us, 1, v)
            else:
                st = (st[0], max(st[1], t_us), st[2] + 1, st[3] + v)
        state.update(st)
        # event-time timeout: fire when the watermark passes the open
        # session's gap horizon (setTimeoutTimestamp takes epoch millis)
        state.setTimeoutTimestamp((st[1] + gap_us) // 1000)
        yield pd.DataFrame(closed, columns=cols)

    return _sessions


def sessionize_stream(
    df: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Streaming (user_id, ts, value) → one row per CLOSED session
    (start_us, end_us, n_events, sum_value, closed_by). A session closes
    when a same-user event arrives past the gap ("gap") or when the
    watermark passes last_event + gap with no new data ("timeout")."""
    src = (
        df.select(
            df[user_col].alias("user_id"),
            df[ts_col].alias("ts"),
            df[value_col].alias("value"),
        ).withWatermark("ts", watermark_delay)
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(int(gap_seconds) * 1_000_000),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
