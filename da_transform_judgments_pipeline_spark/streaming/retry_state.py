"""Keyed retry state as a custom stateful streaming operator (T4/T9/W3).

The reference persists per-consignment retry state as `output-message.json`
under retry-numbered folders and enforces `incoming == last + 1`
(tre_editorial_integration.py:472-542, :504-509). Here the same semantics
are a `applyInPandasWithState` operator keyed by (reference): state holds
the last accepted counter; each incoming attempt is accepted (counter ==
last+1, or 0 for the first), replayed (counter <= last), or gapped
(counter > last+1) — the monotonic-sequence check W3 as streaming state.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([T.StructField("last_retry", T.IntegerType())])

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("reference", T.StringType(), False),
        T.StructField("retry", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("expected", T.IntegerType(), False),
    ]
)

STATUS_ACCEPTED = "accepted"
STATUS_REPLAY = "replay"
STATUS_GAP = "gap"


def _judge(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (reference,) = key
    last = state.get[0] if state.exists else -1
    out = []
    rows = pd.concat(list(pdfs))
    for retry in sorted(rows["retries"].tolist()):
        retry = int(retry)
        expected = last + 1
        if retry == expected:
            status = STATUS_ACCEPTED
            last = retry
        elif retry <= last:
            status = STATUS_REPLAY
        else:
            status = STATUS_GAP
        out.append((reference, retry, status, expected))
    state.update((last,))
    yield pd.DataFrame(
        out, columns=["reference", "retry", "status", "expected"]
    )


def track_retries(df: DataFrame) -> DataFrame:
    """Streaming input with (reference, retries, event_time) → one judged row
    per attempt. State is one int per live reference; a processing-time
    timeout could evict finished consignments at scale (kept unbounded here
    for exact reference parity — consignment cardinality is small relative
    to the data it describes)."""
    return (
        df.select("reference", "retries", "event_time")
        .groupBy("reference")
        .applyInPandasWithState(
            _judge,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def track_retries_batch(df: DataFrame) -> DataFrame:
    """Batch twin of track_retries (same semantics via a window): per
    reference, attempts ordered by retry; accepted iff retry == dense
    position among accepted rows — equivalent to the sequential judge when
    attempts arrive in order. Used by the DuckDB-oracle correctness gate
    (stateful streaming itself is not SQL-expressible)."""
    from pyspark.sql import Window

    w = Window.partitionBy("reference").orderBy("retry")
    lagged = df.select("reference", F.col("retries").cast("int").alias("retry"))
    prev = F.lag("retry").over(w)
    return lagged.withColumn(
        "status",
        F.when(prev.isNull() & (F.col("retry") == 0), STATUS_ACCEPTED)
        .when(F.col("retry") == prev + 1, STATUS_ACCEPTED)
        .when(F.col("retry") <= prev, STATUS_REPLAY)
        .otherwise(STATUS_GAP),
    )
