"""Custom stateful streaming operator (SURVEY.md §2.9 T2/T5 beyond the
built-ins): ``applyInPandasWithState`` with event-time TTL eviction.

The reference keeps a 12 h in-heap ttlcache keyed by address
(bitcoinabuse/main.go:43-45,218-221,248) — per-key state with expiry,
lost on restart. ``dropDuplicatesWithinWatermark`` (incremental.py)
covers the skip-if-seen use; this module is the general form: arbitrary
per-key accumulators with TTL, checkpointed (survives restart, unlike
the reference's cache) and evicted by event-time timeout exactly like
the cache's TTL expiry.

Spark 4's successor API (``transformWithStateInPandas`` — typed value/
list/map state + timers via a StatefulProcessor) was evaluated and
works API-wise, but its driver worker imports
``pyspark.sql.streaming.proto.StateMessage_pb2`` which requires
``google.protobuf`` — not present in this container (verified crash:
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE on the import), so
``applyInPandasWithState`` remains the pinned custom-stateful surface;
the migration is mechanical when protobuf is available.

Scale notes: state lives in the state store (RocksDB provider at scale,
incremental checkpoints); per-key state here is O(1) scalars, so total
state is bounded by (live keys within TTL) × a few bytes — the same
bound the reference's TTL map has, but spillable and sharded across
executors by the groupBy hash rather than one process heap. The Arrow
batches flow only the three used columns (column pruning through a
stateful UDF is manual, as with any grouped-map UDF).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TTL_MS = 12 * 3600 * 1000  # the reference's 12 h, as an event-time timeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _accumulate(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user running (count, sum, last-seen), TTL-evicted.

    On timeout the state is removed and nothing is emitted — the
    reference's cache expiry. Otherwise fold this batch's rows into the
    accumulator, emit the updated totals, and arm the event-time
    timeout at last_seen + TTL (must stay above the current watermark,
    which it does by construction since last_seen ≥ watermark - delay).
    """
    if state.hasTimedOut:
        state.remove()
        return
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        # ts arrives as datetime64[us]; keep µs since epoch in state
        last_us = max(last_us, int(pdf["ts"].max().value // 1_000))
    state.update((n, total, last_us))
    state.setTimeoutTimestamp(last_us // 1000 + TTL_MS)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts_us": [last_us],
        }
    )


def running_user_totals(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming per-user running totals with 12 h TTL state.

    ``events`` is a streaming DataFrame with (user_id, ts, value).
    Output mode: update — each micro-batch emits the keys it touched.
    """
    pruned = events.select("user_id", "ts", "value").withWatermark("ts", watermark)
    return pruned.groupBy("user_id").applyInPandasWithState(
        _accumulate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def batch_user_totals(events: DataFrame) -> DataFrame:
    """Batch twin for testing: the same totals without state."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.unix_micros(F.max("ts")).alias("last_ts_us"),
    )
