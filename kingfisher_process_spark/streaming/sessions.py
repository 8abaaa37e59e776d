"""Stateful streaming sessionization — custom stateful operator over
event streams (SURVEY §2.10; the batch lag-gap equivalent is the
``e_sessionize`` probe in plans/queries.py).

The reference has no stream processor (its "streaming" is RabbitMQ
choreography); this is the Spark-native extension a training-data
pipeline needs: per-user session windows with a gap timeout, implemented
with ``applyInPandasWithState`` so state (open session) lives in the
Structured Streaming state store, scaling with the number of distinct
keys across executors, with watermark-driven cleanup.

Batch-mode equivalence: ``sessionize_batch`` computes the same sessions
with a window lag-gap scan, so correctness is checkable without a
streaming harness (and IS checked, tests/test_streaming.py).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("start_ms", T.LongType()),
    T.StructField("last_ms", T.LongType()),
    T.StructField("n_events", T.LongType()),
])

GAP_SECONDS = 30 * 60


def _emit(user_id: int, start_ms: int, last_ms: int, n: int) -> pd.DataFrame:
    return pd.DataFrame({
        "user_id": [user_id],
        "session_start": [pd.Timestamp(start_ms, unit="ms")],
        "session_end": [pd.Timestamp(last_ms, unit="ms")],
        "n_events": [n],
    })


def _sessionize_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one user into the open-session
    state; emit a session row whenever a gap (or the state timeout)
    closes one."""
    (user_id,) = key
    if state.hasTimedOut:
        start_ms, last_ms, n = state.get
        state.remove()
        yield _emit(user_id, start_ms, last_ms, n)
        return

    ts_ms: list[int] = []
    for pdf in pdfs:
        ts_ms.extend(int(v.value // 1_000_000) for v in pdf["ts"])
    ts_ms.sort()

    start_ms, last_ms, n = state.get if state.exists else (None, None, 0)
    out = []
    for t in ts_ms:
        if start_ms is None:
            start_ms, last_ms, n = t, t, 1
        elif t - last_ms > GAP_SECONDS * 1000:
            out.append((start_ms, last_ms, n))
            start_ms, last_ms, n = t, t, 1
        else:
            last_ms, n = t, n + 1
    state.update((start_ms, last_ms, n))
    state.setTimeoutTimestamp(last_ms + GAP_SECONDS * 1000)
    for s, e, c in out:
        yield _emit(user_id, s, e, c)


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events: streaming DataFrame with (user_id long, ts timestamp).
    Returns closed sessions (open ones flush on gap timeout)."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn, SESSION_SCHEMA, STATE_SCHEMA,
            "append", GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_seconds: int = GAP_SECONDS) -> DataFrame:
    """Batch-mode sessions with identical semantics (lag-gap scan)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.when(
        F.lag("ts").over(w).isNull()
        | ((F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")) > gap_seconds),
        1,
    ).otherwise(0)
    sessioned = (
        events.withColumn("new_session", gap)
        .withColumn("session_no",
                    F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        sessioned.groupBy("user_id", "session_no")
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"))
        .drop("session_no")
    )
