"""Stateful streaming CDC collapse — the streaming twin of the batch
``e_dedup_consecutive`` probe (plans/queries.py): within each user's
event-time-ordered stream, keep a row only when its event_type differs
from the previous kept row's.

State per user is ONE tuple (last event_type + its position), held in
the Structured Streaming state store — so memory scales with distinct
keys, not stream length, and the operator survives restarts via the
checkpoint. Micro-batch boundaries are invisible to the semantics: the
fold sorts each batch by (ts_ms, event_id) and seeds from the carried
state, so a user's stream split across batches collapses identically to
the batch window-LAG plan (proven by oracle equality — both the batch
probe and ``st_cdc_collapse`` share one DuckDB oracle).

Reference analogue: none — the reference's incremental path re-processes
whole messages; this is the Spark-native stateful-operator surface
(SURVEY §2.10, sibling of sessions.py).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

KEPT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("event_type", T.StringType()),
])

CDC_STATE_SCHEMA = T.StructType([
    T.StructField("last_type", T.StringType()),
    T.StructField("last_ms", T.LongType()),
])

STATE_TTL_MS = 60 * 60 * 1000  # drop a user's state after 1h of silence


def _collapse_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return

    rows: list[tuple[int, int, str]] = []
    for pdf in pdfs:
        rows.extend(zip(pdf["ts_ms"], pdf["event_id"], pdf["event_type"]))
    rows.sort()

    last_type, last_ms = state.get if state.exists else (None, 0)
    kept: list[tuple[int, int, str]] = []
    for ts_ms, event_id, etype in rows:
        if etype != last_type:
            kept.append((int(ts_ms), int(event_id), etype))
            last_type = etype
        last_ms = max(last_ms, int(ts_ms))
    state.update((last_type, last_ms))
    state.setTimeoutTimestamp(last_ms + STATE_TTL_MS)
    if kept:
        yield pd.DataFrame({
            "user_id": [user_id] * len(kept),
            "event_id": [e for _, e, _ in kept],
            "ts_ms": [t for t, _, _ in kept],
            "event_type": [y for _, _, y in kept],
        })


def cdc_collapse_stream(events: DataFrame) -> DataFrame:
    """events: streaming DataFrame with (user_id long, event_id long,
    ts timestamp, event_type string). Returns the kept transition rows.

    The watermark bounds how late a row may arrive; state is one row per
    user and is dropped after an hour of event-time silence (a CDC
    consumer that has gone quiet restarts its collapse from scratch —
    the semantics a keyed TTL cache gives).
    """
    from pyspark.sql import functions as F

    prepared = (
        events.withWatermark("ts", "1 hour")
        .select("user_id", "event_id", F.unix_millis("ts").alias("ts_ms"),
                "event_type", "ts")
    )
    return (
        prepared.groupBy("user_id")
        .applyInPandasWithState(
            _collapse_fn, KEPT_SCHEMA, CDC_STATE_SCHEMA,
            "append", GroupStateTimeout.EventTimeTimeout,
        )
    )
