"""Stateful streaming CDC collapse — the streaming twin of the batch
``e_dedup_consecutive`` probe (plans/queries.py): within each user's
event-time-ordered stream, keep a row only when its event_type differs
from the previous kept row's.

State per user is ONE tuple (last event_type + its position), held in
the Structured Streaming state store — so memory scales with distinct
keys, not stream length, and the operator survives restarts via the
checkpoint. Micro-batch boundaries are invisible to the semantics
PROVIDED batches arrive in per-user event-time order (the CDC shape: a
log tailer emits roughly in order; collapsing genuinely out-of-order
input would need watermark-deep buffering, which this operator does not
do): the fold sorts each batch by full-precision (ts, event_id) — the
same key the batch window uses — and seeds from the carried state, so a
user's stream split across ordered batches collapses identically to the
batch window-LAG plan. Both the batch probe and ``st_cdc_collapse``
share one DuckDB oracle, and ``tests/test_streaming.py`` exercises the
multi-batch path (time-split files, one per micro-batch).

State TTL is OPT-IN (``state_ttl_ms``): with a TTL, a user silent past
the horizon restarts their collapse from scratch — deliberately NOT the
batch semantics (the batch window has no notion of expiry), so the
oracle-equivalent probe runs without it and production deployments
bound state explicitly.

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


def _make_collapse_fn(state_ttl_ms: int | None):
    def _collapse_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                     state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return

        # sort on full-precision ts (nanoseconds via pandas Timestamp
        # .value), NOT the millisecond output column: the batch twin and
        # the shared oracle order by (ts, event_id), and two same-user
        # events inside one millisecond would collapse differently under
        # a truncated key
        rows: list[tuple[int, int, str]] = []
        for pdf in pdfs:
            rows.extend(zip((v.value for v in pdf["ts"]),
                            pdf["event_id"], pdf["event_type"]))
        rows.sort()

        last_type, last_ms = state.get if state.exists else (None, 0)
        kept: list[tuple[int, int, str]] = []
        for ts_ns, event_id, etype in rows:
            ts_ms = int(ts_ns) // 1_000_000
            if etype != last_type:
                kept.append((ts_ms, int(event_id), etype))
                last_type = etype
            last_ms = max(last_ms, ts_ms)
        state.update((last_type, last_ms))
        if state_ttl_ms is not None:
            state.setTimeoutTimestamp(last_ms + state_ttl_ms)
        if kept:
            yield pd.DataFrame({
                "user_id": [user_id] * len(kept),
                "event_id": [e for _, e, _ in kept],
                "ts_ms": [t for t, _, _ in kept],
                "event_type": [y for _, _, y in kept],
            })

    return _collapse_fn


def cdc_collapse_stream(events: DataFrame,
                        state_ttl_ms: int | None = None) -> DataFrame:
    """events: streaming DataFrame with (user_id long, event_id long,
    ts timestamp, event_type string). Returns the kept transition rows.

    ``state_ttl_ms=None`` (default): state lives for the query lifetime
    — exact batch equivalence at any micro-batching; memory is one tuple
    per distinct user. With a TTL, state is dropped after that much
    event-time silence (keyed-cache semantics, diverges from the batch
    window after an expiry — see module docstring).
    """
    prepared = (
        events.withWatermark("ts", "1 hour")
        .select("user_id", "event_id", "event_type", "ts")
    )
    timeout = (GroupStateTimeout.NoTimeout if state_ttl_ms is None
               else GroupStateTimeout.EventTimeTimeout)
    return (
        prepared.groupBy("user_id")
        .applyInPandasWithState(
            _make_collapse_fn(state_ttl_ms), KEPT_SCHEMA, CDC_STATE_SCHEMA,
            "append", timeout,
        )
    )
