"""Stateful streaming sessionization vs its batch equivalent: sessions
closed by a gap must agree exactly; the stream's final open session per
user stays in state (flushes on event-time timeout in a live stream)."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kingfisher_process_spark.streaming.sessions import sessionize_batch, sessionize_stream

SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
])

BASE = dt.datetime(2024, 1, 1, 9, 0, 0)


def _events():
    rows = []
    # user 1: two sessions (45-min gap), then a third open one
    for mins in (0, 5, 10, 55, 60, 200):
        rows.append((1, BASE + dt.timedelta(minutes=mins)))
    # user 2: one closed session + open tail
    for mins in (0, 1, 2, 90):
        rows.append((2, BASE + dt.timedelta(minutes=mins)))
    return rows


def test_stream_matches_batch_for_closed_sessions(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    with open(src / "batch0.json", "w") as f:
        for uid, ts in _events():
            f.write(json.dumps({"user_id": uid, "ts": ts.isoformat()}) + "\n")

    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory").queryName("sessions_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("sessions_out").collect()
    }

    batch_df = spark.createDataFrame(_events(), SCHEMA)
    batch = sessionize_batch(batch_df)
    # a session reaches the stream's output if a gap closed it in-batch OR
    # its event-time timeout (end + 30min gap) fell below the final
    # watermark (max_ts - 30min) — i.e. end <= max_ts - 60min
    max_ts = max(ts for _, ts in _events())
    cutoff = max_ts - dt.timedelta(minutes=60)
    closed = batch.where(F.col("session_end") <= F.lit(cutoff))
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in closed.collect()
    }
    assert got == want
    # three gap-closed sessions + user 2's tail flushed by state timeout
    assert len(want) == 4
