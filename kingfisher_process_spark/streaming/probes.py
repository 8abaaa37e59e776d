"""Driver-visible Structured Streaming probes.

The reference is an incremental, message-driven pipeline (SURVEY §2.10);
its Spark mapping is Structured Streaming. These probes run a REAL
streaming query (``readStream`` → event-time window + watermark →
``writeStream``) with ``availableNow`` so the stream drains the parquet
input and terminates — the result is then a plain DataFrame the
correctness gate can hash against DuckDB. The same plan keeps running
un-drained (processingTime trigger) on a live ingest directory at scale.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kingfisher_process_spark.plans.base import normalize_events_ts, probe


# Target input volume per state-store partition (r13). Stateful
# operators run one state store per shuffle partition and COMMIT each
# one every trigger — including data-less watermark-advance triggers —
# so oversized partition counts turn into pure per-trigger commit
# latency (measured: the watermarked-dedup drain at sf0.1 spends
# ~0.5 s/trigger on 32 near-empty state commits; 8 partitions cut the
# drain 1.42 -> 0.96 s with identical results). Deriving the count
# from the stream's INPUT volume instead of the core count keeps it
# scale-adaptive: a 100 TB ingest gets wide state, a megabyte probe
# does not. Overridable for cluster runs via
# SPARK_GRAFT_STREAM_STATE_PARTS.
_STATE_PARTITION_TARGET_BYTES = 16 * 1024 * 1024


def _pin_stream_confs(spark: SparkSession, input_bytes: int | None = None,
                      ) -> None:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # normalize_events_ts's timestamp_ntz→timestamp cast is session-tz
    # dependent; pin UTC here too (load_tables does it for batch paths)
    # so a driver-supplied non-UTC session can't shift streamed instants.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Stateful streaming pins the state-store partition count to
    # shuffle.partitions at first run AND cannot use AQE coalescing — on
    # a driver-supplied session with the 200 default, every stateful
    # stage runs 200 near-empty tasks. When the caller knows the input
    # volume, size to it (see _STATE_PARTITION_TARGET_BYTES); otherwise
    # size to the machine like load_tables does (results unaffected;
    # state-store keying is by group key, not partition).
    import math
    import os

    try:
        par = spark.sparkContext.defaultParallelism
        n = max(par, 8)
        if input_bytes is not None:
            env = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTS")
            if env:
                n = int(env)
            else:
                n = max(8, min(n, math.ceil(
                    input_bytes / _STATE_PARTITION_TARGET_BYTES)))
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
    except Exception:
        pass


def _events_stream(spark: SparkSession, sf_dir: str, prefix: str,
                   copies: int = 1) -> DataFrame:
    """Stage the events file behind a drop directory (FileStreamSource
    wants a dir — the live-ingest shape: files arriving as they land) and
    open a stream with whatever schema the parquet actually has. The
    footer read is one driver-side metadata fetch; ``readStream``
    requires an explicit schema, and hardcoding one broke when testdata
    regenerated ts as timestamp[us] — see plans/base.normalize_events_ts.
    ``copies`` links the source more than once (duplicate-delivery
    fixtures)."""
    import os
    import tempfile

    src = os.path.abspath(f"{sf_dir}/events.parquet")
    _pin_stream_confs(spark, input_bytes=os.path.getsize(src) * copies)
    schema = spark.read.parquet(src).schema
    drop_dir = tempfile.mkdtemp(prefix=prefix)
    for i in range(copies):
        os.symlink(src, os.path.join(drop_dir, f"events_{i}.parquet"))
    return normalize_events_ts(
        spark.readStream.schema(schema).parquet(drop_dir))


@probe(
    "st_hourly_rollup",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY hour_start, event_type
    ORDER BY hour_start, event_type
    """,
    survey_ids="streaming-ext,A5,O1",
)
def st_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time windowed aggregation as a genuine streaming query.

    ``withWatermark`` bounds state for late data (reference's completion
    semantics are not time-based — SURVEY §2.10 — but a 100 TB event
    ingest needs watermarked windows); ``availableNow`` drains the input
    so the probe terminates. Complete output mode emits every window at
    drain time, which makes the result equal to the batch rollup — the
    DuckDB oracle checks exactly that equivalence.
    """
    stream = _events_stream(spark, sf_dir, "kps_stream_events_")
    windowed = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(38,6)")).alias("total_value"))
    )
    sink = f"st_hourly_rollup_{uuid.uuid4().hex[:8]}"
    q = (
        windowed.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(sink)
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:00").alias("hour_start"),
            "event_type", "n_events",
            F.col("total_value").cast("double").alias("total_value"),
        )
        .orderBy("hour_start", "event_type")
    )


@probe(
    "st_sessionize",
    """
    WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
    s AS (SELECT user_id, ms,
            CASE WHEN lag(ms) OVER (PARTITION BY user_id ORDER BY ms) IS NULL
                  OR ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms)
                     > 1800000
                 THEN 1 ELSE 0 END AS new_s
          FROM e),
    g AS (SELECT user_id, ms,
            SUM(new_s) OVER (PARTITION BY user_id ORDER BY ms
                             ROWS UNBOUNDED PRECEDING) AS sno
          FROM s),
    sess AS (SELECT user_id, sno,
               MIN(ms) AS session_start_ms, MAX(ms) AS session_end_ms,
               COUNT(*) AS n_events
             FROM g GROUP BY user_id, sno),
    mx AS (SELECT MAX(ms) AS max_ms FROM e)
    SELECT user_id, session_start_ms, session_end_ms, n_events
    FROM sess, mx
    WHERE sno < (SELECT MAX(sno) FROM sess s2 WHERE s2.user_id = sess.user_id)
       OR session_end_ms + 1800000 < max_ms - 1800000
    ORDER BY user_id, session_start_ms
    """,
    survey_ids="streaming-ext,stateful-ext",
)
def st_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator under the correctness gate: per-user
    session windows via ``applyInPandasWithState`` (state = the open
    session, watermark-driven timeout flush).

    Emission semantics the oracle reproduces exactly: a session row is
    emitted when a >30 min gap closes it inside a micro-batch (every
    session but each user's last), or when the event-time timeout fires —
    the final watermark is max(ts) - 30 min, so an open session flushes
    iff session_end + 30 min < max_ts - 30 min. All comparisons are in
    milliseconds on both sides (the state store keeps ms, so the oracle
    must truncate the same way — micro-precision gaps straddling the
    30 min boundary would otherwise diverge).
    """
    from kingfisher_process_spark.streaming.sessions import sessionize_stream

    stream = (
        _events_stream(spark, sf_dir, "kps_stream_sessions_")
        .select("user_id", "ts")
    )
    sink = f"st_sessionize_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(stream)
        .writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(sink)
        .select(
            "user_id",
            F.unix_millis("session_start").alias("session_start_ms"),
            F.unix_millis("session_end").alias("session_end_ms"),
            "n_events",
        )
        .orderBy("user_id", "session_start_ms")
    )


DOCS_STREAM_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@probe(
    "st_dedup_ingest",
    """
    SELECT DISTINCT md5(text) AS content_hash
    FROM documents
    ORDER BY content_hash
    """,
    survey_ids="streaming-ext,S8,dedup-ext",
)
def st_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming content-hash dedup — the incremental form of the
    engine's payload dedup (S8): a documents stream deduplicated by
    ``dropDuplicates`` on md5(text), so redelivered or re-crawled
    documents are dropped exactly once across micro-batches via the
    state store. ``availableNow`` drains the bench file; the same query
    runs unbounded on a live drop directory with
    ``dropDuplicatesWithinWatermark`` as the bounded-state variant once
    re-crawls have a staleness horizon. The probe emits the sorted
    distinct hash set — identical to the batch DISTINCT the oracle runs,
    regardless of which duplicate arrived first.
    """
    import os
    import tempfile

    src = os.path.abspath(f"{sf_dir}/documents.parquet")
    _pin_stream_confs(spark, input_bytes=os.path.getsize(src))
    drop_dir = tempfile.mkdtemp(prefix="kps_stream_docs_")
    os.symlink(src, os.path.join(drop_dir, "documents.parquet"))
    stream = (
        spark.readStream
        .schema(DOCS_STREAM_SCHEMA)
        .parquet(drop_dir)
        .select(F.md5("text").alias("content_hash"))
        .dropDuplicates(["content_hash"])
    )
    sink = f"st_dedup_ingest_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).select("content_hash").orderBy("content_hash")


@probe(
    "st_stream_stream_join",
    """
    SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id,
           CAST(epoch_ms(c.ts) - epoch_ms(v.ts) AS BIGINT) AS lag_ms
    FROM events c
    JOIN events v
      ON c.user_id = v.user_id
     AND c.event_type = 'click' AND v.event_type = 'view'
     AND v.ts <= c.ts AND v.ts > c.ts - INTERVAL 6 HOUR
    ORDER BY click_id, view_id
    """,
    survey_ids="streaming-ext,J1,range-ext",
)
def st_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval self-join: every view by the
    same user in the 6 hours before each click (attribution joins, the
    streaming twin of the batch as-of/range probes). Both sides are
    watermarked and the join carries an event-time range condition, so
    the state store evicts a view row as soon as the click-side watermark
    passes its 6-hour horizon — bounded state at any scale, where an
    unconstrained stream join would buffer the whole history. Inner
    joins emit on match (the watermark only drives eviction), so
    draining with ``availableNow`` yields exactly the batch join the
    DuckDB oracle runs.

    Reference analogue: none — the reference's incremental path has no
    cross-entity correlation; this extends §2.10 with the Spark-native
    stream-stream join surface.
    """
    clicks = (
        _events_stream(spark, sf_dir, "kps_stream_clicks_")
        .where(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    views = (
        _events_stream(spark, sf_dir, "kps_stream_views_")
        .where(F.col("event_type") == "view")
        .select(F.col("event_id").alias("view_id"),
                F.col("user_id").alias("v_user"),
                F.col("ts").alias("v_ts"))
        .withWatermark("v_ts", "7 hours")
    )
    joined = clicks.join(
        views,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("c_ts"))
        & (F.col("v_ts") > F.col("c_ts") - F.expr("INTERVAL 6 HOURS")),
    )
    sink = f"st_ss_join_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(sink)
        .select("click_id", "view_id", F.col("c_user").alias("user_id"),
                (F.unix_millis("c_ts") - F.unix_millis("v_ts")).alias("lag_ms"))
        .orderBy("click_id", "view_id")
    )


def _cdc_oracle() -> str:
    # Shares the batch probe's oracle verbatim: stream/batch equivalence
    # IS the correctness claim. Imported here (not at module top) so this
    # module stays importable standalone.
    import kingfisher_process_spark.plans.queries  # noqa: F401
    from kingfisher_process_spark.plans.base import oracle_of

    return oracle_of("e_dedup_consecutive")


@probe(
    "st_cdc_collapse",
    None,  # replaced right below — needs the queries module registered
    survey_ids="streaming-ext,cdc-ext,O3",
)
def st_cdc_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``e_dedup_consecutive``: stateful per-user
    consecutive-duplicate collapse via ``applyInPandasWithState`` (one
    (last_type, last_ms) tuple per user in the state store; no TTL here
    — exact batch equivalence requires state for the query lifetime, see
    streaming/cdc.py), drained with ``availableNow``; the kept
    transitions are then aggregated per user exactly like the batch
    probe and hashed against the SAME DuckDB oracle. This drain is one
    micro-batch; the multi-batch state-seeding path is exercised by
    tests/test_streaming.py with time-split files, one per batch.

    Reference analogue: none (SURVEY §2.10 stateful-operator surface,
    sibling of st_sessionize).
    """
    from kingfisher_process_spark.streaming.cdc import cdc_collapse_stream

    events = _events_stream(spark, sf_dir, "kps_stream_cdc_")
    kept = cdc_collapse_stream(
        events.select("user_id", "event_id", "ts", "event_type"))
    sink = f"st_cdc_{uuid.uuid4().hex[:8]}"
    q = (
        kept.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(sink)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_kept"),
             F.min("event_id").cast("bigint").alias("first_event"),
             F.max("ts_ms").cast("bigint").alias("last_ts_ms"))
        .orderBy("user_id")
    )


# late-bind the shared oracle (module import order safe)
from kingfisher_process_spark.plans.base import REGISTRY as _REG  # noqa: E402

_REG["st_cdc_collapse"].oracle = _cdc_oracle()


def _drain_events_three_batches(spark: SparkSession, sf_dir: str,
                                prefix: str, fold_factory) -> str:
    """Shared incremental-MV harness: stage the events table as three
    time-split files, stream them ONE PER MICRO-BATCH through a
    foreachBatch fold built by ``fold_factory(acc_dir, run_id)``, and
    return the accumulator path once the drain terminates."""
    import datetime
    import os
    import shutil
    import tempfile

    from kingfisher_process_spark.functions.artifact_fs import (
        list_parquet)
    from kingfisher_process_spark.plans.base import load_tables

    events = load_tables(spark, sf_dir)["events"].select(
        "ts", "event_type", "value")
    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo).total_seconds()
    base = tempfile.mkdtemp(prefix=prefix)
    drop = os.path.join(base, "drop")
    os.makedirs(drop)
    # ONE staging job instead of three (r13, same device as the r12
    # semantic-dedup slice staging): the old form re-ran the events
    # scan once per time slice (3 filter+coalesce(1) writes); a single
    # partitionBy write stages the same three one-file slice dirs. The
    # stage boundaries are the SAME Python-computed instants the old
    # per-slice filters used, so the row split is identical; each
    # stage's rows land in one task after the repartition, so each
    # stage=i dir holds exactly one file and the copy loop below feeds
    # the drop dir in the same event-time order.
    b1 = lo + datetime.timedelta(seconds=span / 3)
    b2 = lo + datetime.timedelta(seconds=span * 2 / 3)
    stage = (F.when(F.col("ts") < F.lit(b1), 0)
             .when(F.col("ts") < F.lit(b2), 1)
             .otherwise(2))
    staged = os.path.join(base, "staged")
    (events.withColumn("stage", stage).repartition("stage")
     .write.mode("overwrite").partitionBy("stage").parquet(staged))
    for i in range(3):
        src = list_parquet(os.path.join(staged, f"stage={i}"))[0]
        shutil.copy(src, os.path.join(drop, f"batch_{i}.parquet"))

    acc = os.path.join(base, "acc")
    ckpt = os.path.join(base, "ckpt")
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(drop))
    q = (
        stream.writeStream
        .foreachBatch(fold_factory(acc, run_id=ckpt))
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    return acc


@probe(
    "st_incremental_rollup",
    None,  # replaced right below with st_hourly_rollup's oracle
    survey_ids="streaming-ext,A5,mv-ext",
)
def st_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized view: the events table is staged as
    three time-split files, streamed ONE FILE PER MICRO-BATCH, and each
    batch's partial hourly aggregate is additively folded into a
    persisted accumulator (streaming/mv.py) — view maintenance as data
    arrives, O(view) per batch instead of O(history). The final
    accumulator is hashed against st_hourly_rollup's DuckDB oracle: the
    incrementally-maintained view must equal the full recompute
    bit-for-bit (decimal partials make the fold order-free).

    Reference analogue: the reference recomputes collection counts on
    demand (finisher.py:116-176); this is the continuous-aggregate
    surface a 100 TB event store needs.
    """
    from kingfisher_process_spark.streaming.mv import merge_partial_into

    acc = _drain_events_three_batches(spark, sf_dir, "kps_mv_",
                                      merge_partial_into)
    return (
        spark.read.parquet(acc)
        .select("hour_start", "event_type", "n_events",
                F.col("total_value").cast("double").alias("total_value"))
        .orderBy("hour_start", "event_type")
    )


_REG["st_incremental_rollup"].oracle = _REG["st_hourly_rollup"].oracle


@probe(
    "st_incremental_rollup_partitioned",
    None,  # shares st_hourly_rollup's oracle — bound right below
    survey_ids="streaming-ext,A5,mv-ext",
)
def st_incremental_rollup_partitioned(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Partitioned twin of st_incremental_rollup: the same three-file
    drain, but folded with merge_partial_into_partitioned — each
    micro-batch rewrites only the day=YYYY-MM-DD accumulator partitions
    its event-times touch, with per-partition idempotency markers. The
    reassembled view is hashed against the same full-recompute oracle.
    """
    from kingfisher_process_spark.streaming.mv import (
        merge_partial_into_partitioned, read_partitioned_view)

    acc = _drain_events_three_batches(spark, sf_dir, "kps_mvp_",
                                      merge_partial_into_partitioned)
    return (
        read_partitioned_view(spark, acc)
        .select("hour_start", "event_type", "n_events",
                F.col("total_value").cast("double").alias("total_value"))
        .orderBy("hour_start", "event_type")
    )


_REG["st_incremental_rollup_partitioned"].oracle = _REG["st_hourly_rollup"].oracle


@probe(
    "st_dedup_watermarked",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           MIN(event_id) AS min_event,
           MAX(event_id) AS max_event,
           CAST(SUM(event_id) AS BIGINT) AS id_checksum
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    survey_ids="streaming-ext,S8,dedup-ext",
)
def st_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUNDED-STATE streaming dedup — ``dropDuplicatesWithinWatermark``,
    the 100 TB form of st_dedup_ingest's exact dedup: per-key state is
    EVICTED once the event-time watermark passes it, so state size is
    (keys arriving within the lateness horizon), not (all keys ever).
    The input doubles every event (two copies of the source file in the
    drop directory); the dedup must collapse the stream back to exactly
    the original census, which the oracle computes from the base table.
    Trade vs full dedup: a duplicate arriving LATER than the watermark
    horizon would pass through — the operator guarantees exactness only
    within the horizon, which is the right contract for re-delivery-style
    duplicates (the reference's RabbitMQ redelivery window, SURVEY §2.10).
    """
    stream = _events_stream(spark, sf_dir, "kps_stream_wmdedup_", copies=2)
    deduped = (
        stream
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type")
    )
    sink = f"st_dedup_wm_{uuid.uuid4().hex[:8]}"
    q = (deduped.writeStream.format("memory").queryName(sink)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return (
        spark.table(sink)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("event_id").alias("min_event"),
             F.max("event_id").alias("max_event"),
             F.sum("event_id").cast("bigint").alias("id_checksum"))
        .orderBy("event_type")
    )


@probe(
    "st_stream_static_enrich",
    """
    SELECT n.n_name AS nation,
           e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id % (SELECT COUNT(*) FROM customer) + 1
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY nation, e.event_type
    ORDER BY nation, e.event_type
    """,
    survey_ids="streaming-ext,J1,A5",
)
def st_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC join — the remaining cell of the streaming join
    matrix (stream-stream: st_stream_stream_join): each micro-batch of
    events is enriched against a static dimension (customer→nation),
    which Spark plans as a broadcast hash join per batch with NO state
    store involvement — the static side is re-broadcast, never buffered.
    That is exactly the 100 TB dimension-enrichment shape: the stream
    scales with ingest, the dim with customers, and the join cost is one
    map-side probe per event. Users are mapped onto the customer key
    space deterministically (mod) so the oracle is a plain batch join."""
    from kingfisher_process_spark.plans.base import load_tables

    t = load_tables(spark, sf_dir)
    n_cust = t["customer"].count()
    dim = (
        t["customer"].select("c_custkey", "c_nationkey")
        .join(F.broadcast(t["nation"].select("n_nationkey", "n_name")),
              F.col("n_nationkey") == F.col("c_nationkey"))
        .select("c_custkey", F.col("n_name").alias("nation"))
    )
    stream = _events_stream(spark, sf_dir, "kps_stream_enrich_")
    joined = (
        stream.withColumn("c_custkey", F.col("user_id") % n_cust + 1)
        .join(F.broadcast(dim), "c_custkey")
        .select("nation", "event_type",
                F.col("value").cast("decimal(38,6)").alias("v"))
    )
    sink = f"st_enrich_{uuid.uuid4().hex[:8]}"
    q = (joined.groupBy("nation", "event_type")
         .agg(F.count(F.lit(1)).alias("n_events"),
              F.sum("v").alias("tv"))
         .writeStream.format("memory").queryName(sink)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return (
        spark.table(sink)
        .select("nation", "event_type", "n_events",
                F.col("tv").cast("double").alias("total_value"))
        .orderBy("nation", "event_type")
    )


# ---------------------------------------------------------------------------
# Streaming funnel maintenance — the dirty-set pattern
# (st_incremental_compile, st_semantic_dedup) applied to the funnel:
# events arrive in micro-batches in ANY order; per batch only the
# batch's users recompute their chained-MIN frontiers from the
# user-bucketed history (partition-pruned read), and the per-user
# funnel table swaps only dirty buckets (dynamic partition overwrite).
# A late-arriving earlier view RETROACTIVELY rewrites that user's whole
# chain — exactly what frontier-state-only maintenance cannot do and
# the recompute-from-history form does for free.
# ---------------------------------------------------------------------------

FUNNEL_UBUCKETS = 16
_FUNNEL_TYPES = ("view", "click", "purchase")
FUNNEL_HIST_SCHEMA = ("user_id BIGINT, event_type STRING, ts TIMESTAMP,"
                      " ubucket INT, batch_id INT")


def funnel_maintenance_upsert(batch_df: DataFrame, batch_id: int,
                              hist_dir: str, funnel_dir: str,
                              n_buckets: int = FUNNEL_UBUCKETS) -> None:
    """One micro-batch of funnel maintenance: append the batch's
    funnel-relevant events to its own idempotent ``batch_id=N``
    partition (user-bucketed inside), recompute frontiers for the
    batch's users from the pruned history, swap only dirty buckets."""
    import os

    from kingfisher_process_spark.functions.artifact_fs import (
        list_partition_dirs)
    from kingfisher_process_spark.plans.queries import funnel_frontiers
    from kingfisher_process_spark.streaming.maintenance import recover_store

    # heal any crash-stranded compaction swap before reading (r6 advice)
    recover_store(hist_dir)
    spark = batch_df.sparkSession
    ub = F.pmod(F.hash("user_id"), F.lit(n_buckets))
    ev = (batch_df.where(F.col("event_type").isin(*_FUNNEL_TYPES))
          .select("user_id", "event_type", "ts"))
    (ev.withColumn("ubucket", ub)
     .write.mode("overwrite").partitionBy("ubucket")
     .parquet(os.path.join(hist_dir, f"batch_id={batch_id}")))
    dirty = ev.select("user_id").distinct()
    dirty_buckets = [r["b"] for r in
                     dirty.select(ub.alias("b")).distinct().collect()]
    # explicit schema: a batch with zero funnel-relevant rows writes only
    # _SUCCESS under its batch_id dir, and schema inference over the
    # file-less partition raises, wedging every replay (r6 advice)
    hist = (spark.read.option("basePath", hist_dir)
            .schema(FUNNEL_HIST_SCHEMA)
            .parquet(hist_dir)
            .where(F.col("ubucket").isin(dirty_buckets))
            .select("user_id", "event_type", "ts"))
    redo_ev = hist.join(F.broadcast(dirty), "user_id", "left_semi")
    v, c, p = funnel_frontiers(redo_ev)
    redone = (v.join(c, "user_id", "left").join(p, "user_id", "left")
              .withColumn("ubucket", ub))
    if list_partition_dirs(funnel_dir, "ubucket"):
        kept = (spark.read.parquet(funnel_dir)
                .where(F.col("ubucket").isin(dirty_buckets))
                .join(F.broadcast(dirty), "user_id", "left_anti"))
        out = kept.unionByName(redone.select(*kept.columns))
    else:
        out = redone
    staged = out.localCheckpoint()
    (staged.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("ubucket").parquet(funnel_dir))


@probe(
    "st_funnel_maintenance",
    None,  # oracle assigned below — shares e_funnel_conversion's verbatim
    survey_ids="streaming-ext,window-ext,A4,J3",
)
def st_funnel_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained funnel: the events table arrives as a
    4-slice file stream sliced by pmod(hash(event_id), 4) — deliberately
    NOT time-ordered, so later batches carry EARLIER views/clicks and
    exercise the retroactive chain rewrite. foreachBatch maintains the
    user-bucketed history and the per-user funnel table via
    funnel_maintenance_upsert (with one in-loop history compaction);
    the final counts must hash-match the BATCH funnel oracle
    (e_funnel_conversion's SQL verbatim), proving the maintenance
    converges to the one-shot computation for any batch split."""
    import os
    import tempfile

    from kingfisher_process_spark.plans.base import load_tables
    from kingfisher_process_spark.streaming.maintenance import compact_batches

    _pin_stream_confs(spark)
    ev = load_tables(spark, sf_dir)["events"]
    tmp = tempfile.mkdtemp(prefix="kps_stfunnel_")
    watch = os.path.join(tmp, "watch")
    hist = os.path.join(tmp, "hist")
    funnel = os.path.join(tmp, "funnel")
    os.makedirs(watch)
    for i in range(4):
        (ev.where(F.pmod(F.hash("event_id"), F.lit(4)) == i).coalesce(1)
         .write.mode("append").parquet(os.path.join(watch, f"slice={i}")))

    def upsert(batch_df, batch_id):
        funnel_maintenance_upsert(batch_df, batch_id, hist, funnel)
        if batch_id == 2:
            compact_batches(batch_df.sparkSession, hist, upto=batch_id - 1)

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(watch, "slice=*"))
              .writeStream.foreachBatch(upsert)
              .option("checkpointLocation", os.path.join(tmp, "ckpt"))
              .trigger(availableNow=True).start())
    stream.awaitTermination()
    f = spark.read.parquet(funnel)
    return f.agg(
        F.count("t_view").cast("bigint").alias("n_viewed"),
        F.count("t_click").cast("bigint").alias("n_clicked_after"),
        F.count("t_purchase").cast("bigint").alias("n_purchased_after"),
        F.sum(F.when(F.col("t_purchase").isNotNull(),
                     F.unix_millis("t_purchase") - F.unix_millis("t_view")))
        .cast("bigint").alias("total_funnel_ms"))


# share the batch funnel's oracle verbatim (registered by plans.queries,
# which is imported before this module)
def _assign_funnel_oracle() -> None:
    import kingfisher_process_spark.plans.queries  # noqa: F401 — registers it

    from kingfisher_process_spark.plans.base import REGISTRY, oracle_of

    REGISTRY["st_funnel_maintenance"].oracle = oracle_of("e_funnel_conversion")


_assign_funnel_oracle()
