"""Incremental ingest — the reference's message-driven unbounded mode
(SURVEY §2.10) as Structured Streaming.

Reference behavior: files arrive one RabbitMQ message at a time while the
collection is "open" (api_loader.py:28-49); record packages compile
per-file immediately without waiting for the full load
(compiler.py:146-148); completion is not time-based but
all-work-drained (finisher.py:116-176).

Spark mapping: a file-arrival source (``readStream.text(dir,
wholetext)``) feeding ``foreachBatch``; each micro-batch runs the same
batch loader (sources/loader.store_items) — exactly-once per batch via
checkpointing + the loader's idempotent dedup sink. "Close the
collection" = stop the stream and run finish_collection; the
compilable/completable predicates stay stage ordering, as in batch mode.

At scale: the file source scales by `maxFilesPerTrigger`; each micro-batch
is a normal distributed load job (parse in mapInPandas on executors,
dedup via anti-join), so an unbounded crawl ingests at cluster bandwidth
while the driver only tracks file registration.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from kingfisher_process_spark.operators import lifecycle
from kingfisher_process_spark.sources import detect
from kingfisher_process_spark.sources.loader import PARSED_SCHEMA
from kingfisher_process_spark.store import Store


def _parse_batch_texts(batch_df, data_type: dict, cfid_by_path: dict[str, int]):
    """Batch-side parse: one row per file (path, wholetext) → item rows.
    The (tiny, per-micro-batch) path→collection_file_id map travels in the
    UDF closure."""
    import pandas as pd

    from kingfisher_process_spark.sources import reader

    def gen(batches):
        for pdf in batches:
            rows = []
            for path, text in zip(pdf["path"], pdf["value"]):
                for row in reader.text_item_rows(text, data_type, label=path):
                    row["collection_file_id"] = cfid_by_path.get(path)
                    rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in PARSED_SCHEMA.fields])

    return batch_df.mapInPandas(gen, PARSED_SCHEMA)


class StreamingLoader:
    """Open collection + streaming file ingest.

    Usage::

        sl = StreamingLoader(spark, store, "src", "2020-01-01", watch_dir,
                             data_type={"format": "release package", ...})
        q = sl.start(checkpoint_dir)
        ...  # files land in watch_dir; each micro-batch loads + registers
        q.processAllAvailable(); q.stop()
        sl.close()  # store_end_at + finish (counts, completed_at)
    """

    def __init__(self, spark: SparkSession, store: Store, source_id: str,
                 data_version: str, watch_dir: str, data_type: dict,
                 compile_: bool = False, max_files_per_trigger: int = 16,
                 state_store_provider: str | None = None):
        self.spark = spark
        self.store = store
        self.watch_dir = watch_dir
        self.data_type = data_type
        self.compile_ = compile_
        # backpressure: bounds each micro-batch's parse/dedup job (the
        # reference's prefetch=20 consumer window, process/util.py:47)
        self.max_files_per_trigger = max_files_per_trigger
        # state store for stateful stages sharing this session (e.g.
        # RocksDB via session.ROCKSDB_STATE_PROVIDER at large key
        # cardinality — see SCALE.md "State store"); applied at start()
        self.state_store_provider = state_store_provider
        self.ids = lifecycle.create_collections(store, source_id, data_version,
                                                compile_=compile_)
        lifecycle._update_collection(store, self.ids["root"],
                                     data_type=json.dumps(data_type))
        self.collection_id = self.ids["root"]
        self.files_seen = 0

    @classmethod
    def attach(cls, spark: SparkSession, store: Store, collection_id: int,
               max_files_per_trigger: int = 16) -> "StreamingLoader":
        """Reattach to an OPEN collection after a driver restart: rebuild
        the loader's state (data_type, derived-collection ids, files
        already registered) from the catalog tables, so ``start`` with
        the original checkpoint dir resumes exactly where the crashed
        driver stopped — the file-source checkpoint skips files already
        committed, and the dedup sink makes a replayed half-committed
        batch idempotent. This is the restartable-worker property the
        reference gets from RabbitMQ redelivery (api_loader.py:28-49).

        Infrastructure settings are not persisted in the catalog: set
        ``watch_dir`` before ``start``, and re-pass the original
        ``max_files_per_trigger`` if it was non-default (the
        backpressure bound does not survive the restart on its own).
        """
        rows = {r["id"]: r for r in store.read_rows("collection")}
        root = rows.get(collection_id)
        if root is None:
            raise KeyError(f"collection {collection_id} not found")
        if root["store_end_at"] is not None:
            raise ValueError(f"collection {collection_id} is already closed")
        sl = cls.__new__(cls)
        sl.spark = spark
        sl.store = store
        sl.watch_dir = None
        sl.data_type = json.loads(root["data_type"]) if root["data_type"] else {}
        sl.collection_id = collection_id
        sl.ids = {"root": collection_id}
        for r in rows.values():
            if r["parent_id"] == collection_id and r["transform_type"] == lifecycle.TRANSFORM_COMPILE:
                sl.ids["compiled"] = r["id"]
            if r["parent_id"] == collection_id and r["transform_type"] == lifecycle.TRANSFORM_UPGRADE:
                sl.ids["upgraded"] = r["id"]
        sl.compile_ = "compiled" in sl.ids
        sl.max_files_per_trigger = max_files_per_trigger
        sl.state_store_provider = None  # infrastructure, not persisted
        sl.files_seen = len([
            r for r in store.read_rows("collection_file", ["collection_id"])
            if r["collection_id"] == collection_id])
        return sl

    def _process_batch(self, batch_df, batch_id: int) -> None:
        from kingfisher_process_spark.operators.compile_record import compile_records
        from kingfisher_process_spark.sources.loader import store_items

        batch_df = batch_df.withColumn("path", F.input_file_name())
        files = [r["path"] for r in batch_df.select("path").distinct().collect()]
        if not files:
            return
        pairs = lifecycle.create_collection_files(self.store, self.collection_id, files)
        cfid_by_path = {p: i for i, p in pairs}
        parsed = _parse_batch_texts(batch_df, self.data_type, cfid_by_path)
        store_items(self.store, self.collection_id, self.data_type["format"], parsed)
        self.files_seen += len(files)
        # Record packages compile per micro-batch without waiting for the
        # full load (compiler.py:146-148); compile_records' anti-join on
        # already-compiled OCIDs keeps re-delivered batches idempotent.
        if self.compile_ and self.data_type["format"] == detect.RECORD_PACKAGE:
            compile_records(self.store, self.collection_id, self.ids["compiled"])

    def start(self, checkpoint_dir: str, processing_interval: str | None = None):
        """Start the ingest stream.

        ``processing_interval=None`` → availableNow (drain-and-stop, the
        batch-campaign mode); ``"30 seconds"`` → a long-running
        processingTime trigger for continuously-arriving crawls. Both
        respect ``max_files_per_trigger`` so one giant drop of files
        becomes a sequence of bounded micro-batches instead of one
        unbounded job."""
        if not self.watch_dir:
            raise ValueError("watch_dir is unset — assign it before start() "
                             "(attach() does not persist infrastructure paths)")
        if self.state_store_provider:
            self.spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                self.state_store_provider)
        stream = (
            self.spark.readStream
            .option("wholetext", "true")
            .option("maxFilesPerTrigger", str(self.max_files_per_trigger))
            .text(self.watch_dir)
        )
        writer = (
            stream.writeStream
            .foreachBatch(self._process_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if processing_interval is None:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=processing_interval)
        return writer.start()

    def close(self) -> dict:
        """store_end_at + finish. Release packages compile HERE — the
        reference's compilable() gate waits for the whole load
        (compiler.py:128-181); record packages already compiled per batch."""
        from kingfisher_process_spark.operators.compile_release import compile_collection

        lifecycle.close_collection(self.store, self.collection_id,
                                   expected_files_count=self.files_seen)
        if self.compile_ and self.data_type["format"] == detect.RELEASE_PACKAGE:
            compile_collection(self.store, self.collection_id, self.ids["compiled"])
        if self.compile_:
            lifecycle.finish_collection(self.store, self.ids["compiled"])
        return lifecycle.finish_collection(self.store, self.collection_id)
