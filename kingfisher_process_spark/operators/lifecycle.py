"""Collection lifecycle — CRUD, completion, cached counts, metadata /
notes / tree queries (reference: process/processors/loader.py:42-132,
finisher.py:100-176, views.py:65-331).

The reference needs a process-manager state machine (compilable /
completable predicates polled over RabbitMQ) because its stages race
across workers. In this engine stages run as a synchronous Spark DAG, so
"compilable" and "completable" reduce to stage ordering; what remains of
the lifecycle is real state: collection rows, lineage, timestamps, cached
counts, soft-delete.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kingfisher_process_spark.store import Store

TRANSFORM_UPGRADE = "upgrade-1-0-to-1-1"
TRANSFORM_COMPILE = "compile-releases"


def _now():
    return datetime.now(tz=timezone.utc).replace(tzinfo=None)


def create_collections(store: Store, source_id: str, data_version: str, *,
                       sample: bool = False, upgrade: bool = False,
                       compile_: bool = False, check: bool = False,
                       note: str | None = None) -> dict[str, int]:
    """Create the root collection and its derived children
    (loader.py:42-105): root → [upgraded] → compiled (compiled hangs off
    the upgraded collection when both steps are requested).

    Returns {"root": id, "upgraded": id?, "compiled": id?}.
    """
    steps = []
    if check:
        steps.append("check")
    if compile_:
        steps.append("compile")

    base = store.next_id("collection")
    now = _now()
    rows = []
    ids = {"root": base}

    def row(cid, parent_id, transform_type, coll_steps):
        return {
            "id": cid, "source_id": source_id, "data_version": data_version,
            "sample": sample, "steps": coll_steps, "options": None,
            "expected_files_count": None, "data_type": None,
            "compilation_started": False, "compilation_enqueued": False,
            "parent_id": parent_id, "transform_type": transform_type,
            "scrapyd_job": None, "cached_releases_count": None,
            "cached_records_count": None, "cached_compiled_releases_count": None,
            "store_start_at": now, "store_end_at": None,
            "deleted_at": None, "completed_at": None,
        }

    root_steps = (["upgrade"] if upgrade else []) + steps
    rows.append(row(base, None, "", root_steps))
    compile_parent = base
    nxt = base + 1
    if upgrade:
        ids["upgraded"] = nxt
        rows.append(row(nxt, base, TRANSFORM_UPGRADE, steps))
        compile_parent = nxt
        nxt += 1
    if compile_:
        ids["compiled"] = nxt
        rows.append(row(nxt, compile_parent, TRANSFORM_COMPILE, []))
        nxt += 1

    store.append_rows("collection", rows)
    store.advance_next_id("collection", nxt)
    if note:
        add_note(store, base, "INFO", note)
    return ids


def add_note(store: Store, collection_id: int, code: str, note: str,
             data: str | None = None) -> None:
    nid = store.next_id("collection_note")
    store.append_rows("collection_note", [{
        "id": nid, "collection_id": collection_id, "note": note,
        "data": data, "stored_at": _now(), "code": code,
    }])
    store.advance_next_id("collection_note", nid + 1)


STEP_LOAD = "LOAD"


def create_load_steps(store: Store, collection_id: int,
                      pairs: list[tuple[int, str]]) -> None:
    """One LOAD processing_step per registered file (models.py:229-254,
    loader.py:36 ``create_step(LOAD, ...)``) — the work-in-flight marker
    the OPEN-collection path drains at close; existence of steps keeps
    ``completable``/``compilable`` false (compiler.py:162-167,
    finisher.py:142)."""
    base = store.next_id("processing_step")
    store.append_rows("processing_step", [
        {"id": base + i, "collection_id": collection_id,
         "collection_file_id": cfid, "ocid": None, "name": STEP_LOAD}
        for i, (cfid, _) in enumerate(pairs)
    ])
    store.advance_next_id("processing_step", base + len(pairs))


def pending_load_steps(store: Store, collection_id: int) -> list[dict]:
    if not store.exists("processing_step"):
        return []
    return [r for r in store.read_rows("processing_step")
            if r["collection_id"] == collection_id and r["name"] == STEP_LOAD]


def delete_steps(store: Store, step_ids: list[int]) -> None:
    """Transactional step deletion analogue (util.py:123-153): rewrite the
    (driver-sized) step table without the completed steps."""
    if not step_ids or not store.exists("processing_step"):
        return
    done = set(step_ids)
    keep = [r for r in store.read_rows("processing_step")
            if r["id"] not in done]
    store.overwrite_rows("processing_step", keep)


def create_collection_files(store: Store, collection_id: int,
                            paths: list[str],
                            urls: dict[str, str] | None = None,
                            ) -> list[tuple[int, str]]:
    """Register input files, unique on (collection, filename)
    (models.py:221-223). ``urls`` maps a path to its source URL — the
    Collect-integration metadata the API loader records
    (processors/loader.py:23-39 ``create_collection_file(filename, url)``).
    Returns (collection_file_id, path) pairs."""
    base = store.next_id("collection_file")
    existing = {
        r["filename"]
        for r in store.read_rows("collection_file", ["collection_id", "filename"])
        if r["collection_id"] == collection_id
    }
    pairs = []
    rows = []
    for i, p in enumerate(sorted(set(paths))):
        if p in existing:
            raise ValueError(f"File {p} already exists in collection {collection_id}")
        cfid = base + i
        pairs.append((cfid, p))
        rows.append({"id": cfid, "collection_id": collection_id, "filename": p,
                     "url": (urls or {}).get(p), "compilation_started": False})
    store.append_rows("collection_file", rows)
    store.advance_next_id("collection_file", base + len(rows))
    return pairs


def _update_collection(store: Store, collection_id: int, **updates) -> None:
    """Rewrite the (small) collection table with updated fields — a pure
    driver-side read/modify/swap (store.read_rows/overwrite_rows): the
    collection table is O(#collections) catalog metadata, and routing a
    one-row UPDATE through a distributed overwrite cost ~1s of scheduler
    overhead per lifecycle tick."""
    rows = store.read_rows("collection")
    max_id = 0
    for d in rows:
        max_id = max(max_id, d["id"])
        if d["id"] == collection_id:
            d.update(updates)
    store.overwrite_rows("collection", rows)
    store.advance_next_id("collection", max_id + 1)  # ids unchanged by update


def close_collection(store: Store, collection_id: int,
                     expected_files_count: int | None = None) -> None:
    """store_end_at + expected_files_count (views.py:111-147)."""
    _update_collection(store, collection_id, store_end_at=_now(),
                       expected_files_count=expected_files_count)


def finish_collection(store: Store, collection_id: int) -> dict:
    """Cache counts and set completed_at (finisher.py:100-113)."""
    return finish_collections(store, [collection_id])[collection_id]


def finish_collections(store: Store, collection_ids: list[int],
                       known_counts: dict[int, dict[str, int]] | None = None,
                       ) -> dict[int, dict]:
    """Batch finish: cache counts + completed_at for several collections in
    ONE Spark job (union of partition-pruned scans, grouped by collection).
    The pipeline finishes root/upgraded/compiled together instead of paying
    one count job per collection.

    ``known_counts``: {collection_id: {table: n}} from a caller that just
    wrote the rows itself (the pipeline's stage results carry every count).
    When it covers all requested collections the count job is skipped
    entirely — tables unmentioned for a covered collection are taken as 0,
    so it is only valid for collections the caller populated from scratch.
    """
    fields = {"release": "cached_releases_count",
              "record": "cached_records_count",
              "compiled_release": "cached_compiled_releases_count"}
    if known_counts is not None and all(c in known_counts for c in collection_ids):
        by_key = {(t, cid): n
                  for cid, per in known_counts.items() for t, n in per.items()}
    else:
        unioned = None
        for table in fields:
            part = (store.read(table)
                    .where(F.col("collection_id").isin(collection_ids))
                    .select(F.lit(table).alias("t"), "collection_id"))
            unioned = part if unioned is None else unioned.unionAll(part)
        by_key = {(r["t"], r["collection_id"]): r["n"] for r in
                  unioned.groupBy("t", "collection_id")
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
    now = _now()
    out: dict[int, dict] = {}
    # one read/modify/swap of the catalog covers every collection
    rows = store.read_rows("collection")
    max_id = 0
    for d in rows:
        max_id = max(max_id, d["id"])
        if d["id"] in collection_ids:
            counts = {field: by_key.get((table, d["id"]), 0)
                      for table, field in fields.items()}
            d.update(completed_at=now, **counts)
            out[d["id"]] = counts
    store.overwrite_rows("collection", rows)
    store.advance_next_id("collection", max_id + 1)
    return out


def collection_cancelled(store: Store, collection_id: int) -> bool:
    """P8 stage-entry guard (file_worker.py:86-88, record_compiler.py:35-37,
    compiler.py:43-44): a collection with deleted_at set is skipped by
    every stage. Driver-side catalog read — no Spark job."""
    for r in store.read_rows("collection", ["id", "deleted_at"]):
        if r["id"] == collection_id:
            return r["deleted_at"] is not None
    return False


def delete_collection(store: Store, collection_id: int) -> None:
    """Soft-delete + physical wipe of the collection's rows — partition
    drops instead of the reference's batched DELETEs (wiper.py:56-90)."""
    _update_collection(store, collection_id, deleted_at=_now())
    for table in ("release", "record", "compiled_release", "collection_file",
                  "processing_step"):
        store.drop_collection_partition(table, collection_id)


def delete_orphan_data(store: Store) -> int:
    """deleteorphan (deleteorphan.py:27-44): data/package_data rows no
    longer referenced by any envelope row — one distributed anti-join per
    table instead of 100k-row keyset-paginated DELETE batches."""
    refs = None
    for table, col in (("release", "data_id"), ("record", "data_id"),
                       ("compiled_release", "data_id")):
        ids = store.read(table).select(F.col(col).alias("id"))
        refs = ids if refs is None else refs.union(ids)
    import os
    import shutil

    live = store.read("data").join(refs.distinct(), "id", "left_semi")
    n_before = store.read("data").count()
    # Write survivors to a temp dir then swap — a distributed rewrite, not
    # a driver-side materialization (the data table is the big one).
    tmp = store.path("data") + "__rewrite"
    live.write.mode("overwrite").parquet(tmp)
    n_after = store.spark.read.parquet(tmp).count()
    shutil.rmtree(store.path("data"))
    os.replace(tmp, store.path("data"))
    return n_before - n_after


# -- read endpoints (views.py) ---------------------------------------------

def collection_metadata(store: Store, collection_id: int) -> dict:
    """The metadata endpoint (views.py:157-234): OCID prefix + date range
    from the COMPILED collection (lexicographic text compare —
    views.py:193-194), license/publication policy from a sample package of
    the ROOT collection (views.py:224-229 runs the package_data query
    against ``collection.get_root_parent()`` — derived collections carry
    no release/record rows of their own)."""
    crs = store.read("compiled_release").where(F.col("collection_id") == collection_id)
    today = datetime.now(tz=timezone.utc).date().isoformat()
    agg = crs.where(
        (F.col("release_date") > "1970-01-01") & (F.col("release_date") <= today + "~")
    ).agg(
        F.substring(F.max("ocid"), 1, 11).alias("ocid_prefix"),
        F.min("release_date").alias("published_from"),
        F.max("release_date").alias("published_to"),
    ).collect()[0]

    rows = {r["id"]: r for r in store.read_rows("collection")}
    root_id = collection_id
    while rows.get(root_id, {}).get("parent_id") is not None:
        root_id = rows[root_id]["parent_id"]
    pkg = []
    for table in ("record", "release"):  # record first, as the UNION ALL does
        pkg = (
            store.read(table).where(F.col("collection_id") == root_id)
            .where(F.col("package_data_id").isNotNull())
            .select("package_data_id").limit(1)
            .join(store.read("package_data"), F.col("package_data_id") == F.col("id"))
            .select("data").collect()
        )
        if pkg:
            break
    meta = dict(agg.asDict())
    if pkg:
        import json as _json

        p = _json.loads(pkg[0]["data"])
        for ours, theirs in (("license", "license"),
                             ("publication_policy", "publicationPolicy"),
                             ("version", "version")):
            if theirs in p:
                meta[ours] = p[theirs]
    return meta


def collection_tree(store: Store, collection_id: int) -> list[dict]:
    """The tree endpoint (views.py:283-331, WITH RECURSIVE): root + derived
    collections. Tree depth ≤ 3 (models.py:125-144), so an iterative
    driver loop replaces SQL recursion."""
    rows = {r["id"]: r for r in store.read_rows("collection")}
    # walk up to the root
    node = rows.get(collection_id)
    if node is None:
        return []
    while node["parent_id"] is not None:
        node = rows[node["parent_id"]]
    # walk down
    out = [node]
    frontier = [node["id"]]
    while frontier:
        children = [r for r in rows.values() if r["parent_id"] in frontier]
        out.extend(children)
        frontier = [c["id"] for c in children]
    return out


def collection_notes(store: Store, collection_id: int) -> DataFrame:
    return (
        store.read("collection_note")
        .where(F.col("collection_id") == collection_id)
        .orderBy("id")
    )
