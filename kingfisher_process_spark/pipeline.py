"""End-to-end collection processing — the engine's main entry point.

The reference choreographs load → upgrade → compile → check → finish
through six RabbitMQ worker hops (SURVEY §3.1). Here the same pipeline is
one synchronous Spark stage DAG: each hop becomes a DataFrame job over the
parquet store, and the process-manager machinery (steps, optimistic locks,
requeues — compiler.py:128-181, finisher.py:74-176) reduces to function
call order.
"""

from __future__ import annotations

import json
from decimal import Decimal

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from kingfisher_process_spark.operators import lifecycle
from kingfisher_process_spark.operators.check import check_collection
from kingfisher_process_spark.operators.compile_record import compile_records
from kingfisher_process_spark.operators.compile_release import compile_collection
from kingfisher_process_spark.operators.upgrade import upgrade_10_11
from kingfisher_process_spark.sources import detect
from kingfisher_process_spark.sources.loader import PARSED_SCHEMA, parse_files, store_items
from kingfisher_process_spark.store import Store
from kingfisher_process_spark.util import canonical_json, md5_hex, walk_files


def _upgrade_parsed(parsed, cfid_map: dict[int, int]):
    """Map the parsed-items DataFrame through the 1.0→1.1 upgrade
    (file_worker.py:330-335); upgrade warnings become WARNING note rows
    (returned as data, not logged — SURVEY §7 watchlist #4)."""
    cols = [f.name for f in PARSED_SCHEMA.fields]

    def gen(batches):
        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):
                if r["row_kind"] != "item":
                    continue
                cfid = cfid_map.get(r["collection_file_id"])
                doc = json.loads(r["data"], parse_float=Decimal)
                upgraded, warns = upgrade_10_11(doc)
                cj = canonical_json(upgraded)
                out = dict(r)
                out.update(collection_file_id=cfid, data=cj, hash_md5=md5_hex(cj))
                rows.append(out)
                for wtext in warns:
                    rows.append({
                        "collection_file_id": cfid, "row_kind": "note",
                        "item_index": None, "ocid": None, "release_id": None,
                        "release_date": None, "data": None, "hash_md5": None,
                        "package_data": None, "package_hash": None,
                        "note_code": "WARNING", "note": wtext,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return parsed.mapInPandas(gen, PARSED_SCHEMA)


def process_collection(
    spark: SparkSession,
    store: Store,
    source_id: str,
    data_version: str,
    paths: list[str],
    *,
    upgrade: bool = False,
    compile_: bool = False,
    check: bool = False,
    sample: bool = False,
    note: str | None = None,
    two_phase_compile: bool | str = "auto",
    extension_schemas: dict[str, dict] | str | None = None,
) -> dict:
    """Load files into a new collection and run the requested transforms.

    ``extension_schemas`` may be a pre-built {url: release-schema-patch}
    dict or a PATH to an offline extension bundle directory
    (merge.load_extension_bundle) — the no-network analogue of the
    reference's compile-time extension fetch (compiler.py:136-140).

    Returns {"collections": {...}, "data_type": {...}, counts per stage}.
    """
    if isinstance(extension_schemas, str):
        from kingfisher_process_spark.operators.merge import load_extension_bundle

        extension_schemas = load_extension_bundle(extension_schemas)
    ids = lifecycle.create_collections(
        store, source_id, data_version,
        sample=sample, upgrade=upgrade, compile_=compile_, check=check, note=note,
    )
    result: dict = {"collections": ids}

    try:
        # S1 directory-walk source: paths may mix files and directories;
        # directories enumerate recursively, skipping dotfiles
        # (reference process/util.py:30-38 via commands/load.py:145-154)
        paths = walk_files(paths)
        if not paths:
            raise detect.EmptyFormatError("no input files found")
        data_type = detect.detect_format(paths[0]).as_dict()
    except ValueError as e:
        # invalid/truncated JSON → ERROR note, collection aborted
        # (file_worker.py:172-175 IncompleteJSONError path)
        msg = f"Source {source_id} yields invalid JSON: {e}"
        lifecycle.add_note(store, ids["root"], "ERROR", msg)
        result["error"] = msg
        return result
    except (detect.EmptyFormatError, detect.UnsupportedFormatError,
            detect.UnknownFormatError, FileNotFoundError) as e:
        lifecycle.add_note(store, ids["root"], "ERROR", str(e))
        result["error"] = str(e)
        return result
    result["data_type"] = data_type
    lifecycle._update_collection(store, ids["root"], data_type=json.dumps(data_type))

    fmt = data_type["format"]
    pairs = lifecycle.create_collection_files(store, ids["root"], paths)
    parsed = parse_files(spark, pairs, data_type).cache()
    result["load"] = store_items(store, ids["root"], fmt, parsed)

    compile_parent = ids["root"]
    if upgrade:
        upg_id = ids["upgraded"]
        lifecycle._update_collection(store, upg_id, data_type=json.dumps(data_type))
        upg_pairs = lifecycle.create_collection_files(store, upg_id, paths)
        cfid_map = {root_cfid: upg_cfid
                    for (root_cfid, _), (upg_cfid, _) in zip(pairs, upg_pairs)}
        upgraded_parsed = _upgrade_parsed(parsed, cfid_map)
        result["upgrade"] = store_items(store, upg_id, fmt, upgraded_parsed)
        compile_parent = upg_id

    parsed.unpersist()

    if compile_:
        comp_id = ids["compiled"]
        if fmt == detect.RELEASE_PACKAGE:
            # the load stage's stats job already bounded releases-per-ocid
            # for the compile parent — lets "auto" skip its skew-detection
            # job when the collection provably has no hot OCIDs
            hint = (result.get("upgrade") or result["load"]).get("max_per_ocid")
            result["compile"] = compile_collection(store, compile_parent, comp_id,
                                                   two_phase=two_phase_compile,
                                                   max_per_ocid=hint,
                                                   extension_schemas=extension_schemas)
        elif fmt == detect.RECORD_PACKAGE:
            result["compile"] = compile_records(store, compile_parent, comp_id)
        else:
            # compiled-release inputs are already compiled (reference
            # compilable() never fires for this format)
            lifecycle.add_note(store, comp_id, "INFO",
                              "Collection is already compiled; compile step skipped")
        # compiled collection joins the batch finish at the end (one job
        # covers root/upgraded/compiled — synchronous DAG, same semantics)

    if check:
        kind = "record" if fmt == detect.RECORD_PACKAGE else "release"
        target = compile_parent
        result["check"] = check_collection(store, target, kind,
                                           extension_schemas=extension_schemas)

    lifecycle.close_collection(store, ids["root"], expected_files_count=len(paths))
    # every stage already reported what it wrote into these fresh
    # collections — finish needs no re-count job
    item_table = {detect.RELEASE_PACKAGE: "release",
                  detect.RECORD_PACKAGE: "record",
                  detect.COMPILED_RELEASE: "compiled_release"}[fmt]
    known = {ids["root"]: {item_table: result["load"]["rows"]}}
    if upgrade:
        known[ids["upgraded"]] = {item_table: result["upgrade"]["rows"]}
    if compile_:
        known[ids["compiled"]] = {
            "compiled_release": result.get("compile", {}).get("compiled", 0)}
    lifecycle.finish_collections(store, list(ids.values()), known_counts=known)
    return result
