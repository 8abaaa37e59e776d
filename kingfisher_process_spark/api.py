"""API parity layer — the reference's REST surface (process/views.py:65-331)
as library functions over the Store. Each function mirrors one endpoint's
semantics and validation; the HTTP layer is out of scope (any thin WSGI
wrapper can call these).

Endpoints → functions:
- POST /api/collections/           → create_collection  (views.py:81-109)
- POST /api/collections/{id}/close → close_collection   (views.py:111-147)
- DELETE /api/collections/{id}/    → destroy_collection (views.py:149-155)
- GET  .../metadata                → metadata           (views.py:157-234)
- GET  .../notes                   → notes              (views.py:236-281)
- GET  .../tree                    → tree               (views.py:283-331)
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from kingfisher_process_spark.operators import lifecycle
from kingfisher_process_spark.store import Store

# source_id validator (process/models.py:47-50)
SOURCE_ID_RE = re.compile(r"^([a-z]+_)*[a-z]+$")
# data_version format accepted by the loader CLI (load.py docs)
DATA_VERSION_RE = re.compile(r"^\d{4}-\d{2}-\d{2}( \d{2}:\d{2}:\d{2})?$")


class ApiError(ValueError):
    """Validation failure — maps to HTTP 400 in a web wrapper."""


def create_collection(store: Store, source_id: str, data_version: str, *,
                      sample: bool = False, upgrade: bool = False,
                      compile_: bool = False, check: bool = False,
                      note: str | None = None) -> dict[str, int]:
    """Create a collection (+derived children per requested steps).
    Returns {"root": id, "upgraded": id?, "compiled": id?}."""
    if not SOURCE_ID_RE.match(source_id or ""):
        raise ApiError(
            f"source_id {source_id!r} is invalid: letters and underscores only")
    if not DATA_VERSION_RE.match(data_version or ""):
        raise ApiError(
            f"data_version {data_version!r} is invalid: YYYY-MM-DD[ HH:MM:SS]")
    return lifecycle.create_collections(
        store, source_id, data_version, sample=sample,
        upgrade=upgrade, compile_=compile_, check=check, note=note)


def _get_collection(store: Store, collection_id: int) -> dict:
    rows = (store.read("collection")
            .where(F.col("id") == collection_id).collect())
    if not rows:
        raise ApiError(f"Collection {collection_id} not found")
    return rows[0].asDict()


def add_files(store: Store, collection_id: int, paths: list[str]) -> list[tuple[int, str]]:
    """Register new input files in an OPEN collection (addfiles.py:22-26:
    closed collections reject new files)."""
    coll = _get_collection(store, collection_id)
    if coll["store_end_at"] is not None:
        raise ApiError(f"Collection {collection_id} is closed; cannot add files")
    if coll["deleted_at"] is not None:
        raise ApiError(f"Collection {collection_id} is deleted")
    return lifecycle.create_collection_files(store, collection_id, paths)


def close_collection(store: Store, collection_id: int,
                     expected_files_count: int | None = None) -> dict:
    """store_end_at + finish: cached counts, completed_at."""
    coll = _get_collection(store, collection_id)
    if coll["store_end_at"] is not None:
        raise ApiError(f"Collection {collection_id} is already closed")
    lifecycle.close_collection(store, collection_id,
                               expected_files_count=expected_files_count)
    return lifecycle.finish_collection(store, collection_id)


def destroy_collection(store: Store, collection_id: int) -> None:
    """Soft-delete + wipe rows (views.py:149-155 → wiper)."""
    _get_collection(store, collection_id)
    lifecycle.delete_collection(store, collection_id)


def metadata(store: Store, collection_id: int) -> dict:
    _get_collection(store, collection_id)
    return lifecycle.collection_metadata(store, collection_id)


def notes(store: Store, collection_id: int) -> list[dict]:
    _get_collection(store, collection_id)
    return [r.asDict() for r in lifecycle.collection_notes(store, collection_id).collect()]


def tree(store: Store, collection_id: int) -> list[dict]:
    return lifecycle.collection_tree(store, collection_id)
