"""Per-file OCDS parsing — the executor-side half of ingest.

Pure Python (no Spark imports): these functions run inside
``mapInPandas`` batches (see sources/loader.py). Decimal fidelity is
preserved end-to-end: numbers parse as ``Decimal`` and re-serialize
canonically via util.canonical_json (reference: ijson Decimal parse at
file_worker.py:281,306; simplejson use_decimal at models.py:8-9).

Reference behaviors mirrored:
- package metadata is the package object **excluding** the items key, and
  only the FIRST package's metadata is kept for arrays/concatenated files
  (file_worker.py:270-296; docs/cli.rst:36)
- items without ``ocid`` are skipped from envelope rows but their payload
  is still stored (file_worker.py:346-348)
- oversized files are skipped with an ERROR note (file_worker.py:132-144)
"""

from __future__ import annotations

import os
from typing import Any, Iterator

from kingfisher_process_spark.sources import detect
from kingfisher_process_spark.util import MAX_JSON_BYTES, canonical_json, md5_hex

ITEMS_KEY = {
    detect.RELEASE_PACKAGE: "releases",
    detect.RECORD_PACKAGE: "records",
}


class ParsedItem:
    __slots__ = ("ocid", "release_id", "release_date", "data", "package")

    def __init__(self, ocid, release_id, release_date, data, package):
        self.ocid = ocid
        self.release_id = release_id
        self.release_date = release_date
        self.data = data  # canonical JSON string
        self.package = package  # canonical JSON string or None


def iter_packages(values: list, is_array: bool) -> Iterator[Any]:
    """Yield package-level objects from the file's top-level values."""
    for value in values:
        if is_array and isinstance(value, list):
            yield from value
        else:
            yield value


def parse_file(path: str, data_type: dict) -> tuple[list[ParsedItem], list[tuple[str, str]]]:
    """Parse one file into items. Returns (items, notes) where notes are
    (code, text) pairs for file-level problems."""
    notes: list[tuple[str, str]] = []

    if os.path.getsize(path) > MAX_JSON_BYTES:
        notes.append(("ERROR", f"File {path} is too large to store"))
        return [], notes

    try:
        with open(path, encoding="utf-8") as f:
            text = f.read()
    except FileNotFoundError:
        notes.append(("ERROR", f"{path} has disappeared"))
        return [], notes
    return parse_text(text, data_type, label=path)


def parse_text(text: str, data_type: dict,
               label: str = "text") -> tuple[list[ParsedItem], list[tuple[str, str]]]:
    """Parse in-memory JSON text into items — shared by the batch loader
    (which reads files, parse_file) and the streaming loader (whose source
    delivers content directly, streaming/ingest.py)."""
    notes: list[tuple[str, str]] = []
    try:
        values, _ = detect.parse_top_level(text)
    except ValueError:
        notes.append(("ERROR", f"File {label} yields invalid JSON"))
        return [], notes

    fmt = data_type["format"]
    items: list[ParsedItem] = []

    if fmt == detect.COMPILED_RELEASE:
        # Top-level values are the compiled releases themselves (possibly
        # concatenated or an array).
        for pkg in iter_packages(values, data_type.get("array", False)):
            if not isinstance(pkg, dict):
                continue
            items.append(ParsedItem(
                pkg.get("ocid"),
                pkg.get("id") or "",
                pkg.get("date") or "",
                canonical_json(pkg),
                None,
            ))
        return items, notes

    items_key = ITEMS_KEY[fmt]
    package_json: str | None = None
    for pkg in iter_packages(values, data_type.get("array", False)):
        if not isinstance(pkg, dict):
            continue
        if package_json is None:
            meta = {k: v for k, v in pkg.items() if k != items_key}
            package_json = canonical_json(meta)
        for item in pkg.get(items_key) or []:
            if not isinstance(item, dict):
                continue
            items.append(ParsedItem(
                item.get("ocid"),
                item.get("id") or "",
                item.get("date") or "",
                canonical_json(item),
                package_json,
            ))
    return items, notes


def item_rows(path: str, data_type: dict) -> Iterator[dict]:
    """Flatten parse_file output into uniform row dicts for the loader's
    mapInPandas schema (row_kind ∈ {item, note})."""
    yield from _flatten_rows(*parse_file(path, data_type))


def text_item_rows(text: str, data_type: dict, label: str = "text") -> Iterator[dict]:
    """item_rows over in-memory text (streaming sources deliver content,
    not just paths)."""
    yield from _flatten_rows(*parse_text(text, data_type, label=label))


def _flatten_rows(items: list[ParsedItem], notes: list[tuple[str, str]]) -> Iterator[dict]:
    for code, text in notes:
        yield {
            "row_kind": "note", "item_index": None, "ocid": None, "release_id": None,
            "release_date": None, "data": None, "hash_md5": None,
            "package_data": None, "package_hash": None,
            "note_code": code, "note": text,
        }
    for idx, it in enumerate(items):
        yield {
            "row_kind": "item",
            "item_index": idx,
            "ocid": it.ocid,
            "release_id": it.release_id,
            "release_date": it.release_date,
            "data": it.data,
            "hash_md5": md5_hex(it.data),
            "package_data": it.package,
            "package_hash": md5_hex(it.package) if it.package is not None else None,
            "note_code": None, "note": None,
        }
