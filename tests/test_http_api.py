"""HTTP layer (views.py:65-331 parity) — drives the WSGI app in-process
with synthetic environs; response shapes are the reference's."""

from __future__ import annotations

import io
import json

import pytest

from kingfisher_process_spark.http_api import make_app
from kingfisher_process_spark.store import Store


@pytest.fixture
def store(spark, tmp_path):
    return Store(spark, str(tmp_path / "store"))


def call(app, method, path, body=None, query=""):
    raw = json.dumps(body).encode() if body is not None else b""
    environ = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "QUERY_STRING": query,
        "CONTENT_LENGTH": str(len(raw)),
        "wsgi.input": io.BytesIO(raw),
    }
    out = {}

    def start_response(status, headers):
        out["status"] = int(status.split()[0])
        out["headers"] = dict(headers)

    chunks = app(environ, start_response)
    text = b"".join(chunks).decode()
    return out["status"], (json.loads(text) if text else None)


def test_create_close_notes_tree(spark, store):
    app = make_app(store)

    status, body = call(app, "POST", "/api/collections/", {
        "source_id": "test_source", "data_version": "2020-01-01",
        "upgrade": True, "compile": True, "note": "from http"})
    assert status == 200
    assert set(body) == {"collection_id", "upgraded_collection_id",
                         "compiled_collection_id"}
    root = body["collection_id"]

    # tree returns root + derived, depth-ordered
    status, rows = call(app, "GET", f"/api/collections/{root}/tree/")
    assert status == 200 and len(rows) == 3
    assert rows[0]["id"] == root and not rows[0]["transform_type"]

    # close with collect-style stats sets the expected-files barrier
    status, body = call(app, "POST", f"/api/collections/{root}/close/", {
        "reason": "finished",
        "stats": {"kingfisher_process_expected_files_count": 0}})
    assert status == 202 and body is None

    # notes: reference shape {level: [[note, data], ...]}, root-only
    status, notes = call(app, "GET", f"/api/collections/{root}/notes/")
    assert status == 200
    flat = [n for lv in notes.values() for n, _ in lv]
    assert "from http" in flat
    assert "Spider close reason: finished" in flat
    assert ["Spider stats",
            {"kingfisher_process_expected_files_count": 0}] in notes["INFO"]
    # level filter
    status, notes = call(app, "GET", f"/api/collections/{root}/notes/",
                         query="level=ERROR")
    assert status == 200 and set(notes) == {"ERROR"}

    # notes on a non-root collection is a 400 (views.py:268-269)
    child = rows[1]["id"]
    status, err = call(app, "GET", f"/api/collections/{child}/notes/")
    assert status == 400 and "root" in err["error"]


def test_validation_and_404s(spark, store):
    app = make_app(store)
    status, err = call(app, "POST", "/api/collections/", {
        "source_id": "Bad-Source!", "data_version": "2020-01-01"})
    assert status == 400 and "source_id" in err["error"]

    status, err = call(app, "GET", "/api/collections/999/tree/")
    assert status == 404

    status, err = call(app, "POST", "/api/collections/999/close/", {})
    assert status == 404

    status, err = call(app, "GET", "/api/collections/nope/metadata/")
    assert status == 404  # non-numeric id never routes


def test_metadata_requires_compiled_collection(spark, store, tmp_path):
    from tests.test_pipeline_e2e import RELEASES, release_package
    from kingfisher_process_spark.pipeline import process_collection
    from kingfisher_process_spark.util import canonical_json

    path = tmp_path / "pkg.json"
    path.write_text(canonical_json(release_package(RELEASES)))
    r = process_collection(spark, store, "http_meta", "2020-01-01 00:00:00",
                           [str(path)], compile_=True)
    app = make_app(store)
    root, comp = r["collections"]["root"], r["collections"]["compiled"]

    status, err = call(app, "GET", f"/api/collections/{root}/metadata/")
    assert status == 400 and "compiled" in err["error"]

    status, meta = call(app, "GET", f"/api/collections/{comp}/metadata/")
    assert status == 200
    assert meta["ocid_prefix"] == "ocds-x-2"[:11]  # LEFT(MAX(ocid), 11)
    assert meta["license"] == "CC-BY"

    # destroy wipes (202 then rows gone)
    status, _ = call(app, "DELETE", f"/api/collections/{root}/")
    assert status == 202


def test_notes_filters_unknown_levels(spark, store):
    """Reference behavior (views.py:268): unrecognized ?level= values are
    silently filtered — level=info (lowercase) yields 200 with an empty
    dict, not an error."""
    from kingfisher_process_spark import api

    app = make_app(store)
    ids = api.create_collection(store, "lvl_check", "2020-01-01")
    status, notes = call(app, "GET", f"/api/collections/{ids['root']}/notes/",
                         query="level=info")
    assert status == 200 and notes == {}
