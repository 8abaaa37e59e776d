"""API parity layer: endpoint semantics + validation (views.py:65-331,
addfiles.py:22-26, models.py:47-50)."""

from __future__ import annotations

import pytest

from kingfisher_process_spark import api
from kingfisher_process_spark.store import Store


@pytest.fixture
def store(spark, tmp_path):
    return Store(spark, str(tmp_path / "store"))


def test_create_validates_source_id(store):
    with pytest.raises(api.ApiError, match="source_id"):
        api.create_collection(store, "Bad-Source!", "2020-01-01")
    with pytest.raises(api.ApiError, match="data_version"):
        api.create_collection(store, "ok_source", "01/01/2020")
    ids = api.create_collection(store, "ok_source", "2020-01-01 00:00:00",
                                upgrade=True, compile_=True)
    assert set(ids) == {"root", "upgraded", "compiled"}


def test_closed_collection_rejects_files_and_reclose(store, tmp_path):
    ids = api.create_collection(store, "src", "2020-01-01")
    p = tmp_path / "a.json"
    p.write_text("{}")
    api.add_files(store, ids["root"], [str(p)])
    api.close_collection(store, ids["root"], expected_files_count=1)
    with pytest.raises(api.ApiError, match="closed"):
        api.add_files(store, ids["root"], [str(p)])
    with pytest.raises(api.ApiError, match="already closed"):
        api.close_collection(store, ids["root"])


def test_missing_collection_404s(store):
    with pytest.raises(api.ApiError, match="not found"):
        api.metadata(store, 999)
    with pytest.raises(api.ApiError, match="not found"):
        api.close_collection(store, 999)


def test_destroy_and_tree(store):
    ids = api.create_collection(store, "src", "2020-01-01", compile_=True)
    t = api.tree(store, ids["compiled"])
    assert [n["id"] for n in t] == [ids["root"], ids["compiled"]]
    api.destroy_collection(store, ids["root"])
    colls = {r["id"]: r.asDict() for r in store.read("collection").collect()}
    assert colls[ids["root"]]["deleted_at"] is not None


def test_collection_status_and_cancel(store, tmp_path):
    import json

    from kingfisher_process_spark.operators.compile_release import compile_collection
    from kingfisher_process_spark.pipeline import process_collection

    pkg = {"uri": "u", "publisher": {"name": "p"}, "releases": [
        {"ocid": "ocds-x-1", "id": "1", "date": "2020-01-01T00:00:00Z",
         "tag": ["tender"], "tender": {"id": "t", "status": "active"}}]}
    p = tmp_path / "pkg.json"
    p.write_text(json.dumps(pkg))
    result = process_collection(
        store.spark, store, "status_src", "2020-01-01 00:00:00", [str(p)],
        compile_=True)
    root = result["collections"]["root"]

    st = api.collection_status(store, root)
    assert st["steps"] == ["compile"]
    assert st["format"] == "release package"
    assert st["collection_files"] == 1
    assert st["processing_steps"] == 0
    assert st["completable"] is True
    assert st["compilable"] is True
    assert st["error_notes"] == []
    assert st["compiled_collection"]["collection_files"] == 1

    # child collections are not roots
    with pytest.raises(api.ApiError, match="not a root"):
        api.collection_status(store, result["collections"]["compiled"])

    # cancel: root + children stamped; compile stage no-ops afterwards
    cancelled = api.cancel_collection(store, root)
    assert set(cancelled) == set(result["collections"].values())
    colls = {r["id"]: r for r in store.read_rows("collection")}
    assert all(colls[c]["deleted_at"] is not None for c in cancelled)
    out = compile_collection(store, root, result["collections"]["compiled"])
    assert out.get("cancelled") is True and out["compiled"] == 0


def test_add_files_records_source_urls(spark, tmp_path):
    """api_loader metadata (loader.py:23-39): the source URL a file was
    downloaded from is stored on collection_file.url."""
    from kingfisher_process_spark import api
    from kingfisher_process_spark.store import Store

    store = Store(spark, str(tmp_path / "store"))
    ids = api.create_collection(store, "url_source", "2020-01-01")
    p = tmp_path / "f.json"
    p.write_text("{}")
    api.add_files(store, ids["root"], [str(p)],
                  urls={str(p): "https://example.com/api?page=1"})
    [row] = [r for r in store.read_rows("collection_file")
             if r["collection_id"] == ids["root"]]
    assert row["url"] == "https://example.com/api?page=1"
