"""Golden-output tests for the OCDS merge engine, ported from the
reference's expected values (tests/processors/test_compiler.py:10-125).
The golden JSON is the oracle here, not DuckDB (SURVEY §2.12)."""

from __future__ import annotations

import json

from kingfisher_process_spark.operators.merge import compile_releases


def test_merge_warning_golden():
    releases = [
        {
            "ocid": "ocds-213czf-1",
            "id": "1",
            "date": "2020-01-01T00:00:00Z",
            "parties": [
                {"id": "ORG-001", "name": "Acme Corp"},
                {"id": "ORG-001", "name": "Acme Inc."},
            ],
            "awards": [
                {"id": "1"},
                {"id": "1"},
            ],
        },
        {
            "ocid": "ocds-213czf-1",
            "id": "2",
            "date": "2020-01-01T00:00:00Z",
            "parties": [
                {"id": "ORG-002", "name": "Widget Factory"},
            ],
        },
    ]

    merged, notes = compile_releases("ocds-213czf-1", releases, set())

    assert merged == {
        "ocid": "ocds-213czf-1",
        "id": "ocds-213czf-1-2020-01-01T00:00:00Z",
        "date": "2020-01-01T00:00:00Z",
        "parties": [
            {"id": "ORG-001", "name": "Acme Inc."},
            {"id": "ORG-002", "name": "Widget Factory"},
        ],
        "awards": [{"id": "1"}],
        "tag": ["compiled"],
    }

    got = [(n.code, n.note, n.data) for n in notes]
    assert got == [
        (
            "WARNING",
            "Release at index 1 has the same date '2020-01-01T00:00:00Z' as the previous release",
            {"type": "RepeatedDateValueWarning", "date": "2020-01-01T00:00:00Z", "index": 1},
        ),
        (
            "WARNING",
            "Multiple objects have the `id` value 'ORG-001' in the `parties` array\n"
            "Multiple objects have the `id` value '1' in the `awards` array",
            {"type": "DuplicateIdValueWarning", "paths": {"parties": 1, "awards": 1}},
        ),
    ]


def test_merge_error_golden():
    merged, notes = compile_releases("ocds-213czf-1", ["invalid release"], set())
    assert merged is None
    got = [(n.code, n.note, n.data) for n in notes]
    assert got == [
        (
            "ERROR",
            "OCID ocds-213czf-1 can't be compiled",
            {"type": "NonObjectReleaseError", "message": "Release at index 0 must be an object", "index": 0},
        ),
    ]


def test_extension_warning():
    releases = [{"ocid": "ocds-213czf-1", "id": "1", "date": "2020-01-01T00:00:00Z"}]
    merged, notes = compile_releases(
        "ocds-213czf-1", releases,
        {"https://example.com/nonexistent_extension/master/"},
    )
    assert merged == {
        "date": "2020-01-01T00:00:00Z",
        "id": "ocds-213czf-1-2020-01-01T00:00:00Z",
        "ocid": "ocds-213czf-1",
        "tag": ["compiled"],
    }
    assert [n.data["type"] for n in notes] == ["ExtensionWarning"]


def test_null_deletes_and_whole_list_merge():
    releases = [
        {
            "ocid": "x", "id": "1", "date": "2000-01-01",
            "tender": {"status": "planned", "submissionMethod": ["electronicSubmission"]},
            "parties": [{"id": "P1", "roles": ["buyer"],
                         "additionalIdentifiers": [{"id": "a", "scheme": "s1"}]}],
        },
        {
            "ocid": "x", "id": "2", "date": "2000-01-02",
            "tender": {"status": None, "submissionMethod": ["written"]},
            "parties": [{"id": "P1", "roles": ["buyer", "supplier"],
                         "additionalIdentifiers": [{"id": "b"}]}],
        },
    ]
    merged, notes = compile_releases("x", releases, set())
    assert merged["tender"] == {"submissionMethod": ["written"]}  # null deleted status
    assert merged["parties"] == [
        {"id": "P1", "roles": ["buyer", "supplier"], "additionalIdentifiers": [{"id": "b"}]}
    ]  # wholeListMerge replaced both arrays
    assert notes == []


def test_date_errors():
    merged, notes = compile_releases("x", [{"ocid": "x", "id": "1"}], set())
    assert merged is None
    assert notes[0].data["type"] == "MissingDateKeyError"

    merged, notes = compile_releases("x", [{"ocid": "x", "id": "1", "date": None}], set())
    assert merged is None
    assert notes[0].data["type"] == "NullDateValueError"


def test_index_fallback_for_idless_objects():
    releases = [
        {"ocid": "x", "id": "1", "date": "2000-01-01",
         "awards": [{"title": "a"}, {"title": "b"}]},
        {"ocid": "x", "id": "2", "date": "2000-01-02",
         "awards": [{"title": "A"}]},
    ]
    merged, _ = compile_releases("x", releases, set())
    assert merged["awards"] == [{"title": "A"}, {"title": "b"}]


def test_notes_serializable():
    _, notes = compile_releases("x", ["bad"], set())
    for n in notes:
        code, text, data = n.as_tuple()
        assert json.loads(data)["type"] == "NonObjectReleaseError"


def test_versioned_release_golden():
    # Shapes from the public OCDS merging reference ('Versioned data'):
    # change-only history, plain array-item ids, wholeListMerge leaves,
    # omitted top-level id/date/tag, null recording no entry.
    from kingfisher_process_spark.operators.merge import create_versioned_release

    releases = [
        {
            "ocid": "ocds-213czf-1",
            "id": "1",
            "date": "2020-01-01T00:00:00Z",
            "tag": ["tender"],
            "initiationType": "tender",
            "tender": {"id": "t-1", "status": "active"},
            "parties": [{"id": "ORG-001", "name": "Acme Corp",
                         "roles": ["buyer"]}],
        },
        {
            "ocid": "ocds-213czf-1",
            "id": "2",
            "date": "2020-02-01T00:00:00Z",
            "tag": ["tenderUpdate"],
            "initiationType": "tender",  # unchanged -> no new entry
            "tender": {"id": "t-1", "status": "complete",
                       "submissionMethod": None},  # null -> no entry
            "parties": [{"id": "ORG-001", "name": "Acme Inc.",
                         "roles": ["buyer", "supplier"]}],
        },
    ]
    m1 = {"releaseID": "1", "releaseDate": "2020-01-01T00:00:00Z",
          "releaseTag": ["tender"]}
    m2 = {"releaseID": "2", "releaseDate": "2020-02-01T00:00:00Z",
          "releaseTag": ["tenderUpdate"]}

    assert create_versioned_release(releases) == {
        "ocid": "ocds-213czf-1",
        "initiationType": [{**m1, "value": "tender"}],
        "tender": {
            "id": [{**m1, "value": "t-1"}],  # object (non-array) id versions
            "status": [{**m1, "value": "active"}, {**m2, "value": "complete"}],
        },
        "parties": [{
            "id": "ORG-001",  # array-item merge key stays plain
            "name": [{**m1, "value": "Acme Corp"}, {**m2, "value": "Acme Inc."}],
            # parties.roles is wholeListMerge -> versions as one leaf
            "roles": [{**m1, "value": ["buyer"]},
                      {**m2, "value": ["buyer", "supplier"]}],
        }],
    }
