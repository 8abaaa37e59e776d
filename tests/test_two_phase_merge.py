"""Two-phase (partial) merge must be indistinguishable from the
single-phase engine: same merged document, same warnings, for any batch
split. Property-tested with hypothesis + checked end-to-end on Spark."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings, strategies as st

from kingfisher_process_spark.operators import merge as m
from kingfisher_process_spark.operators import merge_partial as mp


def _assert_equivalent(releases, batch):
    want, want_notes = m.create_compiled_release([json.loads(json.dumps(r)) for r in releases])
    got, got_notes = mp.two_phase_compile([json.loads(json.dumps(r)) for r in releases], batch=batch)
    assert got == want
    assert [n.as_tuple() for n in got_notes] == [n.as_tuple() for n in want_notes]


# -- directed cases covering every barrier rule ------------------------------

CASES = [
    # last-wins scalars + nested merge across the split
    [{"ocid": "x", "date": "2020-01-01", "tender": {"id": "t", "status": "planned"}},
     {"ocid": "x", "date": "2020-01-02", "tender": {"status": "active"}},
     {"ocid": "x", "date": "2020-01-03", "buyer": {"name": "B"}}],
    # null-delete in a later batch must erase an earlier batch's field
    [{"ocid": "x", "date": "2020-01-01", "tender": {"id": "t", "status": "planned"}},
     {"ocid": "x", "date": "2020-01-02", "tender": {"status": None}},
     {"ocid": "x", "date": "2020-01-03", "title": "z"}],
    # scalar reset then dict again: earlier dict children must NOT resurface
    [{"ocid": "x", "date": "2020-01-01", "planning": {"rationale": "old", "budget": 1}},
     {"ocid": "x", "date": "2020-01-02", "planning": 7},
     {"ocid": "x", "date": "2020-01-03", "planning": {"budget": 2}}],
    # id-merge across batches + duplicate ids within one release
    [{"ocid": "x", "date": "2020-01-01",
      "awards": [{"id": "a", "status": "pending"}, {"id": "a", "status": "active"}]},
     {"ocid": "x", "date": "2020-01-02", "awards": [{"id": "b", "value": 5}]},
     {"ocid": "x", "date": "2020-01-03", "awards": [{"id": "a", "status": "done"}]}],
    # wholesale replacement (empty list) then id-merge rebuild
    [{"ocid": "x", "date": "2020-01-01", "awards": [{"id": "a", "v": 1}]},
     {"ocid": "x", "date": "2020-01-02", "awards": []},
     {"ocid": "x", "date": "2020-01-03", "awards": [{"id": "b", "v": 2}]}],
    # non-object list → wholesale; repeated dates → warning indices
    [{"ocid": "x", "date": "2020-01-01", "items": [1, 2]},
     {"ocid": "x", "date": "2020-01-01", "items": [3]},
     {"ocid": "x", "date": "2020-01-02", "items": [{"id": "i"}]}],
    # delete inside an id-addressed array entry
    [{"ocid": "x", "date": "2020-01-01", "awards": [{"id": "a", "note": "n", "v": 1}]},
     {"ocid": "x", "date": "2020-01-02", "awards": [{"id": "a", "note": None}]},
     {"ocid": "x", "date": "2020-01-03", "awards": [{"id": "a", "w": 2}]}],
]


@pytest.mark.parametrize("case", range(len(CASES)))
@pytest.mark.parametrize("batch", [1, 2])
def test_directed_equivalence(case, batch):
    _assert_equivalent(CASES[case], batch)


def test_positional_entries_fall_back_but_stay_correct():
    # a reset inside an id-LESS entry is incomposable → single-phase result
    releases = [
        {"ocid": "x", "date": "2020-01-01", "awards": [{"v": 1, "w": {"z": 9}}]},
        {"ocid": "x", "date": "2020-01-02", "awards": [{"v": None}]},
    ]
    _assert_equivalent(releases, batch=1)


# -- property test -----------------------------------------------------------

scalars = st.one_of(st.integers(-5, 5), st.sampled_from(["p", "q", "r"]))
values = st.recursive(
    st.one_of(scalars, st.none()),
    lambda children: st.one_of(
        st.dictionaries(st.sampled_from(["a", "b", "c"]), children, max_size=2),
        st.lists(st.fixed_dictionaries(
            {"id": st.sampled_from(["i1", "i2"])},
            optional={"x": scalars, "y": st.one_of(scalars, st.none())},
        ), max_size=3),
        st.lists(scalars, max_size=2),
    ),
    max_leaves=6,
)
release_st = st.fixed_dictionaries(
    {"ocid": st.just("ocds-p-1"),
     "id": st.sampled_from(["r1", "r2", "r3"]),
     "date": st.sampled_from(["2020-01-0%d" % d for d in range(1, 6)])},
    optional={"tender": values, "awards": values, "planning": values,
              "title": st.one_of(scalars, st.none())},
)


@settings(max_examples=200, deadline=None)
@given(st.lists(release_st, min_size=1, max_size=7), st.integers(1, 4))
def test_property_equivalence(releases, batch):
    _assert_equivalent(releases, batch)


# -- Spark end-to-end --------------------------------------------------------

def test_spark_two_phase_matches_single_phase(spark, tmp_path):
    from pyspark.sql import functions as F

    from kingfisher_process_spark.pipeline import process_collection
    from kingfisher_process_spark.operators.compile_release import compile_collection
    from kingfisher_process_spark.store import Store
    from kingfisher_process_spark.util import canonical_json

    releases = []
    for i in range(40):  # one hot OCID, 40 releases; plus a cold one
        releases.append({
            "ocid": "ocds-hot-1", "id": str(i), "date": f"2020-01-{i % 28 + 1:02d}",
            "tender": {"id": "t", "round": i},
            "awards": [{"id": f"a{i % 3}", "v": i}],
            **({"title": None} if i == 20 else {}),
        })
    releases.append({"ocid": "ocds-cold-1", "id": "c", "date": "2020-02-01",
                     "title": "cold"})
    pkg = {"uri": "http://x", "publisher": {"name": "p"}, "releases": releases}
    path = tmp_path / "pkg.json"
    path.write_text(canonical_json(pkg))

    def run(two_phase):
        store = Store(spark, str(tmp_path / f"store_{two_phase}"))
        r = process_collection(spark, store, "tp", "2020-01-01 00:00:00", [str(path)])
        ids = r["collections"]
        from kingfisher_process_spark.operators import lifecycle
        comp = lifecycle.create_collections(store, "tpc", "2020-01-01 00:00:00")["root"]
        compile_collection(store, ids["root"], comp, two_phase=two_phase, batch=8)
        crs = store.read("compiled_release").where(F.col("collection_id") == comp)
        data = store.read("data").select(F.col("id").alias("data_id"), "data")
        return {r["ocid"]: json.loads(r["data"])
                for r in crs.join(data, "data_id").select("ocid", "data").collect()}

    single = run(False)
    double = run(True)
    auto = run("auto")  # hot-1 (40 releases > batch 8) routes two-phase
    assert set(single) == set(double) == set(auto) == {"ocds-hot-1", "ocds-cold-1"}
    assert single == double == auto
