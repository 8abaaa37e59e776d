"""Exact duplicated-span coverage + removal (r9, Lee et al. 2022
word-level form): the audit flags partially-copied documents that
whole-doc dedup misses, and strip_duplicated_spans removes exactly the
covered word positions."""

from __future__ import annotations

from kingfisher_process_spark.functions.dedup import (
    SPAN_N, span_coverage, strip_duplicated_spans)

_SHARED = "w1 w2 w3 w4 w5 w6 w7 w8"  # exactly SPAN_N words → one span


def _docs(spark):
    # doc 1 and 2 share the 8-word paragraph; doc 1 has a unique tail,
    # doc 2 is ONLY the paragraph; doc 3 is entirely unique
    rows = [
        (1, _SHARED + " unique tail for doc one here"),
        (2, _SHARED),
        (3, "nothing here repeats anywhere in this corpus at all"),
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_span_coverage_flags_only_copied_region(spark):
    assert SPAN_N == 8  # the fixture's paragraph length
    cov = {r["doc_id"]: r for r in span_coverage(_docs(spark)).collect()}
    assert set(cov) == {1, 2}  # doc 3 clean
    assert cov[2]["n_dup_positions"] == 8 and cov[2]["dup_frac"] == 1.0
    assert cov[1]["n_words"] == 14
    assert cov[1]["n_dup_positions"] == 8  # the paragraph only
    assert cov[1]["dup_frac"] == 8.0 / 14.0


def test_strip_removes_covered_positions_only(spark):
    out = {r["doc_id"]: r["text"]
           for r in strip_duplicated_spans(_docs(spark)).collect()}
    assert out[1] == "unique tail for doc one here"
    assert out[2] == ""  # fully covered → empty, caller's length filter drops
    assert out[3] == "nothing here repeats anywhere in this corpus at all"


def test_strip_is_idempotent_on_fixture(spark):
    """After removal nothing duplicated remains (no new duplicated span
    is coincidentally created by splicing on this fixture — pinned
    empirically, also observed on the sf0.001 corpus)."""
    clean = strip_duplicated_spans(_docs(spark)).where("text <> ''")
    assert span_coverage(clean).count() == 0


def test_overlapping_spans_union_positions(spark):
    """Two overlapping duplicated spans must cover the UNION of their
    positions, counted once (the distinct on (doc, position))."""
    nine = "a b c d e f g h i"  # 9 words → spans at pos0 0 and 1
    rows = [(1, nine + " xx unique one"), (2, nine + " yy other two")]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    cov = {r["doc_id"]: r for r in span_coverage(docs).collect()}
    # both docs: positions 1..9 covered exactly once each
    assert cov[1]["n_dup_positions"] == 9
    assert cov[2]["n_dup_positions"] == 9
