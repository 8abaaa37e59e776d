"""Testdata contract: assert the arrow schema of each driver table matches
what the engine expects, so a silent testdata regeneration fails in ONE
obvious test instead of 86 opaque probe errors (round-1 post-mortem:
events.ts flipped TIMESTAMP(NANOS) -> timestamp[us] and poisoned every
probe through the eager loader).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

# column -> set of acceptable arrow types (testdata generations have
# legitimately flipped between these; the engine normalizes them)
EXPECTED: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": {"int64", "int32"}, "r_name": {"string", "large_string"}},
    "nation": {"n_nationkey": {"int64", "int32"}, "n_regionkey": {"int64", "int32"},
               "n_name": {"string", "large_string"}},
    "customer": {"c_custkey": {"int64", "int32"}, "c_nationkey": {"int64", "int32"},
                 "c_acctbal": {"double", "float"}, "c_mktsegment": {"string", "large_string"}},
    "supplier": {"s_suppkey": {"int64", "int32"}, "s_nationkey": {"int64", "int32"}},
    "part": {"p_partkey": {"int64", "int32"}, "p_retailprice": {"double", "float"}},
    "orders": {"o_orderkey": {"int64", "int32"}, "o_custkey": {"int64", "int32"},
               "o_totalprice": {"double", "float"},
               "o_orderdate": {"date32[day]", "timestamp[us]", "timestamp[ns]", "string", "large_string"}},
    "lineitem": {"l_orderkey": {"int64", "int32"}, "l_partkey": {"int64", "int32"},
                 "l_suppkey": {"int64", "int32"}, "l_quantity": {"double", "float", "int64"},
                 "l_extendedprice": {"double", "float"}, "l_discount": {"double", "float"},
                 "l_tax": {"double", "float"},
                 "l_returnflag": {"string", "large_string"},
                 "l_linestatus": {"string", "large_string"},
                 "l_shipdate": {"date32[day]", "timestamp[us]", "timestamp[ns]", "string", "large_string"}},
    "events": {"event_id": {"int64", "int32"},
               # the two generations the engine knows how to normalize
               "ts": {"timestamp[us]", "timestamp[ns]", "int64"},
               "user_id": {"int64", "int32"}, "event_type": {"string", "large_string"},
               "value": {"double", "float"}, "props": {"string", "large_string"}},
    "documents": {"doc_id": {"int64", "int32"}, "text": {"string", "large_string"},
                  "lang": {"string", "large_string"}, "source": {"string", "large_string"}},
    "embeddings": {"vec_id": {"int64", "int32"}, "label": {"int32", "int64"},
                   "embedding": {"list<item: float>", "list<element: float>",
                                 "list<item: double>", "list<element: double>"}},
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_table_schema_contract(table: str):
    path = f"{SF_DIR}/{table}.parquet"
    assert os.path.exists(path), f"missing testdata table {path}"
    schema: pa.Schema = pq.ParquetFile(path).schema_arrow
    names = set(schema.names)
    for col, accepted in EXPECTED[table].items():
        assert col in names, f"{table}.{col} missing (have {sorted(names)})"
        actual = str(schema.field(col).type)
        base = actual.split("[")[0].split("<")[0]
        accepted_bases = {a.split("[")[0].split("<")[0] for a in accepted}
        assert actual in accepted or base in accepted_bases, (
            f"{table}.{col} is {actual}, engine expects one of {sorted(accepted)} "
            f"— update plans/base.normalize_events_ts / this contract together")


def test_events_ts_normalizes_to_timestamp():
    """Whatever the physical type, the engine must hand probes a TIMESTAMP."""
    from kingfisher_process_spark.plans.base import load_tables
    from kingfisher_process_spark.session import get_spark

    spark = get_spark()
    df = load_tables(spark, SF_DIR)["events"]
    assert dict(df.dtypes)["ts"] == "timestamp", df.dtypes


def test_broken_table_does_not_poison_other_probes(tmp_path):
    """Lazy loading isolation: a corrupted events.parquet must fail only
    events-reading probes (VERDICT r1 item 3)."""
    import shutil

    from kingfisher_process_spark.plans.base import load_tables
    from kingfisher_process_spark.session import get_spark

    spark = get_spark()
    for t in EXPECTED:
        shutil.copy(f"{SF_DIR}/{t}.parquet", tmp_path / f"{t}.parquet")
    (tmp_path / "events.parquet").write_bytes(b"not a parquet file")

    t = load_tables(spark, str(tmp_path))
    # non-events table loads fine
    assert t["lineitem"].count() > 0
    # events raises, but only when actually touched
    with pytest.raises(Exception):
        t["events"].count()


def test_simhash_band_candidates_recall():
    """Pigeonhole guarantee: every pair with hamming < n_bands appears in
    the banded candidate set (checked against the exact all-pairs form)."""
    from kingfisher_process_spark.functions.dedup import (
        d_simhash_signatures, simhash_band_candidates)
    from kingfisher_process_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark()
    sigs = d_simhash_signatures(spark, SF_DIR).cache()
    n_bands = 8
    cand = {(r["doc_a"], r["doc_b"])
            for r in simhash_band_candidates(sigs, n_bands).collect()}
    a, b = sigs.alias("a"), sigs.alias("b")
    exact = (a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
                     .alias("h"))
             .where(F.col("h") < n_bands).collect())
    missing = [(r["doc_a"], r["doc_b"]) for r in exact
               if (r["doc_a"], r["doc_b"]) not in cand]
    assert not missing, missing[:5]
    assert len(exact) > 0  # the guarantee actually got exercised


def test_jaccard_verify_matches_exact_pairs():
    """The LSH->verify composition produces the same jaccard values the
    exact all-pairs probe computes for the candidate pairs it covers."""
    from kingfisher_process_spark.functions.dedup import (
        d_minhash_lsh_pairs, jaccard_verify, ngram_jaccard_pairs)
    from kingfisher_process_spark.plans.base import load_tables
    from kingfisher_process_spark.session import get_spark

    spark = get_spark()
    docs = load_tables(spark, SF_DIR)["documents"]
    cands = (d_minhash_lsh_pairs(spark, SF_DIR)
             .select("doc_a", "doc_b"))
    verified = {(r["doc_a"], r["doc_b"]): r["jaccard"]
                for r in jaccard_verify(docs, cands).collect()}
    assert verified, "no candidates at this SF"
    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs).collect()}
    overlap = set(verified) & set(exact)
    assert overlap, "exact top-50 and LSH candidates should intersect"
    for pair in overlap:
        assert abs(verified[pair] - exact[pair]) < 1e-12, (pair, verified[pair], exact[pair])


def test_cms_estimate_upper_bounds_true_counts():
    """CMS property: every point estimate >= the true count; with 5 keys
    in a 4x64 sketch, collisions are absent and estimates are exact."""
    from kingfisher_process_spark.functions.sketch import cms_build, cms_estimate
    from kingfisher_process_spark.plans.base import load_tables
    from kingfisher_process_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark()
    ev = load_tables(spark, SF_DIR)["events"]
    sketch = cms_build(ev, F.col("event_type")).cache()
    est = {r["key"]: r["est"] for r in
           cms_estimate(sketch, ev.select("event_type"), "event_type").collect()}
    true = {r["event_type"]: r["n"] for r in
            ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(est) == set(true)
    for k in true:
        assert est[k] >= true[k]
        assert est[k] == true[k]  # no collisions at this key cardinality
