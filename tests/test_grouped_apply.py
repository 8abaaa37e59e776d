"""grouped_apply_sorted must be row-for-row equivalent to
groupBy().applyInPandas() — including groups that span Arrow batch
boundaries and null keys."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kingfisher_process_spark.operators.grouped import grouped_apply_sorted

OUT_SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("n", T.LongType()),
    T.StructField("vals", T.StringType()),
])


def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("v")
    key = pdf["k"].iloc[0]
    return pd.DataFrame([{
        "k": None if pd.isna(key) else key,
        "n": len(pdf),
        "vals": ",".join(str(x) for x in pdf["v"]),
    }])


@pytest.fixture()
def tiny_batches(spark):
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    yield
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def _rows():
    rows = []
    for g in range(40):
        # group sizes 1..13 — several must straddle the 7-row Arrow batches
        for i in range(g % 13 + 1):
            rows.append((f"grp-{g:03d}", g * 100 + i))
    rows.append((None, 9999))
    rows.append((None, 9998))
    return rows


def test_matches_group_apply(spark, tiny_batches):
    df = spark.createDataFrame(_rows(), "k string, v long")
    expected = sorted(
        df.groupBy("k").applyInPandas(summarize, OUT_SCHEMA).collect(),
        key=lambda r: (r["k"] or "",))
    got = sorted(
        grouped_apply_sorted(df, ["k"], summarize, OUT_SCHEMA,
                             extra_sort=["v"]).collect(),
        key=lambda r: (r["k"] or "",))
    assert got == expected
    assert len(got) == 41  # 40 groups + null-key group


def test_explicit_n_parts_single_partition(spark, tiny_batches):
    # every group funneled into one partition: carry chain is exercised
    # maximally (each 7-row batch ends mid-group somewhere)
    df = spark.createDataFrame(_rows(), "k string, v long")
    got = grouped_apply_sorted(df, ["k"], summarize, OUT_SCHEMA,
                               extra_sort=["v"], n_parts=1).collect()
    assert len(got) == 41
    by_k = {r["k"]: r for r in got}
    assert by_k["grp-012"]["n"] == 13
    assert by_k[None]["n"] == 2
    assert by_k["grp-012"]["vals"] == ",".join(str(1200 + i) for i in range(13))


def test_multi_key(spark, tiny_batches):
    rows = [(f"o-{i % 5}", i % 3, i) for i in range(60)]
    df = spark.createDataFrame(rows, "k string, salt int, v long")

    def pair(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([{
            "k": pdf["k"].iloc[0] + "#" + str(pdf["salt"].iloc[0]),
            "n": len(pdf),
            "vals": ",".join(str(x) for x in sorted(pdf["v"])),
        }])

    got = grouped_apply_sorted(df, ["k", "salt"], pair, OUT_SCHEMA,
                               extra_sort=["v"]).collect()
    expected = df.groupBy("k", "salt").applyInPandas(pair, OUT_SCHEMA).collect()
    assert sorted(got) == sorted(expected)
    assert len(got) == 15
