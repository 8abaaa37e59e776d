"""BPE training unit semantics (the oracle-parity suite covers the full
corpus probe; these pin the greedy-merge fold edge cases directly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kingfisher_process_spark.functions.text import _bpe_apply, bpe_train


def _apply(spark, symbols, a, b):
    df = spark.createDataFrame([(symbols,)], "l array<string>")
    return df.select(_bpe_apply(F.col("l"), a, b).alias("r")).first()["r"]


def test_greedy_merge_left_to_right(spark):
    assert _apply(spark, ["h", "e", "l", "l", "o"], "l", "l") == ["h", "e", "ll", "o"]
    # self-overlapping run: sequential BPE merges positions 0-1 then 2-3
    assert _apply(spark, ["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _apply(spark, ["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    # non-adjacent repeats all merge in one pass
    assert _apply(spark, ["a", "b", "x", "a", "b"], "a", "b") == ["ab", "x", "ab"]
    # no match → unchanged; single symbol survives
    assert _apply(spark, ["q"], "a", "b") == ["q"]


def test_bpe_train_on_tiny_corpus(spark):
    docs = spark.createDataFrame(
        [("low low lower",), ("lowest low",)], "text string")
    merges = bpe_train(docs, rounds=2)
    # 'l o' and 'o w' both occur 4 weighted times ('low'·3? no: vocab is
    # (low,2? ...) — weights are WORD frequencies: low=3, lower=1,
    # lowest=1 → pair (l,o) n=5, (o,w) n=5; tiebreak (a,b) picks (l,o);
    # round 2: ('lo','w') n=5
    assert merges[0] == ("l", "o", 5)
    assert merges[1] == ("lo", "w", 5)
