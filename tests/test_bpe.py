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


# ---- batched training (bpe_train_batched) ----

from kingfisher_process_spark.functions.text import (  # noqa: E402
    _bpe_apply_multi, _select_batch, bpe_train_batched)


def _apply_multi(spark, symbols, pairs):
    df = spark.createDataFrame([(symbols,)], "l array<string>")
    return df.select(
        _bpe_apply_multi(F.col("l"), pairs).alias("r")).first()["r"]


def test_multi_apply_equals_chained_single_applies(spark):
    """One fold pass over a disjoint pair set ≡ sequential per-pair
    folds, including self-overlap runs and adjacent different pairs."""
    cases = [
        (["c", "d", "a", "b"], [("a", "b"), ("c", "d")]),
        (["a", "a", "a", "c", "d"], [("a", "a"), ("c", "d")]),
        (["x", "a", "b", "c", "d", "y"], [("a", "b"), ("c", "d")]),
        (["q"], [("a", "b")]),
    ]
    for symbols, pairs in cases:
        multi = _apply_multi(spark, symbols, pairs)
        seq = symbols
        for a, b in pairs:
            seq = _apply(spark, seq, a, b)
        assert multi == seq, (symbols, pairs, multi, seq)


def test_select_batch_skips_conflicts_keeps_disjoint():
    cands = [("a", "b", 100), ("b", "c", 90), ("d", "e", 80)]
    # (b,c) shares 'b' with accepted (a,b) → skipped; (d,e) disjoint → kept
    assert _select_batch(cands, 10) == [("a", "b", 100), ("d", "e", 80)]
    assert _select_batch([("a", "b", 9), ("c", "d", 8)], 10) == [
        ("a", "b", 9), ("c", "d", 8)]
    assert _select_batch([("a", "a", 9), ("a", "b", 8)], 10) == [("a", "a", 9)]
    # limit caps the batch
    assert _select_batch([("a", "b", 9), ("c", "d", 8)], 1) == [("a", "b", 9)]
    # merged-token cascade guard: keeping both ('ab','c') and ('a','b')
    # would let one fold pass turn a,b,c into abc (sequential never
    # does) — whichever ranks first wins, the collider is skipped
    assert _select_batch([("ab", "c", 9), ("a", "b", 8)], 10) == [
        ("ab", "c", 9)]
    assert _select_batch([("a", "b", 9), ("ab", "c", 8)], 10) == [
        ("a", "b", 9)]
    # accepted set is always pairwise disjoint
    sel = _select_batch(
        [("a", "b", 9), ("b", "c", 8), ("c", "a", 7), ("x", "y", 6)], 10)
    syms = [s for a, b, _ in sel for s in (a, b)]
    assert len(syms) == len(set(syms))


def test_batched_batch1_equals_sequential(spark):
    """batch=1 must replay bpe_train exactly — same picks, same counts,
    one round per merge."""
    docs = spark.createDataFrame(
        [("low low lower",), ("lowest low newest",), ("wide wide new",)],
        "text string")
    seq = bpe_train(docs, rounds=5)
    batched, rounds = bpe_train_batched(docs, n_merges=5, batch=1)
    assert batched == seq
    assert rounds == 5


def test_batched_equals_sequential_on_conflict_free_corpus(spark):
    """A corpus whose top pairs live in disjoint alphabet regions: the
    whole merge schedule is conflict-free, so batched ≡ sequential while
    using ~4x fewer rounds."""
    docs = spark.createDataFrame(
        [("ab cd ef gh " * 3,), ("ab cd ef gh ij",)],
        "text string")
    seq = bpe_train(docs, rounds=4)
    batched, rounds = bpe_train_batched(docs, n_merges=4, batch=4)
    assert batched == seq
    assert rounds == 1


def test_batched_run_at_scale_shape(spark):
    """A 256-merge request on the real documents table. The synthetic
    corpus has only 31 distinct words (≤8 chars, ~108 learnable merges),
    so the trainer must EXHAUST gracefully — and the round count must
    collapse by ~batch size vs one-job-per-merge (the whole point: a
    32k-merge vocabulary at ~1000 rounds, not 32k)."""
    from kingfisher_process_spark.plans.base import load_tables
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE)["documents"]
    merges, rounds = bpe_train_batched(docs, n_merges=256, batch=32)
    assert 64 <= len(merges) <= 256
    # sequential mode would need one round PER merge
    assert rounds * 4 <= len(merges), (rounds, len(merges))
    # every learned merge is a real pair with positive weighted count
    assert all(n > 0 for _, _, n in merges)
    assert len({(a, b) for a, b, _ in merges}) == len(merges)  # no repeats


def test_pandas_fold_matches_jvm(spark):
    """The r12 dict-lookup Arrow fold (_bpe_apply_multi_pandas, the
    batched trainer's fold) must equal the JVM literal-map fold
    (_bpe_apply_multi) step for step — including self-overlap runs,
    adjacent different pairs, empty arrays, and inputs that VIOLATE the
    disjointness precondition (both folds check (last(acc), x) against
    the same merge set at every step, so they must agree even there)."""
    from kingfisher_process_spark.functions.text import (
        _bpe_apply_multi_pandas)

    cases = [
        (["c", "d", "a", "b"], [("a", "b"), ("c", "d")]),
        (["a", "a", "a", "c", "d"], [("a", "a"), ("c", "d")]),
        (["a", "a", "a", "a"], [("a", "a")]),
        (["x", "a", "b", "c", "d", "y"], [("a", "b"), ("c", "d")]),
        (["q"], [("a", "b")]),
        ([], [("a", "b")]),
        # precondition-violating: ('a','b') then 'ab' matches ('ab','c')
        (["a", "b", "c"], [("a", "b"), ("ab", "c")]),
        (["a", "b", "b", "c"], [("a", "b"), ("b", "c")]),
    ]
    for symbols, pairs in cases:
        df = spark.createDataFrame([(symbols, 1)], "l array<string>, freq bigint")
        jvm = df.select(
            _bpe_apply_multi(F.col("l"), pairs).alias("l"), "freq"
        ).first()["l"]
        pd_ = _bpe_apply_multi_pandas(df, pairs).first()["l"]
        assert list(pd_) == list(jvm), (symbols, pairs, pd_, jvm)
