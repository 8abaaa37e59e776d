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
