"""Property-based tests (hypothesis) for the round-3 additions:
connected-components implementations against a union-find ground truth,
and the cove field-walk as a total function over arbitrary JSON."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

edges_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=40,
)


def union_find_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edges_strategy)
def test_lss_components_match_union_find(spark, edges):
    from pyspark.sql import functions as F

    from kingfisher_process_spark.functions.dedup import connected_components_lss

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long")
    got = {r["doc_id"]: r["component"]
           for r in connected_components_lss(df).collect()}
    assert got == union_find_components(edges)


json_strategy = st.recursive(
    st.one_of(st.none(), st.booleans(), st.integers(-10, 10),
              st.floats(allow_nan=False, allow_infinity=False),
              st.text(max_size=8)),
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=8), children, max_size=4)),
    max_leaves=20,
)


@settings(max_examples=50, deadline=None)
@given(doc=st.dictionaries(st.text(min_size=1, max_size=12), json_strategy,
                           max_size=6))
def test_check_item_total_on_arbitrary_json(doc):
    """check_item must be a TOTAL function over arbitrary release-shaped
    JSON: never crash, always return the full cove key set, and only
    flag additional fields that actually appear in the input."""
    from kingfisher_process_spark.operators.check import check_item

    out = json.loads(check_item(json.dumps(doc), False))
    assert set(out) == {
        "file_type", "version_used", "schema_url", "validation_errors",
        "validation_errors_count", "common_error_types", "extensions",
        "deprecated_fields", "additional_fields", "additional_checks",
    }
    assert out["validation_errors_count"] == len(out["validation_errors"])

    def all_keys(node, acc):
        if isinstance(node, dict):
            for k, v in node.items():
                acc.add(k)
                all_keys(v, acc)
        elif isinstance(node, list):
            for v in node:
                all_keys(v, acc)
        return acc

    keys = all_keys(doc, set())
    for entry in out["additional_fields"]:
        assert entry["field"] in keys


rows_strategy = st.lists(
    st.tuples(st.integers(0, 50),
              st.text(alphabet="ab ", min_size=0, max_size=12)),
    min_size=1, max_size=12, unique_by=lambda r: r[0],
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_strategy, mut_idx=st.integers(0, 1000))
def test_fingerprint_detects_any_single_mutation(spark, rows, mut_idx):
    """XOR-of-row-hashes fingerprint: permutation-invariant, and ANY
    single-row change (content or key) flips it."""
    from pyspark.sql import functions as F

    from kingfisher_process_spark.functions.audit import row_hash

    def fp(rs):
        df = spark.createDataFrame(rs, "doc_id long, text string")
        h = row_hash(F.col("doc_id").cast("string"), F.col("text"))
        return df.select(h.alias("h")).agg(
            F.expr("bit_xor(h)").alias("fp")).collect()[0]["fp"]

    base = fp(rows)
    # permutation invariance
    assert fp(list(reversed(rows))) == base
    # single-row text mutation flips the fingerprint
    i = mut_idx % len(rows)
    mutated = list(rows)
    mutated[i] = (mutated[i][0], mutated[i][1] + "x")
    assert fp(mutated) != base


docs_strategy = st.lists(
    st.tuples(st.integers(0, 40),
              st.text(alphabet="ab ", min_size=1, max_size=120)),
    min_size=1, max_size=8, unique_by=lambda r: r[0],
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=docs_strategy)
def test_chunk_manifest_invariants(spark, docs):
    """Chunk cover invariants vs a Python reference: chunk 0 starts at 0,
    consecutive starts differ by exactly the stride, the last chunk
    reaches the final token, every chunk length is in (0, CHUNK_TOKENS],
    and lengths sum to nt + overlap*(n_chunks-1)."""
    import kingfisher_process_spark.functions.text as tx

    rows = [(i, t) for i, t in docs]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    import unittest.mock as mock
    with mock.patch.object(tx, "load_tables",
                           lambda s, d: {"documents": df}):
        got = tx.t_chunk_documents(spark, "ignored").collect()

    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in rows:
        toks = [t for t in text.split(" ") if t]
        chunks = sorted(by_doc.get(doc_id, []), key=lambda r: r["chunk_idx"])
        if not toks:
            assert not chunks
            continue
        nt = len(toks)
        assert chunks[0]["start_tok"] == 0
        for a, b in zip(chunks, chunks[1:]):
            assert b["start_tok"] - a["start_tok"] == tx.CHUNK_STRIDE
        last = chunks[-1]
        assert last["start_tok"] + last["chunk_len"] == nt
        for c in chunks:
            assert 0 < c["chunk_len"] <= tx.CHUNK_TOKENS
            assert c["first_token"] == toks[c["start_tok"]]
            assert c["last_token"] == toks[c["start_tok"] + c["chunk_len"] - 1]


kv_strategy = st.dictionaries(st.integers(0, 20),
                              st.text(alphabet="xyz", min_size=0, max_size=4),
                              min_size=0, max_size=12)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=kv_strategy, b=kv_strategy)
def test_snapshot_diff_matches_dict_diff(spark, a, b):
    from kingfisher_process_spark.store import snapshot_diff

    schema = "k long, v string"
    da = spark.createDataFrame(list(a.items()) or [], schema)
    db = spark.createDataFrame(list(b.items()) or [], schema)
    got = {r["k"]: r["change_type"]
           for r in snapshot_diff(da, db, ["k"]).collect()}
    want = {}
    for k in set(a) | set(b):
        if k not in b:
            want[k] = "removed"
        elif k not in a:
            want[k] = "added"
        elif a[k] != b[k]:
            want[k] = "changed"
    assert got == want


# ---------------------------------------------------------------------------
# r4: PQ encoding and BPE merge against independent pure-Python references
# ---------------------------------------------------------------------------

@given(st.lists(st.floats(min_value=-0.625, max_value=0.625, width=32),
                min_size=64, max_size=64),
       st.integers(min_value=0, max_value=10**6))
@settings(max_examples=20, deadline=None)
def test_pq_encode_matches_python_reference(vec, vec_id):
    from decimal import Decimal

    from kingfisher_process_spark.functions.similarity import (
        PQ_DSUB, PQ_M, pq_codebook, pq_encode)
    from kingfisher_process_spark.session import get_spark

    spark = get_spark("kps-tests", cpus=8)
    df = spark.createDataFrame([(vec_id, vec)],
                               "vec_id long, embedding array<float>")
    got = pq_encode(df).first()

    cb = pq_codebook()
    import struct as _struct

    def f32(x):  # the stored float32 value, as exact double
        return _struct.unpack("f", _struct.pack("f", x))[0]

    q12 = Decimal(1).scaleb(-12)
    for m in range(PQ_M):
        dists = []
        for c in range(PQ_K := 4):
            s = Decimal(0)
            for j in range(PQ_DSUB):
                d = f32(vec[m * PQ_DSUB + j]) - cb[c][j]
                s += Decimal(d * d).quantize(q12)
            dists.append((s, c))
        want = min(dists)[1]
        assert got[f"code_{m}"] == want, (m, dists, got)


@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=6),
                min_size=1, max_size=12),
       st.integers(min_value=1, max_value=3))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_bpe_train_matches_python_reference(words, rounds):
    from collections import Counter

    from kingfisher_process_spark.functions.text import bpe_train
    from kingfisher_process_spark.session import get_spark

    def ref_bpe(words, rounds):
        freq = Counter(words)
        vocab = {w: list(w) for w in freq}
        merges = []
        for _ in range(rounds):
            pairs = Counter()
            for w, f in freq.items():
                syms = vocab[w]
                for i in range(len(syms) - 1):
                    pairs[(syms[i], syms[i + 1])] += f
            if not pairs:
                break
            # max count, then lexicographically smallest (a, b)
            (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((a, b, n))
            for w in vocab:
                syms, out = vocab[w], []
                for x in syms:
                    if out and out[-1] == a and x == b:
                        out[-1] = a + b
                    else:
                        out.append(x)
                vocab[w] = out
        return merges

    spark = get_spark("kps-tests", cpus=8)
    docs = spark.createDataFrame([(" ".join(words),)], "text string")
    assert bpe_train(docs, rounds=rounds) == ref_bpe(words, rounds)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.text(
        # printable-ish unicode incl. quotes/backslashes/newlines; the
        # parser rejects raw NUL and surrogates, which never reach SQL
        # text from JSON-derived ocids either
        st.characters(min_codepoint=1, max_codepoint=0x2FFF),
        max_size=20),
    min_size=1, max_size=12, unique=True))
def test_resolve_keyset_values_literal_roundtrip(spark, keys):
    """Any JSON-representable key set must survive the VALUES-literal
    encoding byte-for-byte — the escaping is load-bearing for
    correctness (a mis-escaped quote would silently drop or corrupt a
    dirty OCID)."""
    from kingfisher_process_spark.operators.compile_release import (
        _resolve_keyset)

    df = spark.createDataFrame([(k,) for k in keys], "ocid string")
    local, small = _resolve_keyset(df)
    assert small
    got = sorted(r[0] for r in local.collect())
    assert got == sorted(keys)
