"""Data-engineering audit operators: orderless table fingerprints and
table-version reconciliation (diff).

These are the operations a 100 TB pipeline runs constantly around its real
work: "did the copy/migration/backfill produce the same table?" answered
without sorting anything (orderless XOR-of-row-hashes, pure map-side +
one partial-aggregated groupBy), and "what changed between two versions?"
answered with a single hash-partitioned full outer join.

Reference analogue: none — the reference trusts Postgres transactional
writes (`process/util.py:93-110` hashes single messages, never tables).
These extend S8's content hashing to whole-table integrity at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kingfisher_process_spark.functions.dedup import H60_SQL, h60
from kingfisher_process_spark.plans.base import load_tables, probe

# \x1f (ASCII unit separator) cannot appear in the space-separated token
# text, so the concatenation is prefix-collision-free.
_SEP = "\x1f"


def row_hash(*cols) -> "F.Column":
    """60-bit hash of the canonical row string — engine-portable (md5 of
    an explicit concat, not a Spark-private hash like xxhash64)."""
    return h60(F.concat_ws(_SEP, *cols))


# The documents row-canon exists in exactly two generators — one per
# engine — parameterized on the expressions the diff probe substitutes.
# Column additions/renames happen HERE, once, never by string surgery.

def _canon_sql(id_expr: str = "doc_id", text_expr: str = "text") -> str:
    return (f"concat_ws(chr(31), CAST({id_expr} AS VARCHAR), {text_expr}, "
            "lang, source, CAST(n_chars AS VARCHAR))")


def _canon_hash(id_col=None, text_col=None) -> "F.Column":
    id_col = F.col("doc_id") if id_col is None else id_col
    text_col = F.col("text") if text_col is None else text_col
    return row_hash(
        id_col.cast("string"), text_col, F.col("lang"),
        F.col("source"), F.col("n_chars").cast("string"),
    )


@probe(
    "t_table_fingerprint",
    f"""
    SELECT source,
           COUNT(*) AS n_rows,
           bit_xor({H60_SQL.format(x=_canon_sql())}) AS fingerprint,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    survey_ids="audit-ext,A1,A7",
)
def t_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orderless per-partition table fingerprint: XOR of 60-bit row
    hashes, plus row and char counts, grouped by source. Two tables are
    byte-equal per source iff the fingerprints match, REGARDLESS of row
    order — so two engines (or two snapshots) can be compared without a
    global sort.

    Scale shape: the row hash is a map-side expression on the scan; XOR
    and the counts are all algebraic aggregates, so map-side partial
    aggregation reduces each of the 1000 executors' input to
    |sources| rows before the one tiny shuffle. This is the cheapest
    possible whole-table integrity check: one pass, no sort, no
    collect.
    """
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .select("source", "n_chars", _canon_hash().alias("h"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(h)").alias("fingerprint"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("source")
    )


# Deterministic synthetic "version 2" of documents, expressible
# identically in both engines: drop every 97th doc, uppercase every 31st,
# and append a derived batch of brand-new doc_ids.
_V2_FILTER = "doc_id % 97 <> 3"
_V2_TEXT = "CASE WHEN doc_id % 31 = 5 THEN upper(text) ELSE text END"
_V2_ADD_FILTER = "doc_id % 101 = 7"
_V2_ADD_OFFSET = 1_000_000


@probe(
    "t_table_diff",
    f"""
    WITH v1 AS (
      SELECT doc_id, {H60_SQL.format(x=_canon_sql())} AS h FROM documents
    ),
    v2 AS (
      SELECT doc_id,
             {H60_SQL.format(x=_canon_sql(text_expr=_V2_TEXT))} AS h
      FROM documents WHERE {_V2_FILTER}
      UNION ALL
      SELECT doc_id + {_V2_ADD_OFFSET} AS doc_id,
             {H60_SQL.format(x=_canon_sql(id_expr=f"doc_id + {_V2_ADD_OFFSET}"))} AS h
      FROM documents WHERE {_V2_ADD_FILTER}
    )
    SELECT CASE WHEN v1.doc_id IS NULL THEN 'added'
                WHEN v2.doc_id IS NULL THEN 'removed'
                WHEN v1.h <> v2.h THEN 'changed'
                ELSE 'same' END AS change_type,
           COUNT(*) AS n_docs,
           CAST(MIN(COALESCE(v1.doc_id, v2.doc_id)) AS BIGINT) AS min_doc_id,
           CAST(MAX(COALESCE(v1.doc_id, v2.doc_id)) AS BIGINT) AS max_doc_id
    FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    GROUP BY 1 ORDER BY change_type
    """,
    survey_ids="audit-ext,J1,J2,A1",
)
def t_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-version reconciliation: diff two snapshots of `documents`
    on their key and row hash, and report added/removed/changed/same
    counts with a doc_id range per class. V2 is derived in-plan by a
    deterministic mutation (drop doc_id%97==3, uppercase doc_id%31==5,
    append re-keyed copies of doc_id%101==7) so both engines construct
    the identical pair of versions.

    Scale shape: ONE hash-partitioned full outer join on the key — both
    sides shuffle once on doc_id (or co-located for free if the tables
    are bucketed by key, the layout `store.py` writes) — then the
    change classification is a map-side CASE over the two row hashes.
    Compare to a sort-based diff (two global sorts) or a collect-based
    one (driver OOM): this is the join-shaped diff a 100 TB snapshot
    pair needs.
    """
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    v1 = docs.select("doc_id", _canon_hash().alias("h"))
    v2_base = (
        docs.where(F.expr(_V2_FILTER))
        .select("doc_id",
                _canon_hash(text_col=F.expr(_V2_TEXT)).alias("h"))
    )
    new_id = (F.col("doc_id") + F.lit(_V2_ADD_OFFSET)).cast("long")
    v2_added = (
        docs.where(F.expr(_V2_ADD_FILTER))
        .select(new_id.alias("doc_id"),
                _canon_hash(id_col=new_id).alias("h"))
    )
    v2 = v2_base.unionAll(v2_added)
    joined = v1.alias("v1").join(
        v2.alias("v2"), F.col("v1.doc_id") == F.col("v2.doc_id"), "full_outer"
    )
    change = (
        F.when(F.col("v1.doc_id").isNull(), F.lit("added"))
        .when(F.col("v2.doc_id").isNull(), F.lit("removed"))
        .when(F.col("v1.h") != F.col("v2.h"), F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    key = F.coalesce(F.col("v1.doc_id"), F.col("v2.doc_id"))
    return (
        joined.select(change.alias("change_type"), key.alias("doc_id"))
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
            F.max("doc_id").cast("bigint").alias("max_doc_id"),
        )
        .orderBy("change_type")
    )


# ---------------------------------------------------------------------------
# Table profiling — the per-column data-quality summary (null counts,
# cardinalities, ranges) a pipeline runs before trusting a new drop of
# data. ONE aggregation pass: every statistic partial-aggregates
# map-side; only the distinct counts add exchanges (Spark's multi-distinct
# expand). At 100 TB swap COUNT(DISTINCT) for approx_count_distinct and
# the pass is fully map-side-combining.
# Reference analogue: none (audit extension family).
# ---------------------------------------------------------------------------

def profile_table(df: DataFrame, columns: list[tuple[str, str]],
                  exact: bool = True) -> DataFrame:
    """Per-column profile rows for ``columns`` = [(name, kind)] with kind
    in {"num", "str", "ts"}: (col_name, n_rows, n_nulls, n_distinct,
    min_num, max_num, min_str, max_str). Ranges land in the type-true
    slot (numeric → DOUBLE, string → lexicographic, timestamp → UTC
    'yyyy-MM-dd HH:mm:ss' strings) so no cross-engine casts of floats to
    text are ever compared.

    ``exact=False`` swaps COUNT(DISTINCT) for approx_count_distinct
    (HLL++), which removes the multi-distinct Expand/extra exchange and
    makes the whole profile ONE fully map-side-combining aggregation
    pass — the 100 TB setting (plan asserted in
    tests/test_physical_plans.py). The oracle-checked probe keeps
    exact=True; n_distinct is then an estimate, everything else is
    identical."""
    distinct = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, kind in columns:
        c = F.col(name)
        aggs += [
            F.sum(c.isNull().cast("long")).alias(f"__nulls_{name}"),
            distinct(c).alias(f"__nd_{name}"),
        ]
        if kind == "num":
            aggs += [F.min(c).cast("double").alias(f"__min_{name}"),
                     F.max(c).cast("double").alias(f"__max_{name}")]
        elif kind == "ts":
            fmt = "yyyy-MM-dd HH:mm:ss"
            aggs += [F.date_format(F.min(c), fmt).alias(f"__smin_{name}"),
                     F.date_format(F.max(c), fmt).alias(f"__smax_{name}")]
        else:
            aggs += [F.min(c).alias(f"__smin_{name}"),
                     F.max(c).alias(f"__smax_{name}")]
    one = df.agg(*aggs)
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    rows = F.array(*[
        F.struct(
            F.lit(name).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{name}").alias("n_nulls"),
            F.col(f"__nd_{name}").alias("n_distinct"),
            (F.col(f"__min_{name}") if kind == "num" else null_d).alias("min_num"),
            (F.col(f"__max_{name}") if kind == "num" else null_d).alias("max_num"),
            (F.col(f"__smin_{name}") if kind != "num" else null_s).alias("min_str"),
            (F.col(f"__smax_{name}") if kind != "num" else null_s).alias("max_str"),
        )
        for name, kind in columns
    ])
    return (one.select(F.explode(rows).alias("p")).select("p.*")
            .orderBy("col_name"))


ORDERS_PROFILE_COLS = [
    ("o_orderkey", "num"), ("o_custkey", "num"), ("o_orderstatus", "str"),
    ("o_totalprice", "num"), ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _profile_col_sql(name: str, kind: str) -> str:
    if kind == "num":
        mins = f"CAST(MIN({name}) AS DOUBLE)", f"CAST(MAX({name}) AS DOUBLE)"
        strs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
    elif kind == "ts":
        mins = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
        strs = (f"strftime(MIN({name}), '%Y-%m-%d %H:%M:%S')",
                f"strftime(MAX({name}), '%Y-%m-%d %H:%M:%S')")
    else:
        mins = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
        strs = f"MIN({name})", f"MAX({name})"
    return f"""
      SELECT '{name}' AS col_name, COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
             CAST(COUNT(DISTINCT {name}) AS BIGINT) AS n_distinct,
             {mins[0]} AS min_num, {mins[1]} AS max_num,
             {strs[0]} AS min_str, {strs[1]} AS max_str
      FROM orders"""


@probe(
    "e_profile_orders",
    " UNION ALL ".join(_profile_col_sql(n, k) for n, k in ORDERS_PROFILE_COLS)
    + " ORDER BY col_name",
    survey_ids="audit-ext,A1,A3,A4",
)
def e_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return profile_table(t["orders"], ORDERS_PROFILE_COLS)


@probe(
    "e_referential_audit",
    """
    SELECT 'customer.c_nationkey->nation' AS fk, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphans
    FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders', COUNT(*),
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
    UNION ALL
    SELECT 'orders.o_custkey->customer', COUNT(*),
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM orders ord LEFT JOIN customer c ON c.c_custkey = ord.o_custkey
    ORDER BY fk
    """,
    survey_ids="audit-ext,J2,A1",
)
def e_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — orphan counts per foreign key, the
    check a pipeline runs before joining a new drop of data. Each FK is
    one aggregated existence join over the parent's DISTINCT key set:
    genuinely-small parents (nation) take a FORCED broadcast (map-side
    probe, child never shuffles); row-scale parents (orders, customer)
    must NOT be force-broadcast — at sf100+ their key sets blow the
    broadcast limit — so they take a plain left join and the planner
    picks broadcast vs shuffled existence join by size (a Bloom
    pre-probe, sk_bloom_prejoin_audit, is the cheap first pass when even
    the shuffle is too much).
    Reference analogue: the deleteorphan maintenance command
    (process/management/commands/deleteorphan.py) reports/wipes orphans
    after manual deletes; this generalizes it to any FK as a query."""
    t = load_tables(spark, sf_dir)

    def fk(name: str, child: DataFrame, ckey: str, parent: DataFrame,
           pkey: str, small_parent: bool = False) -> DataFrame:
        probe_side = parent.select(F.col(pkey).alias("__pk")).distinct()
        if small_parent:
            probe_side = F.broadcast(probe_side)
        return (
            child.join(probe_side, F.col(ckey) == F.col("__pk"), "left")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.col("__pk").isNull().cast("long")).alias("n_orphans"))
            .select(F.lit(name).alias("fk"), "n_rows", "n_orphans")
        )

    return (
        fk("customer.c_nationkey->nation", t["customer"], "c_nationkey",
           t["nation"], "n_nationkey", small_parent=True)
        .unionAll(fk("lineitem.l_orderkey->orders", t["lineitem"],
                     "l_orderkey", t["orders"], "o_orderkey"))
        .unionAll(fk("orders.o_custkey->customer", t["orders"], "o_custkey",
                     t["customer"], "c_custkey"))
        .orderBy("fk")
    )
