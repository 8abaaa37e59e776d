"""Similarity search over the ``embeddings`` table (``array<float>``) —
brute-force cosine top-k (the exactness baseline), LSH-bucketed and
label-blocked variants (the scale paths), embedding near-duplicate pairs.

Exactness engineering: per-element products are computed in DOUBLE
(float32 → double is exact) and summed as DECIMAL(38,12) — decimal
addition is exact and associative, so aggregation order cannot perturb the
result and DuckDB reproduces every cosine bit-for-bit. The final cosine is
one IEEE double division.

Scale posture (100 TB / billions of vectors):

- brute-force top-k joins the (tiny, broadcast) query set against the
  corpus — linear scan, no all-pairs; the per-index equijoin keeps the
  work row-shaped for codegen instead of a Python UDF.
- the near-duplicate pair search blocks on a partition key (``label``
  here; an IVF/k-means cell id or LSH hyperplane bucket in production) so
  the quadratic term is bounded per block — the same banding idea as
  MinHash-LSH.
- random-hyperplane LSH (``s_lsh_buckets``) maps each vector to a sign
  bucket; bucketing is one deterministic projection pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kingfisher_process_spark.plans.base import load_tables, oracle_of, probe

DEC12 = "decimal(38,12)"
N_QUERIES = 5
TOP_K = 10


def _exploded(emb: DataFrame, id_alias: str, val_alias: str) -> DataFrame:
    return emb.select(
        F.col("vec_id").alias(id_alias),
        F.posexplode("embedding").alias("i", val_alias),
    ).withColumn(val_alias, F.col(val_alias).cast("double"))


def _norms(emb: DataFrame, id_alias: str, norm_alias: str) -> DataFrame:
    e = _exploded(emb, id_alias, "x")
    return e.groupBy(id_alias).agg(
        F.sqrt(F.sum((F.col("x") * F.col("x")).cast(DEC12)).cast("double")).alias(norm_alias)
    )


def dot_col(a, b) -> F.Column:
    """Array-native exact dot product: per-element double products summed
    as decimals via a sequential fold — same values as the oracle's
    SUM(CAST(.. AS DECIMAL(38,12))) (decimal addition is exact and
    associative), but the rows never explode 64× and the whole expression
    stays inside codegen.

    Type sizing makes the fold EXACT: products go to DECIMAL(14,12)
    (|element| < 10 ⇒ |product| < 100) and the accumulator is
    DECIMAL(19,12), so each addition resolves to (20,12) — within
    precision 38, no scale loss — and the cast back to (19,12) is
    lossless for |sum| < 1e7. A (38,12) accumulator would force every
    partial sum through (38,11), silently rounding the 12th digit."""
    return F.aggregate(
        F.zip_with(a, b,
                   lambda x, y: (x.cast("double") * y.cast("double"))
                   .cast("decimal(14,12)")),
        F.lit(0).cast("decimal(19,12)"),
        lambda acc, x: (acc + x).cast("decimal(19,12)"),
    ).cast("double")


def norm_col(a) -> F.Column:
    return F.sqrt(dot_col(a, a))


NORMS_SQL = """
  SELECT vec_id, sqrt(CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
  FROM (SELECT vec_id, CAST(embedding[i + 1] AS DOUBLE) AS x
        FROM embeddings, range(64) r(i))
  GROUP BY vec_id
"""


@probe(
    "ann_brute_force_topk",
    f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(SUM(CAST(CAST(q.embedding[i + 1] AS DOUBLE)
                           * CAST(c.embedding[i + 1] AS DOUBLE)
                           AS DECIMAL(38,12))) AS DOUBLE) AS dot
      FROM q, embeddings c, range(64) r(i)
      WHERE q.vec_id <> c.vec_id
      GROUP BY q.vec_id, c.vec_id
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             dot / (nq.nrm * nc.nrm) AS cosine
      FROM pairs
      JOIN ({NORMS_SQL}) nq ON nq.vec_id = query_id
      JOIN ({NORMS_SQL}) nc ON nc.vec_id = neighbor_id
    )
    SELECT query_id, neighbor_id, cosine,
           rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored) x
    WHERE rnk <= {TOP_K}
    ORDER BY query_id, rnk
    """,
    survey_ids="similarity-ext,J1,O5",
)
def ann_brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Linear scan: (tiny) query set broadcast against the fanned-out
    # corpus; dot product and norms are array-native folds, so rows stay
    # 1-per-(query, candidate) — no 64x positional explosion, no norm
    # joins, one window for the per-query top-k.
    from kingfisher_process_spark.functions.dedup import fanout

    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    qv = (emb.where(F.col("vec_id") < N_QUERIES)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("qe"),
                  norm_col(F.col("embedding")).alias("nq")))
    cv = (fanout(emb)
          .select(F.col("vec_id").alias("neighbor_id"),
                  F.col("embedding").alias("ce"),
                  norm_col(F.col("embedding")).alias("nc")))
    scored = (
        cv.crossJoin(F.broadcast(qv))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                (dot_col(F.col("qe"), F.col("ce"))
                 / (F.col("nq") * F.col("nc"))).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rnk")
        .orderBy("query_id", "rnk")
    )


@probe(
    "s_embedding_near_dups",
    f"""
    WITH pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
             CAST(SUM(CAST(CAST(a.embedding[i + 1] AS DOUBLE)
                           * CAST(b.embedding[i + 1] AS DOUBLE)
                           AS DECIMAL(38,12))) AS DOUBLE) AS dot
      FROM embeddings a
      JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id,
           range(64) r(i)
      GROUP BY a.vec_id, b.vec_id, a.label
    )
    SELECT vec_a, vec_b, label,
           dot / (na.nrm * nb.nrm) AS cosine
    FROM pairs
    JOIN ({NORMS_SQL}) na ON na.vec_id = vec_a
    JOIN ({NORMS_SQL}) nb ON nb.vec_id = vec_b
    WHERE dot / (na.nrm * nb.nrm) > 0.5
    ORDER BY cosine DESC, vec_a, vec_b
    LIMIT 100
    """,
    survey_ids="similarity-ext,dedup-ext,J1",
)
def s_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # label-blocked near-duplicate pairs: the quadratic term is bounded per
    # block (an IVF cell / LSH bucket in production)
    from kingfisher_process_spark.functions.dedup import fanout

    t = load_tables(spark, sf_dir)
    emb = fanout(t["embeddings"])
    a = emb.select(F.col("vec_id").alias("vec_a"), "label",
                   F.col("embedding").alias("ea"),
                   norm_col(F.col("embedding")).alias("na"))
    b = emb.select(F.col("vec_id").alias("vec_b"),
                   F.col("label").alias("label_b"),
                   F.col("embedding").alias("eb"),
                   norm_col(F.col("embedding")).alias("nb"))
    pairs = a.join(b, (F.col("label") == F.col("label_b"))
                   & (F.col("vec_a") < F.col("vec_b"))).drop("label_b")
    return (
        pairs.select(
            "vec_a", "vec_b", "label",
            (dot_col(F.col("ea"), F.col("eb"))
             / (F.col("na") * F.col("nb"))).alias("cosine"))
        .where(F.col("cosine") > 0.5)
        .orderBy(F.desc("cosine"), "vec_a", "vec_b")
        .limit(100)
    )


BUCKETS_SQL = """
    WITH planes AS (
      SELECT p, i,
             CAST(CAST(('0x' || substr(md5('plane-' || p || '-' || i), 1, 15))
                       AS UBIGINT) AS BIGINT) % 2001 - 1000 AS w
      FROM range(8) pp(p), range(64) r(i)
    ),
    proj AS (
      SELECT e.vec_id, pl.p,
             SUM(CAST(CAST(e.embedding[pl.i + 1] AS DOUBLE) * pl.w AS DECIMAL(38,6))) AS s
      FROM embeddings e JOIN planes pl ON TRUE
      GROUP BY e.vec_id, pl.p
    )
    SELECT vec_id,
           SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS bucket
    FROM proj GROUP BY vec_id
"""


@probe(
    "ann_lsh_topk",
    f"""
    WITH buckets AS ({BUCKETS_SQL}),
    q AS (SELECT vec_id AS query_id, bucket FROM buckets WHERE vec_id < {N_QUERIES}),
    cand AS (
      SELECT q.query_id, b.vec_id AS neighbor_id
      FROM q JOIN buckets b ON b.bucket = q.bucket AND b.vec_id <> q.query_id
    ),
    pairs AS (
      SELECT c.query_id, c.neighbor_id,
             CAST(SUM(CAST(CAST(a.embedding[i + 1] AS DOUBLE)
                           * CAST(b.embedding[i + 1] AS DOUBLE)
                           AS DECIMAL(38,12))) AS DOUBLE) AS dot
      FROM cand c
      JOIN embeddings a ON a.vec_id = c.query_id
      JOIN embeddings b ON b.vec_id = c.neighbor_id,
           range(64) r(i)
      GROUP BY c.query_id, c.neighbor_id
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             dot / (nq.nrm * nc.nrm) AS cosine
      FROM pairs
      JOIN ({NORMS_SQL}) nq ON nq.vec_id = query_id
      JOIN ({NORMS_SQL}) nc ON nc.vec_id = neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored) x
    WHERE rnk <= {TOP_K}
    ORDER BY query_id, rnk
    """,
    survey_ids="similarity-ext,J1,O5",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN scale path: LSH sign-buckets prune the corpus to same-bucket
    candidates (expected corpus/2^planes per bucket), then exact cosine
    ranks only those. At 100 TB the candidate join shuffles on the bucket
    key instead of cross-joining the corpus; recall is tuned by plane
    count / multi-probe, exactly like an IVF cell probe."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    # buckets feed both the query side and the candidate join; norms feed
    # both cosine factors — cache each once (production materializes them
    # as columns of the corpus table)
    buckets = _sign_buckets(spark, emb).cache()
    q = buckets.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "bucket")
    cand = (
        F.broadcast(q).join(buckets, "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    ea = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("eb"))
    prod = (
        cand.join(F.broadcast(ea), "query_id").join(eb, "neighbor_id")
        .select(
            "query_id", "neighbor_id",
            F.posexplode(F.zip_with(
                "ea", "eb",
                lambda x, y: (x.cast("double") * y.cast("double")).cast(DEC12),
            )).alias("i", "p"),
        )
    )
    dots = prod.groupBy("query_id", "neighbor_id").agg(
        F.sum("p").cast("double").alias("dot"))
    norms = _norms(emb, "vec_id", "nrm").cache()
    nq = norms.select(F.col("vec_id").alias("query_id"), F.col("nrm").alias("nq"))
    nc = norms.select(F.col("vec_id").alias("neighbor_id"), F.col("nrm").alias("nc"))
    scored = (
        dots.join(F.broadcast(nq), "query_id").join(F.broadcast(nc), "neighbor_id")
        .select("query_id", "neighbor_id",
                (F.col("dot") / (F.col("nq") * F.col("nc"))).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rnk")
        .orderBy("query_id", "rnk")
    )


def _sign_buckets(spark: SparkSession, emb: DataFrame) -> DataFrame:
    """(vec_id, bucket): 8-plane sign bucket per vector (shared by
    s_lsh_buckets and ann_lsh_topk)."""
    e = _exploded(emb, "vec_id", "x")
    planes = (
        spark.range(8).select(F.col("id").cast("int").alias("p"))
        .crossJoin(spark.range(64).select(F.col("id").cast("int").alias("i")))
        .select("p", "i",
                (F.conv(F.substring(F.md5(F.concat_ws("-", F.lit("plane"), "p", "i")), 1, 15),
                        16, 10).cast("bigint") % 2001 - 1000).alias("w"))
    )
    proj = (
        e.join(F.broadcast(planes), "i")
        .groupBy("vec_id", "p")
        .agg(F.sum((F.col("x") * F.col("w")).cast("decimal(38,6)")).alias("s"))
    )
    bucket_term = F.when(
        F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), p)")
    ).otherwise(F.lit(0).cast("bigint"))
    return proj.groupBy("vec_id").agg(F.sum(bucket_term).alias("bucket"))


@probe(
    "s_lsh_buckets",
    f"""
    WITH planes AS (
      SELECT p, i,
             CAST(CAST(('0x' || substr(md5('plane-' || p || '-' || i), 1, 15))
                       AS UBIGINT) AS BIGINT) % 2001 - 1000 AS w
      FROM range(8) pp(p), range(64) r(i)
    ),
    proj AS (
      SELECT e.vec_id, pl.p,
             SUM(CAST(CAST(e.embedding[pl.i + 1] AS DOUBLE) * pl.w AS DECIMAL(38,6))) AS s
      FROM embeddings e JOIN planes pl ON TRUE
      GROUP BY e.vec_id, pl.p
    )
    SELECT vec_id,
           CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END)
             AS BIGINT) AS bucket
    FROM proj GROUP BY vec_id
    ORDER BY vec_id
    """,
    survey_ids="similarity-ext",
)
def s_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: 8 md5-seeded integer hyperplanes → a sign
    bucket per vector. Bucket-equality pre-filters candidate pairs at
    scale; deterministic, so DuckDB reproduces every bucket."""
    t = load_tables(spark, sf_dir)
    return _sign_buckets(spark, t["embeddings"]).orderBy("vec_id")


K_CELLS = 16
N_PROBE = 4


@probe(
    "ann_ivf_topk",
    f"""
    WITH norms AS ({NORMS_SQL}),
    cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
             WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + K_CELLS}),
    vc0 AS (
      SELECT v.vec_id, c.cid,
             CAST(SUM(CAST(CAST(v.embedding[i + 1] AS DOUBLE)
                           * CAST(c.ce[i + 1] AS DOUBLE)
                           AS DECIMAL(38,12))) AS DOUBLE) AS dot
      FROM embeddings v, cent c, range(64) r(i)
      GROUP BY v.vec_id, c.cid),
    vc AS (
      SELECT vc0.vec_id, vc0.cid, vc0.dot / (nv.nrm * nc.nrm) AS cos
      FROM vc0 JOIN norms nv ON nv.vec_id = vc0.vec_id
               JOIN norms nc ON nc.vec_id = vc0.cid),
    asg AS (SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM vc) x WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM vc WHERE vec_id < {N_QUERIES}) x WHERE rn <= {N_PROBE}),
    cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
             FROM probes p JOIN asg a ON a.cid = p.cid
             WHERE a.vec_id <> p.query_id),
    pairs AS (
      SELECT cand.query_id, cand.neighbor_id,
             CAST(SUM(CAST(CAST(q.embedding[i + 1] AS DOUBLE)
                           * CAST(n.embedding[i + 1] AS DOUBLE)
                           AS DECIMAL(38,12))) AS DOUBLE) AS dot
      FROM cand
      JOIN embeddings q ON q.vec_id = cand.query_id
      JOIN embeddings n ON n.vec_id = cand.neighbor_id, range(64) r(i)
      GROUP BY cand.query_id, cand.neighbor_id),
    scored AS (SELECT query_id, neighbor_id, dot / (nq.nrm * nn.nrm) AS cosine
               FROM pairs JOIN norms nq ON nq.vec_id = query_id
                          JOIN norms nn ON nn.vec_id = neighbor_id)
    SELECT query_id, neighbor_id, cosine, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored) x WHERE rnk <= {TOP_K}
    ORDER BY query_id, rnk
    """,
    survey_ids="similarity-ext,J1,O5",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF shape (the billions-of-vectors scale path): K broadcast
    # centroids partition the corpus into cells via a MAP-SIDE argmax
    # (groupBy with partial aggregation — no window shuffle over the
    # corpus), queries probe their N_PROBE nearest cells, and the exact
    # re-rank touches only candidate cells instead of the full corpus.
    # Centroids here are a deterministic training sample (vec_id slice) —
    # a k-means quantizer drops in without changing the plan shape.
    from kingfisher_process_spark.functions.dedup import fanout

    t = load_tables(spark, sf_dir)
    emb = fanout(t["embeddings"]).select(
        "vec_id", "embedding", norm_col(F.col("embedding")).alias("nv"))
    cent = t["embeddings"].where(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + K_CELLS)
    ).select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"),
             norm_col(F.col("embedding")).alias("nc"))

    vc = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "embedding", "nv", "cid",
        (dot_col(F.col("embedding"), F.col("ce")) / (F.col("nv") * F.col("nc")))
        .alias("cos"))

    # cell assignment: max(struct(cos, -cid)) == argmax cos with
    # smallest-cid tiebreak; partial aggregation combines map-side, so
    # the shuffle carries one row per vector, not one per (vector, cell)
    asg = (
        vc.groupBy("vec_id")
        .agg(F.max(F.struct(F.col("cos"), (-F.col("cid")).alias("neg"))).alias("m"),
             F.first("embedding").alias("ne"), F.first("nv").alias("nn"))
        .select(F.col("vec_id").alias("neighbor_id"), "ne", "nn",
                (-F.col("m.neg")).alias("cid"))
    )

    wq = Window.partitionBy("vec_id").orderBy(F.desc("cos"), "cid")
    probes_df = (
        vc.where(F.col("vec_id") < N_QUERIES)
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= N_PROBE)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qe"), F.col("nv").alias("nq"), "cid")
    )

    scored = (
        asg.join(F.broadcast(probes_df), "cid")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                (dot_col(F.col("qe"), F.col("ne")) / (F.col("nq") * F.col("nn")))
                .alias("cosine"))
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(wk))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rnk")
        .orderBy("query_id", "rnk")
    )


def train_ivf_centroids(emb: DataFrame, k: int = K_CELLS, iters: int = 5,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> list[list[float]]:
    """Distributed Lloyd's k-means for the IVF coarse quantizer — the
    trained drop-in for ann_ivf_topk's deterministic-sample centroids
    (its plan shape is unchanged: the centroid set stays a broadcast
    literal either way).

    Scale shape, per iteration:

    - ASSIGNMENT is a pure map-side projection — the k centroids are
      embedded as an array-of-structs literal and argmax'd with
      ``F.aggregate`` over that array; no crossJoin row blow-up, no
      shuffle, stays inside codegen.
    - UPDATE is one narrow shuffle: ``groupBy(cell)`` with one AVG per
      dimension, partial-aggregated map-side, so the exchange carries
      k × dims partials per map task — independent of corpus size.
    - The k × dims centroid matrix collected per iteration is
      driver-sized by construction (k ≤ thousands), the same pattern as
      broadcasting any dimension table.

    Deterministic: init = the k smallest ``id_col`` vectors, ties cannot
    occur; Lloyd's from a fixed init is deterministic up to FP summation
    order, which AVG's partial aggregation makes stable enough for
    centroid training (cell assignment differences only arise on exact
    distance ties between centroids — resolved by smallest cell index).
    """
    first = emb.select(F.size(vec_col).alias("d")).first()
    if first is None:
        return []
    dim = first["d"]
    cents = [list(map(float, r["v"])) for r in
             emb.orderBy(id_col).limit(k)
             .select(F.col(vec_col).cast("array<double>").alias("v")).collect()]

    for _ in range(iters):
        cent_lit = F.array(*[
            F.struct(F.lit(ci).alias("cid"),
                     F.array(*[F.lit(x) for x in c]).alias("ce"))
            for ci, c in enumerate(cents)
        ])
        # map-side argmax: per-centroid (dot, -cid) structs, array_max's
        # lexicographic struct compare picks best dot with smallest-cid
        # tiebreak — every term stays inside codegen, zero joins
        v = F.col(vec_col).cast("array<double>")
        scored = F.transform(
            cent_lit,
            lambda c: F.struct(
                F.aggregate(F.zip_with(v, c["ce"], lambda a, b: a * b),
                            F.lit(0.0), lambda acc, x: acc + x).alias("dot"),
                (-c["cid"]).alias("neg")))
        best = F.array_max(scored)
        assigned = emb.select(
            (-best["neg"]).alias("cell"),
            *[F.col(vec_col)[i].cast("double").alias(f"x{i}") for i in range(dim)],
        )
        rows = (assigned.groupBy("cell")
                .agg(*[F.avg(f"x{i}").alias(f"c{i}") for i in range(dim)])
                .collect())
        new = {r["cell"]: [r[f"c{i}"] for i in range(dim)] for r in rows}
        # empty cells keep their previous centroid (standard Lloyd's)
        cents = [new.get(ci, c) for ci, c in enumerate(cents)]
    return cents


@probe(
    "ann_recall_audit",
    # component probes are registered above in this module, so their
    # oracle SQL composes here at decoration time (full SELECTs are valid
    # DuckDB CTE bodies)
    f"""
    WITH bf AS ({oracle_of("ann_brute_force_topk")}),
    ivf AS ({oracle_of("ann_ivf_topk")})
    SELECT bf.query_id,
           CAST(COUNT(ivf.neighbor_id) AS BIGINT) AS n_hit,
           CAST(COUNT(*) AS BIGINT) AS k,
           CAST(COUNT(ivf.neighbor_id) AS DOUBLE) / COUNT(*) AS recall
    FROM bf LEFT JOIN ivf
      ON ivf.query_id = bf.query_id AND ivf.neighbor_id = bf.neighbor_id
    GROUP BY bf.query_id
    ORDER BY bf.query_id
    """,
    survey_ids="similarity-ext,J2,A1",
)
def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF cell-probe path against exact brute-force
    ground truth, per query — the acceptance measurement every ANN
    deployment needs before swapping the approximate path in. Both sides
    are deterministic here, so the audit is exact and oracle-checkable
    (the DuckDB oracle recomputes both pipelines and the same join).
    At 100 TB the ground-truth side runs over a SAMPLED query set (this
    probe's N_QUERIES queries ARE that sample); the audit join touches
    only 2×k rows per query."""
    bf = ann_brute_force_topk(spark, sf_dir).select("query_id", "neighbor_id")
    ivf = (ann_ivf_topk(spark, sf_dir)
           .select(F.col("query_id").alias("qi"), F.col("neighbor_id").alias("ni")))
    joined = bf.join(
        ivf, (F.col("qi") == F.col("query_id")) & (F.col("ni") == F.col("neighbor_id")),
        "left")
    return (
        joined.groupBy("query_id")
        .agg(F.count("ni").alias("n_hit"), F.count(F.lit(1)).alias("k"))
        .select("query_id", "n_hit", "k",
                (F.col("n_hit").cast("double") / F.col("k")).alias("recall"))
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric distance computation (ADC) — the
# memory-compression half of billion-scale ANN (IVF above is the routing
# half): each 64-dim vector collapses to M=8 one-byte codes, and query
# scans touch only the codes plus a 160-entry broadcast distance table.
# Codebooks here are FIXED ±0.25 sign patterns (exact binary fractions,
# reproducible in SQL) so encoding and ADC are exact decimal arithmetic in
# both engines — swapping in per-subspace k-means (train_ivf_centroids on
# vector slices) changes only the broadcast literals, not the plan.
# Reference analogue: none (similarity-search extension family).
# ---------------------------------------------------------------------------

PQ_M = 8          # subspaces
PQ_DSUB = 8       # dims per subspace (8 × 8 = 64)
PQ_K = 4          # centroids per subspace


def pq_codebook() -> list[list[float]]:
    """CB[c][j]: c0 = all -0.25, c1 = all +0.25, c2/c3 = alternating sign
    patterns — same codebook for every subspace."""
    return [
        [-0.25] * PQ_DSUB,
        [0.25] * PQ_DSUB,
        [0.25 if j % 2 == 0 else -0.25 for j in range(PQ_DSUB)],
        [-0.25 if j % 2 == 0 else 0.25 for j in range(PQ_DSUB)],
    ]


def _sq_term_sql(vec: str, k: int, v: float) -> str:
    """SQL for one exact distance term: (x_k - v)² is one IEEE multiply
    (identical cross-engine), cast to DECIMAL(16,12). Double literal
    suffix keeps 0.25 a DOUBLE, not a SQL decimal."""
    x = f"(CAST(element_at({vec}, {k}) AS DOUBLE) - {v}D)"
    return f"CAST({x} * {x} AS DECIMAL(16,12))"


def _pq_dist2_sql(vec: str, m: int, c: int) -> str:
    """Exact squared distance of subvector m to centroid c as a SQL
    string — the 8-term chain adds exact decimals left-to-right."""
    cb = pq_codebook()
    return " + ".join(
        _sq_term_sql(vec, m * PQ_DSUB + j + 1, cb[c][j])
        for j in range(PQ_DSUB))


# centroid c0 = all -q → en+on; c1 = all +q → ep+op;
# c2 = +q even / -q odd → ep+on; c3 = -q even / +q odd → en+op
PQ_COMBOS = [("en", "on"), ("ep", "op"), ("ep", "on"), ("en", "op")]


def _pq_partial_exprs(vec_col: str, q: float = 0.25) -> list[str]:
    """The 4 shared partial sums per subspace — (even/odd) × (±q) — as
    SQL select expressions; every centroid distance is one addition of
    two of these (see PQ_COMBOS)."""
    def partial_sql(m: int, sign: float, parity: int) -> str:
        return " + ".join(
            _sq_term_sql(vec_col, m * PQ_DSUB + j + 1, sign * q)
            for j in range(parity, PQ_DSUB, 2))

    return [
        f"{partial_sql(m, sign, parity)} AS {nm}_{m}"
        for m in range(PQ_M)
        for nm, sign, parity in (("ep", 1.0, 0), ("op", 1.0, 1),
                                 ("en", -1.0, 0), ("on", -1.0, 1))
    ]


def pq_encode(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """vec_id + M code columns (code_0..code_{M-1}), each the argmin
    centroid of its subspace — a pure map-side projection (array_min over
    per-centroid (dist², c) structs picks smallest distance, smallest-c
    tiebreak); nothing shuffles, 1 byte of entropy per code at scale.

    Two implementation choices that are pure wall-clock (values are
    bit-identical to the naive 32-chain _pq_dist2_sql form):

    - the four sign-pattern centroids share their per-element terms, so
      distances are built from four partial sums per subspace —
      (even/odd positions) × (±q sign) — computed once in a FIRST
      projection and recombined in a second (decimal addition is exact
      and associative, so regrouping cannot change a value);
    - the projections are generated SQL strings (selectExpr, ONE parse)
      rather than composed Column objects — the ~2000-node expression
      tree costs seconds of py4j round-trips to build object-by-object.
    """
    parts = emb.selectExpr("vec_id", *_pq_partial_exprs(vec_col))
    code_exprs = []
    for m in range(PQ_M):
        structs = ", ".join(
            f"named_struct('d2', {a}_{m} + {b}_{m}, 'c', CAST({c} AS BIGINT))"
            for c, (a, b) in enumerate(PQ_COMBOS))
        code_exprs.append(f"array_min(array({structs})).c AS code_{m}")
    return parts.selectExpr("vec_id", *code_exprs)


_PQ_SQL_CB = """
      SELECT m, c, j,
             CASE WHEN c = 0 THEN -0.25 WHEN c = 1 THEN 0.25
                  WHEN c = 2 THEN (CASE WHEN j % 2 = 0 THEN 0.25 ELSE -0.25 END)
                  ELSE (CASE WHEN j % 2 = 0 THEN -0.25 ELSE 0.25 END) END AS v
      FROM range(8) rm(m), range(4) rc(c), range(8) rj(j)
"""

_PQ_SQL_D2 = f"""
      SELECT e.vec_id, cb.m, cb.c,
             SUM(CAST((CAST(e.embedding[cb.m * 8 + cb.j + 1] AS DOUBLE) - cb.v)
                      * (CAST(e.embedding[cb.m * 8 + cb.j + 1] AS DOUBLE) - cb.v)
                      AS DECIMAL(16,12))) AS dist2
      FROM embeddings e, ({_PQ_SQL_CB}) cb
      GROUP BY e.vec_id, cb.m, cb.c
"""

_PQ_SQL_CODES = f"""
      SELECT vec_id, m, c AS code FROM (
        SELECT vec_id, m, c,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist2, c) AS rn
        FROM ({_PQ_SQL_D2}) d2) x WHERE rn = 1
"""


@probe(
    "ann_pq_codes",
    f"""
    SELECT m, code, COUNT(*) AS n_vectors,
           MIN(vec_id) AS min_vec, MAX(vec_id) AS max_vec
    FROM ({_PQ_SQL_CODES}) codes
    GROUP BY m, code ORDER BY m, code
    """,
    survey_ids="similarity-ext,A1",
)
def ann_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encoding census: per (subspace, code) population — the
    codebook-balance check a PQ deployment monitors (a collapsed code
    means a dead centroid). Encoding is map-side; the census is one
    partially-aggregated groupBy over 32 keys."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    codes = pq_encode(emb)
    narrow = codes.select(
        "vec_id",
        F.explode(F.array(*[
            F.struct(F.lit(m).cast("bigint").alias("m"),
                     F.col(f"code_{m}").alias("code"))
            for m in range(PQ_M)
        ])).alias("e"),
    ).select("vec_id", "e.m", "e.code")
    return (
        narrow.groupBy("m", "code")
        .agg(F.count(F.lit(1)).alias("n_vectors"),
             F.min("vec_id").alias("min_vec"),
             F.max("vec_id").alias("max_vec"))
        .orderBy("m", "code")
    )


@probe(
    "ann_pq_adc_topk",
    f"""
    WITH d2 AS ({_PQ_SQL_D2}),
    codes AS ({_PQ_SQL_CODES}),
    adc AS (
      SELECT t.vec_id AS query_id, n.vec_id AS neighbor_id,
             SUM(t.dist2) AS adc
      FROM codes n JOIN d2 t ON t.m = n.m AND t.c = n.code
      WHERE t.vec_id < {N_QUERIES} AND n.vec_id <> t.vec_id
      GROUP BY 1, 2)
    SELECT query_id, neighbor_id, CAST(adc AS DOUBLE) AS adc_dist, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc, neighbor_id) AS rnk
      FROM adc) x WHERE rnk <= {TOP_K}
    ORDER BY query_id, rnk
    """,
    survey_ids="similarity-ext,J1,O5",
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-k: the query never reconstructs a vector — its exact
    subvectors are compared to every CENTROID once (M × K = 32 decimal
    distances per query, the classic ADC lookup table, broadcast), and
    each corpus vector's approximate distance is the sum of 8 table
    lookups over its codes. At billions of vectors the scan reads 8
    bytes/vector + one broadcast table — this is why PQ is the memory
    device of IVF-PQ. Exact decimal arithmetic end-to-end makes the
    result (and its rank order) bit-identical to the DuckDB oracle."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    codes = pq_encode(emb)
    narrow = codes.select(
        F.col("vec_id").alias("neighbor_id"),
        F.explode(F.array(*[
            F.struct(F.lit(m).cast("bigint").alias("m"),
                     F.col(f"code_{m}").alias("c"))
            for m in range(PQ_M)
        ])).alias("e"),
    ).select("neighbor_id", "e.m", "e.c")
    # the 32-entry-per-query ADC table — same shared-partials regrouping
    # and generated-SQL construction as pq_encode (values bit-identical
    # to the naive 32-chain form; the tree is 4x smaller, which is
    # optimizer/codegen wall-clock, and ONE parse replaces thousands of
    # py4j round-trips)
    structs = ", ".join(
        f"named_struct('m', CAST({m} AS BIGINT), 'c', CAST({c} AS BIGINT),"
        f" 'd2', {a}_{m} + {b}_{m})"
        for m in range(PQ_M) for c, (a, b) in enumerate(PQ_COMBOS))
    table = (
        emb.where(F.col("vec_id") < N_QUERIES)
        .selectExpr("vec_id AS query_id", *_pq_partial_exprs("embedding"))
        .selectExpr("query_id", f"explode(array({structs})) AS e")
        .select("query_id", "e.m", "e.c", "e.d2")
    )
    adc = (
        narrow.join(F.broadcast(table), ["m", "c"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2").alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy("adc", "neighbor_id")
    return (
        adc.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id",
                F.col("adc").cast("double").alias("adc_dist"), "rnk")
        .orderBy("query_id", "rnk")
    )


_IVF_ROUTE_SQL = f"""
    cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
             WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + K_CELLS}),
    vc0 AS (
      SELECT v.vec_id, c.cid,
             CAST(SUM(CAST(CAST(v.embedding[i + 1] AS DOUBLE)
                           * CAST(c.ce[i + 1] AS DOUBLE)
                           AS DECIMAL(38,12))) AS DOUBLE) AS dot
      FROM embeddings v, cent c, range(64) r(i)
      GROUP BY v.vec_id, c.cid),
    vc AS (
      SELECT vc0.vec_id, vc0.cid, vc0.dot / (nv.nrm * nc.nrm) AS cos
      FROM vc0 JOIN norms nv ON nv.vec_id = vc0.vec_id
               JOIN norms nc ON nc.vec_id = vc0.cid),
    asg AS (SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM vc) x WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM vc WHERE vec_id < {N_QUERIES}) x WHERE rn <= {N_PROBE})
"""


@probe(
    "ann_ivfpq_topk",
    f"""
    WITH norms AS ({NORMS_SQL}),
    {_IVF_ROUTE_SQL},
    codes AS ({_PQ_SQL_CODES}),
    d2 AS ({_PQ_SQL_D2}),
    cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
             FROM probes p JOIN asg a ON a.cid = p.cid
             WHERE a.vec_id <> p.query_id),
    adc AS (
      SELECT c.query_id, c.neighbor_id, SUM(t.dist2) AS adc
      FROM cand c
      JOIN codes n ON n.vec_id = c.neighbor_id
      JOIN d2 t ON t.vec_id = c.query_id AND t.m = n.m AND t.c = n.code
      GROUP BY 1, 2)
    SELECT query_id, neighbor_id, CAST(adc AS DOUBLE) AS adc_dist, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc, neighbor_id) AS rnk
      FROM adc) x WHERE rnk <= {TOP_K}
    ORDER BY query_id, rnk
    """,
    survey_ids="similarity-ext,J1,O5",
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ end-to-end — the full billion-vector serving architecture:
    IVF routing picks each query's N_PROBE nearest cells (broadcast
    centroids, map-side argmax assignment), and within the probed cells
    candidates are scored by ADC over their 8-byte PQ codes — the scan
    reads codes, never raw vectors; raw vectors exist only in the
    broadcast 32-entry/query distance table build. At scale the memory
    story compounds: IVF prunes which codes are read (N_PROBE/K of the
    corpus), PQ shrinks what a code read costs (8 B vs 256 B). Exact
    decimal arithmetic end-to-end keeps the result bit-identical to the
    composed DuckDB oracle."""
    from kingfisher_process_spark.functions.dedup import fanout

    t = load_tables(spark, sf_dir)
    emb = fanout(t["embeddings"]).select(
        "vec_id", "embedding", norm_col(F.col("embedding")).alias("nv"))
    cent = t["embeddings"].where(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + K_CELLS)
    ).select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"),
             norm_col(F.col("embedding")).alias("nc"))
    vc = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "nv", "cid",
        (dot_col(F.col("embedding"), F.col("ce")) / (F.col("nv") * F.col("nc")))
        .alias("cos"))
    asg = (
        vc.groupBy("vec_id")
        .agg(F.max(F.struct(F.col("cos"), (-F.col("cid")).alias("neg"))).alias("m"))
        .select(F.col("vec_id").alias("neighbor_id"), (-F.col("m.neg")).alias("cid"))
    )
    wq = Window.partitionBy("vec_id").orderBy(F.desc("cos"), "cid")
    probes_df = (
        vc.where(F.col("vec_id") < N_QUERIES)
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= N_PROBE)
        .select(F.col("vec_id").alias("query_id"), "cid")
    )
    cand = (asg.join(F.broadcast(probes_df), "cid")
            .where(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id"))

    codes = pq_encode(t["embeddings"])
    narrow = codes.select(
        F.col("vec_id").alias("neighbor_id"),
        F.explode(F.array(*[
            F.struct(F.lit(m).cast("bigint").alias("m"),
                     F.col(f"code_{m}").alias("c"))
            for m in range(PQ_M)
        ])).alias("e"),
    ).select("neighbor_id", "e.m", "e.c")
    structs = ", ".join(
        f"named_struct('m', CAST({m} AS BIGINT), 'c', CAST({c} AS BIGINT),"
        f" 'd2', {a}_{m} + {b}_{m})"
        for m in range(PQ_M) for c, (a, b) in enumerate(PQ_COMBOS))
    table = (
        t["embeddings"].where(F.col("vec_id") < N_QUERIES)
        .selectExpr("vec_id AS query_id", *_pq_partial_exprs("embedding"))
        .selectExpr("query_id", f"explode(array({structs})) AS e")
        .select("query_id", "e.m", "e.c", "e.d2")
    )
    adc = (
        cand.join(narrow, "neighbor_id")
        .join(F.broadcast(table), ["query_id", "m", "c"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2").alias("adc"))
    )
    wk = Window.partitionBy("query_id").orderBy("adc", "neighbor_id")
    return (
        adc.withColumn("rnk", F.row_number().over(wk))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id",
                F.col("adc").cast("double").alias("adc_dist"), "rnk")
        .orderBy("query_id", "rnk")
    )
