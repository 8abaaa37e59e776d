"""Quality bounds for the approximate operators.

``a10_approx_distinct`` emits an estimator audit since r9 (the
engine's HLL++ estimate is engine-specific, so the raw number can't
cross-engine hash-match): the exact count plus a boolean pinning the
estimate within 3× the configured relative standard deviation
(rsd=0.01) — the standard 3-sigma band for the sketch's error model.
CI additionally pins the raw estimate directly here, so the guarantee
is held in two places.

``profile_table(exact=False)`` swaps COUNT(DISTINCT) for the same
sketch; its estimates get the same bound here and its plan shape is
asserted in test_physical_plans.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from kingfisher_process_spark.functions.audit import (
    ORDERS_PROFILE_COLS, profile_table)
from kingfisher_process_spark.plans.base import load_tables
from tests.conftest import SF_SMOKE

A10_RSD = 0.01  # matches approx_count_distinct("o_custkey", 0.01) in the probe
BOUND = 3 * A10_RSD

REGISTRY = entrymod._registry()


def test_a10_estimate_within_3_rsd_of_exact(spark):
    orders = load_tables(spark, SF_SMOKE)["orders"]
    est, exact = orders.agg(
        F.approx_count_distinct("o_custkey", A10_RSD),
        F.count_distinct("o_custkey")).collect()[0]
    assert exact > 0
    rel_err = abs(est - exact) / exact
    assert rel_err <= BOUND, (
        f"HLL estimate {est} vs exact {exact}: "
        f"relative error {rel_err:.4f} exceeds 3*rsd={BOUND}")

    row = REGISTRY["a10_approx_distinct"].fn(spark, SF_SMOKE).collect()[0]
    assert row["exact_customers"] == exact
    assert row["within_3rsd"] is True


def test_profile_approx_distincts_track_exact(spark):
    orders = load_tables(spark, SF_SMOKE)["orders"]
    exact = {r["col_name"]: r for r in
             profile_table(orders, ORDERS_PROFILE_COLS).collect()}
    approx = {r["col_name"]: r for r in
              profile_table(orders, ORDERS_PROFILE_COLS, exact=False).collect()}
    assert exact.keys() == approx.keys()
    # default approx_count_distinct rsd is 0.05 → 3-sigma band of 15%
    for name, er in exact.items():
        ar = approx[name]
        # every non-distinct statistic is computed identically
        for f in ("n_rows", "n_nulls", "min_num", "max_num",
                  "min_str", "max_str"):
            assert ar[f] == er[f], (name, f)
        rel_err = abs(ar["n_distinct"] - er["n_distinct"]) / max(er["n_distinct"], 1)
        assert rel_err <= 0.15, (name, ar["n_distinct"], er["n_distinct"])


def test_histogram_quantile_error_bounded_by_bucket_width(spark):
    """The equi-width histogram guarantee: each estimated quantile lies
    within one bucket width of the exact interpolated percentile."""
    from pyspark.sql import functions as F

    from kingfisher_process_spark.functions.sketch import (
        HIST_BUCKETS, HIST_QS_PM, sk_histogram_quantiles)
    from kingfisher_process_spark.plans.base import load_tables
    from tests.conftest import SF_SMOKE

    o = load_tables(spark, SF_SMOKE)["orders"]
    qs = [q / 1000.0 for q in HIST_QS_PM]
    exact = o.selectExpr(
        f"percentile(o_totalprice, array({', '.join(map(str, qs))})) AS p"
    ).first()["p"]
    mn, mx = o.agg(F.min("o_totalprice"), F.max("o_totalprice")).first()
    w = (mx - mn) / HIST_BUCKETS
    ests = {r["qpm"]: r["est_value"]
            for r in sk_histogram_quantiles(spark, SF_SMOKE).collect()}
    for qpm, ex in zip(HIST_QS_PM, exact):
        assert abs(ests[qpm] - ex) <= w, (qpm, ests[qpm], ex, w)


def test_hll_distinct_quality_and_small_range_correction(spark):
    """The deterministic HLL (r8): the self-auditing probe row must show
    a bounded relative error, and the small-range regime must take the
    linear-counting branch (est_distinct != est_raw) — raw HLL
    overshoots badly when most registers are zero."""
    from kingfisher_process_spark.functions.sketch import sk_hll_distinct
    from tests.conftest import SF_SMOKE

    row = sk_hll_distinct(spark, SF_SMOKE).collect()[0].asDict()
    # sf0.001: 150 distinct custkeys over 256 registers — deep in the
    # linear-counting regime
    assert row["n_zero_registers"] > 0
    assert row["est_distinct"] != row["est_raw"]
    assert abs(row["rel_err"]) < 0.1, row
    # the raw estimator really is the one being corrected away
    assert row["est_raw"] > row["exact_distinct"] * 1.5


def test_hll_set_algebra_tracks_truth(spark):
    """Union-by-register-merge and inclusion-exclusion intersection must
    track their exact values, and the union estimate must never fall
    below either input's (register MAX dominates both sides)."""
    from kingfisher_process_spark.functions.sketch import sk_hll_setops
    from tests.conftest import SF_SMOKE

    row = sk_hll_setops(spark, SF_SMOKE).collect()[0].asDict()
    assert row["est_union"] >= max(row["est_a"], row["est_b"])
    assert abs(row["est_union"] - row["exact_union"]) \
        <= 0.15 * row["exact_union"], row
    assert abs(row["est_intersection"] - row["exact_intersection"]) \
        <= 0.2 * row["exact_intersection"], row


def test_hll_by_group_bounded_error_every_group(spark):
    from kingfisher_process_spark.functions.sketch import sk_hll_by_group
    from tests.conftest import SF_SMOKE

    rows = sk_hll_by_group(spark, SF_SMOKE).collect()
    assert len(rows) == 5  # the five order priorities
    for r in rows:
        assert abs(r["rel_err"]) < 0.15, r.asDict()


def test_qdigest_rank_error_and_size_bounds(spark):
    """q-digest theory pins rank error <= QD_D * n / QD_K and digest
    size O(k log U); both must hold at every requested quantile (the
    probe carries rank_err and n_nodes in its verified row)."""
    from kingfisher_process_spark.functions.sketch import (
        QD_D, QD_K, sk_qdigest_quantiles)

    rows = sk_qdigest_quantiles(spark, SF_SMOKE).collect()
    assert len(rows) == 3
    n = load_tables(spark, SF_SMOKE)["orders"].count()
    bound = QD_D * n / QD_K + 1
    for r in rows:
        assert r["rank_err"] <= bound, (r, bound)
        assert r["n_nodes"] <= 3 * QD_K, r


def test_qdigest_merge_matches_bounds_without_rescan(spark):
    """Digests built independently over two hash-halves of orders (same
    shared bounds) merge sketch-side; the merged digest's quantile
    estimates must obey the SAME rank-error bound, and its size stays
    bounded — the partitions-sketch-independently contract."""
    from kingfisher_process_spark.functions.sketch import (
        QD_D, QD_K, qdigest_bounds, qdigest_build, qdigest_merge,
        qdigest_quantiles)

    o = load_tables(spark, SF_SMOKE)["orders"]
    n = o.count()
    b = qdigest_bounds(o, "o_totalprice")
    halves = [o.where(F.pmod(F.hash("o_orderkey"), F.lit(2)) == i)
              for i in range(2)]
    parts = [qdigest_build(h, "o_totalprice", b) for h in halves]
    merged = qdigest_merge(parts, b).localCheckpoint()
    assert merged.count() <= 3 * QD_K
    # counts conserved through every fold
    assert merged.agg(F.sum("cnt")).collect()[0][0] == n
    est = {r["qpm"]: (r["target_rank"], r["est_value"])
           for r in qdigest_quantiles(spark, merged, b).collect()}
    bound = QD_D * n / QD_K + 1
    for qpm, (r, v) in est.items():
        rank_of_est = o.where(F.col("o_totalprice") <= v).count()
        assert abs(rank_of_est - r) <= bound, (qpm, rank_of_est, r)


def test_qdigest_beats_histogram_on_heavy_tail(spark):
    """The upgrade's reason to exist: on a heavy-tailed column (cubing
    o_totalprice pushes ~everything into the lowest equi-width
    buckets) the q-digest's adaptive resolution must place the median
    with materially lower rank error than the 64-bucket equi-width
    histogram."""
    from kingfisher_process_spark.functions.sketch import (
        HIST_BUCKETS, qdigest_bounds, qdigest_build, qdigest_quantiles)

    o = (load_tables(spark, SF_SMOKE)["orders"]
         .selectExpr("o_totalprice * o_totalprice * o_totalprice AS v")
         .localCheckpoint())
    n = o.count()
    b = qdigest_bounds(o, "v")
    digest = qdigest_build(o, "v", b).localCheckpoint()
    qd = {r["qpm"]: r for r in
          qdigest_quantiles(spark, digest, b).collect()}

    # the histogram estimate for the same column, same p50 target
    hb = o.agg(F.min("v").alias("mn"), F.max("v").alias("mx"),
               F.count(F.lit(1)).cast("bigint").alias("n"))
    h = (o.crossJoin(F.broadcast(hb))
         .selectExpr(
             f"LEAST(CAST(floor((v - mn) / ((mx - mn)"
             f" / {HIST_BUCKETS}.0)) AS BIGINT), {HIST_BUCKETS - 1}) AS bk")
         .groupBy("bk").agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    cum = h.selectExpr(
        "bk", "c",
        "SUM(c) OVER (ORDER BY bk ROWS BETWEEN UNBOUNDED PRECEDING"
        " AND CURRENT ROW) AS cum")
    r50 = qd[500]["target_rank"]
    mn, mx = hb.collect()[0]["mn"], hb.collect()[0]["mx"]
    pick = (cum.where(F.col("cum") >= r50)
            .orderBy("bk").limit(1).collect()[0])
    hist_v = (mn + (mx - mn) / HIST_BUCKETS
              * (pick["bk"] + (r50 - (pick["cum"] - pick["c"]))
                 / pick["c"]))
    hist_rank = o.where(F.col("v") <= hist_v).count()
    qd_rank = o.where(F.col("v") <= qd[500]["est_value"]).count()
    qd_err, hist_err = abs(qd_rank - r50), abs(hist_rank - r50)
    # adaptive resolution should cut the rank error by a wide margin
    assert qd_err * 2 < hist_err, (qd_err, hist_err)


def test_cms_join_size_one_sided_and_bounded(spark):
    """The inner-product estimate never undercounts (colliding keys
    only ADD cross terms) and its overestimate stays near the theory
    bound n_a*n_b/width (pinned at 4x slack for hash luck)."""
    from kingfisher_process_spark.functions.sketch import (
        CMS_JOIN_WIDTH, sk_cms_join_size)

    [r] = sk_cms_join_size(spark, SF_SMOKE).collect()
    assert r["overestimate"] >= 0
    t = load_tables(spark, SF_SMOKE)
    n_a = t["orders"].count()
    n_b = t["customer"].where("c_acctbal > 0").count()
    assert r["overestimate"] <= 4 * n_a * n_b / CMS_JOIN_WIDTH + 1, r
