"""Plan-shape and semantics tests for the statistics module
(plans/stats.py): the exact-moment determinism pattern must compile
to single-pass partial aggregation, and ranked shapes must plan as
broadcast joins / top-k heaps — the properties that carry to 100 TB.
Value parity vs DuckDB is covered by test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import Row

from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_stats_moments_single_shuffle(spark):
    from weatherflow_spark.plans.stats import q_stats_moments

    plan = _plan(q_stats_moments(spark, SF_SMALL))
    # one scan → partial agg → ONE exchange of 3 groups → final agg
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") >= 2


def test_linear_regression_single_shuffle(spark):
    from weatherflow_spark.plans.stats import q_linear_regression

    plan = _plan(q_linear_regression(spark, SF_SMALL))
    assert plan.count("Exchange") == 1


def test_mode_no_window_no_sort(spark):
    from weatherflow_spark.plans.stats import q_mode

    plan = _plan(q_mode(spark, SF_SMALL))
    # arg-max via max(struct), never a row_number window over the input
    assert "Window" not in plan
    assert plan.count("Exchange") <= 2


def test_tpch_q3_broadcasts_and_heaps(spark):
    from weatherflow_spark.plans.stats import q_tpch_q3

    plan = _plan(q_tpch_q3(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_explode_pos_topk_is_heap(spark):
    from weatherflow_spark.plans.stats import q_explode_pos

    plan = _plan(q_explode_pos(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan
    assert "Generate" in plan  # posexplode stays a narrow generator


def test_mode_tie_breaks_to_smallest_value(spark):
    # 10 appears twice, 20 appears twice, 30 once → mode must be 10.
    df = spark.createDataFrame(
        [Row(g="a", v=10), Row(g="a", v=10), Row(g="a", v=20),
         Row(g="a", v=20), Row(g="a", v=30)]
    )
    from pyspark.sql import functions as F

    counts = df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("n"))
    best = F.max(F.struct(F.col("n").alias("n"), (-F.col("v")).alias("negv")))
    out = (
        counts.groupBy("g").agg(best.alias("b"))
        .select("g", (-F.col("b.negv")).alias("mode_v"), F.col("b.n").alias("cnt"))
        .collect()
    )
    assert out[0].mode_v == 10 and out[0].cnt == 2


def test_entropy_matches_closed_form(spark):
    # uniform distribution over k types → entropy = ln(k)
    import math

    from weatherflow_spark.plans.stats import q_entropy

    row = q_entropy(spark, SF_SMALL).collect()[0]
    assert row.n_types >= 2
    assert 0.0 < row.entropy_nats <= math.log(row.n_types) + 1e-9


def test_table_fingerprint_merges_across_loads(spark):
    """E71 mergeability: the XOR and modular-sum digests of a table
    must equal the combination of per-batch digests (XOR / modular
    add) — the property that lets an incremental load maintain the
    fingerprint without rescanning history."""
    from pyspark.sql import functions as F

    from weatherflow_spark.plans.quality import FP_SUM_MOD, _row_fp_spark

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 7 % 13).alias("v")
    )
    h = _row_fp_spark("concat_ws('|', id, v)")
    def digest(frame):
        r = frame.select(F.expr(h).alias("h")).agg(
            F.expr("bit_xor(h)").alias("x"),
            F.expr(f"sum(h % {FP_SUM_MOD})").alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        return r.x, r.s, r.n

    full = digest(df)
    a = digest(df.where("id < 400"))
    b = digest(df.where("id >= 400"))
    assert full[0] == a[0] ^ b[0]
    assert full[1] == a[1] + b[1]
    assert full[2] == a[2] + b[2]


def test_covariance_blocked_matches_single_pass(spark):
    """E47 blocking (verdict r7 #6): dimension-blocked tiles must
    reproduce the single-pass matrix exactly — including an uneven
    final block (64 % 24 != 0)."""
    from weatherflow_spark.operators.caching import release_caches
    from weatherflow_spark.plans.stats import q_covariance_matrix

    try:
        plain = {
            (r.dim_i, r.dim_j): (r.sum_prod, r.cov_num, r.cov_e9)
            for r in q_covariance_matrix(spark, SF_SMALL).collect()
        }
        blocked = {
            (r.dim_i, r.dim_j): (r.sum_prod, r.cov_num, r.cov_e9)
            for r in q_covariance_matrix(
                spark, SF_SMALL, block_size=24
            ).collect()
        }
        assert blocked == plain and len(plain) == 64 * 65 // 2
    finally:
        release_caches()
        spark.catalog.clearCache()


def test_covariance_blocked_d256_fixture(spark, tmp_path):
    """D=256: the regime blocking exists for (D(D+1)/2 = 32,896
    partial-agg keys per task unblocked). Deterministic synthetic
    embeddings; blocked B=64 (10 tiles) == unblocked."""
    from pyspark.sql import functions as F

    from weatherflow_spark.operators.caching import release_caches
    from weatherflow_spark.plans.stats import q_covariance_matrix

    d = 256
    emb = spark.range(0, 40).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {d}), k -> "
            "cast(((id * 37 + k * 11) % 97 - 48) / 100.0 as float))"
        ).alias("embedding"),
        F.lit(0).alias("label"),
    )
    emb.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    try:
        plain = {
            (r.dim_i, r.dim_j): (r.sum_prod, r.cov_num, r.cov_e9)
            for r in q_covariance_matrix(spark, str(tmp_path), dim=d).collect()
        }
        blocked = {
            (r.dim_i, r.dim_j): (r.sum_prod, r.cov_num, r.cov_e9)
            for r in q_covariance_matrix(
                spark, str(tmp_path), dim=d, block_size=64
            ).collect()
        }
        assert blocked == plain and len(plain) == d * (d + 1) // 2
    finally:
        release_caches()
        spark.catalog.clearCache()
