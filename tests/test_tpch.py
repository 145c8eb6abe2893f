"""Plan-shape tests for the TPC-H-shaped star module (plans/tpch.py):
dimensions must broadcast, the only wide shuffle is lineitem⋈orders,
and conditional ratios stay one-pass. Value parity vs DuckDB is
covered by test_oracle_parity."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q5_broadcasts_all_dims(spark):
    from weatherflow_spark.plans.tpch import q_tpch_q5

    plan = _plan(q_tpch_q5(spark, SF_SMALL))
    # customer, supplier, nation, region all broadcast → ≥4 BHJ;
    # exactly one sort-merge/shuffle-hash join may remain (li⋈orders).
    assert plan.count("BroadcastHashJoin") >= 4


def test_q14_is_single_pass(spark):
    from weatherflow_spark.plans.tpch import q_tpch_q14

    plan = _plan(q_tpch_q14(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    # numerator+denominator in one aggregate: lineitem scanned once.
    assert plan.count("FileScan parquet") <= 2  # lineitem + part


def test_q14_prunes_and_pushes_down(spark):
    from weatherflow_spark.plans.tpch import q_tpch_q14

    df = q_tpch_q14(spark, SF_SMALL)
    formatted = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # shipdate range predicate reaches the parquet scan
    assert "PushedFilters" in formatted
    assert "l_shipdate" in formatted.split("PushedFilters")[1].splitlines()[0]


def test_supplier_rank_no_shuffle_for_dim_joins(spark):
    from weatherflow_spark.plans.tpch import q_supplier_rank

    plan = _plan(q_supplier_rank(spark, SF_SMALL))
    assert plan.count("BroadcastHashJoin") >= 2
    # only the window's own partitioning exchanges rows
    assert plan.count("Exchange hashpartitioning") <= 1
