"""Physical-plan shape assertions: the optimizer work we rely on at
100 TB must be visible in explain output at any scale (SURVEY §4)."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_scan_filter_project_pushdown(spark):
    from weatherflow_spark.plans.relational import q_scan_filter_project

    plan = _formatted(q_scan_filter_project(spark, SF_SMALL))
    # Predicate reaches the parquet scan...
    assert "PushedFilters" in plan
    assert "c_mktsegment" in plan.split("PushedFilters")[1].splitlines()[0]
    # ...and only the needed columns are read.
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "c_custkey" in read_schema and "c_nationkey" not in read_schema


def test_star_join_broadcasts_dims(spark):
    from weatherflow_spark.plans.relational import q_star_join_agg

    plan = _plan(q_star_join_agg(spark, SF_SMALL))
    # customer and nation must broadcast; the lineitem side must not
    # appear under a BroadcastExchange.
    assert plan.count("BroadcastHashJoin") >= 2


def test_topk_plans_take_ordered(spark):
    from weatherflow_spark.plans.relational import q_topk

    plan = _plan(q_topk(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan


def test_groupby_is_two_phase_hash_agg(spark):
    from weatherflow_spark.plans.relational import q_groupby_agg

    plan = _plan(q_groupby_agg(spark, SF_SMALL))
    # partial (map-side) + final aggregate → two HashAggregate nodes.
    assert plan.count("HashAggregate") >= 2


def test_enrichment_is_single_stage_no_shuffle(spark):
    from weatherflow_spark.plans.queries import events_weather, _local_ts
    from weatherflow_spark.functions.weather import add_calc_attributes

    df = add_calc_attributes(events_weather(spark, SF_SMALL))
    plan = _plan(df)
    assert "Exchange" not in plan  # narrow transforms only (SURVEY §3.1)
