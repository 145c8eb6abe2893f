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


def test_arg_max_is_aggregate_not_window(spark):
    from weatherflow_spark.plans.analytics import q_arg_max

    plan = _plan(q_arg_max(spark, SF_SMALL))
    # arg-max must plan as a two-phase aggregate (map-side partial_max
    # per partition, one row per group crossing the exchange), NOT as
    # a window over all rows. Struct-typed max buffers aren't
    # hash-aggregatable, so Spark picks SortAggregate — still partial.
    assert "partial_max" in plan
    assert plan.count("Exchange") == 1
    assert "Window" not in plan


def test_conditional_agg_single_scan(spark):
    from weatherflow_spark.plans.analytics import q_conditional_agg

    plan = _plan(q_conditional_agg(spark, SF_SMALL))
    # all conditional branches in one pass: exactly one scan, one exchange.
    assert plan.count("FileScan") == 1
    assert plan.count("Exchange") == 1


def test_corpus_curation_dedup_uses_group_limit(spark):
    from weatherflow_spark.plans.analytics import q_corpus_curation

    plan = _plan(q_corpus_curation(spark, SF_SMALL))
    # the keep-first-per-content-hash dedup must plan as a group-limit
    # (rank pushdown) so each partition keeps 1 row per hash before the
    # exchange, not a full materialized sort of the corpus.
    assert "WindowGroupLimit" in plan
    # scoring/filtering stay narrow: shuffles only for dedup + final agg.
    assert plan.count("Exchange") <= 3


def test_array_ops_no_explode_no_python(spark):
    from weatherflow_spark.plans.analytics import q_array_ops

    plan = _plan(q_array_ops(spark, SF_SMALL))
    assert "Generate" not in plan  # no explode
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # fully narrow per-vector math


def test_stratified_sample_uses_group_limit(spark):
    from weatherflow_spark.plans.analytics import q_stratified_sample

    plan = _plan(q_stratified_sample(spark, SF_SMALL))
    # per-stratum top-N must keep a heap before the exchange.
    assert "WindowGroupLimit" in plan


def test_first_last_single_window_node(spark):
    from weatherflow_spark.plans.analytics import q_window_first_last

    plan = _plan(q_window_first_last(spark, SF_SMALL))
    # same partitioning+ordering for all four exprs → one shuffle.
    assert plan.count("Exchange") == 1


def test_quality_gate_budget_pinned(spark):
    """r9 (VERDICT r8 'Next round' #8): the scheduler gate
    (q_quality_gate, sections=GATE_SECTIONS) must stay the CHEAP
    invariant pass a scheduler polls before every load. r13: the pin
    is a RATIO against the full report measured in the SAME session —
    min-of-3 gate < half the min-of-3 full report — because the old
    absolute 1.0 s wall pin tracked the box's ambient load, not the
    gate (it blew at ~1.5 s on sessions whose bench controls measured
    1.5x ambient while the warm-bench gate cost was 0.76 s, and the
    UNCHANGED r12 code failed it identically). The ratio is
    ambient-immune — both sides inflate together — and it IS the
    documented claim: the gate tier must be materially cheaper than
    the full report (bench r13: 0.76 s vs 3.76 s, ratio 0.20; the
    absolute trend stays visible in bench_last.json). min-of-N
    because this sandbox's rep-to-rep noise is one-sided."""
    import time

    from weatherflow_spark.plans.quality import (
        q_data_quality_report,
        q_quality_gate,
    )

    sf01 = "/root/testdata/sf0.1"

    def min_of_3(fn):
        # One untimed warm-up rep — bench.py's own methodology: JVM /
        # codegen / first-file-listing warm-up is not the query's
        # cost (r12.2).
        fn(spark, sf01).write.format("noop").mode("overwrite").save()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf01).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        return min(times)

    gate, report = min_of_3(q_quality_gate), min_of_3(q_data_quality_report)
    assert gate < report / 2, (
        f"gate budget blown: gate {gate:.2f}s vs full report "
        f"{report:.2f}s (must be < half)"
    )
