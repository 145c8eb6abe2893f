"""Physical-plan regression audit: the properties that make the
certified queries viable at 100 TB must be visible in their plans,
not just assumed — filters reaching the parquet scan, column pruning,
dimension broadcasts, top-k as a bounded heap, and (globally) no
cartesian products anywhere in the certified window. A refactor that
silently de-optimizes a plan fails here even though results stay
correct."""

from __future__ import annotations

import pytest

from weatherflow_spark.plans import QUERIES
from tests.conftest import SF_SMALL

# The certified prefix (dict insertion order = registry order).
WINDOW = list(QUERIES)[:50]


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_scan_filter_project_pushes_down(spark):
    """S1/P1/P2: the predicate and the 3-column projection must reach
    the parquet scan — a scan reading all columns for a 3-column
    projection is wrong at any scale."""
    p = _plan(QUERIES["q_scan_filter_project"](spark, SF_SMALL))
    assert "PushedFilters: [" in p, p
    pushed = p.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip(), f"no filters pushed to the scan:\n{p}"
    read_schema = p.split("ReadSchema: ", 1)[1].splitlines()[0]
    for unused in ("c_address", "c_phone", "c_comment"):
        assert unused not in read_schema, (
            f"unused column read from parquet:\n{read_schema}"
        )


def test_derived_metrics_is_narrow_single_stage(spark):
    """F11-F14 are pure column arithmetic: the whole query must be one
    shuffle-free whole-stage-codegen pipeline over the scan."""
    p = _plan(QUERIES["q_derived_metrics"](spark, SF_SMALL))
    assert "Exchange" not in p, f"narrow transform plan contains a shuffle:\n{p}"
    # formatted explain marks codegen'd operators with "[codegen id : N]"
    assert "[codegen id :" in p, f"transform fell out of whole-stage codegen:\n{p}"


def test_star_join_broadcasts_dimensions(spark):
    """J2: the star join must broadcast its dimension sides — a
    shuffle join against a small dim wastes a full fact shuffle."""
    p = _plan(QUERIES["q_star_join_agg"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in p, f"star join plans no broadcast:\n{p}"


def test_tpch_suite_broadcasts_dimensions(spark):
    p = _plan(QUERIES["q_tpch_suite"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in p


def test_topk_is_bounded_heap(spark):
    """O2: ORDER BY + LIMIT must plan as TakeOrderedAndProject (a
    k-row heap per partition + driver merge), never a global sort."""
    p = _plan(QUERIES["q_topk"](spark, SF_SMALL))
    assert "TakeOrderedAndProject" in p, p


def test_groupby_agg_has_map_side_partials(spark):
    """A1: hash aggregation must run partial (map-side) before the
    exchange and final after — one aggregated row per group crosses
    the wire, not one row per fact."""
    p = _plan(QUERIES["q_groupby_agg"](spark, SF_SMALL))
    assert p.count("HashAggregate") >= 2, p
    assert "Exchange" in p


@pytest.mark.parametrize("name", WINDOW)
def test_no_cartesian_product_in_certified_window(spark, name):
    """No certified plan may contain a CartesianProduct. (Broadcast
    nested-loop joins against 1-row/tiny broadcast relations are
    allowed — that is the planned shape for scalar subqueries.)"""
    p = _plan(QUERIES[name](spark, SF_SMALL))
    assert "CartesianProduct" not in p, f"{name} plans a cartesian product:\n{p}"
