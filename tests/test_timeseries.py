"""Gap-fill + interpolation: spine density, edge fills, interior
linearity (oracle hash parity is covered by test_oracle_parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from weatherflow_spark.io import load_table
from weatherflow_spark.plans.timeseries import q_gap_fill_interpolate


@pytest.fixture(scope="module")
def filled(spark):
    return q_gap_fill_interpolate(spark, SF_SMALL).cache()


def test_spine_is_dense_and_shared(spark, filled):
    """Every series covers the identical global [min,max] hour range
    with no holes: |series| x |hours| rows exactly."""
    ev = load_table(spark, SF_SMALL, "events")
    n_keys = ev.select("event_type").distinct().count()
    lo, hi = ev.agg(
        F.min(F.date_trunc("hour", "ts")), F.max(F.date_trunc("hour", "ts"))
    ).first()
    n_hours = int((hi - lo).total_seconds() // 3600) + 1
    assert filled.count() == n_keys * n_hours
    per_key = filled.groupBy("series_key").count().collect()
    assert all(r["count"] == n_hours for r in per_key)


def test_no_null_fills_when_series_nonempty(filled):
    """Each series has at least one observation in the testdata, so
    every spine row gets a value (interp or edge fill)."""
    assert filled.where(F.col("filled_value").isNull()).count() == 0


def test_gap_rows_bounded_by_neighbors(spark, filled):
    """Interior interpolated values lie within [min(prev,next),
    max(prev,next)] — linear interpolation never overshoots."""
    from pyspark.sql import Window

    w_prev = (
        Window.partitionBy("series_key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("series_key")
        .orderBy("bucket")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    obs_v = F.when(F.col("is_observed"), F.col("filled_value"))
    checked = (
        filled.withColumn("pv", F.last(obs_v, ignorenulls=True).over(w_prev))
        .withColumn("nv", F.first(obs_v, ignorenulls=True).over(w_next))
        .where(~F.col("is_observed") & F.col("pv").isNotNull() & F.col("nv").isNotNull())
    )
    bad = checked.where(
        (F.col("filled_value") < F.least("pv", "nv") - F.lit(1e-9))
        | (F.col("filled_value") > F.greatest("pv", "nv") + F.lit(1e-9))
    ).count()
    assert bad == 0


def test_observed_rows_keep_exact_hourly_mean(spark, filled):
    """Observed spine rows reproduce the integer-cents hourly mean."""
    ev = load_table(spark, SF_SMALL, "events")
    obs = (
        ev.groupBy(
            F.col("event_type").alias("series_key"),
            F.date_trunc("hour", "ts").alias("bucket"),
        )
        .agg(
            (
                F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long"))
                / (100.0 * F.count(F.lit(1)))
            ).alias("expect")
        )
    )
    joined = filled.where("is_observed").join(obs, ["series_key", "bucket"], "inner")
    assert joined.count() == obs.count()
    assert joined.where(F.col("filled_value") != F.col("expect")).count() == 0
