"""Registered queries: one callable per implemented operator (SURVEY §2).

Each ``q_*`` takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names/types match its DuckDB oracle in
:mod:`weatherflow_spark.plans.oracles` exactly (the driver hashes
values after sorting columns by name).

Cross-engine determinism rules used throughout (see tests
``tests/test_oracle_parity.py`` which enforce them at sf0.001):

- **No nondeterministic exprs** (uuid/rand/now) in any checked query;
  surrogate keys are sha2 content hashes.
- **Money sums** use exact integer arithmetic: per-row
  ``round(x * 100)`` cast to long, summed as longs, divided back at
  the end. Summation order then cannot change the result, unlike
  naive double sums.
- **Rounding** is only applied where the true value is either
  already ~2-decimal or has a long generic decimal expansion —
  never where a decimal tie (.xx5 exactly) is likely, because Spark
  (HALF_UP on shortest decimal repr) and DuckDB (binary multiply)
  disagree on exact ties.
- **Ties in top-k / window orderings** are always broken by a unique
  key column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from weatherflow_spark.functions.calendar import (
    epoch_to_local_ts,
    quarter_bucket,
    season_bucket,
    ts_diff_minutes,
)
from weatherflow_spark.functions.weather import dew_point, heat_index
from weatherflow_spark.io import load_table

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def scaled_sum(x: Column, scale: int = 100) -> Column:
    """Order-independent exact sum of a fixed-decimal double, as double.

    ``sum(floor(x*scale + 0.5) :: long) / scale`` — integer summation
    is associative, so Spark's partial/final agg order and DuckDB's
    single-threaded order produce bit-identical results; the
    floor(+0.5) rounding is the engine's deterministic half-up
    (functions/numeric.py). Scale 100 for 2-decimal inputs, 10^4/10^6
    for computed expressions like price*(1-discount)[*(1+tax)].
    """
    p = F.lit(float(scale))
    return F.sum(F.floor(x * p + F.lit(0.5))) / p


def cents_sum(x: Column) -> Column:
    return scaled_sum(x, 100)


def scaled_sum_sql(expr: str, scale: int = 100) -> str:
    """The identical computation as DuckDB SQL text."""
    p = float(scale)
    return f"sum(CAST(floor(({expr}) * {p} + 0.5) AS BIGINT)) / {p}"


def events_weather(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `events` table dressed as the reference's weather-record
    shape (FIXTURES.md §A): epoch seconds, a per-row UTC offset
    simulated as ``(user_id % 25 - 12) * 3600`` (reference stations
    carry offsets like -18000, api.py:34), humidity 0..100, temp °C.

    One narrow projection over the scan — Catalyst prunes unused
    columns per consuming query.
    """
    df = load_table(spark, sf_dir, "events")
    return df.withColumns(
        {
            "epoch_s": F.col("ts").cast("timestamp").cast("long"),
            "tz_offset_s": (F.col("user_id") % F.lit(25) - F.lit(12)) * F.lit(3600),
            "humidity": (F.col("user_id") % F.lit(101)).cast("double"),
            "temp": F.col("value"),
        }
    )


def _local_ts(df: DataFrame) -> Column:
    return epoch_to_local_ts(F.col("epoch_s"), F.col("tz_offset_s"))


# ---------------------------------------------------------------------------
# flagship (entry smoke query)
# ---------------------------------------------------------------------------


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal rollup of the weather-enriched event stream.

    The minimum end-to-end slice from SURVEY §7: scan → epoch+offset
    local time (F2) → season bucket (F5) → hash aggregate. Narrow
    transforms collapse into the scan stage; the only shuffle is the
    4-group aggregate, which does a map-side partial first.
    """
    df = events_weather(spark, sf_dir)
    local = _local_ts(df)
    return (
        df.select(
            season_bucket(local).alias("season"),
            quarter_bucket(local).alias("quarter"),
            F.col("value"),
        )
        .groupBy("season", "quarter")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(cents_sum(F.col("value")), 2).alias("sum_value"),
        )
    )


def q_flagship_season_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return flagship(spark, sf_dir)


# ---------------------------------------------------------------------------
# §2.3 scalar-function fidelity queries (reference F1-F14, on `events`)
# ---------------------------------------------------------------------------


def q_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 (etl.py:26-28): defensive numeric casts. Spark double→long
    truncates toward zero (like Python ``int()``); oracle mirrors with
    ``trunc``."""
    df = load_table(spark, sf_dir, "events")
    return df.select(
        F.col("event_id"),
        F.col("value").cast("long").alias("value_long"),
        F.col("user_id").cast("double").alias("user_id_double"),
        F.col("event_id").cast("string").cast("long").alias("event_id_roundtrip"),
    )


def q_epoch_to_local_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 (etl.py:30-32): epoch seconds + per-row UTC-offset seconds →
    naive local timestamp, pinned UTC."""
    df = events_weather(spark, sf_dir)
    return df.select(
        F.col("event_id"),
        F.col("epoch_s"),
        F.col("tz_offset_s"),
        _local_ts(df).alias("local_ts"),
    )


def q_datetime_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3/F6/F7/F8 (etl.py:36, :55-57): month number, weekday name,
    month name, year — on the local timestamp."""
    df = events_weather(spark, sf_dir)
    local = _local_ts(df)
    return df.select(
        F.col("event_id"),
        F.month(local).alias("month_num"),
        F.date_format(local, "EEEE").alias("weekday_name"),
        F.date_format(local, "MMMM").alias("month_name"),
        F.year(local).alias("year_num"),
        F.dayofmonth(local).alias("day_num"),
        F.hour(local).alias("hour_num"),
    )


def q_bucket_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 (etl.py:37-44): 'Q1'..'Q4' labels, aggregated per bucket."""
    df = events_weather(spark, sf_dir)
    return (
        df.select(quarter_bucket(_local_ts(df)).alias("quarter_label"))
        .groupBy("quarter_label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_bucket_season(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 (etl.py:46-53), incl. the December→Winter wrap."""
    df = events_weather(spark, sf_dir)
    return (
        df.select(season_bucket(_local_ts(df)).alias("season_label"))
        .groupBy("season_label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_ts_diff_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 (etl.py:59-60): whole-minute timestamp difference.
    ``sunset`` simulated as epoch + trunc(value) minutes; the negative
    direction pins our floor semantics (documented divergence from the
    reference's ``timedelta.seconds`` wrap)."""
    df = events_weather(spark, sf_dir)
    sunrise = F.col("epoch_s")
    sunset = F.col("epoch_s") + F.col("value").cast("long") * F.lit(60)
    return df.select(
        F.col("event_id"),
        ts_diff_minutes(sunrise, sunset).alias("daylight_minutes"),
        ts_diff_minutes(sunset, sunrise).alias("neg_minutes"),
    )


def q_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 (etl.py:63-66): date/datetime rendering."""
    df = events_weather(spark, sf_dir)
    local = _local_ts(df)
    return df.select(
        F.col("event_id"),
        F.date_format(local, "yyyy-MM-dd").alias("date_str"),
        F.date_format(local, "yyyy-MM-dd HH:mm:ss").alias("datetime_str"),
    )


def q_derived_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11-F14 (etl.py:78-82): dew point + Steadman heat index on the
    weather-shaped events (temp = value °C-ish, humidity 0..100)."""
    df = events_weather(spark, sf_dir)
    return df.select(
        F.col("event_id"),
        F.col("temp"),
        F.col("humidity"),
        dew_point(F.col("temp"), F.col("humidity")).alias("dew_point"),
        heat_index(F.col("temp"), F.col("humidity")).alias("heat_index"),
    )


def q_fidelity_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated scalar-fidelity query — one pass covering the
    reference's F1-F10 transform set plus P3/P4 (etl.py:26-66):
    defensive casts, epoch+offset→local timestamp, all calendar
    parts, quarter/season buckets, whole-minute diffs, date
    rendering, a range predicate (pushed to the parquet scan) and
    column-drop projection. Single narrow projection — Catalyst
    collapses every expression into the scan stage. The per-function
    single-op twins (q_cast, q_epoch_to_local_ts, ...) remain
    registered for pinpoint debugging."""
    df = events_weather(spark, sf_dir)
    local = _local_ts(df)
    sunset = F.col("epoch_s") + F.col("value").cast("long") * F.lit(60)
    return df.where(F.col("value").between(50.0, 950.0)).select(
        F.col("event_id"),
        F.col("value").cast("long").alias("value_long"),
        F.col("user_id").cast("double").alias("user_id_double"),
        local.alias("local_ts"),
        F.month(local).alias("month_num"),
        F.date_format(local, "EEEE").alias("weekday_name"),
        F.date_format(local, "MMMM").alias("month_name"),
        F.year(local).alias("year_num"),
        F.dayofmonth(local).alias("day_num"),
        F.hour(local).alias("hour_num"),
        quarter_bucket(local).alias("quarter_label"),
        season_bucket(local).alias("season_label"),
        ts_diff_minutes(F.col("epoch_s"), sunset).alias("daylight_minutes"),
        F.date_format(local, "yyyy-MM-dd").alias("date_str"),
        F.date_format(local, "yyyy-MM-dd HH:mm:ss").alias("datetime_str"),
    )


def q_branch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 (etl.py:86-94): the reference recombines two parallel
    transform branches by *list position* — meaningless distributed.
    Re-specified as a keyed equi-join of the two branch outputs on the
    natural key; at scale both branches share one scan and Catalyst
    collapses the self-join of narrow projections."""
    base = events_weather(spark, sf_dir)
    datetime_branch = base.select(
        F.col("event_id"),
        F.date_format(_local_ts(base), "yyyy-MM-dd HH:mm:ss").alias("datetime_str"),
        season_bucket(_local_ts(base)).alias("season"),
    )
    calc_branch = base.select(
        F.col("event_id"),
        dew_point(F.col("temp"), F.col("humidity")).alias("dew_point"),
        heat_index(F.col("temp"), F.col("humidity")).alias("heat_index"),
    )
    return datetime_branch.join(calc_branch, "event_id", "inner")


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_flagship_season_rollup": q_flagship_season_rollup,
    "q_cast": q_cast,
    "q_epoch_to_local_ts": q_epoch_to_local_ts,
    "q_datetime_parts": q_datetime_parts,
    "q_bucket_quarter": q_bucket_quarter,
    "q_bucket_season": q_bucket_season,
    "q_ts_diff_minutes": q_ts_diff_minutes,
    "q_date_format": q_date_format,
    "q_derived_metrics": q_derived_metrics,
    "q_fidelity_datetime": q_fidelity_datetime,
    "q_branch_merge": q_branch_merge,
}
