"""Calendar / datetime enrichment (reference F1-F10).

Behavioral spec: reference ``dags/etl.py:20-69`` (``enrich_datetime``
task). The reference iterates records as ``pd.Series`` and mutates
them field-by-field; here each derivation is one Catalyst column
expression and the whole enrichment is a single narrow projection —
no shuffle, fully inside whole-stage codegen, identical cost per row
at 6 k rows or 100 TB.

Timezone semantics (reference etl.py:30-32): the reference calls
``datetime.fromtimestamp(ts + timezone)`` — epoch seconds plus the
station's UTC-offset seconds rendered as a *naive* local timestamp,
implicitly assuming a UTC worker. We pin that intent explicitly:
``timestamp_seconds(ts + offset)`` under ``session.timeZone=UTC``,
cast to TIMESTAMP_NTZ. Per-row integer offsets rule out
``from_utc_timestamp`` (which wants zone *names*).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def epoch_to_local_ts(epoch_s: Column, tz_offset_s: Column) -> Column:
    """Naive local timestamp from epoch seconds + UTC-offset seconds.

    Spec: reference dags/etl.py:30-32 (``datetime.fromtimestamp(v + tz)``).
    """
    return F.timestamp_seconds(epoch_s.cast("long") + tz_offset_s.cast("long")).cast(
        "timestamp_ntz"
    )


def quarter_bucket(ts: Column) -> Column:
    """Calendar-quarter label "Q1".."Q4".

    Spec: reference dags/etl.py:37-44 (month-range if/elif chain).
    ``concat("Q", quarter(ts))`` is semantically identical and folds
    to one codegen expression.
    """
    return F.concat(F.lit("Q"), F.quarter(ts).cast("string"))


def season_bucket(ts: Column) -> Column:
    """Meteorological northern-hemisphere season label.

    Spec: reference dags/etl.py:46-53 — months 3-5 Spring, 6-8 Summer,
    9-11 Fall, and December wraps with Jan/Feb into Winter (etl.py:52).
    """
    m = F.month(ts)
    return (
        F.when(m.between(3, 5), F.lit("Spring"))
        .when(m.between(6, 8), F.lit("Summer"))
        .when(m.between(9, 11), F.lit("Fall"))
        .otherwise(F.lit("Winter"))
    )


def ts_diff_minutes(start_epoch_s: Column, end_epoch_s: Column) -> Column:
    """Whole minutes between two epoch-second instants.

    Spec: reference dags/etl.py:59-60 computes
    ``(sunset - sunrise).seconds // 60``. ``timedelta.seconds`` is the
    sub-day component, which silently wraps for negative deltas; the
    intended semantic (daylight duration, always 0..24 h) is
    ``floor((end - start) / 60)``, which we implement. Documented
    divergence: for end < start the reference wraps modulo 24 h, we
    return a negative number (tested in tests/test_calendar.py).
    """
    return F.floor((end_epoch_s.cast("long") - start_epoch_s.cast("long")) / F.lit(60)).cast(
        "long"
    )


def enrich_datetime(
    df: DataFrame,
    ts_col: str = "timestamp",
    tz_col: str = "timezone",
    sunrise_col: str = "sunrise_ts",
    sunset_col: str = "sunset_ts",
    drop_raw: bool = True,
) -> DataFrame:
    """The reference's ``enrich_datetime`` task as one projection.

    Spec: reference dags/etl.py:20-69. Input columns are epoch seconds
    (``ts_col``, ``sunrise_col``, ``sunset_col``) and UTC-offset
    seconds (``tz_col``); the int() casts at etl.py:26-28 are the
    ``cast("long")`` here. Output columns mirror etl.py:30-66:

    - recorded/sunrise/sunset local naive timestamps, rendered
      'yyyy-MM-dd HH:mm:ss' (etl.py:64-66)
    - recorded_date_local 'yyyy-MM-dd' (etl.py:63)
    - month/quarter/season/weekday/monthname/year attributes
      (etl.py:36-57)
    - daylight_duration_minutes (etl.py:59-60)

    The raw epoch columns are dropped like etl.py:34 when
    ``drop_raw``. One narrow projection: Catalyst collapses all of it
    into the scan's whole-stage-codegen stage.
    """
    ts = epoch_to_local_ts(F.col(ts_col), F.col(tz_col))
    sunrise = epoch_to_local_ts(F.col(sunrise_col), F.col(tz_col))
    sunset = epoch_to_local_ts(F.col(sunset_col), F.col(tz_col))

    out = df.withColumns(
        {
            "recorded_month_num_local": F.month(ts),
            "recorded_quarter_local": quarter_bucket(ts),
            "recorded_season_local": season_bucket(ts),
            "recorded_weekday_local": F.date_format(ts, "EEEE"),
            "recorded_month_local": F.date_format(ts, "MMMM"),
            "recorded_year_local": F.year(ts),
            "daylight_duration_minutes": ts_diff_minutes(
                F.col(sunrise_col), F.col(sunset_col)
            ),
            "recorded_date_local": F.date_format(ts, "yyyy-MM-dd"),
            "recorded_datetime_local": F.date_format(ts, "yyyy-MM-dd HH:mm:ss"),
            "sunrise_datetime_local": F.date_format(sunrise, "yyyy-MM-dd HH:mm:ss"),
            "sunset_datetime_local": F.date_format(sunset, "yyyy-MM-dd HH:mm:ss"),
        }
    )
    if drop_raw:
        out = out.drop(ts_col, sunrise_col, sunset_col)
    return out
