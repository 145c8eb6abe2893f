"""Unit tests for the fidelity transform core against hand-computed
expectations — the semantic edges flagged in SURVEY §2.3/§5."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import Row, functions as F

from weatherflow_spark.functions.calendar import (
    enrich_datetime,
    epoch_to_local_ts,
    quarter_bucket,
    season_bucket,
    ts_diff_minutes,
)
from weatherflow_spark.functions.numeric import round_half_up
from weatherflow_spark.functions.weather import add_calc_attributes


def _ts(y, m, d, h=0, mi=0, s=0):
    return int(datetime(y, m, d, h, mi, s, tzinfo=timezone.utc).timestamp())


def test_epoch_to_local_ts_negative_offset_crosses_midnight(spark):
    # Station at UTC-5 (reference seed offset -18000, insert_stations):
    # 2024-03-01 02:30 UTC is 2024-02-29 21:30 local — date changes.
    df = spark.createDataFrame([Row(e=_ts(2024, 3, 1, 2, 30), tz=-18000)])
    out = df.select(epoch_to_local_ts(F.col("e"), F.col("tz")).alias("local")).head()
    assert out.local == datetime(2024, 2, 29, 21, 30)


def test_epoch_matches_python_fromtimestamp_utc():
    # Pin the reference semantic: datetime.fromtimestamp(ts+tz) on a
    # UTC worker (etl.py:30-32).
    e, tz = _ts(2024, 7, 15, 23, 10), 19800  # UTC+5:30
    expected = datetime.fromtimestamp(e + tz, tz=timezone.utc).replace(tzinfo=None)
    assert expected == datetime(2024, 7, 16, 4, 40)


def test_season_bucket_december_wrap(spark):
    # etl.py:52: December joins Jan/Feb in Winter.
    rows = [Row(e=_ts(2024, m, 15), tz=0) for m in (12, 1, 2, 3, 5, 6, 8, 9, 11)]
    df = spark.createDataFrame(rows)
    out = df.select(
        season_bucket(epoch_to_local_ts(F.col("e"), F.col("tz"))).alias("s")
    ).collect()
    assert [r.s for r in out] == [
        "Winter", "Winter", "Winter", "Spring", "Spring",
        "Summer", "Summer", "Fall", "Fall",
    ]


def test_quarter_bucket_boundaries(spark):
    rows = [Row(e=_ts(2024, m, 1), tz=0) for m in (1, 3, 4, 6, 7, 9, 10, 12)]
    df = spark.createDataFrame(rows)
    out = df.select(
        quarter_bucket(epoch_to_local_ts(F.col("e"), F.col("tz"))).alias("q")
    ).collect()
    assert [r.q for r in out] == ["Q1", "Q1", "Q2", "Q2", "Q3", "Q3", "Q4", "Q4"]


def test_ts_diff_minutes_positive_and_negative(spark):
    # Positive daylight matches the reference's timedelta.seconds//60;
    # negative documents our floor divergence (SURVEY §2.3 F9).
    sunrise = _ts(2024, 6, 1, 5, 4)
    sunset = _ts(2024, 6, 1, 21, 33)
    df = spark.createDataFrame([Row(a=sunrise, b=sunset)])
    out = df.select(
        ts_diff_minutes(F.col("a"), F.col("b")).alias("pos"),
        ts_diff_minutes(F.col("b"), F.col("a")).alias("neg"),
    ).head()
    ref_pos = (timedelta(seconds=sunset - sunrise)).seconds // 60
    assert out.pos == ref_pos == 989
    assert out.neg == -989  # reference would wrap to 1440-989-1... we don't.


def test_enrich_datetime_full_record(spark):
    # One reference-shaped record end-to-end (FIXTURES.md B2→B3).
    df = spark.createDataFrame(
        [
            Row(
                station_id=1,
                timestamp=_ts(2024, 12, 31, 23, 30),
                sunrise_ts=_ts(2024, 12, 31, 12, 0),
                sunset_ts=_ts(2024, 12, 31, 21, 17),
                timezone=3600,  # UTC+1 → local 2025-01-01 00:30
            )
        ]
    )
    out = enrich_datetime(df).head()
    assert out.recorded_datetime_local == "2025-01-01 00:30:00"
    assert out.recorded_date_local == "2025-01-01"
    assert out.recorded_quarter_local == "Q1"
    assert out.recorded_season_local == "Winter"
    assert out.recorded_weekday_local == "Wednesday"
    assert out.recorded_month_local == "January"
    assert out.recorded_year_local == 2025
    assert out.daylight_duration_minutes == 557
    assert "timestamp" not in out.asDict()  # dropped like etl.py:34


def test_weather_metrics_hand_computed(spark):
    # dew_point: 25 - (100-60)/5 = 17.0 (etl.py:78)
    # heat_index: T_F=77; HI_F=0.5*(77+61+(77-68)*1.2+60*0.094)=0.5*154.44
    #   =77.22; °C=(77.22-32)*5/9=25.1222..→25.12 (etl.py:80-82)
    df = spark.createDataFrame([Row(temp=25.0, humidity=60.0)])
    out = add_calc_attributes(df).head()
    assert out.dew_point == 17.0
    assert abs(out.heat_index - 25.12) < 1e-9


def test_round_half_up_at_ties(spark):
    df = spark.createDataFrame([Row(x=2.675), Row(x=2.665), Row(x=-1.005)])
    out = df.select(round_half_up(F.col("x"), 2).alias("r")).collect()
    # floor(x*100+0.5)/100 on the actual IEEE doubles — matches what
    # Python computes on the same doubles (and DuckDB, bit-for-bit):
    assert out[0].r == 2.68  # 2.675*100 == 267.5 exactly → 268
    assert out[1].r == 2.67  # 2.665*100+0.5 == 267.0 → 267
    assert out[2].r == -1.0  # -1.005*100+0.5 == -99.99…9 → floor -100
