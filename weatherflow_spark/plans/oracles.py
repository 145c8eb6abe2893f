"""DuckDB oracle SQL — ANSI twins of every hash-checkable query.

The driver registers the parquet tables as DuckDB views (``region
nation customer supplier part orders lineitem events documents
embeddings``) and compares row count + schema + order-insensitive
value hash against the Spark result. These strings therefore mirror
the Spark plans *numerically*, not just logically — see the
determinism rules at the top of :mod:`weatherflow_spark.plans.queries`.

DuckDB↔Spark parity notes baked in here:

- DuckDB reads events.ts (parquet TIMESTAMP(NANOS)) truncated to
  microseconds, same as our io-layer normalization.
- ``epoch(ts)`` is double seconds → ``CAST(floor(...) AS BIGINT)``
  matches Spark's timestamp→long cast.
- DuckDB CAST(double AS BIGINT) *rounds*; Spark truncates → oracle
  says ``trunc()`` explicitly wherever Spark casts.
- DuckDB ``month()`` etc. return BIGINT; cast to INTEGER to match
  Spark's int.
- Naive timestamp arithmetic (`TIMESTAMP '1970-01-01' + k seconds`)
  avoids any dependence on the DuckDB session time zone.
"""

from __future__ import annotations

# events dressed as weather records — must mirror queries.events_weather.
EVENTS_SIM = """
    SELECT
        *,
        CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        (user_id % 25 - 12) * 3600 AS tz_offset_s,
        CAST(user_id % 101 AS DOUBLE) AS humidity,
        value AS temp
    FROM events
"""

# naive local timestamp from epoch seconds + offset, TZ-independent.
LOCAL_TS = "TIMESTAMP '1970-01-01 00:00:00' + INTERVAL (epoch_s + tz_offset_s) SECOND"

# Deterministic half-up rounding, mirroring functions/numeric.py
# (plain F.round diverges from DuckDB at decimal ties).
DEW_POINT = "floor((temp - (100.0 - humidity) / 5.0) * 100.0 + 0.5) / 100.0"
_T_F = "(temp * 1.8 + 32.0)"
HEAT_INDEX = (
    f"floor(((0.5 * ({_T_F} + 61.0 + ({_T_F} - 68.0) * 1.2 + humidity * 0.094)"
    " - 32.0) * 5.0 / 9.0) * 100.0 + 0.5) / 100.0"
)

ORACLES: dict[str, str] = {
    "q_flagship_season_rollup": f"""
        WITH w AS ({EVENTS_SIM}),
        t AS (
            SELECT
                CASE
                    WHEN month({LOCAL_TS}) BETWEEN 3 AND 5 THEN 'Spring'
                    WHEN month({LOCAL_TS}) BETWEEN 6 AND 8 THEN 'Summer'
                    WHEN month({LOCAL_TS}) BETWEEN 9 AND 11 THEN 'Fall'
                    ELSE 'Winter'
                END AS season,
                'Q' || CAST(quarter({LOCAL_TS}) AS VARCHAR) AS quarter,
                value
            FROM w
        )
        SELECT
            season,
            quarter,
            count(*) AS n_events,
            round(sum(CAST(round(value * 100.0, 0) AS BIGINT)) / 100.0, 2) AS sum_value
        FROM t
        GROUP BY season, quarter
    """,
    "q_cast": """
        SELECT
            event_id,
            CAST(trunc(value) AS BIGINT) AS value_long,
            CAST(user_id AS DOUBLE) AS user_id_double,
            CAST(CAST(event_id AS VARCHAR) AS BIGINT) AS event_id_roundtrip
        FROM events
    """,
    "q_epoch_to_local_ts": f"""
        WITH w AS ({EVENTS_SIM})
        SELECT event_id, epoch_s, tz_offset_s, {LOCAL_TS} AS local_ts
        FROM w
    """,
    "q_datetime_parts": f"""
        WITH w AS ({EVENTS_SIM})
        SELECT
            event_id,
            CAST(month({LOCAL_TS}) AS INTEGER) AS month_num,
            dayname({LOCAL_TS}) AS weekday_name,
            monthname({LOCAL_TS}) AS month_name,
            CAST(year({LOCAL_TS}) AS INTEGER) AS year_num,
            CAST(day({LOCAL_TS}) AS INTEGER) AS day_num,
            CAST(hour({LOCAL_TS}) AS INTEGER) AS hour_num
        FROM w
    """,
    "q_bucket_quarter": f"""
        WITH w AS ({EVENTS_SIM})
        SELECT
            'Q' || CAST(quarter({LOCAL_TS}) AS VARCHAR) AS quarter_label,
            count(*) AS n
        FROM w
        GROUP BY 1
    """,
    "q_bucket_season": f"""
        WITH w AS ({EVENTS_SIM})
        SELECT
            CASE
                WHEN month({LOCAL_TS}) BETWEEN 3 AND 5 THEN 'Spring'
                WHEN month({LOCAL_TS}) BETWEEN 6 AND 8 THEN 'Summer'
                WHEN month({LOCAL_TS}) BETWEEN 9 AND 11 THEN 'Fall'
                ELSE 'Winter'
            END AS season_label,
            count(*) AS n
        FROM w
        GROUP BY 1
    """,
    "q_ts_diff_minutes": f"""
        WITH w AS ({EVENTS_SIM}),
        t AS (
            SELECT
                event_id,
                epoch_s AS sunrise_s,
                epoch_s + CAST(trunc(value) AS BIGINT) * 60 AS sunset_s
            FROM w
        )
        SELECT
            event_id,
            CAST(floor((sunset_s - sunrise_s) / 60.0) AS BIGINT) AS daylight_minutes,
            CAST(floor((sunrise_s - sunset_s) / 60.0) AS BIGINT) AS neg_minutes
        FROM t
    """,
    "q_date_format": f"""
        WITH w AS ({EVENTS_SIM})
        SELECT
            event_id,
            strftime({LOCAL_TS}, '%Y-%m-%d') AS date_str,
            strftime({LOCAL_TS}, '%Y-%m-%d %H:%M:%S') AS datetime_str
        FROM w
    """,
    "q_derived_metrics": f"""
        WITH w AS ({EVENTS_SIM})
        SELECT
            event_id,
            temp,
            humidity,
            {DEW_POINT} AS dew_point,
            {HEAT_INDEX} AS heat_index
        FROM w
    """,
    "q_branch_merge": f"""
        WITH w AS ({EVENTS_SIM}),
        datetime_branch AS (
            SELECT
                event_id,
                strftime({LOCAL_TS}, '%Y-%m-%d %H:%M:%S') AS datetime_str,
                CASE
                    WHEN month({LOCAL_TS}) BETWEEN 3 AND 5 THEN 'Spring'
                    WHEN month({LOCAL_TS}) BETWEEN 6 AND 8 THEN 'Summer'
                    WHEN month({LOCAL_TS}) BETWEEN 9 AND 11 THEN 'Fall'
                    ELSE 'Winter'
                END AS season
            FROM w
        ),
        calc_branch AS (
            SELECT
                event_id,
                {DEW_POINT} AS dew_point,
                {HEAT_INDEX} AS heat_index
            FROM w
        )
        SELECT d.event_id, d.datetime_str, d.season, c.dew_point, c.heat_index
        FROM datetime_branch d
        JOIN calc_branch c USING (event_id)
    """,
}
