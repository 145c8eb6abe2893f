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

# exact integer-scaled sum (mirrors queries.scaled_sum)
def _ssum(expr: str, scale: int = 100) -> str:
    p = float(scale)
    return f"sum(CAST(floor(({expr}) * {p} + 0.5) AS BIGINT)) / {p}"


# surrogate key (mirrors operators/star.surrogate_key)
def _skey(tag: str, key: str = "event_id") -> str:
    return f"sha256(concat_ws('|', CAST({key} AS VARCHAR), '{tag}'))"


SEASON_SQL = (
    "CASE WHEN month({ts}) BETWEEN 3 AND 5 THEN 'Spring' "
    "WHEN month({ts}) BETWEEN 6 AND 8 THEN 'Summer' "
    "WHEN month({ts}) BETWEEN 9 AND 11 THEN 'Fall' ELSE 'Winter' END"
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
            round(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0, 2) AS sum_value
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
    "q_fidelity_datetime": f"""
        WITH w AS ({EVENTS_SIM})
        SELECT
            event_id,
            CAST(trunc(value) AS BIGINT) AS value_long,
            CAST(user_id AS DOUBLE) AS user_id_double,
            {LOCAL_TS} AS local_ts,
            CAST(month({LOCAL_TS}) AS INTEGER) AS month_num,
            dayname({LOCAL_TS}) AS weekday_name,
            monthname({LOCAL_TS}) AS month_name,
            CAST(year({LOCAL_TS}) AS INTEGER) AS year_num,
            CAST(day({LOCAL_TS}) AS INTEGER) AS day_num,
            CAST(hour({LOCAL_TS}) AS INTEGER) AS hour_num,
            'Q' || CAST(quarter({LOCAL_TS}) AS VARCHAR) AS quarter_label,
            {SEASON_SQL.format(ts=LOCAL_TS)} AS season_label,
            CAST(floor(((epoch_s + CAST(trunc(value) AS BIGINT) * 60) - epoch_s) / 60.0)
                 AS BIGINT) AS daylight_minutes,
            strftime({LOCAL_TS}, '%Y-%m-%d') AS date_str,
            strftime({LOCAL_TS}, '%Y-%m-%d %H:%M:%S') AS datetime_str
        FROM w
        WHERE value BETWEEN 50.0 AND 950.0
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

# ---------------------------------------------------------------------------
# relational surface (plans/relational.py)
# ---------------------------------------------------------------------------

ORACLES.update(
    {
        "q_scan_filter_project": """
            SELECT c_custkey, c_name, c_acctbal
            FROM customer
            WHERE c_mktsegment = 'FURNITURE' AND c_acctbal > 1000.0
        """,
        "q_json_extract": """
            SELECT
                event_id,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
            FROM events
        """,
        "q_star_build": f"""
            SELECT
                {_skey('record')} AS record_id,
                user_id AS station_id,
                {_skey('time')} AS time_id,
                {_skey('param')} AS parameter_id,
                {_skey('temp')} AS temp_id,
                {_skey('heat_index')} AS heat_index_id
            FROM events
        """,
        "q_star_time_dim": f"""
            WITH w AS ({EVENTS_SIM})
            SELECT
                {_skey('time')} AS time_id,
                strftime({LOCAL_TS}, '%Y-%m-%d %H:%M:%S') AS recorded_datetime_local,
                strftime({LOCAL_TS}, '%Y-%m-%d') AS recorded_date_local,
                monthname({LOCAL_TS}) AS recorded_month_local,
                'Q' || CAST(quarter({LOCAL_TS}) AS VARCHAR) AS recorded_quarter_local,
                {SEASON_SQL.format(ts=LOCAL_TS)} AS recorded_season_local,
                dayname({LOCAL_TS}) AS recorded_weekday_local,
                CAST(year({LOCAL_TS}) AS INTEGER) AS recorded_year_local
            FROM w
        """,
        "q_star_join_agg": f"""
            SELECT
                n_name,
                count(*) AS n_items,
                {_ssum('l_extendedprice * (1.0 - l_discount)', 10000)} AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "q_join_left": f"""
            SELECT
                c_custkey,
                count(o_orderkey) AS n_orders,
                coalesce({_ssum('o_totalprice')}, 0.0) AS total_spend
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        """,
        "q_join_semi": """
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        """,
        "q_join_anti": """
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        """,
        "q_join_semi_anti": """
            SELECT o_orderkey, o_totalprice, 'semi' AS side
            FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
            UNION ALL
            SELECT o_orderkey, o_totalprice, 'anti' AS side
            FROM orders
            WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        """,
        "q_groupby_agg": f"""
            SELECT
                l_returnflag,
                l_linestatus,
                sum(l_quantity) AS sum_qty,
                {_ssum('l_extendedprice')} AS sum_base_price,
                {_ssum('l_extendedprice * (1.0 - l_discount)', 10000)} AS sum_disc_price,
                {_ssum('l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)', 1000000)} AS sum_charge,
                sum(l_quantity) / count(*) AS avg_qty,
                {_ssum('l_extendedprice')} / count(*) AS avg_price,
                {_ssum('l_discount')} AS sum_disc,
                count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q_count_distinct": """
            SELECT
                o_orderpriority,
                count(DISTINCT o_custkey) AS n_customers,
                count(*) AS n_orders
            FROM orders
            GROUP BY o_orderpriority
        """,
        "q_rollup_time": f"""
            WITH t AS (
                SELECT
                    CAST(year(o_orderdate) AS INTEGER) AS order_year,
                    'Q' || CAST(quarter(o_orderdate) AS VARCHAR) AS order_quarter,
                    o_totalprice
                FROM orders
            )
            SELECT
                order_year,
                order_quarter,
                count(*) AS n_orders,
                {_ssum('o_totalprice')} AS total_price
            FROM t
            GROUP BY ROLLUP (order_year, order_quarter)
        """,
        "q_window_rank": """
            SELECT user_id, event_id, ts, value
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC
            ) = 1
        """,
        "q_window_lag": """
            SELECT
                event_id,
                user_id,
                value,
                lag(value) OVER w AS prev_value,
                value - lag(value) OVER w AS delta
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "q_window_moving_avg": """
            SELECT
                event_id,
                user_id,
                value,
                sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER w
                    / (100.0 * count(*) OVER w) AS moving_avg
            FROM events
            WINDOW w AS (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
            )
        """,
        "q_window_suite": """
            SELECT
                event_id,
                user_id,
                value,
                CAST(row_number() OVER (
                    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                ) AS INTEGER) AS recency_rank,
                lag(value) OVER wa AS prev_value,
                value - lag(value) OVER wa AS delta,
                sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER wf
                    / (100.0 * count(*) OVER wf) AS moving_avg
            FROM events
            WINDOW
                wa AS (PARTITION BY user_id ORDER BY ts, event_id),
                wf AS (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
                )
        """,
        "q_join_mix": f"""
            SELECT
                'left' AS side,
                c_custkey AS key_id,
                count(o_orderkey) AS n,
                coalesce({_ssum('o_totalprice')}, 0.0) AS amount
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
            UNION ALL
            SELECT 'semi' AS side, o_orderkey AS key_id,
                   CAST(1 AS BIGINT) AS n, o_totalprice AS amount
            FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
            UNION ALL
            SELECT 'anti' AS side, o_orderkey AS key_id,
                   CAST(0 AS BIGINT) AS n, o_totalprice AS amount
            FROM orders
            WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        """,
        "q_sort": """
            WITH top AS (
                SELECT o_orderkey, o_totalprice
                FROM orders
                ORDER BY o_totalprice DESC, o_orderkey ASC
                LIMIT 1000
            )
            SELECT
                CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC)
                     AS INTEGER) AS sort_rank,
                o_orderkey,
                o_totalprice
            FROM top
        """,
        "q_topk": """
            SELECT p_partkey, p_name, p_retailprice
            FROM part
            ORDER BY p_retailprice DESC, p_partkey ASC
            LIMIT 10
        """,
        "q_order_suite": """
            WITH top AS (
                SELECT o_orderkey, o_totalprice
                FROM orders
                ORDER BY o_totalprice DESC, o_orderkey ASC
                LIMIT 1000
            ),
            ranked AS (
                SELECT row_number() OVER (
                           ORDER BY o_totalprice DESC, o_orderkey ASC
                       ) AS sort_rank,
                       o_orderkey, o_totalprice
                FROM top
            ),
            tk AS (
                SELECT p_partkey, p_name, p_retailprice
                FROM part
                ORDER BY p_retailprice DESC, p_partkey ASC
                LIMIT 10
            )
            SELECT 'sort' AS op, CAST(sort_rank AS VARCHAR) AS key,
                   'key_id' AS metric, CAST(o_orderkey AS BIGINT) AS value
            FROM ranked
            UNION ALL
            SELECT 'sort', CAST(sort_rank AS VARCHAR), 'price_cents',
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
            FROM ranked
            UNION ALL
            SELECT 'topk', CAST(p_partkey AS VARCHAR), 'price_cents',
                   CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
            FROM tk
            UNION ALL
            SELECT 'topk', CAST(p_partkey AS VARCHAR), 'name_len',
                   CAST(length(p_name) AS BIGINT)
            FROM tk
        """,
        "q_union": """
            SELECT p_partkey, p_size, p_brand FROM part WHERE p_size <= 10
            UNION ALL
            SELECT p_partkey, p_size, p_brand FROM part WHERE p_size >= 40
        """,
        "q_except": """
            SELECT p_partkey FROM part
            EXCEPT
            SELECT p_partkey FROM part WHERE p_size > 20
        """,
        "q_intersect": """
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'FURNITURE'
            INTERSECT
            SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
        """,
        "q_set_ops": """
            SELECT 'union_all' AS op, p_partkey AS key_id FROM part WHERE p_size <= 10
            UNION ALL
            SELECT 'union_all' AS op, p_partkey AS key_id FROM part WHERE p_size >= 40
            UNION ALL
            SELECT 'except' AS op, key_id FROM (
                SELECT p_partkey AS key_id FROM part
                EXCEPT
                SELECT p_partkey AS key_id FROM part WHERE p_size > 20
            )
            UNION ALL
            SELECT 'intersect' AS op, key_id FROM (
                SELECT c_custkey AS key_id FROM customer WHERE c_mktsegment = 'FURNITURE'
                INTERSECT
                SELECT c_custkey AS key_id FROM customer WHERE c_acctbal > 5000.0
            )
        """,
        "q_tumbling_window_agg": f"""
            SELECT
                date_trunc('hour', ts) AS window_start,
                count(*) AS n_events,
                {_ssum('value')} AS sum_value
            FROM events
            GROUP BY 1
        """,
    }
)
