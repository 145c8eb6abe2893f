"""Time-series gap filling with linear interpolation.

The reference's whole domain is periodic weather observations
(dags/weather_etl.py polls every 5 minutes); real feeds drop
readings, so the canonical downstream repair is: regularize onto a
dense time spine, then fill the holes — forward/backward fill at the
series edges, linear interpolation between the surrounding
observations inside. This module expresses that as pure DataFrame
ops, hash-checkable against a DuckDB twin.

Algorithm (per series key, here ``event_type``):

1. **Observe** — hourly buckets with exact integer-cents averages
   (order-independent: ``sum(floor(v*100+0.5))`` / ``100*count``).
2. **Spine** — one global ``[min_hour, max_hour]`` bound (single tiny
   agg) cross-joined with the key set; per-key dense hours come from
   ``sequence()`` + ``explode`` — generated inside the task, never on
   the driver.
3. **Fill** — one window pass per direction on the (key)-partitioned
   hour order: ``last(value, ignorenulls)`` over the preceding frame
   gives the previous observation (value and hour), ``first(...,
   ignorenulls)`` over the following frame the next; the fill is
   - the observed value where one exists,
   - prev + (next-prev) * (t-t_prev)/(t_next-t_prev) strictly inside
     a gap (all-double arithmetic with a pinned operation order, so
     both engines produce bit-identical IEEE results),
   - forward/backward fill at the edges.

Scale posture (100 TB): the spine is |keys| x |hours| rows built by a
narrow per-key generator — no driver loop, no cross join of big
relations (the bounds relation is one broadcast row). The two window
passes shuffle once on the series key; a station-keyed deployment
partitions perfectly (each series sorts independently). Nothing is
quadratic in series length.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from weatherflow_spark.io import load_table

GAP_FILL_KEY = "event_type"


def q_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly mean `value` per event_type on a dense shared hour
    spine; missing hours linearly interpolated (edges ffill/bfill).
    Output: one row per (event_type, hour) with the fill and an
    is_observed flag."""
    ev = load_table(spark, sf_dir, "events")
    obs = (
        ev.groupBy(
            F.col(GAP_FILL_KEY).alias("series_key"),
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "series_key",
            "bucket",
            (F.col("s") / (F.lit(100.0) * F.col("n"))).alias("obs_avg"),
        )
    )
    bounds = ev.agg(
        F.min(F.date_trunc("hour", F.col("ts"))).alias("lo"),
        F.max(F.date_trunc("hour", F.col("ts"))).alias("hi"),
    )
    keys = ev.select(F.col(GAP_FILL_KEY).alias("series_key")).distinct()
    spine = keys.crossJoin(F.broadcast(bounds)).select(
        "series_key",
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("bucket"),
    )
    w_prev = (
        Window.partitionBy("series_key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("series_key")
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    eh = F.col("bucket").cast("timestamp").cast("long")
    obs_h = F.when(F.col("obs_avg").isNotNull(), eh)
    filled = (
        spine.join(obs, ["series_key", "bucket"], "left")
        .withColumn("prev_v", F.last("obs_avg", ignorenulls=True).over(w_prev))
        .withColumn("prev_h", F.last(obs_h, ignorenulls=True).over(w_prev))
        .withColumn("next_v", F.first("obs_avg", ignorenulls=True).over(w_next))
        .withColumn("next_h", F.first(obs_h, ignorenulls=True).over(w_next))
    )
    frac = (eh.cast("double") - F.col("prev_h").cast("double")) / (
        F.col("next_h").cast("double") - F.col("prev_h").cast("double")
    )
    fill = (
        F.when(F.col("obs_avg").isNotNull(), F.col("obs_avg"))
        .when(
            F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac,
        )
        .otherwise(F.coalesce(F.col("prev_v"), F.col("next_v")))
    )
    return filled.select(
        "series_key",
        "bucket",
        F.col("obs_avg").isNotNull().alias("is_observed"),
        fill.alias("filled_value"),
    )


ORACLE_GAP_FILL_INTERPOLATE = """
    WITH obs AS (
        SELECT
            event_type AS series_key,
            date_trunc('hour', ts) AS bucket,
            sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                / (100.0 * count(*)) AS obs_avg
        FROM events
        GROUP BY 1, 2
    ),
    bounds AS (
        SELECT min(date_trunc('hour', ts)) AS lo,
               max(date_trunc('hour', ts)) AS hi
        FROM events
    ),
    spine AS (
        SELECT k.series_key, s.bucket
        FROM (SELECT DISTINCT event_type AS series_key FROM events) k
        CROSS JOIN (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
            FROM bounds
        ) s
    ),
    marked AS (
        SELECT
            spine.series_key,
            spine.bucket,
            obs.obs_avg,
            CAST(floor(epoch(spine.bucket)) AS BIGINT) AS eh,
            CASE WHEN obs.obs_avg IS NOT NULL
                 THEN CAST(floor(epoch(spine.bucket)) AS BIGINT) END AS oh
        FROM spine LEFT JOIN obs USING (series_key, bucket)
    ),
    winged AS (
        SELECT
            series_key, bucket, obs_avg, eh,
            last_value(obs_avg IGNORE NULLS) OVER wp AS prev_v,
            last_value(oh IGNORE NULLS) OVER wp AS prev_h,
            first_value(obs_avg IGNORE NULLS) OVER wn AS next_v,
            first_value(oh IGNORE NULLS) OVER wn AS next_h
        FROM marked
        WINDOW
            wp AS (PARTITION BY series_key ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            wn AS (PARTITION BY series_key ORDER BY bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT
        series_key,
        bucket,
        obs_avg IS NOT NULL AS is_observed,
        CASE
            WHEN obs_avg IS NOT NULL THEN obs_avg
            WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                prev_v + (next_v - prev_v)
                    * ((CAST(eh AS DOUBLE) - CAST(prev_h AS DOUBLE))
                       / (CAST(next_h AS DOUBLE) - CAST(prev_h AS DOUBLE)))
            ELSE coalesce(prev_v, next_v)
        END AS filled_value
    FROM winged
"""


# ---------------------------------------------------------------------------
# q_ewma — E45: per-key exponential smoothing (EWMA)
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.25  # exactly representable in binary, so α·(x−s) is a
# pinned-order IEEE op sequence both engines replay bit-identically


def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of the event
    value — the classic streaming smoother (s ← s + α·(x − s), seeded
    with the first observation). EWMA is inherently sequential, which
    a naive window can't express; here each user's series is folded
    in event order inside ONE user-keyed aggregation: a custom
    ``array_sort`` comparator over (ts, event_id) pins the order —
    event_id breaks ts ties, and ``value`` is deliberately NOT part
    of the comparator so both engines order by exactly (ts, event_id)
    (the DuckDB twin's ``list(... ORDER BY ts, event_id)``) — then an
    ``aggregate`` fold runs the recurrence. Precondition (checked by
    q_data_quality_report): event_id is unique per (user_id, ts) and
    value is non-null — a duplicate (ts, event_id) makes any engine's
    order arbitrary, and a NULL value poisons the whole fold.
    Per-key state is one array bounded by the user's
    own event count — never corpus-scale — and the single shuffle is
    the user_id exchange; at 100 TB per-key series stay bounded by
    retention, the same contract as session windows. DuckDB twin:
    ``list_reduce`` (first element is the seed, matching the Spark
    slice-and-seed fold exactly)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    g = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(
            "transform(array_sort(collect_list(struct(ts, event_id, value)), "
            "(a, b) -> CASE WHEN a.ts < b.ts THEN -1 WHEN a.ts > b.ts THEN 1 "
            "WHEN a.event_id < b.event_id THEN -1 "
            "WHEN a.event_id > b.event_id THEN 1 ELSE 0 END), "
            "e -> e.value)"
        ).alias("vals"),
    )
    fold = (
        "aggregate(slice(vals, 2, size(vals) - 1), element_at(vals, 1), "
        f"(acc, x) -> acc + cast({EWMA_ALPHA} as double) * (x - acc))"
    )
    return g.select(
        "user_id",
        "n_events",
        F.expr(f"cast(floor(({fold}) * 1e6 + 0.5) as bigint)").alias("ewma_e6"),
    )


ORACLE_EWMA = f"""
    WITH g AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               list(value ORDER BY ts ASC, event_id ASC) AS vals
        FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           CAST(floor(list_reduce(vals,
               (acc, x) -> acc + CAST({EWMA_ALPHA} AS DOUBLE) * (x - acc))
               * 1e6 + 0.5) AS BIGINT) AS ewma_e6
    FROM g
"""


# ---------------------------------------------------------------------------
# q_timeseries_suite — certification row: gap fill + EWMA, one hash
# ---------------------------------------------------------------------------
# q_seasonal_anomaly — E73: seasonal-baseline residual anomaly detection
# ---------------------------------------------------------------------------

ANOM_TOP = 25


def q_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly detection — the ops-monitoring
    primitive over the event stream: fit a (event_type × hour-of-day)
    baseline (the dominant seasonality of product metrics), score
    every event by its residual z-score against that cell, surface
    the top anomalies. The poor-man's STL that catches what a global
    z-score can't (a value normal at noon is an anomaly at 4am).

    Exactness discipline: values quantize to integer cents; each
    cell's (n, Σc, Σc²) are EXACT int64 partials (map-side combine,
    one bounded-group exchange — the q_stats_moments pattern), and
    mean/std materialize as single correctly-rounded double ops
    identical in both engines. The baseline table (≤ types×24 rows)
    broadcasts back; scoring is narrow; the anomaly list is a heap
    top-{ANOM_TOP} on the e6-pinned |z| with event_id tie-break.
    Cells with fewer than 2 events or zero variance score NULL and
    are excluded (documented: no z against a degenerate baseline).
    The degeneracy guard and the z itself both evaluate in DOUBLE;
    the int64 cell partials (s1, s2) remain exact up to ~1e18, i.e.
    ~1e10 rows per (type, hour) cell at cent precision — beyond that,
    re-bucket by (type, hour, day-shard) before the final combine."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.hour("ts").alias("hod"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    base = ev.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.expr("c * c")).alias("s2"),
    )
    scored = ev.join(F.broadcast(base), ["event_type", "hod"]).select(
        "event_id",
        "event_type",
        "hod",
        "c",
        # The degenerate-variance guard evaluates in DOUBLE, matching
        # the z expression: n*s2 - s1*s1 in int64 overflows at large
        # event volumes (s2 = Σc² ~ n·c²), where Spark wraps silently
        # and DuckDB raises — either way a cross-engine divergence.
        F.expr(
            "CASE WHEN n < 2 OR "
            "(cast(n as double) * s2 - cast(s1 as double) * s1) <= 0 THEN NULL "
            "ELSE cast(floor((cast(c as double) - cast(s1 as double) / n) "
            "/ sqrt((cast(n as double) * s2 - cast(s1 as double) * s1) "
            "/ (cast(n as double) * (n - 1))) * 1e6 + 0.5) as bigint) END"
        ).alias("z_e6"),
    )
    return (
        scored.where(F.col("z_e6").isNotNull())
        .orderBy(F.desc(F.abs(F.col("z_e6"))), F.asc("event_id"))
        .limit(ANOM_TOP)
    )


ORACLE_SEASONAL_ANOMALY = f"""
    WITH ev AS (
        SELECT event_id, event_type,
               CAST(hour(ts) AS INTEGER) AS hod,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        FROM events
    ),
    base AS (
        SELECT event_type, hod, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS s1,
               CAST(sum(c * c) AS BIGINT) AS s2
        FROM ev GROUP BY event_type, hod
    ),
    scored AS (
        SELECT e.event_id, e.event_type, e.hod, e.c,
               CASE WHEN b.n < 2 OR (CAST(b.n AS DOUBLE) * b.s2
                         - CAST(b.s1 AS DOUBLE) * b.s1) <= 0 THEN NULL
                    ELSE CAST(floor((CAST(e.c AS DOUBLE) - CAST(b.s1 AS DOUBLE) / b.n)
                        / sqrt((CAST(b.n AS DOUBLE) * b.s2 - CAST(b.s1 AS DOUBLE) * b.s1)
                        / (CAST(b.n AS DOUBLE) * (b.n - 1))) * 1e6 + 0.5) AS BIGINT)
               END AS z_e6
        FROM ev e JOIN base b ON b.event_type = e.event_type AND b.hod = e.hod
    )
    SELECT event_id, event_type, hod, c, z_e6
    FROM scored WHERE z_e6 IS NOT NULL
    ORDER BY abs(z_e6) DESC, event_id ASC
    LIMIT {ANOM_TOP}
"""


# ---------------------------------------------------------------------------


def q_timeseries_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series certification row: the dense-spine gap fill (E22)
    and the per-user EWMA recurrence (E45), tagged and unioned in
    LONG format — (op, key, metric, value:bigint), doubles re-rounded
    to e6 integers. Union is plan-level only; single-op twins stay
    registered in the tail."""
    gf = q_gap_fill_interpolate(spark, sf_dir).selectExpr(
        "'gap_fill' AS op",
        "concat(series_key, '|', date_format(bucket, 'yyyy-MM-dd HH')) AS key",
        "stack(2, 'is_observed', cast(is_observed as bigint), "
        "'filled_e6', cast(floor(filled_value * 1e6 + 0.5) as bigint)) "
        "AS (metric, value)",
    )
    ew = q_ewma(spark, sf_dir).selectExpr(
        "'ewma' AS op",
        "cast(user_id as string) AS key",
        "stack(2, 'n_events', n_events, 'ewma_e6', ewma_e6) AS (metric, value)",
    )
    # E73: the seasonal-baseline anomaly list.
    an = q_seasonal_anomaly(spark, sf_dir).selectExpr(
        "'anomaly' AS op",
        "concat(cast(event_id as string), '@', event_type, ':', "
        "cast(hod as string)) AS key",
        "stack(2, 'c', c, 'z_e6', z_e6) AS (metric, value)",
    )
    return gf.unionByName(ew).unionByName(an)


ORACLE_TIMESERIES_SUITE = f"""
    WITH gf_side AS ({ORACLE_GAP_FILL_INTERPOLATE}),
    ew_side AS ({ORACLE_EWMA}),
    an_side AS ({ORACLE_SEASONAL_ANOMALY})
    SELECT 'gap_fill' AS op,
           series_key || '|' || strftime(bucket, '%Y-%m-%d %H') AS key,
           'is_observed' AS metric,
           CAST(is_observed AS BIGINT) AS value
    FROM gf_side
    UNION ALL
    SELECT 'gap_fill', series_key || '|' || strftime(bucket, '%Y-%m-%d %H'),
           'filled_e6', CAST(floor(filled_value * 1e6 + 0.5) AS BIGINT)
    FROM gf_side
    UNION ALL
    SELECT 'ewma', CAST(user_id AS VARCHAR), 'n_events', n_events FROM ew_side
    UNION ALL
    SELECT 'ewma', CAST(user_id AS VARCHAR), 'ewma_e6', ewma_e6 FROM ew_side
    UNION ALL
    SELECT 'anomaly',
           CAST(event_id AS VARCHAR) || '@' || event_type || ':'
               || CAST(hod AS VARCHAR),
           'c', c
    FROM an_side
    UNION ALL
    SELECT 'anomaly',
           CAST(event_id AS VARCHAR) || '@' || event_type || ':'
               || CAST(hod AS VARCHAR),
           'z_e6', z_e6
    FROM an_side
"""


TIMESERIES_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_gap_fill_interpolate": q_gap_fill_interpolate,
    "q_ewma": q_ewma,
    "q_seasonal_anomaly": q_seasonal_anomaly,
    "q_timeseries_suite": q_timeseries_suite,
}

TIMESERIES_ORACLES: dict[str, str] = {
    "q_gap_fill_interpolate": ORACLE_GAP_FILL_INTERPOLATE,
    "q_ewma": ORACLE_EWMA,
    "q_seasonal_anomaly": ORACLE_SEASONAL_ANOMALY,
    "q_timeseries_suite": ORACLE_TIMESERIES_SUITE,
}
