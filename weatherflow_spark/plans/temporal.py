"""Temporal join operators + multi-grain aggregates (extension of
SURVEY §2.4/§2.5: the reference has no joins at all beyond the
positional zip-merge; as-of and range joins are the temporal
workhorses of event/training-data pipelines, and cube/grouping-sets
complete the multi-grain rollup family started by ``q_rollup_time``).

Scale design:

- **As-of join** is implemented as union + one window pass (single
  shuffle on the join key, state = one row per stream element), NOT
  as an inequality join + argmax — the naive form materializes every
  (probe, all-preceding-build) pair, which is quadratic per key.
  This is the standard distributed as-of algorithm (kdb's aj /
  Flink's temporal join equivalent).
- **Range join** keeps an equality key (user) so Spark plans a hash
  join with the interval predicate as a post-join filter — linear in
  matches. A pure range join (no equi key) would need time-bucket
  blocking: join on overlapping coarse buckets, then filter exactly;
  noted here, not required by any workload shape we have.
- **cube/rollup/grouping sets** are native Catalyst expansions (one
  shuffle, grouping-id column distinguishes grains).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from weatherflow_spark.io import load_table
from weatherflow_spark.plans.queries import cents_sum, scaled_sum_sql


def _epoch_s(c: F.Column) -> F.Column:
    return c.cast("timestamp").cast("long")


# ---------------------------------------------------------------------------
# q_asof_join — attribution: latest 'view' before each 'purchase'
# ---------------------------------------------------------------------------


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, the same user's latest view event at
    or before the purchase time (classic attribution as-of join).

    Union-window algorithm: tag both sides, union, and take
    ``last(view_cols, ignorenulls)`` over a (user_id)-partitioned
    window ordered by (ts, side) — views sort before purchases at
    equal ts, giving the ASOF ``<=`` tie semantic. One shuffle total;
    no pairwise blowup. View-side ties at identical (user_id, ts) are
    pre-collapsed to max(event_id) so both engines pick the same row.
    """
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
        .select(
            "user_id",
            "ts",
            "view_id",
            F.lit(0).alias("side"),
            F.lit(None).cast("long").alias("purchase_id"),
        )
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("view_id"),
        F.lit(1).alias("side"),
        F.col("event_id").alias("purchase_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        views.unionByName(purchases)
        .withColumn("asof_view_id", F.last("view_id", ignorenulls=True).over(w))
        .withColumn(
            "asof_view_ts",
            F.last(F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True).over(w),
        )
    )
    return merged.where(F.col("side") == 1).select(
        F.col("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("asof_view_id").alias("view_id"),
        F.col("asof_view_ts").alias("view_ts"),
        (_epoch_s(F.col("ts")) - _epoch_s(F.col("asof_view_ts"))).alias("gap_s"),
    )


ORACLE_ASOF_JOIN = """
    WITH v AS (
        SELECT user_id, ts, max(event_id) AS view_id
        FROM events WHERE event_type = 'view'
        GROUP BY user_id, ts
    ),
    p AS (
        SELECT event_id AS purchase_id, user_id, ts
        FROM events WHERE event_type = 'purchase'
    )
    SELECT
        p.purchase_id, p.user_id, p.ts AS purchase_ts,
        v.view_id, v.ts AS view_ts,
        CAST(floor(epoch(p.ts)) AS BIGINT) - CAST(floor(epoch(v.ts)) AS BIGINT) AS gap_s
    FROM p ASOF LEFT JOIN v
      ON v.user_id = p.user_id AND v.ts <= p.ts
"""


# ---------------------------------------------------------------------------
# q_range_join — interval-predicate join with an equality key
# ---------------------------------------------------------------------------


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase: how many clicks the same user made in the 30
    minutes leading up to it (left join keeps zero-click purchases).
    The user equi-key makes this a hash join; the interval predicate
    is a cheap post-join filter."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("c_ts")
    )
    joined = purchases.join(
        clicks,
        on=[
            purchases.user_id == clicks.user_id,
            clicks.c_ts >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"),
            clicks.c_ts < F.col("p_ts"),
        ],
        how="left",
    )
    return joined.groupBy("purchase_id", purchases.user_id.alias("user_id"), "p_ts").agg(
        F.count(clicks.c_ts).alias("n_clicks_30m")
    )


ORACLE_RANGE_JOIN = """
    WITH p AS (
        SELECT event_id AS purchase_id, user_id, ts AS p_ts
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click'
    )
    SELECT p.purchase_id, p.user_id, p.p_ts,
           count(c.c_ts) AS n_clicks_30m
    FROM p LEFT JOIN c
      ON c.user_id = p.user_id
     AND c.c_ts >= p.p_ts - INTERVAL 30 MINUTE
     AND c.c_ts < p.p_ts
    GROUP BY p.purchase_id, p.user_id, p.p_ts
"""


def q_temporal_join_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of + range join consolidated into one certified result,
    tagged by side: per purchase, ('asof', view attribution with the
    gap in seconds) and ('range', the 30-minute click count). Each
    branch keeps its optimal physical form — the as-of is the
    union-window single-shuffle algorithm, the range a hash join on
    the user equi-key. Single-op twins stay registered in the tail."""
    asof = q_asof_join(spark, sf_dir).select(
        F.lit("asof").alias("side"),
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.col("view_id").alias("ref_id"),
        F.col("gap_s").alias("metric"),
    )
    rng = q_range_join(spark, sf_dir).select(
        F.lit("range").alias("side"),
        "purchase_id",
        "user_id",
        F.col("p_ts").alias("purchase_ts"),
        F.lit(None).cast("long").alias("ref_id"),
        F.col("n_clicks_30m").alias("metric"),
    )
    return asof.unionByName(rng)


ORACLE_TEMPORAL_JOIN_SUITE = f"""
    WITH asof_side AS ({ORACLE_ASOF_JOIN}),
    range_side AS ({ORACLE_RANGE_JOIN})
    SELECT 'asof' AS side, purchase_id, user_id, purchase_ts,
           view_id AS ref_id, gap_s AS metric
    FROM asof_side
    UNION ALL
    SELECT 'range' AS side, purchase_id, user_id, p_ts AS purchase_ts,
           CAST(NULL AS BIGINT) AS ref_id, n_clicks_30m AS metric
    FROM range_side
"""


# ---------------------------------------------------------------------------
# q_cube / q_grouping_sets — multi-grain aggregates
# ---------------------------------------------------------------------------


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grains in one
    shuffle, grain identified by grouping_id."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(cents_sum(F.col("l_quantity")), 2).alias("sum_qty"),
            F.grouping_id().alias("grain"),
        )
        .select("l_returnflag", "l_linestatus", "n", "sum_qty", "grain")
    )


ORACLE_CUBE = f"""
    SELECT
        l_returnflag, l_linestatus,
        count(*) AS n,
        round({scaled_sum_sql('l_quantity')}, 2) AS sum_qty,
        GROUPING(l_returnflag, l_linestatus) AS grain
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — (flag, status) detail plus per-flag
    totals, skipping the grand total (the asymmetric-grain case cube
    can't express)."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("wf_lineitem_gs")
    # NB: Spark SQL parses the literal 100.0 as DECIMAL(3,1) (ANSI
    # exact-literal rule), which would make the division DECIMAL —
    # cast to DOUBLE to match the DataFrame-API/oracle arithmetic.
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               round(sum(CAST(floor(l_quantity * CAST(100.0 AS DOUBLE) + 0.5) AS BIGINT))
                     / CAST(100.0 AS DOUBLE), 2) AS sum_qty,
               grouping_id() AS grain
        FROM wf_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag))
        """
    )


ORACLE_GROUPING_SETS = """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           round(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) / 100.0, 2) AS sum_qty,
           GROUPING(l_returnflag, l_linestatus) AS grain
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag))
"""


TEMPORAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_asof_join": q_asof_join,
    "q_range_join": q_range_join,
    "q_temporal_join_suite": q_temporal_join_suite,
    "q_cube": q_cube,
    "q_grouping_sets": q_grouping_sets,
}

TEMPORAL_ORACLES: dict[str, str] = {
    "q_asof_join": ORACLE_ASOF_JOIN,
    "q_range_join": ORACLE_RANGE_JOIN,
    "q_temporal_join_suite": ORACLE_TEMPORAL_JOIN_SUITE,
    "q_cube": ORACLE_CUBE,
    "q_grouping_sets": ORACLE_GROUPING_SETS,
}
