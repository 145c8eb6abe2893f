"""Relational surface queries (SURVEY §2.1, §2.4-§2.8): scans, star
build, joins, aggregations, windows, sort/top-k, set ops, JSON.

Scale notes are per-query docstrings; the common posture:

- filters/projections expressed declaratively → Catalyst pushes them
  into the parquet scan (verified via explain in tests);
- small dimension sides of joins marked ``broadcast`` explicitly
  (nation/region/customer at TPC-H shapes) — no shuffle of the fact;
- every sum over doubles uses the exact integer-scaled pattern
  (:func:`weatherflow_spark.plans.queries.scaled_sum`) so results are
  partial-agg-order independent;
- top-k goes through ``orderBy().limit()`` which Spark plans as
  ``TakeOrderedAndProject`` (per-partition heaps + driver merge of k
  rows, never a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from weatherflow_spark.functions.weather import add_calc_attributes
from weatherflow_spark.io import load_table
from weatherflow_spark.operators.star import build_weather_star
from weatherflow_spark.plans.queries import cents_sum, events_weather, scaled_sum, _local_ts


# ---------------------------------------------------------------------------
# §2.1 scans / star build / JSON source surface
# ---------------------------------------------------------------------------


def q_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/P1/P2 (api.py:18-21): scan + predicate + projection.
    Catalyst pushes both the filter and the 3-column read schema into
    the parquet scan (PushedFilters / ReadSchema in explain)."""
    return (
        load_table(spark, sf_dir, "customer")
        .where((F.col("c_mktsegment") == "FURNITURE") & (F.col("c_acctbal") > 1000.0))
        .select("c_custkey", "c_name", "c_acctbal")
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/E4 (api.py:28-34): project typed leaves out of a JSON
    payload column — the engine's nested-JSON flatten surface."""
    return load_table(spark, sf_dir, "events").select(
        F.col("event_id"),
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k_val"),
    )


def q_star_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/K2 (etl.py:96-123): the star-schema build with deterministic
    sha2 surrogate keys in place of uuid4 (etl.py:103), over the
    weather-dressed events. Returns the keys-only fact
    (create_tables.sql:11-18); the four dims are split off the same
    cached plan in :mod:`weatherflow_spark.operators.star`."""
    base = events_weather(spark, sf_dir)
    enriched = add_calc_attributes(
        base.withColumns(
            {
                "station_id": F.col("user_id"),
                "recorded_datetime_local": F.date_format(
                    _local_ts(base), "yyyy-MM-dd HH:mm:ss"
                ),
            }
        )
    )
    star = build_weather_star(enriched, station_col="station_id",
                              natural_key_cols=["event_id"])
    return star["w_fact"]


def q_star_time_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1: the time-dimension side of the same build
    (create_tables.sql:20-29) — calendar attributes keyed by time_id."""
    base = events_weather(spark, sf_dir)
    local = _local_ts(base)
    from weatherflow_spark.functions.calendar import quarter_bucket, season_bucket

    enriched = base.withColumns(
        {
            "station_id": F.col("user_id"),
            "recorded_datetime_local": F.date_format(local, "yyyy-MM-dd HH:mm:ss"),
            "recorded_date_local": F.date_format(local, "yyyy-MM-dd"),
            "recorded_month_local": F.date_format(local, "MMMM"),
            "recorded_quarter_local": quarter_bucket(local),
            "recorded_season_local": season_bucket(local),
            "recorded_weekday_local": F.date_format(local, "EEEE"),
            "recorded_year_local": F.year(local),
        }
    )
    star = build_weather_star(enriched, station_col="station_id",
                              natural_key_cols=["event_id"])
    return star["w_time_dim"]


# ---------------------------------------------------------------------------
# §2.4 joins
# ---------------------------------------------------------------------------


def q_star_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: the analytical star join the warehouse exists for
    (dbdiagram.txt:59-63): fact(lineitem) ⋈ orders ⋈ customer ⋈
    nation, revenue per nation. customer and nation are explicitly
    broadcast — the lineitem side never shuffles for the join; the
    only shuffle is the final 25-group aggregate."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            scaled_sum(revenue, 10000).alias("revenue"),
        )
    )


def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: every customer with order count and exact
    total spend (0 for order-less customers)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count(F.col("o_orderkey")).alias("n_orders"),
            F.coalesce(cents_sum(F.col("o_totalprice")), F.lit(0.0)).alias("total_spend"),
        )
    )


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: orders that have at least one lineitem.
    Spark builds a hash set of keys — no row multiplication."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return orders.join(
        lineitem, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    ).select("o_orderkey", "o_totalprice")


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: orders with no lineitems (a non-empty set in
    the testdata, unlike customers-without-orders)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return orders.join(
        lineitem, F.col("o_orderkey") == F.col("l_orderkey"), "left_anti"
    ).select("o_orderkey", "o_totalprice")


def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti join in one certified result: orders WITH at least
    one lineitem (tag 'semi') unioned with orders WITHOUT (tag
    'anti'). Both sides build a hash set of lineitem keys — no row
    multiplication — and together they partition `orders` exactly,
    which the oracle's EXISTS/NOT EXISTS twin checks row-for-row.
    The single-mode twins (q_join_semi / q_join_anti) stay
    registered."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    semi = (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
        .withColumn("side", F.lit("semi"))
    )
    anti = (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"), "left_anti")
        .select("o_orderkey", "o_totalprice")
        .withColumn("side", F.lit("anti"))
    )
    return semi.unionByName(anti)


# ---------------------------------------------------------------------------
# §2.5 aggregations
# ---------------------------------------------------------------------------


def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1, TPC-H Q1 shape (the star schema's raison d'être, README.md:24):
    pricing summary over lineitem. All sums exact-integer-scaled;
    averages derived sum/count so they are order-independent too."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            cents_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            scaled_sum(disc_price, 10000).alias("sum_disc_price"),
            scaled_sum(charge, 1000000).alias("sum_charge"),
            (F.sum("l_quantity") / n).alias("avg_qty"),
            (cents_sum(F.col("l_extendedprice")) / n).alias("avg_price"),
            scaled_sum(F.col("l_discount"), 100).alias("sum_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: exact distinct counts per group (expands to a two-phase
    hash aggregate)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 approx: HyperLogLog++ distinct counts — the 100 TB answer to
    count-distinct (one pass, fixed memory, no key shuffle of raw
    rows). Sketch values are engine-specific → rows-only check."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers")
    )


def q_rollup_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: multi-grain rollup over the time dimension (year → quarter
    → grand total), the workload the reference's pre-bucketed time dim
    (create_tables.sql:24-28) exists to serve."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumns(
            {
                "order_year": F.year("o_orderdate"),
                "order_quarter": F.concat(
                    F.lit("Q"), F.quarter("o_orderdate").cast("string")
                ),
            }
        )
        .rollup("order_year", "order_quarter")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            cents_sum(F.col("o_totalprice")).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# §2.6 windows
# ---------------------------------------------------------------------------


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: latest event per user via row_number over a per-user
    window — the well-defined replacement for the reference's
    positional zip (J1) and the canonical 'current observation per
    station' query. Partition-local sort only; no global sort."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "value")
    )


def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: per-user previous-value delta (lag) — e.g. temperature
    change between consecutive observations of one station."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return events.select(
        "event_id",
        "user_id",
        "value",
        prev.alias("prev_value"),
        (F.col("value") - prev).alias("delta"),
    )


def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: 4-row moving average per user. Computed in exact integer
    cents inside the frame so both engines divide the same integers."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
    return events.select(
        "event_id",
        "user_id",
        "value",
        (F.sum(cents).over(w) / (F.lit(100.0) * F.count(F.lit(1)).over(w))).alias(
            "moving_avg"
        ),
    )


def q_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+W2+W3 consolidated: recency rank, lag delta, and a 4-row
    moving average — all per-user, from ONE shuffle on user_id (the
    two opposite-ordered window specs share the partitioning; Spark
    plans a single exchange with two in-partition sorts). This is the
    window family's certification row; the single-op twins
    (q_window_rank/lag/moving_avg) stay registered in the tail."""
    events = load_table(spark, sf_dir, "events")
    wa = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wf = wa.rowsBetween(-3, Window.currentRow)
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
    prev = F.lag("value").over(wa)
    return events.select(
        "event_id",
        "user_id",
        "value",
        F.row_number().over(wd).alias("recency_rank"),
        prev.alias("prev_value"),
        (F.col("value") - prev).alias("delta"),
        (F.sum(cents).over(wf) / (F.lit(100.0) * F.count(F.lit(1)).over(wf))).alias(
            "moving_avg"
        ),
    )


def q_join_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer+semi+anti consolidated into one certified result:
    per-customer left-outer order totals (side 'left', zero-filled
    for order-less customers) unioned with the semi/anti partition of
    orders by lineitem existence. Each branch keeps its optimal
    physical form — left is a shuffle join + agg, semi/anti build a
    hash set of lineitem keys with no row multiplication."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    left = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count(F.col("o_orderkey")).alias("n"),
            F.coalesce(cents_sum(F.col("o_totalprice")), F.lit(0.0)).alias("amount"),
        )
        .select(
            F.lit("left").alias("side"),
            F.col("c_custkey").alias("key_id"),
            F.col("n"),
            F.col("amount"),
        )
    )
    semi = (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .select(
            F.lit("semi").alias("side"),
            F.col("o_orderkey").alias("key_id"),
            F.lit(1).cast("long").alias("n"),
            F.col("o_totalprice").alias("amount"),
        )
    )
    anti = (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"), "left_anti")
        .select(
            F.lit("anti").alias("side"),
            F.col("o_orderkey").alias("key_id"),
            F.lit(0).cast("long").alias("n"),
            F.col("o_totalprice").alias("amount"),
        )
    )
    return left.unionByName(semi).unionByName(anti)


# ---------------------------------------------------------------------------
# §2.7 sort / top-k
# ---------------------------------------------------------------------------


def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: global order materialized as an explicit rank column (the
    value hash is order-insensitive, so the rank IS the sort's
    observable output). Note: a global row_number window is a
    single-partition bottleneck at scale — for 100 TB ranking use
    orderBy (range-partitioned sort) and zipWithIndex-style staged
    ranks; here the result is capped at 1000 rows first."""
    orders = load_table(spark, sf_dir, "orders")
    top = orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(1000)
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return top.select(
        F.row_number().over(w).alias("sort_rank"), "o_orderkey", "o_totalprice"
    )


def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: top-10 parts by price — Spark plans TakeOrderedAndProject
    (per-partition heap + driver merge, never a global sort)."""
    part = load_table(spark, sf_dir, "part")
    return part.orderBy(F.desc("p_retailprice"), F.asc("p_partkey")).limit(10).select(
        "p_partkey", "p_name", "p_retailprice"
    )


# ---------------------------------------------------------------------------
# §2.8 set operations
# ---------------------------------------------------------------------------


def q_order_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2 consolidated window row (r12.2 — frees one certification
    slot, the house rotation pattern: the ``q_sort``/``q_topk``
    singles keep tail parity and their plan audits). LONG format
    (op, key, metric, value:bigint): the 'sort' branch emits the
    explicit global rank with its key and scaled price (the rank IS
    the sort's observable output under an order-insensitive hash),
    the 'topk' branch the heap-planned top-10 membership."""
    s = q_sort(spark, sf_dir).selectExpr(
        "'sort' AS op",
        "cast(sort_rank AS string) AS key",
        "stack(2, 'key_id', cast(o_orderkey AS bigint), "
        "'price_cents', cast(floor(o_totalprice * 100 + 0.5) AS bigint)"
        ") AS (metric, value)",
    )
    t = q_topk(spark, sf_dir).selectExpr(
        "'topk' AS op",
        "cast(p_partkey AS string) AS key",
        "stack(2, 'price_cents', "
        "cast(floor(p_retailprice * 100 + 0.5) AS bigint), "
        "'name_len', cast(length(p_name) AS bigint)) AS (metric, value)",
    )
    return s.unionByName(t)


def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: unionByName of two filtered scans (bag semantics, like SQL
    UNION ALL — no dedup shuffle)."""
    part = load_table(spark, sf_dir, "part")
    small = part.where(F.col("p_size") <= 10).select("p_partkey", "p_size", "p_brand")
    large = part.where(F.col("p_size") >= 40).select("p_partkey", "p_size", "p_brand")
    return small.unionByName(large)


def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: EXCEPT DISTINCT — parts never shipped small-size."""
    part = load_table(spark, sf_dir, "part")
    all_keys = part.select("p_partkey")
    big = part.where(F.col("p_size") > 20).select("p_partkey")
    return all_keys.exceptAll(big).distinct()


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: INTERSECT DISTINCT — customers that are both FURNITURE
    segment and have above-median balance."""
    customer = load_table(spark, sf_dir, "customer")
    a = customer.where(F.col("c_mktsegment") == "FURNITURE").select("c_custkey")
    b = customer.where(F.col("c_acctbal") > 5000.0).select("c_custkey")
    return a.intersect(b)


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 consolidated: the three set-operation semantics in one
    tagged, same-schema result — UNION ALL (bag: duplicate keys
    survive and the order-insensitive value hash counts them),
    EXCEPT DISTINCT, INTERSECT DISTINCT. The per-op twins
    (q_union/q_except/q_intersect) stay registered."""
    part = load_table(spark, sf_dir, "part")
    customer = load_table(spark, sf_dir, "customer")
    union_all = (
        part.where(F.col("p_size") <= 10)
        .select("p_partkey")
        .unionByName(part.where(F.col("p_size") >= 40).select("p_partkey"))
        .select(F.lit("union_all").alias("op"), F.col("p_partkey").alias("key_id"))
    )
    except_d = (
        part.select("p_partkey")
        .exceptAll(part.where(F.col("p_size") > 20).select("p_partkey"))
        .distinct()
        .select(F.lit("except").alias("op"), F.col("p_partkey").alias("key_id"))
    )
    intersect_d = (
        customer.where(F.col("c_mktsegment") == "FURNITURE")
        .select("c_custkey")
        .intersect(customer.where(F.col("c_acctbal") > 5000.0).select("c_custkey"))
        .select(F.lit("intersect").alias("op"), F.col("c_custkey").alias("key_id"))
    )
    return union_all.unionByName(except_d).unionByName(intersect_d)


# ---------------------------------------------------------------------------
# §2.9 streaming surface, batch-checkable part
# ---------------------------------------------------------------------------


def q_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: 1-hour tumbling event-time windows via ``window()`` — the
    same expression Structured Streaming uses with a watermark
    (streaming/pipeline.py); batch-mode here so it is hash-checkable
    (oracle: date_trunc)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            cents_sum(F.col("value")).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


RELATIONAL_QUERIES = {
    "q_scan_filter_project": q_scan_filter_project,
    "q_json_extract": q_json_extract,
    "q_star_build": q_star_build,
    "q_star_time_dim": q_star_time_dim,
    "q_star_join_agg": q_star_join_agg,
    "q_join_left": q_join_left,
    "q_join_semi": q_join_semi,
    "q_join_anti": q_join_anti,
    "q_join_semi_anti": q_join_semi_anti,
    "q_groupby_agg": q_groupby_agg,
    "q_count_distinct": q_count_distinct,
    "q_approx_count_distinct": q_approx_count_distinct,
    "q_rollup_time": q_rollup_time,
    "q_window_rank": q_window_rank,
    "q_window_lag": q_window_lag,
    "q_window_moving_avg": q_window_moving_avg,
    "q_window_suite": q_window_suite,
    "q_join_mix": q_join_mix,
    "q_sort": q_sort,
    "q_topk": q_topk,
    "q_order_suite": q_order_suite,
    "q_union": q_union,
    "q_except": q_except,
    "q_intersect": q_intersect,
    "q_set_ops": q_set_ops,
    "q_tumbling_window_agg": q_tumbling_window_agg,
}
