"""Advanced relational operators: sessionization, pivot, ntile,
exact percentiles, scalar subqueries, deterministic sampling.

The reference (pratik-choudhari/WeatherFlow) has none of these — its
only query surface is the star schema the warehouse serves (SURVEY
§2.5-§2.7, all ABSENT rows). These are the analytical operators that
schema implies plus the sampling/quality surface a training-data
pipeline needs, each expressed Spark-first and hash-checked against a
DuckDB oracle.

Scale posture per query is in its docstring; the common rules:

- aggregations use the exact integer-scaled sum pattern
  (:func:`weatherflow_spark.plans.queries.scaled_sum`) so partial-agg
  order can never change a result;
- window operators always partition (by user / segment) — no global
  single-partition windows;
- sessionization uses Spark's native ``session_window`` (the same
  expression Structured Streaming uses with a watermark), so the
  batch query here is the streaming query at 100 TB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from weatherflow_spark.functions import text as T
from weatherflow_spark.io import load_table
from weatherflow_spark.plans.oracles import ORACLES as _CORE_ORACLES
from weatherflow_spark.plans.queries import cents_sum, scaled_sum, scaled_sum_sql
from weatherflow_spark.plans.relational import q_tumbling_window_agg

SESSION_GAP = "8 hours"  # ~median per-user event gap at all SFs


# ---------------------------------------------------------------------------
# q_session_window — event-time sessionization (gaps-and-islands)
# ---------------------------------------------------------------------------


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with an 8-hour inactivity gap via the native
    ``session_window`` operator — one shuffle on (user_id), then the
    session merge happens inside the aggregate; no self-join, no
    global sort. In streaming this exact expression runs with a
    watermark (T2/T3); the batch form here is hash-checkable against
    the classic gaps-and-islands SQL (lag + cumulative sum).

    Spark semantics: windows are half-open ``[ts, ts+gap)`` and merge
    while they overlap, so a new session starts when the gap to the
    previous event is >= 8h — mirrored exactly in the oracle's
    ``ts >= lag(ts) + INTERVAL 8 HOUR`` test.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.col("user_id"),
            F.session_window("ts", SESSION_GAP).alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("ts").alias("last_event_ts"),
            cents_sum(F.col("value")).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "last_event_ts",
            "n_events",
            "sum_value",
        )
    )


ORACLE_SESSION_WINDOW = f"""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts >= lag(ts) OVER w + INTERVAL 8 HOUR
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
        SELECT *, sum(new_session) OVER
                   (PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) AS last_event_ts,
           count(*) AS n_events,
           {scaled_sum_sql('value')} AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# q_event_window_suite — consolidated T2 certification row
# ---------------------------------------------------------------------------


def q_event_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 consolidated certification row: the 1-hour tumbling
    event-time aggregate (plans/relational.py) and the 8-hour-gap
    sessionization (above) over the same event stream, tagged by form
    and unioned on a normalized schema — the tumbling branch carries
    typed-NULL user/session columns. Both branches are the exact
    expressions Structured Streaming runs with a watermark
    (streaming/pipeline.py); batch mode keeps them hash-checkable.
    The union is plan-level only (each branch keeps its own single
    shuffle); single-form twins stay registered in the tail."""
    tumbling = q_tumbling_window_agg(spark, sf_dir).select(
        F.lit("tumbling").alias("form"),
        F.lit(None).cast("long").alias("user_id"),
        "window_start",
        F.lit(None).cast("timestamp").alias("last_event_ts"),
        "n_events",
        "sum_value",
    )
    session = q_session_window(spark, sf_dir).select(
        F.lit("session").alias("form"),
        "user_id",
        F.col("session_start").alias("window_start"),
        "last_event_ts",
        "n_events",
        "sum_value",
    )
    return tumbling.unionByName(session)


ORACLE_EVENT_WINDOW_SUITE = f"""
    WITH tumbling_side AS ({_CORE_ORACLES['q_tumbling_window_agg']}),
    session_side AS ({ORACLE_SESSION_WINDOW})
    SELECT 'tumbling' AS form, CAST(NULL AS BIGINT) AS user_id,
           window_start, CAST(NULL AS TIMESTAMP) AS last_event_ts,
           n_events, sum_value
    FROM tumbling_side
    UNION ALL
    SELECT 'session', user_id, session_start, last_event_ts,
           n_events, sum_value
    FROM session_side
"""


# ---------------------------------------------------------------------------
# q_pivot — orders status counts pivoted wide per nation
# ---------------------------------------------------------------------------


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation × order-status matrix via ``groupBy().pivot()`` with an
    explicit value list ('F','O','P') — no extra distinct-values job,
    stable output schema, and the pivot becomes a single hash
    aggregate (one shuffle on n_name, 25 groups). Dims broadcast; the
    orders fact never shuffles for the joins."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(
            F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        .select(
            "n_name",
            F.col("F").alias("n_fulfilled"),
            F.col("O").alias("n_open"),
            F.col("P").alias("n_pending"),
        )
    )


ORACLE_PIVOT = """
    SELECT n_name,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_fulfilled,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# q_ntile — within-segment quartiles (partitioned ranking window)
# ---------------------------------------------------------------------------


def q_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-balance quartile of each customer *within its market
    segment*: ``ntile(4)`` over a partitioned window (one shuffle on
    c_mktsegment, each partition sorted locally — never a global
    single-partition window, which would serialize at scale). Ties
    broken by c_custkey so the assignment is total-ordered and
    deterministic in both engines."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("balance_quartile"),
    )


ORACLE_NTILE = """
    SELECT c_custkey, c_mktsegment, c_acctbal,
           ntile(4) OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal ASC, c_custkey ASC)
               AS balance_quartile
    FROM customer
"""


# ---------------------------------------------------------------------------
# q_percentiles — exact interpolated percentiles per group
# ---------------------------------------------------------------------------


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quartiles of l_quantity per return flag via Spark's
    ``percentile`` aggregate (exact, interpolated — the distributed
    form collects per-group value counts, fine for bounded-cardinality
    measures like quantity 1..50; for unbounded doubles at 100 TB use
    ``approx_percentile`` with a t-digest accuracy knob instead).
    Results rounded to 1e-6 to absorb last-ulp interpolation-order
    differences vs DuckDB's quantile_cont."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    sixr = lambda c: (F.floor(c * 1e6 + F.lit(0.5)) / 1e6)  # noqa: E731
    return lineitem.groupBy("l_returnflag").agg(
        sixr(F.expr("percentile(l_quantity, 0.25)")).alias("q25"),
        sixr(F.expr("percentile(l_quantity, 0.50)")).alias("q50"),
        sixr(F.expr("percentile(l_quantity, 0.75)")).alias("q75"),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_PERCENTILES = """
    SELECT l_returnflag,
           floor(quantile_cont(l_quantity, 0.25) * 1e6 + 0.5) / 1e6 AS q25,
           floor(quantile_cont(l_quantity, 0.50) * 1e6 + 0.5) / 1e6 AS q50,
           floor(quantile_cont(l_quantity, 0.75) * 1e6 + 0.5) / 1e6 AS q75,
           count(*) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# q_scalar_subquery — filter against a computed global scalar
# ---------------------------------------------------------------------------


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders priced above the global average, per priority. The
    scalar (global avg) is a 1-row aggregate cross-joined back as a
    broadcast — Spark plans the same shape for a SQL scalar subquery;
    no shuffle of the fact beyond the final 5-group aggregate. The
    average is defined over integer-scaled cents so both engines
    compute the identical double and the > comparison can never flip
    on a summation-order ulp."""
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        (scaled_sum(F.col("o_totalprice")) / F.count(F.lit(1))).alias("avg_price")
    )
    return (
        orders.crossJoin(F.broadcast(stats))
        .where(F.col("o_totalprice") > F.col("avg_price"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            cents_sum(F.col("o_totalprice")).alias("sum_price"),
        )
    )


ORACLE_SCALAR_SUBQUERY = f"""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           {scaled_sum_sql('o_totalprice')} AS sum_price
    FROM orders
    WHERE o_totalprice > (
        SELECT {scaled_sum_sql('o_totalprice')} / count(*) FROM orders
    )
    GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q_hash_sample — deterministic content-hash sampling
# ---------------------------------------------------------------------------


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% deterministic sample of the corpus: keep documents whose
    content fingerprint ≡ 0 (mod 10). This is how a training pipeline
    samples reproducibly at 100 TB — a pure narrow filter on a
    content hash (pipelines into the scan, no RNG, no seed state,
    stable under re-partitioning and re-runs — unlike TABLESAMPLE,
    whose output depends on partition layout). Uses the cross-engine
    polynomial fingerprint, so the oracle selects the identical
    rows."""
    df = load_table(spark, sf_dir, "documents")
    return (
        df.select(
            "doc_id",
            F.expr(T.doc_fingerprint_expr("text")).alias("fingerprint"),
            T.n_tokens("text").alias("n_tokens"),
        )
        .where(F.col("fingerprint") % 10 == 0)
    )


ORACLE_HASH_SAMPLE = f"""
    SELECT doc_id, fingerprint, n_tokens
    FROM (
        SELECT doc_id,
               {T.doc_fingerprint_sql('text')} AS fingerprint,
               {T.n_tokens_sql('text')} AS n_tokens
        FROM documents
    )
    WHERE fingerprint % 10 = 0
"""


# ---------------------------------------------------------------------------
# q_olap_suite — consolidated OLAP certification row
# ---------------------------------------------------------------------------


def q_olap_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 + pivot + exact-percentile consolidated certification row:
    the five OLAP grain/reshape families (time rollup, CUBE, GROUPING
    SETS, pivot, exact per-group percentiles) projected to one tagged
    (part, k1, k2, n, v1..v3) shape and unioned. Each branch keeps its
    own physical plan — a single shuffle per branch (see the per-query
    docstrings); the union is plan-level only, no cross-branch
    shuffle. Single-grain twins stay registered in the tail."""
    from weatherflow_spark.plans.relational import q_rollup_time
    from weatherflow_spark.plans.temporal import q_cube, q_grouping_sets

    nul_s = F.lit(None).cast("string")
    nul_n = F.lit(None).cast("long")
    nul_d = F.lit(None).cast("double")
    rollup = q_rollup_time(spark, sf_dir).select(
        F.lit("rollup").alias("part"),
        F.col("order_year").cast("string").alias("k1"),
        F.col("order_quarter").alias("k2"),
        F.col("n_orders").alias("n"),
        F.col("total_price").alias("v1"),
        nul_d.alias("v2"),
        nul_d.alias("v3"),
    )
    cube = q_cube(spark, sf_dir).select(
        F.lit("cube").alias("part"),
        F.col("l_returnflag").alias("k1"),
        F.col("l_linestatus").alias("k2"),
        F.col("n").alias("n"),
        F.col("sum_qty").alias("v1"),
        F.col("grain").cast("double").alias("v2"),
        nul_d.alias("v3"),
    )
    gsets = q_grouping_sets(spark, sf_dir).select(
        F.lit("gsets").alias("part"),
        F.col("l_returnflag").alias("k1"),
        F.col("l_linestatus").alias("k2"),
        F.col("n").alias("n"),
        F.col("sum_qty").alias("v1"),
        F.col("grain").cast("double").alias("v2"),
        nul_d.alias("v3"),
    )
    pivot = q_pivot(spark, sf_dir).select(
        F.lit("pivot").alias("part"),
        F.col("n_name").alias("k1"),
        nul_s.alias("k2"),
        nul_n.alias("n"),
        F.col("n_fulfilled").cast("double").alias("v1"),
        F.col("n_open").cast("double").alias("v2"),
        F.col("n_pending").cast("double").alias("v3"),
    )
    pct = q_percentiles(spark, sf_dir).select(
        F.lit("pct").alias("part"),
        F.col("l_returnflag").alias("k1"),
        nul_s.alias("k2"),
        F.col("n_items").alias("n"),
        F.col("q25").alias("v1"),
        F.col("q50").alias("v2"),
        F.col("q75").alias("v3"),
    )
    return (
        rollup.unionByName(cube)
        .unionByName(gsets)
        .unionByName(pivot)
        .unionByName(pct)
    )


def _olap_suite_oracle() -> str:
    from weatherflow_spark.plans.oracles import ORACLES as _CORE_ORACLES
    from weatherflow_spark.plans.temporal import ORACLE_CUBE, ORACLE_GROUPING_SETS

    return f"""
    WITH rollup_side AS ({_CORE_ORACLES["q_rollup_time"]}),
    cube_side AS ({ORACLE_CUBE}),
    gsets_side AS ({ORACLE_GROUPING_SETS}),
    pivot_side AS ({ORACLE_PIVOT}),
    pct_side AS ({ORACLE_PERCENTILES})
    SELECT 'rollup' AS part, CAST(order_year AS VARCHAR) AS k1,
           order_quarter AS k2, n_orders AS n, total_price AS v1,
           CAST(NULL AS DOUBLE) AS v2, CAST(NULL AS DOUBLE) AS v3
    FROM rollup_side
    UNION ALL
    SELECT 'cube', l_returnflag, l_linestatus, n, sum_qty,
           CAST(grain AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM cube_side
    UNION ALL
    SELECT 'gsets', l_returnflag, l_linestatus, n, sum_qty,
           CAST(grain AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM gsets_side
    UNION ALL
    SELECT 'pivot', n_name, CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
           CAST(n_fulfilled AS DOUBLE), CAST(n_open AS DOUBLE),
           CAST(n_pending AS DOUBLE)
    FROM pivot_side
    UNION ALL
    SELECT 'pct', l_returnflag, CAST(NULL AS VARCHAR), n_items,
           q25, q50, q75
    FROM pct_side
"""


ORACLE_OLAP_SUITE = _olap_suite_oracle()


ADVANCED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_session_window": q_session_window,
    "q_event_window_suite": q_event_window_suite,
    "q_pivot": q_pivot,
    "q_ntile": q_ntile,
    "q_percentiles": q_percentiles,
    "q_scalar_subquery": q_scalar_subquery,
    "q_hash_sample": q_hash_sample,
    "q_olap_suite": q_olap_suite,
}

ADVANCED_ORACLES: dict[str, str] = {
    "q_session_window": ORACLE_SESSION_WINDOW,
    "q_event_window_suite": ORACLE_EVENT_WINDOW_SUITE,
    "q_pivot": ORACLE_PIVOT,
    "q_ntile": ORACLE_NTILE,
    "q_percentiles": ORACLE_PERCENTILES,
    "q_scalar_subquery": ORACLE_SCALAR_SUBQUERY,
    "q_hash_sample": ORACLE_HASH_SAMPLE,
    "q_olap_suite": ORACLE_OLAP_SUITE,
}
