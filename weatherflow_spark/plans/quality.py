"""Warehouse data-quality checks (E55) — the dbt-test tier expressed
as ONE query: primary-key uniqueness, foreign-key integrity,
null-fraction and value-bound screens across the star schema, all in
a single long-format report so a scheduler can gate a load on one
row set (the reference's Airflow DAG would run exactly this after
its `load` task; the engine makes it a query instead of a script).

Every check is an exact integer aggregate (counts, anti-join counts)
— no doubles anywhere, so the report hash-checks trivially. `pass`
is 1/0 for hard invariants (pk/fk/bounds) and NULL for report-only
metrics (null tallies that carry no contract).

Scale posture: each check is one map-side-partial aggregation or one
broadcast/keyed anti-join count; the report is a plan-level union of
tiny results (no cross-check shuffle). At 100 TB the fk checks are
the expensive ones — they are plain anti-joins, so AQE picks
broadcast vs shuffle per dimension size exactly as the star joins do.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from weatherflow_spark.io import load_table

DISCOUNT_LO, DISCOUNT_HI = 0.0, 0.10


def _row(tbl: str, check: str, value, passed) -> list:
    return [F.lit(tbl).alias("tbl"), F.lit(check).alias("check"), value, passed]


def q_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per check: (tbl, check, value, pass)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")

    def _count_row(tbl: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("value")).select(
            F.lit(tbl).alias("tbl"),
            F.lit("row_count").alias("check"),
            "value",
            F.lit(None).cast("int").alias("pass"),
        )

    def _pk_row(tbl: str, df: DataFrame, key: str) -> DataFrame:
        return df.agg(
            (F.count(F.lit(1)) - F.countDistinct(key)).alias("value")
        ).select(
            F.lit(tbl).alias("tbl"),
            F.lit(f"pk_dupes_{key}").alias("check"),
            "value",
            (F.col("value") == 0).cast("int").alias("pass"),
        )

    def _fk_row(
        tbl: str, fact: DataFrame, fk: str, dim: DataFrame, pk: str
    ) -> DataFrame:
        orphans = fact.select(F.col(fk).alias("k")).join(
            dim.select(F.col(pk).alias("k")), "k", "left_anti"
        )
        return orphans.agg(F.count(F.lit(1)).alias("value")).select(
            F.lit(tbl).alias("tbl"),
            F.lit(f"fk_orphans_{fk}").alias("check"),
            "value",
            (F.col("value") == 0).cast("int").alias("pass"),
        )

    bounds = lineitem.agg(
        F.sum(
            (
                (F.col("l_discount") < DISCOUNT_LO)
                | (F.col("l_discount") > DISCOUNT_HI)
            ).cast("long")
        ).alias("value")
    ).select(
        F.lit("lineitem").alias("tbl"),
        F.lit("discount_out_of_bounds").alias("check"),
        "value",
        (F.col("value") == 0).cast("int").alias("pass"),
    )
    nulls = events.agg(
        (F.count(F.lit(1)) - F.count("props")).alias("value")
    ).select(
        F.lit("events").alias("tbl"),
        F.lit("null_props").alias("check"),
        "value",
        F.lit(None).cast("int").alias("pass"),
    )
    # E71: the anti-entropy table fingerprints as report rows (XOR +
    # modular-sum channels; pass is NULL — a digest, not an invariant).
    fps = q_table_fingerprint(spark, sf_dir).selectExpr(
        "tbl",
        "stack(2, 'fingerprint_xor', fp_xor, 'fingerprint_sum', fp_sum) "
        "AS (check, value)",
        "cast(NULL as int) AS pass",
    )
    # E75: join-key skew diagnostics as report rows (pass is NULL —
    # measurements feeding the salting decision, not invariants).
    skew = q_skew_report(spark, sf_dir).selectExpr(
        "rel_key AS tbl",
        "stack(5, 'skew_n_keys', n_keys, 'skew_max_count', max_count, "
        "'skew_top_share_e6', top_share_e6, 'skew_p50_count', p50_count, "
        "'skew_p99_count', p99_count) AS (check, value)",
        "cast(NULL as int) AS pass",
    )
    parts = [
        fps,
        skew,
        _count_row("orders", orders),
        _count_row("customer", customer),
        _count_row("lineitem", lineitem),
        _count_row("events", events),
        _pk_row("orders", orders, "o_orderkey"),
        _pk_row("customer", customer, "c_custkey"),
        _pk_row("events", events, "event_id"),
        _fk_row("orders", orders, "o_custkey", customer, "c_custkey"),
        _fk_row("lineitem", lineitem, "l_orderkey", orders, "o_orderkey"),
        bounds,
        nulls,
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


ORACLE_DATA_QUALITY = f"""
    SELECT 'orders' AS tbl, 'row_count' AS check,
           CAST(count(*) AS BIGINT) AS value, CAST(NULL AS INTEGER) AS pass
    FROM orders
    UNION ALL
    SELECT 'customer', 'row_count', CAST(count(*) AS BIGINT),
           CAST(NULL AS INTEGER) FROM customer
    UNION ALL
    SELECT 'lineitem', 'row_count', CAST(count(*) AS BIGINT),
           CAST(NULL AS INTEGER) FROM lineitem
    UNION ALL
    SELECT 'events', 'row_count', CAST(count(*) AS BIGINT),
           CAST(NULL AS INTEGER) FROM events
    UNION ALL
    SELECT 'orders', 'pk_dupes_o_orderkey',
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
           CAST(CASE WHEN count(*) = count(DISTINCT o_orderkey)
                THEN 1 ELSE 0 END AS INTEGER)
    FROM orders
    UNION ALL
    SELECT 'customer', 'pk_dupes_c_custkey',
           CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT),
           CAST(CASE WHEN count(*) = count(DISTINCT c_custkey)
                THEN 1 ELSE 0 END AS INTEGER)
    FROM customer
    UNION ALL
    SELECT 'events', 'pk_dupes_event_id',
           CAST(count(*) - count(DISTINCT event_id) AS BIGINT),
           CAST(CASE WHEN count(*) = count(DISTINCT event_id)
                THEN 1 ELSE 0 END AS INTEGER)
    FROM events
    UNION ALL
    SELECT 'orders', 'fk_orphans_o_custkey',
           CAST(count(*) AS BIGINT),
           CAST(CASE WHEN count(*) = 0 THEN 1 ELSE 0 END AS INTEGER)
    FROM orders o WHERE NOT EXISTS (
        SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem', 'fk_orphans_l_orderkey',
           CAST(count(*) AS BIGINT),
           CAST(CASE WHEN count(*) = 0 THEN 1 ELSE 0 END AS INTEGER)
    FROM lineitem l WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem', 'discount_out_of_bounds',
           CAST(coalesce(sum(CASE WHEN l_discount < {DISCOUNT_LO}
                                    OR l_discount > {DISCOUNT_HI}
                             THEN 1 ELSE 0 END), 0) AS BIGINT),
           CAST(CASE WHEN coalesce(sum(CASE WHEN l_discount < {DISCOUNT_LO}
                                              OR l_discount > {DISCOUNT_HI}
                                       THEN 1 ELSE 0 END), 0) = 0
                THEN 1 ELSE 0 END AS INTEGER)
    FROM lineitem
    UNION ALL
    SELECT 'events', 'null_props',
           CAST(count(*) - count(props) AS BIGINT), CAST(NULL AS INTEGER)
    FROM events
"""


# ---------------------------------------------------------------------------
# q_table_fingerprint — E71: order-independent table checksums
# ---------------------------------------------------------------------------

FP_SUM_MOD = 1_000_003  # keeps sum(h % M) < 9e18 for ~9e12 rows


def _row_fp_spark(cols_concat: str) -> str:
    from weatherflow_spark.functions.text import _tok_hash_lambda_spark

    return _tok_hash_lambda_spark(cols_concat)


def _row_fp_duck(cols_concat: str) -> str:
    from weatherflow_spark.functions.text import _tok_hash_lambda_duck

    return _tok_hash_lambda_duck(cols_concat)


def q_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprints — the anti-entropy
    primitive behind replica comparison, migration sign-off, and
    idempotent-load verification (same bytes ⇒ same fingerprint, ANY
    row order, ANY partitioning): each row serializes canonically
    ('|'-joined typed columns, doubles as exact cents) and folds to
    the engine's polynomial hash; the table digest is the XOR of row
    hashes (commutative/associative — map-side-combinable, merge-able
    across partitions and incremental loads) plus a modular-sum
    second channel (XOR alone cannot see a row repeated twice; the
    sum channel can — and stays overflow-safe to ~9e12 rows via the
    per-row mod). Comparing two replicas = comparing 3 integers per
    table.

    One narrow scan + one global aggregate per table; no shuffles
    beyond the single-row final combine."""
    def fp(tbl: str, df: DataFrame, concat_cols: str) -> DataFrame:
        h = _row_fp_spark(f"concat_ws('|', {concat_cols})")
        return df.select(F.expr(h).alias("h")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(h)").alias("fp_xor"),
            F.expr(f"sum(h % {FP_SUM_MOD})").alias("fp_sum"),
        ).select(
            F.lit(tbl).alias("tbl"), "n_rows", "fp_xor", "fp_sum"
        )

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    o = fp(
        "orders",
        orders,
        "o_orderkey, o_custkey, cast(floor(o_totalprice * 100 + 0.5) as bigint), "
        "o_orderstatus, o_orderpriority",
    )
    c = fp("customer", customer, "c_custkey, c_nationkey, c_name")
    e = fp(
        "events",
        events,
        "event_id, user_id, event_type, "
        "cast(floor(value * 100 + 0.5) as bigint)",
    )
    return o.unionByName(c).unionByName(e)


def _oracle_table_fingerprint() -> str:
    def fp(tbl: str, concat_cols: str) -> str:
        h = _row_fp_duck(f"concat_ws('|', {concat_cols})")
        return f"""
        SELECT '{tbl}' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
               bit_xor(h) AS fp_xor,
               CAST(sum(h % {FP_SUM_MOD}) AS BIGINT) AS fp_sum
        FROM (SELECT {h} AS h FROM {tbl})"""

    return (
        fp(
            "orders",
            "o_orderkey, o_custkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), "
            "o_orderstatus, o_orderpriority",
        )
        + "\n    UNION ALL\n"
        + fp("customer", "c_custkey, c_nationkey, c_name")
        + "\n    UNION ALL\n"
        + fp(
            "events",
            "event_id, user_id, event_type, "
            "CAST(floor(value * 100 + 0.5) AS BIGINT)",
        )
    )


# ---------------------------------------------------------------------------
# q_skew_report — E75: join-key skew diagnostics
# ---------------------------------------------------------------------------

SKEW_KEYS = [
    ("lineitem", "l_suppkey"),
    ("lineitem", "l_orderkey"),
    ("events", "user_id"),
    ("documents", "source"),
]


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics — the measurement that decides
    whether a key needs salting (operators/skew.py) or AQE skew-join
    before a 100 TB shuffle is launched: for each candidate join key,
    the exact key-count distribution summarized as max share, p50 and
    p99 per-key counts, and distinct-key cardinality.

    The exact-percentile trick is the COUNT-OF-COUNTS decomposition
    (the E65 compressed-domain discipline applied twice): per-key
    counts are one keyed aggregation (key-cardinality-sized output),
    then counts-of-counts collapses that to one row per DISTINCT
    count value — a table bounded by the count DOMAIN, over which the
    cumulative windows computing exact p50/p99 are trivially small.
    No sort of raw rows, no percentile over the key table itself.

    Output: one row per (relation, key) with n_rows, n_keys,
    max_count, top_share_e6 (= max_count·1e6 div n_rows), p50_count,
    p99_count — all exact integers."""
    parts = []
    for tbl, key in SKEW_KEYS:
        df = load_table(spark, sf_dir, tbl)
        per_key = df.groupBy(F.col(key).alias("k")).agg(
            F.count(F.lit(1)).alias("c")
        )
        coc = per_key.groupBy("c").agg(F.count(F.lit(1)).alias("nk"))
        from pyspark.sql import Window

        w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
        wall = Window.partitionBy()
        ranked = coc.select(
            "c",
            "nk",
            F.sum("nk").over(w).alias("cum"),
            F.sum("nk").over(wall).alias("n_keys"),
            F.sum(F.col("c") * F.col("nk")).over(wall).alias("n_rows"),
            F.max("c").over(wall).alias("max_count"),
        )
        pct = ranked.agg(
            F.min("n_rows").alias("n_rows"),
            F.min("n_keys").alias("n_keys"),
            F.min("max_count").alias("max_count"),
            F.min(F.when(F.col("cum") * 100 >= F.col("n_keys") * 50, F.col("c"))).alias(
                "p50_count"
            ),
            F.min(F.when(F.col("cum") * 100 >= F.col("n_keys") * 99, F.col("c"))).alias(
                "p99_count"
            ),
        )
        parts.append(
            pct.select(
                F.lit(f"{tbl}.{key}").alias("rel_key"),
                "n_rows",
                "n_keys",
                "max_count",
                F.expr("max_count * 1000000 div n_rows").alias("top_share_e6"),
                "p50_count",
                "p99_count",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _oracle_skew_report() -> str:
    blocks = []
    for tbl, key in SKEW_KEYS:
        blocks.append(f"""
    SELECT '{tbl}.{key}' AS rel_key, n_rows, n_keys, max_count,
           max_count * 1000000 // n_rows AS top_share_e6,
           p50_count, p99_count
    FROM (
        SELECT CAST(min(n_rows) AS BIGINT) AS n_rows,
               CAST(min(n_keys) AS BIGINT) AS n_keys,
               CAST(min(max_count) AS BIGINT) AS max_count,
               CAST(min(CASE WHEN cum * 100 >= n_keys * 50 THEN c END) AS BIGINT)
                   AS p50_count,
               CAST(min(CASE WHEN cum * 100 >= n_keys * 99 THEN c END) AS BIGINT)
                   AS p99_count
        FROM (
            SELECT c, nk,
                   sum(nk) OVER (ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                   sum(nk) OVER () AS n_keys,
                   sum(c * nk) OVER () AS n_rows,
                   max(c) OVER () AS max_count
            FROM (
                SELECT c, CAST(count(*) AS BIGINT) AS nk FROM (
                    SELECT {key}, CAST(count(*) AS BIGINT) AS c
                    FROM {tbl} GROUP BY {key}
                ) GROUP BY c
            )
        )
    )""")
    return "\n    UNION ALL\n".join(blocks)


# Rebind: the report oracle gains the fingerprint rows (defined after
# the base literal, so extended here — the curation-suite precedent).
ORACLE_DATA_QUALITY = f"""
    SELECT * FROM ({ORACLE_DATA_QUALITY})
    UNION ALL
    SELECT tbl, 'fingerprint_xor' AS check, fp_xor AS value,
           CAST(NULL AS INTEGER) AS pass
    FROM ({_oracle_table_fingerprint()})
    UNION ALL
    SELECT tbl, 'fingerprint_sum', fp_sum, CAST(NULL AS INTEGER)
    FROM ({_oracle_table_fingerprint()})
    UNION ALL
    SELECT rel_key, 'skew_n_keys', n_keys, CAST(NULL AS INTEGER)
    FROM ({_oracle_skew_report()})
    UNION ALL
    SELECT rel_key, 'skew_max_count', max_count, CAST(NULL AS INTEGER)
    FROM ({_oracle_skew_report()})
    UNION ALL
    SELECT rel_key, 'skew_top_share_e6', top_share_e6, CAST(NULL AS INTEGER)
    FROM ({_oracle_skew_report()})
    UNION ALL
    SELECT rel_key, 'skew_p50_count', p50_count, CAST(NULL AS INTEGER)
    FROM ({_oracle_skew_report()})
    UNION ALL
    SELECT rel_key, 'skew_p99_count', p99_count, CAST(NULL AS INTEGER)
    FROM ({_oracle_skew_report()})
"""


QUALITY_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_data_quality_report": q_data_quality_report,
    "q_table_fingerprint": q_table_fingerprint,
    "q_skew_report": q_skew_report,
}

QUALITY_ORACLES: dict[str, str] = {
    "q_data_quality_report": ORACLE_DATA_QUALITY,
    "q_table_fingerprint": _oracle_table_fingerprint(),
    "q_skew_report": _oracle_skew_report(),
}
