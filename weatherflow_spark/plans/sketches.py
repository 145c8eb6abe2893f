"""Deterministic-sketch and layout-key queries (extension tier).

Two additions beyond the round-1 surface, both chosen so the sketch
arithmetic itself is cross-engine deterministic (polynomial hashes,
integer folds) and therefore *hash-checkable* — unlike HLL/GK whose
internals are engine-private (q_approx_count_distinct /
q_approx_quantiles are rows-only for that reason):

- **q_cms_heavy_hitters** — a count-min sketch over document tokens:
  d=4 rows × w=1024 buckets of exact integer counts (mergeable
  partials — the 100 TB shape: each executor sketches its split, the
  4096-cell table merges by addition), then a point-estimate
  (min over rows) for the exact top-10 tokens, reported next to their
  true counts. CMS estimate ≥ truth always; equality on the test
  corpus sizes shows the sketch is tight at w >> distinct-heavy-mass.
- **q_zorder_key** — the Morton z-value (operators/zorder.py) of
  (o_custkey, order epoch-day), each clamped into 10 bits, for the
  100 highest-value orders: certifies the bit-interleave the
  write_zordered layout operator range-sorts on.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from weatherflow_spark.functions import text as T
from weatherflow_spark.io import load_table
from weatherflow_spark.operators.bloom import bloom_prune
from weatherflow_spark.operators.zorder import zvalue_expr, zvalue_sql
from weatherflow_spark.plans.queries import cents_sum, scaled_sum_sql

CMS_W = 1024
# Row-hash constants: reuse the engine's fixed minhash permutation
# literals (functions/text.py) — deterministic, and a*h+b stays under
# int64 for h < 1e9+7.
CMS_ROWS = 4
CMS_TOP = 10


def _cms_bucket_spark(i: int) -> str:
    a, b = T.MINHASH_A[i], T.MINHASH_B[i]
    return f"((h * {a} + {b}) % {T.MOD}) % {CMS_W}"


def _cms_bucket_duck(i: int) -> str:
    a, b = T.MINHASH_A[i], T.MINHASH_B[i]
    return f"((h * {a} + {b}) % {T.MOD}) % {CMS_W}"


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min heavy hitters over `documents` tokens: exact top-10
    tokens by occurrence (ties broken by token hash) with their CMS
    point estimates. Two aggregates over one token explode — the
    sketch build is a (row, bucket) hash aggregate with map-side
    partials (4096 cells regardless of corpus size), the candidate
    set an ordinary top-k."""
    docs = load_table(spark, sf_dir, "documents")
    th = f"transform({T.tokens_expr('text')}, tok -> {T._tok_hash_lambda_spark('tok')})"
    toks = docs.select(F.explode(F.expr(th)).alias("h"))
    # sketch: one row per (sketch row j, bucket) with exact count
    cells = toks.select(
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"named_struct('j', {j}, 'bucket', {_cms_bucket_spark(j)})"
                    for j in range(CMS_ROWS)
                )
                + ")"
            )
        ).alias("c")
    ).groupBy(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # candidates: exact top tokens (by hash — token strings with equal
    # hash collapse, which is the sketch's own equivalence anyway)
    cand = (
        toks.groupBy("h")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("h"))
        .limit(CMS_TOP)
    )
    est = cand.select(
        "h",
        "exact_n",
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"named_struct('j', {j}, 'bucket', {_cms_bucket_spark(j)})"
                    for j in range(CMS_ROWS)
                )
                + ")"
            )
        ).alias("c"),
    ).select("h", "exact_n", F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
    return (
        est.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("h", "exact_n")
        .agg(F.min("n").alias("cms_est"))
        .select(
            F.col("h").alias("token_hash"),
            F.col("exact_n"),
            F.col("cms_est"),
        )
    )


def _cms_cells_cte() -> str:
    structs = ", ".join(
        f"{{'j': {j}, 'bucket': {_cms_bucket_duck(j)}}}" for j in range(CMS_ROWS)
    )
    return f"""
    toks AS (
        SELECT unnest({T.token_hashes_sql('text')}) AS h FROM documents
    ),
    cells AS (
        SELECT c.j AS j, c.bucket AS bucket, count(*) AS n
        FROM (SELECT unnest([{structs}]) AS c FROM toks)
        GROUP BY 1, 2
    ),
    cand AS (
        SELECT h, count(*) AS exact_n
        FROM toks GROUP BY h
        ORDER BY exact_n DESC, h ASC
        LIMIT {CMS_TOP}
    ),
    est AS (
        SELECT h, exact_n, c.j AS j, c.bucket AS bucket
        FROM (SELECT h, exact_n, unnest([{structs}]) AS c FROM cand)
    )
    """


ORACLE_CMS_HEAVY_HITTERS = f"""
    WITH {_cms_cells_cte()}
    SELECT est.h AS token_hash, est.exact_n AS exact_n, min(cells.n) AS cms_est
    FROM est JOIN cells USING (j, bucket)
    GROUP BY 1, 2
"""


Z_BITS = 10  # 2^10 day / custkey bins → 20-bit z-value


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-value of (custkey mod 2^10, order epoch-day mod 2^10)
    for the 100 highest-value orders — certifies the interleave
    arithmetic behind operators/zorder.write_zordered."""
    orders = load_table(spark, sf_dir, "orders")
    a = f"pmod(o_custkey, {1 << Z_BITS})"
    b = (
        f"pmod(cast(cast(o_orderdate as timestamp) as bigint) div 86400, "
        f"{1 << Z_BITS})"
    )
    top = orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(100)
    return top.select(
        "o_orderkey",
        F.expr(a).alias("bin_cust"),
        F.expr(f"cast({b} as bigint)").alias("bin_day"),
        F.expr(zvalue_expr(a, b, Z_BITS)).alias("zvalue"),
    )


ORACLE_ZORDER_KEY = f"""
    WITH top AS (
        SELECT o_orderkey, o_custkey,
               CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day_num
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    )
    SELECT
        o_orderkey,
        o_custkey % {1 << Z_BITS} AS bin_cust,
        day_num % {1 << Z_BITS} AS bin_day,
        {zvalue_sql(f'o_custkey % {1 << Z_BITS}', f'day_num % {1 << Z_BITS}', Z_BITS)} AS zvalue
    FROM top
"""


BLOOM_PRICE_MIN = 475000.0  # ~p95 of o_totalprice — a selective dim


def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue summary of lineitems belonging to the top ~5% orders
    by total price, with the fact scan pre-pruned by an explicit
    bloom filter on the order-key set (operators/bloom.py) before the
    exact semi join. The bloom is transparent — false positives are
    removed by the join — so the oracle is the plain semi-join SQL;
    the pruning itself is asserted in tests/test_bloom.py."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dim = orders.where(F.col("o_totalprice") > BLOOM_PRICE_MIN).select("o_orderkey")
    pruned = bloom_prune(li, dim, "l_orderkey", "o_orderkey")
    return (
        pruned.join(dim, pruned["l_orderkey"] == dim["o_orderkey"], "left_semi")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            cents_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        )
    )


ORACLE_BLOOM_SEMI_JOIN = f"""
    SELECT
        l_returnflag,
        count(*) AS n_items,
        {scaled_sum_sql('l_extendedprice')} AS sum_base_price
    FROM lineitem
    WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_totalprice > {BLOOM_PRICE_MIN}
    )
    GROUP BY l_returnflag
"""


SKETCH_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_cms_heavy_hitters": q_cms_heavy_hitters,
    "q_zorder_key": q_zorder_key,
    "q_bloom_semi_join": q_bloom_semi_join,
}

SKETCH_ORACLES: dict[str, str] = {
    "q_cms_heavy_hitters": ORACLE_CMS_HEAVY_HITTERS,
    "q_zorder_key": ORACLE_ZORDER_KEY,
    "q_bloom_semi_join": ORACLE_BLOOM_SEMI_JOIN,
}
