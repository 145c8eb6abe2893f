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


def cms_cells(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(j, bucket, n): the CMS cell-count table for a document set —
    4·1024 cells regardless of corpus size, built as one token
    explode + hash aggregate with map-side partials. Factored out so
    the streaming sink (``streaming.pipeline.foreach_batch_cms``)
    builds per-batch cells with the EXACT same hash pipeline as the
    one-shot query; cell counts ADD across batches (the CMS
    mergeability law), so summed slices equal a one-shot sketch."""
    th = (
        f"transform({T.tokens_expr(text_col)}, "
        f"tok -> {T._tok_hash_lambda_spark('tok')})"
    )
    toks = docs.select(F.explode(F.expr(th)).alias("h"))
    return (
        toks.select(
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
        )
        .groupBy(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


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
    cells = cms_cells(docs)
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


# ---------------------------------------------------------------------------
# q_hll_distinct — deterministic HyperLogLog (hash-checkable registers)
# ---------------------------------------------------------------------------

HLL_M = 256          # registers (bucket = low 8 bits of the mixed hash)
HLL_W = 53           # rho frame: (mixed div 256) % 2^53, mixed < 2^62
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# alpha * m^2 * 2^(W+1) — the whole numerator as ONE double literal, so
# the raw estimate is a single deterministic division by the
# integer-exact register sum (weights are 2^(W+1-rho), rho ∈ [1, W+1]).
_HLL_C = _HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_W + 1))

_LIMB = 1 << 31
_M62 = 1 << 62
# Murmur3 finalizer constants folded into the 62-bit domain (both odd).
_HLL_C1 = 0xFF51AFD7ED558CCD % _M62
_HLL_C2 = 0xC4CEB9FE1A85EC53 % _M62


def _hll_rho_case(var: str) -> str:
    """CASE ladder: rho = leading zeros of `var` in a fixed
    ``HLL_W``-bit frame, +1 (var = 0 → W+1). Pure integer
    comparisons — identical text is valid Spark SQL and DuckDB SQL,
    and stays inside whole-stage codegen (no log2/doubles, which
    round differently across engines)."""
    whens = " ".join(
        f"WHEN {var} >= {1 << (HLL_W - k)} THEN {k}"
        for k in range(1, HLL_W + 1)
    )
    return f"CASE {whens} ELSE {HLL_W + 1} END"


def _mulmod62(var: str, c: int, div: str) -> str:
    """``(var * c) mod 2^62`` without any intermediate exceeding
    2^63 — 31-bit-limb decomposition, safe under Spark's ANSI
    overflow checking and identical integer-for-integer in DuckDB
    (``div`` is the engine's integer-division spelling)."""
    ch, cl = c >> 31, c & (_LIMB - 1)
    return (
        f"((((({var} % {_LIMB}) * {ch} + ({var} {div} {_LIMB}) * {cl})"
        f" % {_LIMB}) * {_LIMB} + ({var} % {_LIMB}) * {cl}) % {_M62})"
    )


def _hll_mixed_hash(fold_expr: str, div: str, xor) -> str:
    """Murmur-style avalanche over the engine's polynomial char-fold:
    two xor-shift + multiply-mod-2^62 rounds. The raw fold is nearly
    linear on short numeric strings (it never wraps the modulus), so
    its low bits would make a catastrophically biased HLL; the
    finalizer restores the uniform-bit contract HLL needs. Built from
    let-bound lambdas so each stage is evaluated once per row."""
    y1 = xor("a", f"({'a'} {div} {_LIMB})")  # a ^ (a >> 31), div == shift
    z1 = _mulmod62("y1", _HLL_C1, div)
    y2 = xor("z1", f"(z1 {div} {_LIMB})")
    z2 = _mulmod62("y2", _HLL_C2, div)
    h = xor("z2", f"(z2 {div} {_LIMB})")
    if div == "div":  # Spark spelling
        lets = T.let_spark
    else:
        lets = T.let_duck
    return lets(
        fold_expr, "a",
        lets(y1, "y1",
             lets(z1, "z1",
                  lets(y2, "y2", lets(z2, "z2", h)))),
    )


def hll_registers(df: DataFrame, col: str) -> DataFrame:
    """(b, m): the HLL register table of ``df[col]`` — bucket and
    max-rho from the mixed hash. This is the mergeable partial: the
    registers of a union of datasets are the bucket-wise ``max`` of
    their register tables (asserted in tests/test_extensions.py), so
    at 100 TB each executor/partition/day sketches independently and
    the 256-row tables merge by one tiny max-aggregation."""
    fold = T._tok_hash_lambda_spark(f"cast({col} as string)")
    mixed = _hll_mixed_hash(fold, "div", lambda x, y: f"({x} ^ {y})")
    rows = df.select(
        F.expr(f"{mixed} % {HLL_M}").alias("b"),
        F.expr(
            T.let_spark(
                f"({mixed} div {HLL_M}) % {1 << HLL_W}",
                "rest",
                _hll_rho_case("rest"),
            )
        ).cast("int").alias("r"),
    )
    return rows.groupBy("b").agg(F.max("r").alias("m"))


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count of orders.o_custkey with fully
    deterministic internals — the hash-checkable upgrade over the
    rows-only q_approx_count_distinct (whose HLL++ internals are
    engine-private): the value hash is the engine's cross-engine
    polynomial fold, registers are an exact (bucket, max-rho) table,
    and the estimate is one double division of integer-exact terms.

    Mergeable by construction: each executor's partial is its own
    max-per-bucket table and merges by max — the same 100 TB shape as
    the count-min sketch above. Output: raw HLL estimate next to the
    exact distinct count and the relative error (×1e-4 rounded).
    """
    orders = load_table(spark, sf_dir, "orders")
    regs = hll_registers(orders, "o_custkey")
    summary = regs.agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {HLL_W + 1} - m)")).alias("s_hit"),
        F.count(F.lit(1)).alias("present"),
    )
    exact = orders.agg(
        F.countDistinct("o_custkey").alias("exact_distinct")
    )
    raw = F.lit(_HLL_C) / (
        F.col("s_hit")
        + (F.lit(HLL_M) - F.col("present")) * F.lit(1 << (HLL_W + 1))
    ).cast("double")
    zeros = F.lit(HLL_M) - F.col("present")
    # Standard small-range correction: linear counting on the empty
    # registers when the raw estimate is under 2.5m. The single ln()
    # is the one non-integer step; its result is rounded (1e2/1e4)
    # before exposure, far coarser than any cross-libm ulp.
    est = F.when(
        (raw < F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(raw)
    return (
        summary.crossJoin(exact)
        .select(
            F.col("exact_distinct"),
            (F.floor(est * 1e2 + F.lit(0.5)) / 1e2).alias("hll_estimate"),
            zeros.cast("int").alias("n_zero_registers"),
            (
                F.floor(
                    F.abs(est - F.col("exact_distinct").cast("double"))
                    / F.col("exact_distinct").cast("double")
                    * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("rel_err"),
        )
    )


def _oracle_hll_distinct() -> str:
    fold = T._tok_hash_lambda_duck("CAST(o_custkey AS VARCHAR)")
    mixed = _hll_mixed_hash(fold, "//", lambda x, y: f"xor({x}, {y})")
    est = f"""CASE WHEN {_HLL_C!r} / CAST(s_hit + ({HLL_M} - present)
                       * {1 << (HLL_W + 1)} AS DOUBLE) < {2.5 * HLL_M}
                   AND present < {HLL_M}
              THEN {float(HLL_M)!r} * ln({float(HLL_M)!r}
                                         / CAST({HLL_M} - present AS DOUBLE))
              ELSE {_HLL_C!r} / CAST(s_hit + ({HLL_M} - present)
                                     * {1 << (HLL_W + 1)} AS DOUBLE) END"""
    return f"""
    WITH rows_h AS (
        SELECT {mixed} % {HLL_M} AS b,
               CAST({T.let_duck(f"({mixed} // {HLL_M}) % {1 << HLL_W}",
                                'rest', _hll_rho_case('rest'))}
                    AS INTEGER) AS r
        FROM orders
    ),
    regs AS (SELECT b, max(r) AS m FROM rows_h GROUP BY b),
    summary AS (
        SELECT CAST(sum(CAST(1 AS BIGINT) << ({HLL_W + 1} - m)) AS BIGINT) AS s_hit,
               count(*) AS present
        FROM regs
    ),
    exact AS (
        SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
        FROM orders
    )
    SELECT exact_distinct,
           floor(({est}) * 1e2 + 0.5) / 1e2 AS hll_estimate,
           CAST({HLL_M} - present AS INTEGER) AS n_zero_registers,
           floor(abs(({est}) - CAST(exact_distinct AS DOUBLE))
                 / CAST(exact_distinct AS DOUBLE) * 1e4 + 0.5) / 1e4 AS rel_err
    FROM summary CROSS JOIN exact
"""


# ---------------------------------------------------------------------------
# q_hll_grouped — E49: per-group HLL distinct (GROUP BY + sketch)
# ---------------------------------------------------------------------------


def q_hll_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via PER-GROUP HyperLogLog — the
    shape approx-distinct actually takes in production dashboards
    (`GROUP BY key, approx_count_distinct(col)`), with the same
    deterministic internals as q_hll_distinct so it hash-checks.

    The register table gains the group key: (key, bucket) → max-rho,
    still mergeable by bucket-wise max WITHIN each group — at 100 TB
    each partition sketches every group independently and the
    exchange carries ≤ groups × 256 rows per partition (map-side max
    partials), never the raw rows. The small-range linear-counting
    correction applies per group (these cardinalities sit well under
    2.5·m, exactly where production group-bys live)."""
    ev = load_table(spark, sf_dir, "events")
    rows = grouped_hll_rows(ev, "user_id", "event_type")
    regs = rows.groupBy("event_type", "b").agg(F.max("r").alias("m"))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return serve_grouped_hll(regs, exact)


def grouped_hll_rows(df: DataFrame, value_col: str, *keys: str) -> DataFrame:
    """(keys..., b, r): one mixed-hash row per input row, ready for
    the (keys, b) → max(r) register aggregation. Factored out so the
    persisted sketch cube (plans/serving.q_sketch_serve) computes its
    per-slice partials with the exact same hash pipeline the one-shot
    query uses — byte-identical registers is the merge contract."""
    fold = T._tok_hash_lambda_spark(f"cast({value_col} as string)")
    mixed = _hll_mixed_hash(fold, "div", lambda x, y: f"({x} ^ {y})")
    return df.select(
        *keys,
        F.expr(f"{mixed} % {HLL_M}").alias("b"),
        F.expr(
            T.let_spark(
                f"({mixed} div {HLL_M}) % {1 << HLL_W}",
                "rest",
                _hll_rho_case("rest"),
            )
        ).cast("int").alias("r"),
    )


def serve_grouped_hll(
    regs: DataFrame, exact: DataFrame, key: str = "event_type"
) -> DataFrame:
    """Per-``key`` HLL estimate from a (key, b, m) register table +
    per-key small-range linear counting — the serve half shared by the
    one-shot query and the persisted-cube serve."""
    summary = regs.groupBy(key).agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {HLL_W + 1} - m)")).alias(
            "s_hit"
        ),
        F.count(F.lit(1)).alias("present"),
    )
    raw = F.lit(_HLL_C) / (
        F.col("s_hit")
        + (F.lit(HLL_M) - F.col("present")) * F.lit(1 << (HLL_W + 1))
    ).cast("double")
    zeros = F.lit(HLL_M) - F.col("present")
    est = F.when(
        (raw < F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(raw)
    return summary.join(exact, key).select(
        key,
        F.col("exact_distinct"),
        (F.floor(est * 1e2 + F.lit(0.5)) / 1e2).alias("hll_estimate"),
        zeros.cast("int").alias("n_zero_registers"),
    )


def _oracle_hll_grouped() -> str:
    fold = T._tok_hash_lambda_duck("CAST(user_id AS VARCHAR)")
    mixed = _hll_mixed_hash(fold, "//", lambda x, y: f"xor({x}, {y})")
    est = f"""CASE WHEN {_HLL_C!r} / CAST(s_hit + ({HLL_M} - present)
                       * {1 << (HLL_W + 1)} AS DOUBLE) < {2.5 * HLL_M}
                   AND present < {HLL_M}
              THEN {float(HLL_M)!r} * ln({float(HLL_M)!r}
                                         / CAST({HLL_M} - present AS DOUBLE))
              ELSE {_HLL_C!r} / CAST(s_hit + ({HLL_M} - present)
                                     * {1 << (HLL_W + 1)} AS DOUBLE) END"""
    return f"""
    WITH rows_h AS (
        SELECT event_type,
               {mixed} % {HLL_M} AS b,
               CAST({T.let_duck(f"({mixed} // {HLL_M}) % {1 << HLL_W}",
                                'rest', _hll_rho_case('rest'))}
                    AS INTEGER) AS r
        FROM events
    ),
    regs AS (
        SELECT event_type, b, max(r) AS m FROM rows_h GROUP BY event_type, b
    ),
    summary AS (
        SELECT event_type,
               CAST(sum(CAST(1 AS BIGINT) << ({HLL_W + 1} - m)) AS BIGINT)
                   AS s_hit,
               count(*) AS present
        FROM regs GROUP BY event_type
    ),
    exact AS (
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
        FROM events GROUP BY event_type
    )
    SELECT s.event_type, exact_distinct,
           floor(({est}) * 1e2 + 0.5) / 1e2 AS hll_estimate,
           CAST({HLL_M} - present AS INTEGER) AS n_zero_registers
    FROM summary s JOIN exact USING (event_type)
"""


# ---------------------------------------------------------------------------
# q_sketch_suite — certification row: CMS + HLL + bloom, one hash
# ---------------------------------------------------------------------------


def q_sketch_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-tier certification row: count-min heavy hitters, the
    deterministic HLL summary, and the bloom-pruned semi-join revenue
    rows, tagged by op and unioned in LONG format — (op, key, metric,
    value:bigint); rounded doubles re-scale to their integer grids
    (HLL estimate e2, rel-err e4, revenue cents). Union is plan-level
    only; singles stay in the tail."""
    cms = q_cms_heavy_hitters(spark, sf_dir).selectExpr(
        "'cms' AS op",
        "cast(token_hash as string) AS key",
        "stack(2, 'exact_n', cast(exact_n as bigint), "
        "'cms_est', cast(cms_est as bigint)) AS (metric, value)",
    )
    hll = q_hll_distinct(spark, sf_dir).selectExpr(
        "'hll' AS op",
        "'all' AS key",
        "stack(4, 'exact_distinct', cast(exact_distinct as bigint), "
        "'estimate_e2', cast(floor(hll_estimate * 1e2 + 0.5) as bigint), "
        "'n_zero_registers', cast(n_zero_registers as bigint), "
        "'rel_err_e4', cast(floor(rel_err * 1e4 + 0.5) as bigint)) "
        "AS (metric, value)",
    )
    bloom = q_bloom_semi_join(spark, sf_dir).selectExpr(
        "'bloom' AS op",
        "l_returnflag AS key",
        "stack(2, 'n_items', cast(n_items as bigint), "
        "'cents', cast(floor(sum_base_price * 1e2 + 0.5) as bigint)) "
        "AS (metric, value)",
    )
    # E49: the GROUP BY form of the deterministic HLL.
    hllg = q_hll_grouped(spark, sf_dir).selectExpr(
        "'hll_grouped' AS op",
        "event_type AS key",
        "stack(3, 'exact_distinct', cast(exact_distinct as bigint), "
        "'estimate_e2', cast(floor(hll_estimate * 1e2 + 0.5) as bigint), "
        "'n_zero_registers', cast(n_zero_registers as bigint)) "
        "AS (metric, value)",
    )
    return cms.unionByName(hll).unionByName(bloom).unionByName(hllg)


def _oracle_sketch_suite() -> str:
    return f"""
        WITH cms_side AS ({ORACLE_CMS_HEAVY_HITTERS}),
        hll_side AS ({_oracle_hll_distinct()}),
        hllg_side AS ({_oracle_hll_grouped()}),
        bloom_side AS ({ORACLE_BLOOM_SEMI_JOIN})
        SELECT 'cms' AS op, CAST(token_hash AS VARCHAR) AS key,
               'exact_n' AS metric, CAST(exact_n AS BIGINT) AS value
        FROM cms_side
        UNION ALL
        SELECT 'cms', CAST(token_hash AS VARCHAR),
               'cms_est', CAST(cms_est AS BIGINT) FROM cms_side
        UNION ALL
        SELECT 'hll', 'all', 'exact_distinct',
               CAST(exact_distinct AS BIGINT) FROM hll_side
        UNION ALL
        SELECT 'hll', 'all', 'estimate_e2',
               CAST(floor(hll_estimate * 1e2 + 0.5) AS BIGINT) FROM hll_side
        UNION ALL
        SELECT 'hll', 'all', 'n_zero_registers',
               CAST(n_zero_registers AS BIGINT) FROM hll_side
        UNION ALL
        SELECT 'hll', 'all', 'rel_err_e4',
               CAST(floor(rel_err * 1e4 + 0.5) AS BIGINT) FROM hll_side
        UNION ALL
        SELECT 'bloom', l_returnflag, 'n_items',
               CAST(n_items AS BIGINT) FROM bloom_side
        UNION ALL
        SELECT 'bloom', l_returnflag, 'cents',
               CAST(floor(sum_base_price * 1e2 + 0.5) AS BIGINT) FROM bloom_side
        UNION ALL
        SELECT 'hll_grouped', event_type, 'exact_distinct',
               CAST(exact_distinct AS BIGINT) FROM hllg_side
        UNION ALL
        SELECT 'hll_grouped', event_type, 'estimate_e2',
               CAST(floor(hll_estimate * 1e2 + 0.5) AS BIGINT) FROM hllg_side
        UNION ALL
        SELECT 'hll_grouped', event_type, 'n_zero_registers',
               CAST(n_zero_registers AS BIGINT) FROM hllg_side
    """


SKETCH_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_hll_grouped": q_hll_grouped,
    "q_cms_heavy_hitters": q_cms_heavy_hitters,
    "q_zorder_key": q_zorder_key,
    "q_bloom_semi_join": q_bloom_semi_join,
    "q_hll_distinct": q_hll_distinct,
    "q_sketch_suite": q_sketch_suite,
}

SKETCH_ORACLES: dict[str, str] = {
    "q_hll_grouped": _oracle_hll_grouped(),
    "q_cms_heavy_hitters": ORACLE_CMS_HEAVY_HITTERS,
    "q_zorder_key": ORACLE_ZORDER_KEY,
    "q_bloom_semi_join": ORACLE_BLOOM_SEMI_JOIN,
    "q_hll_distinct": _oracle_hll_distinct(),
    "q_sketch_suite": _oracle_sketch_suite(),
}
