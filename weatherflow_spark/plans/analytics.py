"""Columnar-analytics operators: arg-max, filtered aggregation,
time-range window frames, array functions, and the composed corpus-
curation pipeline.

The reference (pratik-choudhari/WeatherFlow) has no aggregation or
array surface at all (SURVEY §2.5/§2.3 ABSENT rows) — these are the
operators its star-schema warehouse implies plus the training-data
curation surface the north star mandates, each expressed Spark-first
and hash-checked against a DuckDB oracle.

Scale notes common to this module:

- arg-max is ``max(struct(ordering, payload))`` — a *partial-
  aggregatable* expression (map-side combine, one shuffle of one row
  per group), never the window row_number()=1 idiom, which shuffles
  and sorts every input row;
- filtered aggregation stays a single pass (no self-joins, no
  ``df.filter(...).agg(...)`` per branch — one groupBy computing all
  conditional branches at once);
- time-range window frames bound state by time, not row count, so a
  skewed user cannot blow executor memory with an unbounded frame;
- array math runs inside Catalyst higher-order functions
  (``aggregate``/``transform``) — JVM codegen, no Python, no explode
  (an explode would multiply 100 TB of vectors by dim count before
  re-aggregating).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from weatherflow_spark.functions import text as T
from weatherflow_spark.io import load_table
from weatherflow_spark.plans.queries import cents_sum, scaled_sum_sql
from weatherflow_spark.plans.advanced import ORACLE_HASH_SAMPLE, q_hash_sample


# ---------------------------------------------------------------------------
# q_arg_max — per-group arg-max via partial-aggregatable max(struct)
# ---------------------------------------------------------------------------


def q_arg_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order priority: the single most expensive order (arg-max).

    ``max(struct(price, orderkey))`` compares lexicographically, so
    the orderkey rides along with the max price and doubles as the
    deterministic tie-break — and unlike the window ``row_number()=1``
    idiom this is an ordinary aggregate: map-side partial max per
    partition, then a one-row-per-group shuffle. At 100 TB that is
    the difference between shuffling 5 rows and shuffling the entire
    orders table into sorted windows. (Struct-typed agg buffers plan
    as SortAggregate rather than HashAggregate — still two-phase
    partial/final, asserted in tests/test_plans.py.) The oracle
    expresses the same semantics with the window idiom (DuckDB's
    arg_max lacks a tie-break), ordering DESC on both fields to match
    struct comparison.
    """
    orders = load_table(spark, sf_dir, "orders")
    best = F.max(
        F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
    ).alias("best")
    return (
        orders.groupBy("o_orderpriority")
        .agg(best, F.count(F.lit(1)).alias("n_orders"))
        .select(
            "o_orderpriority",
            F.col("best.k").alias("top_orderkey"),
            F.col("best.p").alias("top_price"),
            "n_orders",
        )
    )


ORACLE_ARG_MAX = """
    SELECT o_orderpriority, top_orderkey, top_price, n_orders
    FROM (
        SELECT o_orderpriority,
               o_orderkey AS top_orderkey,
               o_totalprice AS top_price,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn,
               count(*) OVER (PARTITION BY o_orderpriority) AS n_orders
        FROM orders
    )
    WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# q_conditional_agg — all conditional branches in one aggregation pass
# ---------------------------------------------------------------------------


def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order priority: open/fulfilled counts and fulfilled-only
    revenue, as *conditional aggregates in one pass* —
    ``count_if``/``sum(CASE WHEN ...)`` — never one scan per
    predicate. One shuffle of 5 partially-aggregated groups; adding
    another conditional branch adds zero I/O at any scale. Revenue
    uses the exact integer-cents sum so partial-agg order cannot
    change the double."""
    orders = load_table(spark, sf_dir, "orders")
    is_done = F.col("o_orderstatus") == "F"
    return orders.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_orderstatus") == "O").alias("n_open"),
        F.count_if(is_done).alias("n_done"),
        cents_sum(F.when(is_done, F.col("o_totalprice")).otherwise(F.lit(0.0))).alias(
            "done_revenue"
        ),
        F.count(F.lit(1)).alias("n_total"),
    )


ORACLE_CONDITIONAL_AGG = f"""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_done,
           {scaled_sum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END")}
               AS done_revenue,
           count(*) AS n_total
    FROM orders
    GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q_window_range_frame — trailing 1-hour per-user window (RANGE frame)
# ---------------------------------------------------------------------------


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: that user's event count and value sum over the
    trailing hour — a RANGE frame keyed on epoch seconds
    (``rangeBetween(-3600, 0)``), not a ROWS frame: the frame is
    bounded by *time*, so burst-y users don't change semantics and
    state per window stays (events within 1 h), not (all preceding
    rows). One shuffle on user_id; the frame scan is a single
    ordered pass per partition. Sum uses integer cents over the
    window for order-independence."""
    events = load_table(spark, sf_dir, "events")
    df = events.withColumn("ts_sec", F.col("ts").cast("timestamp").cast("long"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return df.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("trailing_1h_n"),
        (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).over(w) / 100.0).alias(
            "trailing_1h_sum"
        ),
    )


ORACLE_WINDOW_RANGE_FRAME = """
    SELECT event_id, user_id, ts,
           count(*) OVER w AS trailing_1h_n,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w / 100.0 AS trailing_1h_sum
    FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# q_array_ops — vector-column math via higher-order functions
# ---------------------------------------------------------------------------


def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per embedding: dimensionality, L2 norm, max component and its
    (1-based) position — all with Catalyst higher-order functions
    (``aggregate``, ``array_max``, ``array_position``), whole-stage
    codegen, no explode and no Python. The norm squares are scaled
    to 1e8-fixed-point integers before summing so the fold order can
    never perturb the double, then sqrt of the identical quotient on
    both engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731 — float→double exact widening
    sq_sum = F.aggregate(
        F.col("embedding"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.floor(xd(x) * xd(x) * 1e8 + F.lit(0.5)).cast("long"),
    )
    mx = F.array_max(F.col("embedding"))
    return emb.select(
        "vec_id",
        F.size(F.col("embedding")).alias("n_dims"),
        F.sqrt(sq_sum / 1e8).alias("l2_norm"),
        mx.cast("double").alias("max_val"),
        F.array_position(F.col("embedding"), mx).alias("max_pos"),
    )


ORACLE_ARRAY_OPS = """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS n_dims,
           sqrt(list_sum(list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e8 + 0.5)
                          AS BIGINT))) / 1e8) AS l2_norm,
           CAST(list_max(embedding) AS DOUBLE) AS max_val,
           CAST(list_position(embedding, list_max(embedding)) AS BIGINT) AS max_pos
    FROM embeddings
"""


# ---------------------------------------------------------------------------
# q_corpus_curation — the composed training-data pipeline
# ---------------------------------------------------------------------------

QUALITY_THRESHOLD = 0.5


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation in one plan: quality-score filter →
    language filter → exact dedup (keep lowest doc_id per content
    hash) → per-source yield stats. This is the composition a 100 TB
    training-data pipeline actually runs; expressing it as ONE
    DataFrame lets Catalyst pipeline all narrow stages (scoring,
    filtering, hashing) into the scan, leaving exactly two shuffles:
    the dedup window on content_hash and the final tiny groupBy.

    Filters compare the *rounded* (1e-6) quality score so the
    threshold test is on a value both engines compute bit-identically
    (same guarantee q_text_stats's hash-match certifies). Dedup keeps
    min doc_id — deterministic, rerun-stable.
    """
    df = load_table(spark, sf_dir, "documents")
    ntok = T.n_tokens("text")
    nchar = F.length("text").cast("int")
    punct = F.expr("size(regexp_extract_all(text, '[^a-zA-Z0-9 ]', 0))").cast("int")
    swr = T.stopword_ratio("text")
    len_sat = F.least(F.lit(1.0), ntok.cast("double") / F.lit(100.0))
    quality = (
        len_sat * F.lit(0.5)
        + (F.lit(1.0) - punct.cast("double") / nchar.cast("double")) * F.lit(0.3)
        + F.least(F.lit(1.0), swr * F.lit(5.0)) * F.lit(0.2)
    )
    scored = df.select(
        "doc_id",
        "source",
        "lang",
        F.sha2(F.trim(F.lower(F.col("text"))), 256).alias("content_hash"),
        ntok.alias("n_tokens"),
        (F.floor(quality * 1e6 + F.lit(0.5)) / 1e6).alias("quality_score"),
    ).where((F.col("lang") == "en") & (F.col("quality_score") >= QUALITY_THRESHOLD))
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    kept = scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_tokens").cast("long")).alias("total_tokens"),
        (F.sum(F.floor(F.col("quality_score") * 1e6 + F.lit(0.5)).cast("long"))
         / F.count(F.lit(1)) / 1e6).alias("avg_quality"),
    )


ORACLE_CORPUS_CURATION = f"""
    WITH scored AS (
        SELECT doc_id, source, lang,
               sha256(trim(lower(text))) AS content_hash,
               {T.n_tokens_sql('text')} AS n_tokens,
               floor((least(1.0, CAST({T.n_tokens_sql('text')} AS DOUBLE) / 100.0) * 0.5
                      + (1.0 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS INTEGER)
                               / CAST(length(text) AS DOUBLE)) * 0.3
                      + least(1.0, {T.stopword_ratio_sql('text')} * 5.0) * 0.2) * 1e6 + 0.5)
                   / 1e6 AS quality_score
        FROM documents
    ),
    filtered AS (
        SELECT * FROM scored
        WHERE lang = 'en' AND quality_score >= {QUALITY_THRESHOLD}
    ),
    kept AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
            FROM filtered
        ) WHERE rn = 1
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens,
           sum(CAST(floor(quality_score * 1e6 + 0.5) AS BIGINT)) / count(*) / 1e6
               AS avg_quality
    FROM kept
    GROUP BY source
"""


# ---------------------------------------------------------------------------
# q_window_first_last — boundary values over full-partition frames
# ---------------------------------------------------------------------------


def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: the first and last value of that user's history
    (full-partition frame) and the fraction of the user's total the
    event represents. One shuffle on user_id serving all four window
    exprs (same partitioning + ordering → a single Window node).
    Ordering is tie-broken by event_id so first/last are exact."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return events.select(
        "event_id",
        "user_id",
        F.first("value").over(full).alias("first_val"),
        F.last("value").over(full).alias("last_val"),
        F.row_number().over(w).alias("seq"),
        (cents / (F.sum(cents).over(full))).alias("share_of_user"),
    )


ORACLE_WINDOW_FIRST_LAST = """
    SELECT event_id, user_id,
           first_value(value) OVER full_w AS first_val,
           last_value(value) OVER full_w AS last_val,
           row_number() OVER w AS seq,
           CAST(floor(value * 100 + 0.5) AS BIGINT)
               / sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER full_w
               AS share_of_user
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
           full_w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# ---------------------------------------------------------------------------
# q_stratified_sample — fixed-size deterministic sample per stratum
# ---------------------------------------------------------------------------

STRATUM_N = 20


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly N documents per source, chosen by content-hash order —
    the deterministic stratified sample a training pipeline uses for
    eval splits (same rows on every run and every cluster layout,
    unlike ``sampleBy``). row_number ≤ N plans as WindowGroupLimit:
    each task keeps a per-stratum top-N heap before the shuffle, so
    the exchange carries ~N·strata rows, not the corpus."""
    df = load_table(spark, sf_dir, "documents")
    fp = F.expr(T.doc_fingerprint_expr("text"))
    w = Window.partitionBy("source").orderBy(fp.asc(), F.col("doc_id").asc())
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= STRATUM_N)
        .select("source", "doc_id", F.col("rn").alias("sample_rank"))
    )


ORACLE_STRATIFIED_SAMPLE = f"""
    SELECT source, doc_id, rn AS sample_rank
    FROM (
        SELECT source, doc_id,
               row_number() OVER (PARTITION BY source
                                  ORDER BY {T.doc_fingerprint_sql('text')} ASC,
                                           doc_id ASC) AS rn
        FROM documents
    )
    WHERE rn <= {STRATUM_N}
"""


# ---------------------------------------------------------------------------
# q_weighted_sample — Efraimidis–Spirakis weighted sampling w/o replacement
# ---------------------------------------------------------------------------

WEIGHTED_K = 50


def _es_key_sql(fp: str, w: str) -> str:
    """The Efraimidis–Spirakis sort key −ln(u)/w (top-k smallest keys
    = a weight-proportional sample without replacement), with u a
    deterministic uniform in (0, 1] derived from the cross-engine
    content fingerprint — one SQL string shared by both engines so
    the double expression trees match."""
    u = f"(CAST(({fp}) % 1000000 + 1 AS DOUBLE) / 1000000.0)"
    return f"-ln({u}) / CAST({w} AS DOUBLE)"


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count-weighted sample of 50 documents without replacement
    (Efraimidis–Spirakis): long documents are proportionally more
    likely, no document twice, and — because the uniform comes from
    the content fingerprint, not an RNG — the sample is identical on
    every run, every cluster layout, and in the DuckDB oracle. This is
    how a mixture pipeline takes "sample X tokens from this source"
    reproducibly at 100 TB.

    Narrow prelude (fingerprint + key pipeline into the scan), heap
    top-k on the e9-rounded key (TakeOrdered, no global sort)."""
    df = load_table(spark, sf_dir, "documents")
    ntok = T.n_tokens("text")
    # Empty documents weight 1 so the division is total (mirrored in
    # the oracle text).
    w_sql = f"greatest(1, size({T.tokens_expr('text')}))"
    key = F.expr(_es_key_sql(T.doc_fingerprint_expr("text"), w_sql))
    return (
        df.select(
            "doc_id",
            ntok.alias("n_tokens"),
            F.floor(key * F.lit(1e9) + F.lit(0.5)).cast("bigint").alias("es_key_e9"),
        )
        .orderBy(F.asc("es_key_e9"), F.asc("doc_id"))
        .limit(WEIGHTED_K)
    )


ORACLE_WEIGHTED_SAMPLE = f"""
    SELECT doc_id,
           {T.n_tokens_sql('text')} AS n_tokens,
           CAST(floor(({_es_key_sql(T.doc_fingerprint_sql('text'),
                                    f"greatest(1, len({T.tokens_sql('text')}))")})
                      * 1e9 + 0.5) AS BIGINT) AS es_key_e9
    FROM documents
    ORDER BY es_key_e9 ASC, doc_id ASC
    LIMIT {WEIGHTED_K}
"""


# ---------------------------------------------------------------------------
# q_sampling_suite — certification row: hash + stratified + weighted
# ---------------------------------------------------------------------------


def q_sampling_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-sampling certification row: the mod-fingerprint
    hash sample, the per-source stratified sample, and the
    Efraimidis–Spirakis weighted sample, tagged by op and unioned in
    LONG format — (op, key, metric, value:bigint). Union is plan-level
    only; singles stay in the tail."""
    hs = q_hash_sample(spark, sf_dir).selectExpr(
        "'hash' AS op",
        "cast(doc_id as string) AS key",
        "stack(2, 'fingerprint', fingerprint, "
        "'n_tokens', cast(n_tokens as bigint)) AS (metric, value)",
    )
    st = q_stratified_sample(spark, sf_dir).selectExpr(
        "'stratified' AS op",
        "concat(source, '#', cast(doc_id as string)) AS key",
        "stack(1, 'sample_rank', cast(sample_rank as bigint)) AS (metric, value)",
    )
    ws = q_weighted_sample(spark, sf_dir).selectExpr(
        "'weighted' AS op",
        "cast(doc_id as string) AS key",
        "stack(2, 'n_tokens', cast(n_tokens as bigint), "
        "'es_key_e9', es_key_e9) AS (metric, value)",
    )
    return hs.unionByName(st).unionByName(ws)


def _oracle_sampling_suite() -> str:
    return f"""
        WITH hash_side AS ({ORACLE_HASH_SAMPLE}),
        strat_side AS ({ORACLE_STRATIFIED_SAMPLE}),
        weighted_side AS ({ORACLE_WEIGHTED_SAMPLE})
        SELECT 'hash' AS op, CAST(doc_id AS VARCHAR) AS key,
               'fingerprint' AS metric, fingerprint AS value FROM hash_side
        UNION ALL
        SELECT 'hash', CAST(doc_id AS VARCHAR),
               'n_tokens', CAST(n_tokens AS BIGINT) FROM hash_side
        UNION ALL
        SELECT 'stratified', source || '#' || CAST(doc_id AS VARCHAR),
               'sample_rank', CAST(sample_rank AS BIGINT) FROM strat_side
        UNION ALL
        SELECT 'weighted', CAST(doc_id AS VARCHAR),
               'n_tokens', CAST(n_tokens AS BIGINT) FROM weighted_side
        UNION ALL
        SELECT 'weighted', CAST(doc_id AS VARCHAR),
               'es_key_e9', es_key_e9 FROM weighted_side
    """


# ---------------------------------------------------------------------------
# q_approx_quantiles — sketch-based quantiles (rows-only contract)
# ---------------------------------------------------------------------------


def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate quantiles per group
    (``percentile_approx``) — the mergeable-sketch path for 100 TB
    where exact percentiles (q_percentiles) would need a full sort:
    partial sketches per partition, one tiny merge. Sketch internals
    are engine-private, so this is a rows-only check (the exact twin
    q_percentiles is the hash-checked one). Quartiles are emitted as
    three scalar double columns (not one array column) so harnesses
    that canonicalize rows into hashable tuples can digest the frame."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75], 10000)
    return li.groupBy("l_returnflag").agg(
        F.element_at(q, 1).alias("p25"),
        F.element_at(q, 2).alias("p50"),
        F.element_at(q, 3).alias("p75"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# q_funnel — ordered conversion funnel over the event stream
# ---------------------------------------------------------------------------


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered signup → click → purchase funnel: a user converts a
    stage only with an event strictly AFTER their entry into the
    previous stage (first qualifying timestamp each time). Output is
    the 3-row stage summary with conversion vs stage 1.

    Scale shape: one data-scale exchange. Events are window-
    aggregated per user_id three times, but every window shares the
    same partition key, so Catalyst plans a single hash-partitioning
    exchange and the later windows reuse it (plan shows 2 Exchanges
    total: the user_id one plus the single-row final-totals
    SinglePartition — constant-size). The per-user funnel state then
    collapses via a partial-agg count — no self-joins, no per-stage
    scans of the fact. Sequencing with strict inequalities makes the
    result insensitive to same-timestamp ties across stages."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    staged = (
        events.select("user_id", "event_type", "ts")
        .withColumn(
            "s_ts", F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
        )
        .withColumn(
            "c_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("s_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "p_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("c_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max(F.col("s_ts").isNotNull().cast("int")).alias("did_signup"),
        F.max(F.col("c_ts").isNotNull().cast("int")).alias("did_click"),
        F.max(F.col("p_ts").isNotNull().cast("int")).alias("did_purchase"),
    )
    totals = per_user.agg(
        F.sum("did_signup").alias("n_signup"),
        F.sum("did_click").alias("n_click"),
        F.sum("did_purchase").alias("n_purchase"),
    )
    six = lambda c: (F.floor(c * 1e6 + F.lit(0.5)) / 1e6)  # noqa: E731
    # NULLIF guard: on a corpus with zero signups, Spark's non-ANSI
    # x/0 yields NULL while DuckDB's IEEE double divide yields NaN —
    # NULLIF pins both engines to NULL (mirrored in the oracle).
    denom = F.nullif(F.col("n_signup"), F.lit(0)).cast("double")
    stage = lambda tag, num: F.struct(  # noqa: E731
        F.lit(tag).alias("stage"),
        F.col(num).alias("n_users"),
        six(F.col(num).cast("double") / denom).alias("conv_vs_first"),
    )
    return totals.select(
        F.explode(
            F.array(
                stage("1_signup", "n_signup"),
                stage("2_click_after_signup", "n_click"),
                stage("3_purchase_after_click", "n_purchase"),
            )
        ).alias("s")
    ).select("s.stage", "s.n_users", "s.conv_vs_first")


ORACLE_FUNNEL = """
    WITH staged AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts
        FROM events GROUP BY user_id
    ),
    clicked AS (
        SELECT e.user_id, min(e.ts) AS c_ts
        FROM events e JOIN staged s ON e.user_id = s.user_id
        WHERE e.event_type = 'click' AND e.ts > s.s_ts
        GROUP BY e.user_id
    ),
    purchased AS (
        SELECT e.user_id, min(e.ts) AS p_ts
        FROM events e JOIN clicked c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        GROUP BY e.user_id
    ),
    totals AS (
        SELECT
            (SELECT count(*) FROM staged WHERE s_ts IS NOT NULL) AS n_signup,
            (SELECT count(*) FROM clicked) AS n_click,
            (SELECT count(*) FROM purchased) AS n_purchase
    )
    SELECT '1_signup' AS stage, n_signup AS n_users,
           floor(CAST(n_signup AS DOUBLE) / NULLIF(n_signup, 0) * 1e6 + 0.5) / 1e6
               AS conv_vs_first
    FROM totals
    UNION ALL
    SELECT '2_click_after_signup', n_click,
           floor(CAST(n_click AS DOUBLE) / NULLIF(n_signup, 0) * 1e6 + 0.5) / 1e6
    FROM totals
    UNION ALL
    SELECT '3_purchase_after_click', n_purchase,
           floor(CAST(n_purchase AS DOUBLE) / NULLIF(n_signup, 0) * 1e6 + 0.5) / 1e6
    FROM totals
"""


# ---------------------------------------------------------------------------
# q_retention — daily cohort retention matrix
# ---------------------------------------------------------------------------


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention over the event stream: users are
    cohorted by first-activity date; each later active day counts
    them at its day offset. Output: (cohort_date, day_offset,
    n_active) — the matrix every growth dashboard draws.

    Scale shape: distinct (user, day) activity first (hash agg with
    map-side partials — the raw fact collapses to at most
    users × days rows before anything else), cohort via a min-date
    agg on the same key, then one keyed join of the two small
    relations and a final count aggregate. The fact table is scanned
    once and shuffled only as its (user, day) distinct."""
    events = load_table(spark, sf_dir, "events")
    active = (
        events.select("user_id", F.to_date("ts").alias("day")).distinct()
    )
    cohort = active.groupBy("user_id").agg(F.min("day").alias("cohort_date"))
    return (
        active.join(cohort, "user_id")
        .select(
            # date keys surface as yyyy-MM-dd strings (house convention
            # for cross-engine DATE parity, see q_date_dim)
            F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort_date"),
            F.datediff(F.col("day"), F.col("cohort_date")).alias("day_offset"),
        )
        .groupBy("cohort_date", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


ORACLE_RETENTION = """
    WITH active AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    cohort AS (
        SELECT user_id, min(day) AS cohort_date FROM active GROUP BY user_id
    )
    SELECT strftime(c.cohort_date, '%Y-%m-%d') AS cohort_date,
           CAST(date_diff('day', c.cohort_date, a.day) AS INTEGER) AS day_offset,
           count(*) AS n_active
    FROM active a JOIN cohort c USING (user_id)
    GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q_product_analytics_suite — consolidated funnel + retention row
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# q_event_transitions — Markov transition matrix over per-user event paths
# ---------------------------------------------------------------------------
# q_event_sequences — E72: frequent behavioral sequence mining
# ---------------------------------------------------------------------------

SEQ_N = 3      # sequence length (trigrams of consecutive event types)
SEQ_TOP = 25


def q_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent event-SEQUENCE mining — the n-gram generalization of
    the Markov transition matrix (E35): which length-3 behavioral
    paths actually occur, how often, and across how many users. The
    product-analytics primitive behind journey analysis and funnel
    discovery (the E35 matrix only sees pairs; real funnels are
    longer).

    Physical shape: ONE user-keyed aggregation collects each user's
    type sequence in (ts, event_id) order (per-user state bounded by
    retention — the EWMA contract), trigram generation is a NARROW
    positional zip over that array (no self-join), and the
    (user, trigram)→trigram two-level aggregation gives exact
    occurrence and distinct-user counts with map-side partials at
    both levels. Final list is a heap top-{SEQ_TOP} (count desc,
    path asc)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    seqs = ev.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ts, event_id, event_type))), "
            "e -> e.event_type)"
        ).alias("types")
    )
    # Guard the short-array case: Spark's sequence(3, 2) is DESCENDING
    # (yields [3, 2], not empty like DuckDB's generate_series), so a
    # user with < SEQ_N events would hit element_at out-of-bounds.
    # Same footgun shingle_hashes_expr guards (functions/text.py).
    tris = seqs.select(
        "user_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(types) < {SEQ_N} THEN array() ELSE "
                f"transform(sequence({SEQ_N}, size(types)), i -> "
                "concat_ws('>', element_at(types, i - 2), "
                "element_at(types, i - 1), element_at(types, i))) END"
            )
        ).alias("path"),
    )
    per_user = tris.groupBy("path", "user_id").agg(
        F.count(F.lit(1)).alias("n_u")
    )
    return (
        per_user.groupBy("path")
        .agg(
            F.sum("n_u").alias("n_occurrences"),
            F.count(F.lit(1)).alias("n_users"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("path"))
        .limit(SEQ_TOP)
    )


ORACLE_EVENT_SEQUENCES = f"""
    WITH seqs AS (
        SELECT user_id, list(event_type ORDER BY ts ASC, event_id ASC) AS types
        FROM events GROUP BY user_id
    ),
    tris AS (
        SELECT user_id,
               types[i - 2] || '>' || types[i - 1] || '>' || types[i] AS path
        FROM seqs, unnest(generate_series({SEQ_N}, len(types))) AS u(i)
    ),
    per_user AS (
        SELECT path, user_id, CAST(count(*) AS BIGINT) AS n_u
        FROM tris GROUP BY path, user_id
    )
    SELECT path, CAST(sum(n_u) AS BIGINT) AS n_occurrences,
           CAST(count(*) AS BIGINT) AS n_users
    FROM per_user GROUP BY path
    ORDER BY n_occurrences DESC, path ASC
    LIMIT {SEQ_TOP}
"""


# ---------------------------------------------------------------------------
# q_assoc_rules — E63: frequent itemsets + association rules
# ---------------------------------------------------------------------------

ITEM_CLASS_MOD = 50   # l_partkey % 50 — class-densified market baskets
RULE_MIN_PAIR = 5     # minimum pair support
RULE_TOP = 50         # emitted rule budget


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-itemset mining with association rules — the basket
    analysis every retail warehouse runs (and, in a training-data
    pipeline, the tag/topic co-occurrence miner): per order the set
    of distinct part CLASSES forms a basket; pair supports come from
    the same narrow in-array pair expansion the PMI and triangle
    operators use (collect_set per basket, explode ordered pairs —
    never a basket x basket self-join); item supports from one
    explode+count. Rules (x→y and y→x per surviving pair) carry
    confidence = pair/item and lift = pair·N/(x·y), both pinned as
    e6 integers via exact BIGINT floor division — no doubles anywhere.

    Scale posture: baskets bound the expansion (|basket| ≤ class
    count, pairs ≤ C(50,2) distinct keys), supports are two keyed
    map-side-partial aggregations, the N_orders scalar rides a
    1-row broadcast cross join, and the final rule list is heap
    top-RULE_TOP (TakeOrderedAndProject)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", (F.col("l_partkey") % ITEM_CLASS_MOD).alias("item")
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("item")).alias("items")
    )
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    item_n = (
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(items, (x, i) -> "
                "transform(slice(items, i + 2, size(items)), "
                "y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    pair_n = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= RULE_MIN_PAIR)
    )
    scored = (
        pair_n.join(
            F.broadcast(item_n.select(F.col("item").alias("a"), F.col("n_item").alias("n_a"))),
            "a",
        )
        .join(
            F.broadcast(item_n.select(F.col("item").alias("b"), F.col("n_item").alias("n_b"))),
            "b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "a",
            "b",
            "n_pair",
            "n_a",
            "n_b",
            F.expr("n_pair * 1000000 div n_a").alias("conf_ab_e6"),
            F.expr("n_pair * 1000000 div n_b").alias("conf_ba_e6"),
            # staged division keeps intermediates <= N*1e6 (overflow-safe to
            # ~3e9 baskets; the single-expression form caps at ~3e6)
            F.expr("(n_pair * n_orders div n_a) * 1000000 div n_b").alias("lift_e6"),
        )
    )
    return scored.orderBy(
        F.desc("n_pair"), F.asc("a"), F.asc("b")
    ).limit(RULE_TOP)


ORACLE_ASSOC_RULES = f"""
    WITH li AS (
        SELECT l_orderkey, l_partkey % {ITEM_CLASS_MOD} AS item FROM lineitem
    ),
    baskets AS (
        SELECT l_orderkey, list_sort(list_distinct(list(item))) AS items
        FROM li GROUP BY l_orderkey
    ),
    n_orders_t AS (SELECT CAST(count(*) AS BIGINT) AS n_orders FROM baskets),
    item_n AS (
        SELECT item, CAST(count(*) AS BIGINT) AS n_item FROM (
            SELECT l_orderkey, unnest(items) AS item FROM baskets
        ) GROUP BY item
    ),
    pair_n AS (
        SELECT x.item AS a, y.item AS b, CAST(count(*) AS BIGINT) AS n_pair
        FROM (SELECT l_orderkey, unnest(items) AS item FROM baskets) x
        JOIN (SELECT l_orderkey, unnest(items) AS item FROM baskets) y
          ON x.l_orderkey = y.l_orderkey AND x.item < y.item
        GROUP BY x.item, y.item
        HAVING count(*) >= {RULE_MIN_PAIR}
    )
    SELECT p.a, p.b, p.n_pair, ia.n_item AS n_a, ib.n_item AS n_b,
           p.n_pair * 1000000 // ia.n_item AS conf_ab_e6,
           p.n_pair * 1000000 // ib.n_item AS conf_ba_e6,
           (p.n_pair * n.n_orders // ia.n_item) * 1000000 // ib.n_item
               AS lift_e6
    FROM pair_n p
    JOIN item_n ia ON ia.item = p.a
    JOIN item_n ib ON ib.item = p.b
    CROSS JOIN n_orders_t n
    ORDER BY p.n_pair DESC, p.a ASC, p.b ASC
    LIMIT {RULE_TOP}
"""


# ---------------------------------------------------------------------------


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream: for
    each user's time-ordered path, count (event_type → next event_type)
    hops and the per-source-state transition probability — the "what
    do users do next" path analysis that sits beside funnel and
    retention in every product-analytics stack.

    Probability is integer-exact: p_e6 = (n·10^6) div out-degree — no
    doubles anywhere, so the matrix hash-checks with no rounding
    epsilon. Scale posture: one hash exchange on user_id for the lead
    window, one on the (from, to) pair for the count; the per-state
    totals come from a window over the pair counts (state-cardinality
    rows — no second data-scale shuffle, no join)."""
    ev = load_table(spark, sf_dir, "events")
    nxt = ev.select(
        F.col("event_type").alias("from_type"),
        F.expr(
            "lead(event_type) OVER "
            "(PARTITION BY user_id ORDER BY ts ASC, event_id ASC)"
        ).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = nxt.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    # `div`, not `/`: Spark's / on longs goes through DOUBLE and the
    # truncating cast could land one off from DuckDB's exact integer //.
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.expr(
            "CAST((n * 1000000L) div "
            "sum(n) OVER (PARTITION BY from_type) AS BIGINT)"
        ).alias("p_e6"),
    )


ORACLE_EVENT_TRANSITIONS = """
    WITH hops AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER
                   (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                   AS to_type
        FROM events
    ),
    counts AS (
        SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        FROM hops WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           CAST((n * 1000000) // sum(n) OVER (PARTITION BY from_type)
                AS BIGINT) AS p_e6
    FROM counts
"""


def q_product_analytics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-analytics certification row: the ordered conversion
    funnel (3 stage rows) + the cohort retention matrix + the Markov
    event-transition matrix, tagged by op
    and unioned on a normalized schema — funnel rows key by stage and
    carry the conversion ratio; retention rows key by cohort date and
    carry the day offset; each fills the other's columns with typed
    NULLs. The union is plan-level only (no cross-branch shuffle);
    single-op twins stay registered in the tail."""
    funnel = q_funnel(spark, sf_dir).select(
        F.lit("funnel").alias("op"),
        F.col("stage").alias("key"),
        F.lit(None).cast("int").alias("day_offset"),
        F.col("n_users").alias("n"),
        F.col("conv_vs_first").alias("ratio"),
    )
    retention = q_retention(spark, sf_dir).select(
        F.lit("retention").alias("op"),
        F.col("cohort_date").alias("key"),
        "day_offset",
        F.col("n_active").alias("n"),
        F.lit(None).cast("double").alias("ratio"),
    )
    # ratio from the integer-exact p_e6 (one exact double division) —
    # never a re-derived float share.
    transitions = q_event_transitions(spark, sf_dir).select(
        F.lit("transitions").alias("op"),
        F.concat_ws(">", "from_type", "to_type").alias("key"),
        F.lit(None).cast("int").alias("day_offset"),
        F.col("n"),
        (F.col("p_e6").cast("double") / F.lit(1e6)).alias("ratio"),
    )
    # E63: association rules — key is the item pair, n the pair
    # support, ratio the exact e6-integer lift re-widened to double.
    rules = q_assoc_rules(spark, sf_dir).select(
        F.lit("assoc_rules").alias("op"),
        F.concat_ws("|", "a", "b").alias("key"),
        F.lit(None).cast("int").alias("day_offset"),
        F.col("n_pair").alias("n"),
        (F.col("lift_e6").cast("double") / F.lit(1e6)).alias("ratio"),
    )
    # E72: frequent behavioral sequences — ratio carries the exact
    # distinct-user count re-widened to double.
    seqs = q_event_sequences(spark, sf_dir).select(
        F.lit("sequences").alias("op"),
        F.col("path").alias("key"),
        F.lit(None).cast("int").alias("day_offset"),
        F.col("n_occurrences").alias("n"),
        F.col("n_users").cast("double").alias("ratio"),
    )
    return (
        funnel.unionByName(retention)
        .unionByName(transitions)
        .unionByName(rules)
        .unionByName(seqs)
    )


ORACLE_PRODUCT_ANALYTICS_SUITE = f"""
    WITH funnel_side AS ({ORACLE_FUNNEL}),
    retention_side AS ({ORACLE_RETENTION}),
    transitions_side AS ({ORACLE_EVENT_TRANSITIONS}),
    rules_side AS ({ORACLE_ASSOC_RULES}),
    seqs_side AS ({ORACLE_EVENT_SEQUENCES})
    SELECT 'funnel' AS op, stage AS key, CAST(NULL AS INTEGER) AS day_offset,
           n_users AS n, conv_vs_first AS ratio
    FROM funnel_side
    UNION ALL
    SELECT 'retention', cohort_date, day_offset, n_active,
           CAST(NULL AS DOUBLE)
    FROM retention_side
    UNION ALL
    SELECT 'transitions', from_type || '>' || to_type,
           CAST(NULL AS INTEGER), n, CAST(p_e6 AS DOUBLE) / 1e6
    FROM transitions_side
    UNION ALL
    SELECT 'assoc_rules', CAST(a AS VARCHAR) || '|' || CAST(b AS VARCHAR),
           CAST(NULL AS INTEGER), n_pair, CAST(lift_e6 AS DOUBLE) / 1e6
    FROM rules_side
    UNION ALL
    SELECT 'sequences', path, CAST(NULL AS INTEGER), n_occurrences,
           CAST(n_users AS DOUBLE)
    FROM seqs_side
"""


ANALYTICS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_arg_max": q_arg_max,
    "q_conditional_agg": q_conditional_agg,
    "q_window_range_frame": q_window_range_frame,
    "q_array_ops": q_array_ops,
    "q_corpus_curation": q_corpus_curation,
    "q_window_first_last": q_window_first_last,
    "q_stratified_sample": q_stratified_sample,
    "q_approx_quantiles": q_approx_quantiles,
    "q_funnel": q_funnel,
    "q_retention": q_retention,
    "q_event_transitions": q_event_transitions,
    "q_assoc_rules": q_assoc_rules,
    "q_event_sequences": q_event_sequences,
    "q_product_analytics_suite": q_product_analytics_suite,
    "q_weighted_sample": q_weighted_sample,
    "q_sampling_suite": q_sampling_suite,
}

ANALYTICS_ORACLES: dict[str, str] = {
    "q_window_first_last": ORACLE_WINDOW_FIRST_LAST,
    "q_stratified_sample": ORACLE_STRATIFIED_SAMPLE,
    # q_approx_quantiles: rows-only (engine-private sketch)
    "q_arg_max": ORACLE_ARG_MAX,
    "q_conditional_agg": ORACLE_CONDITIONAL_AGG,
    "q_window_range_frame": ORACLE_WINDOW_RANGE_FRAME,
    "q_array_ops": ORACLE_ARRAY_OPS,
    "q_corpus_curation": ORACLE_CORPUS_CURATION,
    "q_funnel": ORACLE_FUNNEL,
    "q_retention": ORACLE_RETENTION,
    "q_event_transitions": ORACLE_EVENT_TRANSITIONS,
    "q_assoc_rules": ORACLE_ASSOC_RULES,
    "q_event_sequences": ORACLE_EVENT_SEQUENCES,
    "q_product_analytics_suite": ORACLE_PRODUCT_ANALYTICS_SUITE,
    "q_weighted_sample": ORACLE_WEIGHTED_SAMPLE,
    "q_sampling_suite": _oracle_sampling_suite(),
}
