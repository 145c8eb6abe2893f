"""Extension tier E3 (SURVEY §2.11): text analysis over `documents`.

The reference has no string surface at all (SURVEY §2.3 — "String
functions beyond date formatting: ABSENT"); these are the mandated
training-data-pipeline operators: quality scoring, token counting
(whitespace + BPE-ish regex), language-ID (stopword-hit heuristic),
and document fingerprinting (rolling hash).

Every query here is hash-checked against a DuckDB oracle — including
the fingerprint/hash ops, because all hashing is the cross-engine
polynomial hash from :mod:`weatherflow_spark.functions.text` rather
than an engine-private hash function.

Scale posture: all per-document derivations are narrow (no shuffle;
they pipeline into the parquet scan inside whole-stage codegen). The
only shuffles are the token-count aggregate (map-side partial first)
and the final top-k (TakeOrderedAndProject — no global sort).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from weatherflow_spark.functions import text as T
from weatherflow_spark.io import load_table
from weatherflow_spark.operators.caching import tracked_persist

_LANGS = sorted(T.LANG_STOPWORDS)

# Rows per source above which per-source SELECTION queries (the E51
# percentile cut, the E32 quota cap) switch from the hash-partitioned
# window (one task per source) to the distributed exact rank of
# operators/indexing.assign_grouped_rank. Sized so a source's window
# partition stays well under one executor's memory; never reached at
# test SFs (both paths are result-identical and equality-tested on a
# skewed fixture, tests/test_scale_ops.py).
PPL_SKEW_THRESHOLD = 5_000_000
# Per-input source census memo, keyed by (dir, data mtime) so a
# rewritten corpus at the same path re-measures instead of reusing a
# stale census (r8 review) — pay the (cheap, one-column) counting
# scan once per data VERSION, not once per build.
_PPL_SRC_CENSUS: dict[tuple, int] = {}


def _docs_mtime(sf_dir: str) -> float:
    import os

    p = os.path.join(sf_dir, "documents.parquet")
    try:
        if os.path.isdir(p):
            return max(
                (e.stat().st_mtime for e in os.scandir(p)), default=0.0
            )
        return os.path.getmtime(p)
    except OSError:
        return 0.0


def _max_source_rows(spark: SparkSession, sf_dir: str) -> int:
    key = (sf_dir, _docs_mtime(sf_dir))
    if key not in _PPL_SRC_CENSUS:
        top = (
            load_table(spark, sf_dir, "documents")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("m"))
            .collect()
        )
        _PPL_SRC_CENSUS[key] = int(top[0].m) if top and top[0].m is not None else 0
    return _PPL_SRC_CENSUS[key]


# ---------------------------------------------------------------------------
# q_text_stats — quality scoring (length / punct / stopword ratios)
# ---------------------------------------------------------------------------


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics. Quality score is a deterministic
    blend: length saturation (0..1), non-punct ratio, stopword-rate
    band — the standard heuristic pre-filter for LLM training corpora
    (cf. Gopher/C4-style rules), all as closed-form column exprs."""
    df = load_table(spark, sf_dir, "documents")
    ntok = T.n_tokens("text")
    nchar = F.length("text").cast("int")
    punct = F.expr("size(regexp_extract_all(text, '[^a-zA-Z0-9 ]', 0))").cast("int")
    swr = T.stopword_ratio("text")
    len_sat = F.least(F.lit(1.0), ntok.cast("double") / F.lit(100.0))
    punct_ratio = punct.cast("double") / nchar.cast("double")
    quality = (
        len_sat * F.lit(0.5)
        + (F.lit(1.0) - punct_ratio) * F.lit(0.3)
        + F.least(F.lit(1.0), swr * F.lit(5.0)) * F.lit(0.2)
    )
    return df.select(
        F.col("doc_id"),
        nchar.alias("n_chars_calc"),
        ntok.alias("n_tokens"),
        T.bpe_token_count("text").alias("n_bpe_tokens"),
        punct.alias("n_punct"),
        (F.floor(swr * 1e6 + F.lit(0.5)) / 1e6).alias("stopword_ratio"),
        (F.floor(quality * 1e6 + F.lit(0.5)) / 1e6).alias("quality_score"),
    )


ORACLE_TEXT_STATS = f"""
    WITH m AS (
        SELECT
            doc_id,
            CAST(length(text) AS INTEGER) AS n_chars_calc,
            {T.n_tokens_sql('text')} AS n_tokens,
            {T.bpe_token_count_sql('text')} AS n_bpe_tokens,
            CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS INTEGER) AS n_punct,
            {T.stopword_ratio_sql('text')} AS swr
        FROM documents
    )
    SELECT
        doc_id, n_chars_calc, n_tokens, n_bpe_tokens, n_punct,
        floor(swr * 1e6 + 0.5) / 1e6 AS stopword_ratio,
        floor((least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.5
               + (1.0 - CAST(n_punct AS DOUBLE) / CAST(n_chars_calc AS DOUBLE)) * 0.3
               + least(1.0, swr * 5.0) * 0.2) * 1e6 + 0.5) / 1e6 AS quality_score
    FROM m
"""


# ---------------------------------------------------------------------------
# q_token_topk — corpus token frequencies (explode → agg → top-k)
# ---------------------------------------------------------------------------


def q_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 tokens by corpus frequency. Explode is a narrow op; the
    groupBy does a map-side partial count before the 32-partition
    exchange; the final top-k is TakeOrderedAndProject (no full
    sort). Ties broken by token text for determinism."""
    df = load_table(spark, sf_dir, "documents")
    return (
        df.select(F.explode(T.tokens("text")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(25)
    )


ORACLE_TOKEN_TOPK = f"""
    SELECT token, count(*) AS n
    FROM (SELECT unnest({T.tokens_sql('text')}) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 25
"""


# ---------------------------------------------------------------------------
# q_lang_id — stopword-hit language identification
# ---------------------------------------------------------------------------


def _argmax_case(scores: dict[str, str]) -> str:
    """CASE chain picking the alphabetically-first language with the
    maximal score — identical text generated for Spark and DuckDB so
    tie-breaks cannot diverge."""
    langs = sorted(scores)
    clauses = []
    for lang in langs:
        conds = " AND ".join(
            f"{scores[lang]} >= {scores[other]}" for other in langs if other != lang
        )
        clauses.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + " ELSE 'und' END"


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predict language from per-language stopword hit counts (n-gram
    heuristic); report accuracy flag vs the labeled `lang`."""
    df = load_table(spark, sf_dir, "documents")
    spark_scores = {lang: T._stop_hits_expr("text", w) for lang, w in T.LANG_STOPWORDS.items()}
    sel = [F.col("doc_id"), F.col("lang")]
    for lang in _LANGS:
        sel.append(F.expr(spark_scores[lang]).cast("int").alias(f"score_{lang}"))
    sel.append(F.expr(_argmax_case(spark_scores)).alias("predicted_lang"))
    out = df.select(*sel)
    return out.withColumn(
        "is_match", (F.col("predicted_lang") == F.col("lang")).cast("int")
    )


def _oracle_lang_id() -> str:
    duck_scores = {lang: T._stop_hits_sql("text", w) for lang, w in T.LANG_STOPWORDS.items()}
    score_cols = ", ".join(
        f"CAST({duck_scores[lang]} AS INTEGER) AS score_{lang}" for lang in _LANGS
    )
    return f"""
        WITH p AS (
            SELECT doc_id, lang, {score_cols},
                   {_argmax_case(duck_scores)} AS predicted_lang
            FROM documents
        )
        SELECT *, CAST(predicted_lang = lang AS INTEGER) AS is_match FROM p
    """


# ---------------------------------------------------------------------------
# q_doc_fingerprint — rolling-hash document fingerprint
# ---------------------------------------------------------------------------


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash fingerprint per document plus the
    exact-dedup content hash (sha256 of normalized text). Narrow —
    pipelines into the scan."""
    df = load_table(spark, sf_dir, "documents")
    return df.select(
        F.col("doc_id"),
        F.expr(T.doc_fingerprint_expr("text")).alias("fingerprint"),
        F.sha2(F.trim(F.lower(F.col("text"))), 256).alias("content_hash"),
        T.n_tokens("text").alias("n_tokens"),
    )


ORACLE_DOC_FINGERPRINT = f"""
    SELECT
        doc_id,
        {T.doc_fingerprint_sql('text')} AS fingerprint,
        sha256(trim(lower(text))) AS content_hash,
        {T.n_tokens_sql('text')} AS n_tokens
    FROM documents
"""


# ---------------------------------------------------------------------------
# q_string_funcs — the general string surface (SURVEY §2.3 ABSENT row)
# ---------------------------------------------------------------------------


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The string functions the reference lacks entirely (its only
    string op is date formatting, SURVEY §2.3): case mapping, split,
    concat_ws, regexp_extract, substring — all JVM-codegen builtins,
    narrow over the scan. Note DuckDB list indexing is 1-based vs
    Spark's 0-based ``getItem``; the oracle compensates."""
    df = load_table(spark, sf_dir, "documents")
    parts = F.split(F.col("text"), " ")
    return df.select(
        "doc_id",
        F.upper(parts.getItem(0)).alias("first_token_upper"),
        F.concat_ws(":", F.col("source"), F.col("lang")).alias("src_lang"),
        F.coalesce(F.regexp_extract(F.col("text"), "[0-9]+", 0), F.lit("")).alias(
            "first_number"
        ),
        F.size(parts).alias("n_parts"),
        F.substring(F.col("text"), 1, 12).alias("prefix12"),
        F.lower(F.reverse(F.substring(F.col("text"), 1, 8))).alias("rev8_lower"),
    )


ORACLE_STRING_FUNCS = """
    SELECT doc_id,
           upper(string_split(text, ' ')[1]) AS first_token_upper,
           concat_ws(':', source, lang) AS src_lang,
           coalesce(regexp_extract(text, '[0-9]+'), '') AS first_number,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_parts,
           substring(text, 1, 12) AS prefix12,
           lower(reverse(substring(text, 1, 8))) AS rev8_lower
    FROM documents
"""


# ---------------------------------------------------------------------------
# q_bpe_token_count — BPE-style pre-tokenizer counting (north star E3)
# ---------------------------------------------------------------------------

def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: corpus size in *pre-tokenizer* tokens — the unit a
    training-data pipeline budgets by — alongside whitespace-token
    and character counts. The BPE-ish split (functions/text.py
    ``bpe_token_count``) is ``regexp_extract_all`` over letter/digit/
    punct run classes — a deliberately engine-portable subset of the
    GPT-2 pre-tokenizer; a real BPE merge table would sit in a pandas
    UDF downstream (see ext_udf).

    All three counts are narrow per-row expressions folded into the
    scan, partially aggregated map-side; one shuffle of ≤#sources
    groups. Avg tokens/doc derives from two exact longs — one
    deterministic double division (plans/stats.py pattern).
    """
    df = load_table(spark, sf_dir, "documents")
    bpe_n = T.bpe_token_count("text").cast("long")
    ws_n = T.n_tokens("text").cast("long")
    agg = df.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(bpe_n).alias("bpe_tokens"),
        F.sum(ws_n).alias("ws_tokens"),
        F.sum(F.length("text").cast("long")).alias("n_chars"),
    )
    return agg.select(
        "source",
        "n_docs",
        "bpe_tokens",
        "ws_tokens",
        "n_chars",
        (F.col("bpe_tokens").cast("double") / F.col("n_docs").cast("double")).alias(
            "avg_bpe_per_doc"
        ),
    )


ORACLE_BPE_TOKEN_COUNT = f"""
    WITH t AS (
        SELECT source,
               CAST({T.bpe_token_count_sql('text')} AS BIGINT) AS bpe_n,
               CAST({T.n_tokens_sql('text')} AS BIGINT) AS ws_n,
               CAST(len(text) AS BIGINT) AS nc
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(bpe_n) AS BIGINT) AS bpe_tokens,
           CAST(sum(ws_n) AS BIGINT) AS ws_tokens,
           CAST(sum(nc) AS BIGINT) AS n_chars,
           CAST(sum(bpe_n) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_bpe_per_doc
    FROM t
    GROUP BY source
"""


# ---------------------------------------------------------------------------
# q_repetition_filter — within-document repetition (Gopher-style rule)
# ---------------------------------------------------------------------------

REP_TOP2GRAM_MAX = 0.05
REP_TTR_MIN = 0.35


def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition metrics + keep/drop verdict — the
    Gopher-style repetition rule family the quality score
    (q_text_stats) doesn't cover: type-token ratio (distinct/total
    tokens, a narrow array expression) and the most-frequent-2-gram
    fraction (the fraction of all 2-grams taken by the single most
    repeated one).

    Shape at scale: the 2-gram branch explodes ~n_tokens rows/doc,
    then two aggregations with map-side partials — (doc_id, gram)
    count, then per-doc max/sum; the second exchange carries only
    one row per distinct (doc, gram). The TTR branch is shuffle-free
    and the final join broadcasts the doc-sized aggregate.
    Thresholds compare *rounded* (1e-6) values so the verdict is
    bit-identical cross-engine. Docs with <2 tokens pin the 2-gram
    fraction to 0 (left join + coalesce)."""
    df = load_table(spark, sf_dir, "documents")
    toks = df.select(F.col("doc_id"), F.expr(T.tokens_expr("text")).alias("t"))
    ttr = toks.select(
        "doc_id",
        F.expr("size(t)").cast("int").alias("n_tokens"),
        (
            F.floor(
                F.expr("size(array_distinct(t))").cast("double")
                / F.expr("size(t)").cast("double")
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("ttr"),
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "case when size(t) < 2 then array() else "
                "transform(sequence(1, size(t) - 1), "
                "i -> concat(element_at(t, i), ' ', element_at(t, i + 1))) end"
            )
        ).alias("g"),
    )
    top_frac = (
        grams.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            (
                F.floor(
                    F.max("c").cast("double") / F.sum("c").cast("double") * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("top_2gram_frac")
        )
    )
    return ttr.join(top_frac, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "ttr",
        F.coalesce(F.col("top_2gram_frac"), F.lit(0.0)).alias("top_2gram_frac"),
        (
            (F.coalesce(F.col("top_2gram_frac"), F.lit(0.0)) <= REP_TOP2GRAM_MAX)
            & (F.col("ttr") >= REP_TTR_MIN)
        ).alias("keep"),
    )


ORACLE_REPETITION_FILTER = f"""
    WITH toks AS (
        SELECT doc_id, {T.tokens_sql('text')} AS t
        FROM documents
    ),
    ttr AS (
        SELECT doc_id,
               CAST(len(t) AS INTEGER) AS n_tokens,
               floor(CAST(len(list_distinct(t)) AS DOUBLE)
                     / CAST(len(t) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS ttr
        FROM toks
    ),
    grams AS (
        SELECT doc_id, t[i] || ' ' || t[i + 1] AS g
        FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
    ),
    cnt AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g),
    top_frac AS (
        SELECT doc_id,
               floor(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) * 1e6
                     + 0.5) / 1e6 AS top_2gram_frac
        FROM cnt GROUP BY doc_id
    )
    SELECT ttr.doc_id,
           n_tokens,
           ttr,
           coalesce(top_2gram_frac, 0.0) AS top_2gram_frac,
           coalesce(top_2gram_frac, 0.0) <= {REP_TOP2GRAM_MAX}
               AND ttr >= {REP_TTR_MIN} AS keep
    FROM ttr LEFT JOIN top_frac ON ttr.doc_id = top_frac.doc_id
"""


# ---------------------------------------------------------------------------
# q_quality_filter — Gopher-style quality rule set
# ---------------------------------------------------------------------------

# Rae et al. 2021 (Gopher, appendix A) rule family, with thresholds
# adapted to the synthetic corpus scale (docs are 10-100 tokens of
# lowercase vocabulary): word-count bounds, mean-word-length band,
# symbol-to-word ratio, bullet/ellipsis line fractions, alphabetic
# word fraction, and a required-stopword floor. Gopher requires >= 2
# of its 8 stopwords; this vocabulary only ever contains 'the', so
# the floor is 1 — same rule, recalibrated.
GQ_MIN_WORDS = 20
GQ_MAX_WORDS = 100_000
GQ_MEAN_WLEN_MIN = 3.0
GQ_MEAN_WLEN_MAX = 10.0
GQ_SYMBOL_RATIO_MAX = 0.1
GQ_BULLET_FRAC_MAX = 0.9
GQ_ELLIPSIS_FRAC_MAX = 0.3
GQ_ALPHA_FRAC_MIN = 0.8
GQ_REQUIRED_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GQ_MIN_STOP_HITS = 1


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality filter — the standard pre-train
    curation gate beyond the repetition rules (q_repetition_filter):
    per document, every rule's metric plus the keep verdict.

    All metrics are narrow array/string expressions over two
    let-bound arrays (tokens, lines — bound once per row so the
    higher-order references don't re-evaluate the split, the
    CollapseProject trap functions/text.py documents). Zero shuffles;
    the whole query pipelines into the parquet scan. Thresholds
    compare *rounded* (1e-6) values so the verdict is bit-identical
    cross-engine (the engine-wide rule)."""
    docs = load_table(spark, sf_dir, "documents")
    stops = ", ".join(f"'{w}'" for w in GQ_REQUIRED_STOPS)
    metrics = T.let_spark(
        T.tokens_expr("text"),
        "t",
        T.let_spark(
            "split(text, '\\n')",
            "L",
            "struct("
            "cast(size(t) as int) as n_words, "
            "floor(cast(aggregate(t, cast(0 as bigint), (acc, x) -> acc + length(x)) "
            "as double) / size(t) * 1e6 + 0.5) / 1e6 as mean_word_len, "
            f"cast(size(array_intersect(t, array({stops}))) as int) as stop_hits, "
            "floor(cast(size(filter(t, x -> regexp_like(x, '[a-z]'))) as double) "
            "/ size(t) * 1e6 + 0.5) / 1e6 as alpha_frac, "
            "floor(cast(size(regexp_extract_all(text, '#', 0)) "
            "+ (length(text) - length(replace(text, '...', ''))) DIV 3 as double) "
            "/ size(t) * 1e6 + 0.5) / 1e6 as symbol_ratio, "
            "floor(cast(size(filter(L, l -> regexp_like(l, '^[-*•] '))) as double) "
            "/ size(L) * 1e6 + 0.5) / 1e6 as bullet_frac, "
            "floor(cast(size(filter(L, l -> endswith(l, '...'))) as double) "
            "/ size(L) * 1e6 + 0.5) / 1e6 as ellipsis_frac)",
        ),
    )
    return docs.select("doc_id", F.expr(metrics).alias("m")).select(
        "doc_id",
        "m.n_words",
        "m.mean_word_len",
        "m.stop_hits",
        "m.alpha_frac",
        "m.symbol_ratio",
        "m.bullet_frac",
        "m.ellipsis_frac",
        (
            F.col("m.n_words").between(GQ_MIN_WORDS, GQ_MAX_WORDS)
            & F.col("m.mean_word_len").between(GQ_MEAN_WLEN_MIN, GQ_MEAN_WLEN_MAX)
            & (F.col("m.stop_hits") >= GQ_MIN_STOP_HITS)
            & (F.col("m.alpha_frac") >= GQ_ALPHA_FRAC_MIN)
            & (F.col("m.symbol_ratio") <= GQ_SYMBOL_RATIO_MAX)
            & (F.col("m.bullet_frac") <= GQ_BULLET_FRAC_MAX)
            & (F.col("m.ellipsis_frac") <= GQ_ELLIPSIS_FRAC_MAX)
        ).alias("keep"),
    )


_GQ_STOPS_SQL = ", ".join(f"'{w}'" for w in GQ_REQUIRED_STOPS)

_GQ_METRICS_DUCK = T.let_duck(
    T.tokens_sql("text"),
    "t",
    T.let_duck(
        "regexp_split_to_array(text, '\\n')",
        "L",
        "struct_pack("
        "n_words := CAST(len(t) AS INTEGER), "
        "mean_word_len := floor(CAST(list_reduce(list_prepend("
        "CAST(0 AS BIGINT), list_transform(t, x -> "
        "CAST(length(x) AS BIGINT))), (acc, x) -> acc + x) "
        "AS DOUBLE) / len(t) * 1e6 + 0.5) / 1e6, "
        f"stop_hits := CAST(len(list_intersect(t, [{_GQ_STOPS_SQL}])) AS INTEGER), "
        "alpha_frac := floor(CAST(len(list_filter(t, x -> "
        "regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(t) * 1e6 + 0.5) / 1e6, "
        "symbol_ratio := floor(CAST(len(regexp_extract_all(text, '#')) "
        "+ (length(text) - length(replace(text, '...', ''))) // 3 "
        "AS DOUBLE) / len(t) * 1e6 + 0.5) / 1e6, "
        "bullet_frac := floor(CAST(len(list_filter(L, l -> "
        "regexp_matches(l, '^[-*•] '))) AS DOUBLE) / len(L) * 1e6 + 0.5) / 1e6, "
        "ellipsis_frac := floor(CAST(len(list_filter(L, l -> "
        "ends_with(l, '...'))) AS DOUBLE) / len(L) * 1e6 + 0.5) / 1e6)",
    ),
)

ORACLE_QUALITY_FILTER = f"""
    WITH m AS (
        SELECT doc_id, {_GQ_METRICS_DUCK} AS m
        FROM documents
    )
    SELECT doc_id,
           m.n_words, m.mean_word_len, m.stop_hits, m.alpha_frac,
           m.symbol_ratio, m.bullet_frac, m.ellipsis_frac,
           m.n_words BETWEEN {GQ_MIN_WORDS} AND {GQ_MAX_WORDS}
               AND m.mean_word_len BETWEEN {GQ_MEAN_WLEN_MIN} AND {GQ_MEAN_WLEN_MAX}
               AND m.stop_hits >= {GQ_MIN_STOP_HITS}
               AND m.alpha_frac >= {GQ_ALPHA_FRAC_MIN}
               AND m.symbol_ratio <= {GQ_SYMBOL_RATIO_MAX}
               AND m.bullet_frac <= {GQ_BULLET_FRAC_MAX}
               AND m.ellipsis_frac <= {GQ_ELLIPSIS_FRAC_MAX} AS keep
    FROM m
"""


# ---------------------------------------------------------------------------
# q_decontaminate — benchmark n-gram contamination filter
# ---------------------------------------------------------------------------

# Contamination gram width: a corpus doc sharing any DECON_N-token
# verbatim run with the benchmark set is flagged. The literature
# standard is ~13 tokens; the synthetic docs here are 20-80 tokens,
# so 8 keeps the same "long verbatim run" semantics at this scale.
DECON_N = 8
# The held-out set: source 'src0' plays the benchmark/eval corpus.
DECON_BENCH_SOURCE = "src0"


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination — the filter every training pipeline
    must run before releasing a corpus: flag documents that share any
    verbatim ``DECON_N``-token run with the held-out benchmark set
    (source = 'src0'), and report how many distinct runs they share.
    One verdict row per non-benchmark document.

    Scale posture: benchmark sets are small by construction (they are
    eval sets), so the distinct benchmark gram-hash table is the
    plan's ONLY broadcast, and the corpus side never shuffles for the
    probe — the corpus explodes its distinct gram hashes with
    ``explode_outer`` (narrow, pipelines into the scan; gram-less
    docs keep a NULL row so every document gets a verdict), left-joins
    the broadcast bench set, and re-aggregates per doc_id with
    map-side partials (the only data-scale shuffle). The verdict is
    computed inside that single aggregation — no rejoin of a
    data-dependent hits relation, whose size is bounded only by the
    contamination rate and must never be hinted broadcast. For a
    benchmark union too large to broadcast, swap the broadcast for
    the bloom runtime filter (operators/bloom.py) and keep the same
    plan shape. Gram hashing is the cross-engine rolling polynomial
    (functions/text.shingle_hashes_expr), so the oracle is exact."""
    docs = load_table(spark, sf_dir, "documents")
    grams = f"array_distinct({T.shingle_hashes_expr('text', DECON_N)})"
    bench_grams = (
        docs.where(F.col("source") == DECON_BENCH_SOURCE)
        .select(F.explode(F.expr(grams)).alias("g"))
        .distinct()
        .withColumn("bench_hit", F.lit(1))
    )
    corpus = docs.where(F.col("source") != DECON_BENCH_SOURCE)
    return (
        corpus.select("doc_id", F.explode_outer(F.expr(grams)).alias("g"))
        .join(F.broadcast(bench_grams), "g", "left")
        .groupBy("doc_id")
        .agg(F.count("bench_hit").alias("n_shared_grams"))
        .select(
            "doc_id",
            "n_shared_grams",
            (F.col("n_shared_grams") > 0).cast("int").alias("contaminated"),
        )
    )


ORACLE_DECONTAMINATE = f"""
    WITH bench AS (
        SELECT DISTINCT unnest(list_distinct({T.shingle_hashes_sql('text', DECON_N)})) AS g
        FROM documents WHERE source = '{DECON_BENCH_SOURCE}'
    ),
    corpus_grams AS (
        SELECT doc_id, unnest(list_distinct({T.shingle_hashes_sql('text', DECON_N)})) AS g
        FROM documents WHERE source <> '{DECON_BENCH_SOURCE}'
    ),
    hits AS (
        SELECT doc_id, count(*) AS n_shared
        FROM corpus_grams JOIN bench USING (g)
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(h.n_shared, CAST(0 AS BIGINT)) AS n_shared_grams,
           CAST(coalesce(h.n_shared, 0) > 0 AS INTEGER) AS contaminated
    FROM documents d
    LEFT JOIN hits h USING (doc_id)
    WHERE d.source <> '{DECON_BENCH_SOURCE}'
"""


# ---------------------------------------------------------------------------
# q_source_mixture — deterministic down-sampling to a token-balanced mix
# ---------------------------------------------------------------------------

MIX_SCALE = 1_000_000  # sampling-threshold resolution (ppm)


def q_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture rebalancing: compute each source's BPE-token
    total, set every source's sampling rate so it contributes at most
    the smallest source's token budget (uniform mix), then select the
    sample *deterministically* — a document survives iff its content
    fingerprint mod 1e6 falls under its source's threshold. One
    summary row per source: corpus size, threshold, and what the
    sampled mix actually kept.

    Determinism is the point: the threshold is exact integer
    arithmetic (``(1e6 · min_tokens) DIV source_tokens`` on scaled
    longs — no float rates to diverge between engines or runs), and
    membership hangs on the cross-engine content fingerprint, so the
    same document set survives under any partitioning, replay, or
    engine — unlike ``TABLESAMPLE``/``rand()``, whose output depends
    on partition layout. Scale shape: the narrow per-doc pass
    (tokens + fingerprint) pipelines into the scan; the per-source
    totals are a map-side-partial aggregate to ~|sources| rows,
    broadcast back for the filter; the kept-side re-aggregate is the
    same shape. The corpus shuffles only as aggregated partials keyed
    by source (salt per operators/skew.py if one source dominates)."""
    docs = load_table(spark, sf_dir, "documents")
    # Pass 1 over the corpus: per-source token totals only (the
    # fingerprint isn't needed yet — keep the first scan cheap).
    # The totals relation is |sources| rows but feeds THREE subtrees
    # (the floor, the rates, the final select); without the persist,
    # Catalyst re-derives it per subtree and the physical plan grows
    # a corpus FileScan per derivation. With it the whole query scans
    # the corpus exactly twice — pass 1 here, pass 2 below — which
    # tests/test_plan_audit.py asserts on the executed plan.
    totals = (
        docs.select("source", T.bpe_token_count("text").alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("tokens_total"),
        )
    )
    totals = tracked_persist(totals)
    floor_tokens = totals.agg(F.min("tokens_total").alias("m"))
    rates = totals.crossJoin(F.broadcast(floor_tokens)).select(
        "source",
        "n_docs",
        "tokens_total",
        F.expr(f"({MIX_SCALE} * m) DIV tokens_total").alias("keep_threshold"),
    )
    # Pass 2 — the only other corpus scan: fingerprint, membership
    # filter against the broadcast thresholds, kept-side re-aggregate.
    kept = (
        docs.select(
            "source",
            T.bpe_token_count("text").alias("n_tok"),
            F.expr(T.doc_fingerprint_expr("text")).alias("fp"),
        )
        .join(F.broadcast(rates.select("source", "keep_threshold")), "source")
        .where(F.col("fp") % MIX_SCALE < F.col("keep_threshold"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_tok").alias("tokens_kept"),
        )
    )
    zero = F.lit(0).cast("long")
    return (
        rates.join(F.broadcast(kept), "source", "left")
        .select(
            "source",
            "n_docs",
            "tokens_total",
            "keep_threshold",
            F.coalesce(F.col("n_docs_kept"), zero).alias("n_docs_kept"),
            F.coalesce(F.col("tokens_kept"), zero).alias("tokens_kept"),
        )
    )


ORACLE_SOURCE_MIXTURE = f"""
    WITH base AS (
        SELECT source,
               {T.bpe_token_count_sql('text')} AS n_tok,
               {T.doc_fingerprint_sql('text')} AS fp
        FROM documents
    ),
    totals AS (
        -- sum(bigint) is HUGEINT in DuckDB; pin to BIGINT like Spark
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS tokens_total
        FROM base GROUP BY source
    ),
    floor_tokens AS (SELECT min(tokens_total) AS m FROM totals),
    rates AS (
        SELECT source, n_docs, tokens_total,
               CAST(({MIX_SCALE} * m) // tokens_total AS BIGINT)
                   AS keep_threshold
        FROM totals CROSS JOIN floor_tokens
    ),
    kept AS (
        SELECT b.source, count(*) AS n_docs_kept,
               CAST(sum(b.n_tok) AS BIGINT) AS tokens_kept
        FROM base b JOIN rates r USING (source)
        WHERE b.fp % {MIX_SCALE} < r.keep_threshold
        GROUP BY b.source
    )
    SELECT r.source, r.n_docs, r.tokens_total, r.keep_threshold,
           coalesce(k.n_docs_kept, CAST(0 AS BIGINT)) AS n_docs_kept,
           coalesce(k.tokens_kept, CAST(0 AS BIGINT)) AS tokens_kept
    FROM rates r LEFT JOIN kept k USING (source)
"""


# ---------------------------------------------------------------------------
# q_pii_redact — pattern-based PII detection + redaction
# ---------------------------------------------------------------------------

# Detection patterns, valid in BOTH Java regex (Spark) and RE2
# (DuckDB): no backrefs, no lookaround, ASCII word boundaries only.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def _pii_injected_spark() -> str:
    """Deterministic PII weaving: the synthetic corpus is word salad
    with no real PII, so a fifth of the docs get an email, a fifth an
    IPv4, a fifth a phone number — derived from doc_id, so the same
    strings appear under any partitioning or engine. This makes the
    redaction measurably non-trivial while keeping the query a pure
    function of the input."""
    return (
        "CASE CAST(doc_id % 5 AS INT) "
        "WHEN 0 THEN concat(text, ' contact user', cast(doc_id as string), "
        "'@example.com for details') "
        "WHEN 1 THEN concat(text, ' from host 10.', "
        "cast(doc_id % 200 as string), '.0.7 port 80') "
        "WHEN 2 THEN concat(text, ' call 555-', "
        "lpad(cast(doc_id % 1000 as string), 3, '0'), '-0142 today') "
        "ELSE text END"
    )


def _pii_injected_duck() -> str:
    return (
        "CASE CAST(doc_id % 5 AS INTEGER) "
        "WHEN 0 THEN concat(text, ' contact user', CAST(doc_id AS VARCHAR), "
        "'@example.com for details') "
        "WHEN 1 THEN concat(text, ' from host 10.', "
        "CAST(doc_id % 200 AS VARCHAR), '.0.7 port 80') "
        "WHEN 2 THEN concat(text, ' call 555-', "
        "lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'), '-0142 today') "
        "ELSE text END"
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction pass every corpus release runs:
    count and replace emails / IPv4 addresses / phone numbers with
    typed placeholder tokens. One row per document with the per-type
    hit counts, a clean flag, and the fingerprint of the *redacted*
    text (so the hash check certifies the replacement bytes, not just
    the counts).

    Scale posture: pure per-row column expressions — regexp_count +
    chained regexp_replace + the rolling-hash fingerprint all run in
    whole-stage codegen over the scan, zero shuffles, zero Python.
    The deterministic PII weaving (see _pii_injected_spark) stands in
    for real dirty data; on a real corpus the CASE disappears and the
    plan is identical."""
    docs = load_table(spark, sf_dir, "documents")
    # Patterns go through the Python functions API, NOT SQL string
    # literals — the Spark SQL parser would eat \b/\d escapes inside
    # '...' (a backspace character, not a word boundary).
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("pii"), PII_EMAIL_RE, "[EMAIL]"),
            PII_IPV4_RE,
            "[IP]",
        ),
        PII_PHONE_RE,
        "[PHONE]",
    )
    return (
        docs.select("doc_id", F.expr(_pii_injected_spark()).alias("pii"))
        .select(
            "doc_id",
            F.regexp_count("pii", F.lit(PII_EMAIL_RE)).alias("n_emails"),
            F.regexp_count("pii", F.lit(PII_IPV4_RE)).alias("n_ips"),
            F.regexp_count("pii", F.lit(PII_PHONE_RE)).alias("n_phones"),
            redacted.alias("redacted"),
        )
        .select(
            "doc_id",
            "n_emails",
            "n_ips",
            "n_phones",
            F.expr(T.doc_fingerprint_expr("redacted")).alias("redacted_fp"),
            ((F.col("n_emails") + F.col("n_ips") + F.col("n_phones")) == 0)
            .cast("int")
            .alias("clean"),
        )
    )


ORACLE_PII_REDACT = f"""
    WITH injected AS (
        SELECT doc_id, {_pii_injected_duck()} AS pii FROM documents
    ),
    counted AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(pii, '{PII_EMAIL_RE}')) AS INTEGER)
                   AS n_emails,
               CAST(len(regexp_extract_all(pii, '{PII_IPV4_RE}')) AS INTEGER)
                   AS n_ips,
               CAST(len(regexp_extract_all(pii, '{PII_PHONE_RE}')) AS INTEGER)
                   AS n_phones,
               {T.doc_fingerprint_sql(
                   "regexp_replace(regexp_replace(regexp_replace(pii, "
                   f"'{PII_EMAIL_RE}', '[EMAIL]', 'g'), "
                   f"'{PII_IPV4_RE}', '[IP]', 'g'), "
                   f"'{PII_PHONE_RE}', '[PHONE]', 'g')"
               )} AS redacted_fp
        FROM injected
    )
    SELECT doc_id, n_emails, n_ips, n_phones, redacted_fp,
           CAST((n_emails + n_ips + n_phones) = 0 AS INTEGER) AS clean
    FROM counted
"""


# ---------------------------------------------------------------------------
# q_doc_chunks — context-window chunking (1 doc → N overlapping chunks)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 32  # context-window size in whitespace tokens
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking — the 1→N split a training pipeline
    runs to fit documents into fixed model context windows: 32-token
    chunks with an 8-token overlap (stride 24). One row per chunk
    with its index, token offsets, and the rolling-hash fingerprint
    of the chunk's tokens (certifying the exact chunk contents
    cross-engine, not just the boundaries).

    Scale posture: the token-hash array is bound once per row (the
    let-binding trick, functions/text.py:147-160) and sliced per
    chunk — the explode is a narrow 1→N generator that pipelines into
    the scan; no shuffle anywhere. Chunk fingerprints fold the
    *token-hash slice* directly instead of re-tokenizing substrings,
    so cost is O(tokens) per document regardless of chunk count."""
    docs = load_table(spark, sf_dir, "documents")
    n_last = (
        f"CASE WHEN size(th) <= {CHUNK_TOKENS} THEN 0 "
        f"ELSE (size(th) - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1) DIV {CHUNK_STRIDE} END"
    )
    chunk_struct = (
        f"transform(sequence(0, {n_last}), i -> struct("
        f"cast(i as int) as chunk_idx, "
        f"cast(i * {CHUNK_STRIDE} as int) as chunk_start, "
        f"cast(least({CHUNK_TOKENS}, size(th) - i * {CHUNK_STRIDE}) as int) as chunk_len, "
        f"aggregate(slice(th, i * {CHUNK_STRIDE} + 1, {CHUNK_TOKENS}), "
        f"cast(0 as bigint), (acc, h) -> (acc * {T.TOK_P} + h) % {T.MOD}) as chunk_fp))"
    )
    th_expr = f"transform({T.tokens_expr('text')}, tok -> {T._tok_hash_lambda_spark('tok')})"
    chunks = T.let_spark(th_expr, "th", chunk_struct)
    return (
        docs.select("doc_id", F.explode(F.expr(chunks)).alias("c"))
        .select("doc_id", "c.chunk_idx", "c.chunk_start", "c.chunk_len", "c.chunk_fp")
    )


ORACLE_DOC_CHUNKS = f"""
    WITH th_t AS (
        SELECT doc_id, {T.token_hashes_sql('text')} AS th FROM documents
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS chunk_idx,
           CAST(i * {CHUNK_STRIDE} AS INTEGER) AS chunk_start,
           CAST(least({CHUNK_TOKENS}, len(th) - i * {CHUNK_STRIDE}) AS INTEGER)
               AS chunk_len,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_slice(th, i * {CHUNK_STRIDE} + 1,
                          least(i * {CHUNK_STRIDE} + {CHUNK_TOKENS}, len(th)))),
               (acc, h) -> (acc * {T.TOK_P} + h) % {T.MOD}) AS chunk_fp
    FROM th_t CROSS JOIN UNNEST(generate_series(0,
        CASE WHEN len(th) <= {CHUNK_TOKENS} THEN 0
             ELSE (len(th) - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE}
        END)) AS u(i)
"""


# ---------------------------------------------------------------------------
# q_sequence_pack — concat-and-split packing into fixed context windows
# ---------------------------------------------------------------------------

PACK_TOKENS = 512  # training context-window size in BPE-ish tokens


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the batch-assembly step of a pretraining
    pipeline: documents are concatenated per source stream in
    deterministic (doc_id) order and split into fixed 512-token
    context windows ("concat then split" packing). Each document
    lands at a byte-exact position: its pack number, its token offset
    inside that pack, and whether it straddles a pack boundary (the
    fraction of straddlers is the packing-efficiency metric every
    data team tracks).

    Scale posture: one shuffle on the packing stream key (source),
    then a per-partition ordered prefix sum inside the window — no
    self-joins, no iteration. A skewed stream (one giant source)
    serializes its prefix sum; the scale-safe form is
    ``q_sequence_pack_indexed`` below (operators/packing.py), which
    computes the same cumulative offsets with a bucket-decomposed
    segmented prefix sum — no single-partition window — and is
    hash-checked against this query's oracle."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.select("source", "doc_id", T.bpe_token_count("text").alias("n_tok"))
        .withColumn("cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0).cast("long")))
        .select(
            "source",
            "doc_id",
            "n_tok",
            F.expr(f"cum_before DIV {PACK_TOKENS}").alias("pack_id"),
            (F.col("cum_before") % PACK_TOKENS).alias("pack_offset"),
            (
                F.expr(f"cum_before DIV {PACK_TOKENS}")
                != F.expr(f"(cum_before + n_tok - 1) DIV {PACK_TOKENS}")
            )
            .cast("int")
            .alias("crosses_boundary"),
        )
    )


ORACLE_SEQUENCE_PACK = f"""
    WITH toks AS (
        SELECT source, doc_id, {T.bpe_token_count_sql('text')} AS n_tok
        FROM documents
    ),
    cum AS (
        SELECT source, doc_id, n_tok,
               CAST(coalesce(sum(n_tok) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS cum_before
        FROM toks
    )
    SELECT source, doc_id, n_tok,
           cum_before // {PACK_TOKENS} AS pack_id,
           cum_before % {PACK_TOKENS} AS pack_offset,
           CAST(cum_before // {PACK_TOKENS}
                <> (cum_before + n_tok - 1) // {PACK_TOKENS} AS INTEGER)
               AS crosses_boundary
    FROM cum
"""


# ---------------------------------------------------------------------------
# q_sequence_pack_indexed — the same packing, skew-proof
# ---------------------------------------------------------------------------

# Small bucket so even sf0.001 (500 docs) exercises multiple buckets
# per source; production would use 8192+ (the plan is identical — only
# the tiny bucket-totals row count changes).
PACK_BUCKET = 64


def q_sequence_pack_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing computed with the BUCKET-DECOMPOSED prefix sum
    (operators/packing.pack_sequences_indexed) instead of the
    per-source window: per-(source, bucket) totals → exclusive prefix
    over the tiny totals table → broadcast-join the base offsets back
    → window *within* each (source, bucket). No window partition ever
    holds more than PACK_BUCKET rows, so one dominant source no longer
    serializes the corpus — the skew hazard q_sequence_pack documents.
    Hash-checked against the SAME window SQL as q_sequence_pack: the
    physical rewrite must be invisible in the result."""
    from weatherflow_spark.operators.packing import pack_sequences_indexed

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source", "doc_id", T.bpe_token_count("text").alias("n_tok")
    )
    return pack_sequences_indexed(
        base,
        stream_col="source",
        order_col="doc_id",
        tok_col="n_tok",
        pack_tokens=PACK_TOKENS,
        bucket_size=PACK_BUCKET,
    )


# Same SQL as the window idiom: the segmented plan must be
# result-invisible.
ORACLE_SEQUENCE_PACK_INDEXED = ORACLE_SEQUENCE_PACK


# ---------------------------------------------------------------------------
# q_mixture_weights — temperature-scaled source sampling weights
# ---------------------------------------------------------------------------

MIXTURE_ALPHA = 0.7


def _temp_weight_sql(tok: str, alpha: float) -> str:
    """pow(tokens, α) as SQL text shared verbatim by both engines."""
    return f"power(CAST({tok} AS DOUBLE), {alpha})"


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (the T5/XLM α-sampling rule,
    α=0.7): p_s ∝ tokens_s^α, which up-weights small sources relative
    to proportional sampling without letting any source dominate —
    the standard multilingual/multi-source rebalancing knob, reported
    next to the hard uniform cap of q_source_mixture. One row per
    source: token total, raw share, temperature share (both e9
    integers), and the expected per-epoch token draw under the
    temperature distribution.

    Scale posture: one map-side-partial aggregate to |sources| rows;
    the normalizers are a single-row reduction over those rows,
    broadcast back (no second corpus pass). The token sum is
    integer-exact; the pow-weight sum folds a SORTED double array so
    addition order cannot diverge between engines (q_entropy
    precedent); shares are e9-rounded."""
    docs = load_table(spark, sf_dir, "documents")
    totals = docs.groupBy("source").agg(
        F.sum(T.bpe_token_count("text").cast("bigint")).alias("tokens_total")
    )
    w = _temp_weight_sql("tokens_total", MIXTURE_ALPHA)
    norm = totals.agg(
        F.sum("tokens_total").alias("tok_sum"),
        F.expr(
            f"aggregate(array_sort(collect_list({w})), cast(0.0 as double), "
            "(acc, x) -> acc + x)"
        ).alias("w_sum"),
    )
    return totals.crossJoin(F.broadcast(norm)).select(
        "source",
        "tokens_total",
        F.expr(
            "CAST(floor(CAST(tokens_total AS DOUBLE) "
            "/ CAST(tok_sum AS DOUBLE) * 1e9 + 0.5) AS BIGINT)"
        ).alias("raw_share_e9"),
        F.expr(
            f"CAST(floor(({w}) / w_sum * 1e9 + 0.5) AS BIGINT)"
        ).alias("temp_share_e9"),
        F.expr(
            f"CAST(floor(({w}) / w_sum * CAST(tok_sum AS DOUBLE)) AS BIGINT)"
        ).alias("expected_tokens"),
    )


ORACLE_MIXTURE_WEIGHTS = f"""
    WITH totals AS (
        SELECT source,
               CAST(sum(CAST({T.bpe_token_count_sql('text')} AS BIGINT))
                    AS BIGINT) AS tokens_total
        FROM documents GROUP BY source
    ),
    norm AS (
        SELECT CAST(sum(tokens_total) AS BIGINT) AS tok_sum,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_sort(
                   list({_temp_weight_sql('tokens_total', MIXTURE_ALPHA)}))),
                   (acc, x) -> acc + x) AS w_sum
        FROM totals
    )
    SELECT source, tokens_total,
           CAST(floor(CAST(tokens_total AS DOUBLE)
                / CAST(tok_sum AS DOUBLE) * 1e9 + 0.5)
                AS BIGINT) AS raw_share_e9,
           CAST(floor(({_temp_weight_sql('tokens_total', MIXTURE_ALPHA)})
                / w_sum * 1e9 + 0.5) AS BIGINT) AS temp_share_e9,
           CAST(floor(({_temp_weight_sql('tokens_total', MIXTURE_ALPHA)})
                / w_sum * CAST(tok_sum AS DOUBLE)) AS BIGINT)
               AS expected_tokens
    FROM totals CROSS JOIN norm
"""


# ---------------------------------------------------------------------------
# q_boilerplate_detect — cross-document repeated-span flagging
# ---------------------------------------------------------------------------

BOILERPLATE_MIN_DOCS = 3


def q_boilerplate_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection (the C4-style "drop spans
    repeated across pages" rule): a chunk whose fingerprint appears in
    ≥ BOILERPLATE_MIN_DOCS distinct documents is boilerplate; each
    document reports its chunk count, boilerplate-chunk count, and the
    integer-exact boilerplate fraction. Reuses q_doc_chunks'
    fingerprints, so the flagged spans are the exact chunk contents,
    not a heuristic.

    Scale posture: the chunk stream is narrow (1→N generator into the
    scan); one exchange aggregates distinct-doc counts per
    fingerprint, the flag join is UNHINTED (Catalyst broadcasts while
    the count table is estimated small and degrades to the
    fp-co-partitioned shuffle join at corpus scale — nothing
    data-dependent is forced into driver memory), and one exchange
    folds back to documents."""
    chunks = q_doc_chunks(spark, sf_dir).select("doc_id", "chunk_fp")
    fpc = chunks.groupBy("chunk_fp").agg(
        F.countDistinct("doc_id").alias("n_docs_with")
    )
    flagged = chunks.join(fpc, "chunk_fp")
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(
            F.when(F.col("n_docs_with") >= BOILERPLATE_MIN_DOCS, 1).otherwise(0)
        ).alias("n_boilerplate"),
    ).select(
        "doc_id",
        "n_chunks",
        "n_boilerplate",
        F.expr("CAST((n_boilerplate * 1000000L) div n_chunks AS BIGINT)").alias(
            "boiler_frac_e6"
        ),
    )


ORACLE_BOILERPLATE_DETECT = f"""
    WITH chunks AS (
        SELECT doc_id, chunk_fp FROM ({ORACLE_DOC_CHUNKS})
    ),
    fpc AS (
        SELECT chunk_fp, count(DISTINCT doc_id) AS n_docs_with
        FROM chunks GROUP BY chunk_fp
    )
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN f.n_docs_with >= {BOILERPLATE_MIN_DOCS}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate,
           CAST((CAST(sum(CASE WHEN f.n_docs_with >= {BOILERPLATE_MIN_DOCS}
                    THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
                // CAST(count(*) AS BIGINT) AS BIGINT) AS boiler_frac_e6
    FROM chunks c JOIN fpc f USING (chunk_fp)
    GROUP BY c.doc_id
"""


# ---------------------------------------------------------------------------
# q_domain_quota — per-source cap via deterministic hash rank
# ---------------------------------------------------------------------------

QUOTA_PER_SOURCE = 40


def q_domain_quota(
    spark: SparkSession,
    sf_dir: str,
    skew_threshold: int = PPL_SKEW_THRESHOLD,
) -> DataFrame:
    """Per-source document quota (the CommonCrawl-style per-domain cap
    every web-scale curation pipeline applies so one dominant domain
    cannot swamp the mixture): rank each source's documents by a
    deterministic content-free hash (md5 of the doc id — a uniform,
    engine-portable shuffle order) and keep the first
    ``QUOTA_PER_SOURCE``. Emitting the rank and the keep verdict for
    every document makes the certification hash pin the entire
    selection, not just the survivors.

    Scale posture: one hash-partitioned window keyed by source — the
    same shape (and skew hazard, and the same r8-wired remedy) as the
    perplexity filter's percentile cut: when the measured source
    census exceeds ``skew_threshold``, the rank switches to the
    distributed exact form (operators/indexing.assign_grouped_rank —
    range-partition on (source, md5, doc_id) so a dominant source
    spans partitions), emitting the identical (rank, kept) row for
    every document. Default path: no joins, no broadcast, no
    Python."""
    docs = load_table(spark, sf_dir, "documents")
    if _max_source_rows(spark, sf_dir) >= skew_threshold:
        from weatherflow_spark.operators.indexing import assign_grouped_rank

        ranked = assign_grouped_rank(
            docs.select(
                "doc_id",
                "source",
                F.expr("md5(cast(doc_id AS string))").alias("__h"),
            ),
            ["source"],
            ["__h", "doc_id"],
            rank_col="__rank",
        )
        return ranked.select(
            "doc_id",
            "source",
            F.col("__rank").cast("int").alias("quota_rank"),
            (F.col("__rank") <= QUOTA_PER_SOURCE).cast("int").alias("kept"),
        )
    w = (
        F.expr("row_number() OVER (PARTITION BY source "
               "ORDER BY md5(cast(doc_id AS string)) ASC, doc_id ASC)")
        .cast("int")
        .alias("quota_rank")
    )
    return docs.select("doc_id", "source", w).withColumn(
        "kept", (F.col("quota_rank") <= QUOTA_PER_SOURCE).cast("int")
    )


ORACLE_DOMAIN_QUOTA = f"""
    SELECT doc_id, source,
           CAST(row_number() OVER (PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC)
                AS INTEGER) AS quota_rank,
           CAST(row_number() OVER (PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC)
                <= {QUOTA_PER_SOURCE} AS INTEGER) AS kept
    FROM documents
"""


# ---------------------------------------------------------------------------
# q_curation_suite — consolidated corpus-curation certification row
# ---------------------------------------------------------------------------
# q_corpus_drift — E66: token-distribution drift (KL / Jensen-Shannon)
# ---------------------------------------------------------------------------

DRIFT_VOCAB = 300
DRIFT_TOP = 20
# Shared double-expression fragments (identical text both engines, the
# BM25 precedent) — add-one smoothing over the capped vocabulary.
_DRIFT_P = f"((CAST(c_a AS DOUBLE) + 1.0) / (CAST(na AS DOUBLE) + {DRIFT_VOCAB}.0))"
_DRIFT_Q = f"((CAST(c_b AS DOUBLE) + 1.0) / (CAST(nb AS DOUBLE) + {DRIFT_VOCAB}.0))"
_DRIFT_M = f"(({_DRIFT_P} + {_DRIFT_Q}) / 2.0)"


def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution drift between two ingestion batches — the
    monitor a training-data pipeline runs before admitting a new crawl
    snapshot: has the language actually shifted? Batch A is the even
    doc_ids, batch B the odd (a deterministic stand-in for
    consecutive loads); both distributions live on the SAME top-V
    shared vocabulary (V={DRIFT_VOCAB}, by combined frequency, token
    tie-break) with add-one smoothing, so KL is finite by
    construction. Emits the top-{DRIFT_TOP} drifted tokens (by |log
    probability ratio|) plus three total rows: KL(A‖B), KL(B‖A), and
    the symmetric Jensen-Shannon divergence.

    Determinism at scale: ONE token exchange computes both halves'
    counts (conditional sums in one keyed agg); the vocab cap is a
    heap top-V; totals broadcast as one row; and — the load-bearing
    trick — every per-token KL/JS term is floored to an e12 INTEGER
    before summation, so the cross-token sum is exact int64 arithmetic
    with no float addition-order dependence (the integer-cents
    pattern; e12 precision leaves the e9-reported divergences exact
    to the last digit for any vocab ≤ 1e6)."""
    from weatherflow_spark.operators.caching import tracked_persist

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        (F.col("doc_id") % 2 == 0).cast("long").alias("in_a"),
        F.explode(T.tokens("text")).alias("token"),
    ).where(F.col("token") != "")
    counts = toks.groupBy("token").agg(
        F.sum("in_a").alias("c_a"),
        F.sum(F.lit(1) - F.col("in_a")).alias("c_b"),
    )
    vocab = (
        counts.select("token", "c_a", "c_b", (F.col("c_a") + F.col("c_b")).alias("tot"))
        .orderBy(F.desc("tot"), F.asc("token"))
        .limit(DRIFT_VOCAB)
    )
    totals = vocab.agg(F.sum("c_a").alias("na"), F.sum("c_b").alias("nb"))
    per = tracked_persist(
        vocab.crossJoin(F.broadcast(totals)).select(
            "token",
            "c_a",
            "c_b",
            "na",
            "nb",
            F.expr(
                f"cast(floor(ln({_DRIFT_P} / {_DRIFT_Q}) * 1e9 + 0.5) as bigint)"
            ).alias("lr_e9"),
            F.expr(
                f"cast(floor({_DRIFT_P} * ln({_DRIFT_P} / {_DRIFT_Q}) * 1e12 + 0.5) as bigint)"
            ).alias("t_ab_e12"),
            F.expr(
                f"cast(floor({_DRIFT_Q} * ln({_DRIFT_Q} / {_DRIFT_P}) * 1e12 + 0.5) as bigint)"
            ).alias("t_ba_e12"),
            F.expr(
                f"cast(floor((0.5 * {_DRIFT_P} * ln({_DRIFT_P} / {_DRIFT_M}) "
                f"+ 0.5 * {_DRIFT_Q} * ln({_DRIFT_Q} / {_DRIFT_M})) * 1e12 + 0.5) as bigint)"
            ).alias("t_js_e12"),
        )
    )
    top = (
        per.orderBy(F.desc(F.abs(F.col("lr_e9"))), F.asc("token"))
        .limit(DRIFT_TOP)
        .select(F.col("token").alias("key"), "c_a", "c_b", F.col("lr_e9").alias("metric_e9"))
    )
    tot = per.agg(
        F.min("na").alias("na"),
        F.min("nb").alias("nb"),
        F.sum("t_ab_e12").alias("s_ab"),
        F.sum("t_ba_e12").alias("s_ba"),
        F.sum("t_js_e12").alias("s_js"),
    ).selectExpr(
        "stack(3, '__kl_ab__', na, nb, s_ab div 1000, "
        "'__kl_ba__', na, nb, s_ba div 1000, "
        "'__js__', na, nb, s_js div 1000) AS (key, c_a, c_b, metric_e9)"
    )
    return top.unionByName(tot)


ORACLE_CORPUS_DRIFT = f"""
    WITH toks AS (
        SELECT CAST(doc_id % 2 = 0 AS BIGINT) AS in_a, token
        FROM (
            SELECT doc_id, unnest({T.tokens_sql('text')}) AS token
            FROM documents
        ) WHERE token <> ''
    ),
    counts AS (
        SELECT token, CAST(sum(in_a) AS BIGINT) AS c_a,
               CAST(sum(1 - in_a) AS BIGINT) AS c_b
        FROM toks GROUP BY token
    ),
    vocab AS (
        SELECT token, c_a, c_b FROM counts
        ORDER BY (c_a + c_b) DESC, token ASC LIMIT {DRIFT_VOCAB}
    ),
    totals AS (
        SELECT CAST(sum(c_a) AS BIGINT) AS na, CAST(sum(c_b) AS BIGINT) AS nb
        FROM vocab
    ),
    per AS (
        SELECT token, c_a, c_b, na, nb,
               CAST(floor(ln({_DRIFT_P} / {_DRIFT_Q}) * 1e9 + 0.5) AS BIGINT)
                   AS lr_e9,
               CAST(floor({_DRIFT_P} * ln({_DRIFT_P} / {_DRIFT_Q}) * 1e12 + 0.5)
                   AS BIGINT) AS t_ab_e12,
               CAST(floor({_DRIFT_Q} * ln({_DRIFT_Q} / {_DRIFT_P}) * 1e12 + 0.5)
                   AS BIGINT) AS t_ba_e12,
               CAST(floor((0.5 * {_DRIFT_P} * ln({_DRIFT_P} / {_DRIFT_M})
                    + 0.5 * {_DRIFT_Q} * ln({_DRIFT_Q} / {_DRIFT_M})) * 1e12 + 0.5)
                   AS BIGINT) AS t_js_e12
        FROM vocab CROSS JOIN totals
    )
    SELECT key, c_a, c_b, metric_e9 FROM (
        SELECT token AS key, c_a, c_b, lr_e9 AS metric_e9,
               row_number() OVER (ORDER BY abs(lr_e9) DESC, token ASC) AS rn
        FROM per
    ) WHERE rn <= {DRIFT_TOP}
    UNION ALL
    SELECT '__kl_ab__', min(na), min(nb),
           CAST(sum(t_ab_e12) AS BIGINT) // 1000 FROM per
    UNION ALL
    SELECT '__kl_ba__', min(na), min(nb),
           CAST(sum(t_ba_e12) AS BIGINT) // 1000 FROM per
    UNION ALL
    SELECT '__js__', min(na), min(nb),
           CAST(sum(t_js_e12) AS BIGINT) // 1000 FROM per
"""


# ---------------------------------------------------------------------------
# q_release_datasheet — E76: dataset-card rollup (source × split)
# ---------------------------------------------------------------------------


def q_release_datasheet(
    spark: SparkSession,
    sf_dir: str,
    split: DataFrame | None = None,
    decon: DataFrame | None = None,
) -> DataFrame:
    """The release DATASHEET — the dataset-card table every corpus
    release publishes: per (source × split) and every rollup margin,
    the document count, total whitespace tokens, and how many
    documents the decontamination screen flagged (the leakage rate a
    reviewer checks per split before trusting an eval number).
    Composes three certified operators — token accounting (E3), the
    stratified split (E62), and decontamination (E27's screen) — into
    one ROLLUP aggregation; NULL margins surface as '<all>' so keys
    are stable strings.

    Scale posture: the two doc_id-keyed joins align verdict tables
    that are each one-pass derivations; the rollup itself is a
    grouping-sets aggregation with map-side partials (3 grouping sets
    × |sources×splits| groups — tiny output at any corpus size).
    ``split``/``decon`` let a caller that already built those verdicts
    pass them in (the shared-subtree pattern of q_text_mining_suite)
    so the suite plans each verdict pipeline once."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("source") != DECON_BENCH_SOURCE
    ).select("doc_id", "source", T.n_tokens("text").cast("long").alias("n_tokens"))
    if split is None:
        split = q_train_split(spark, sf_dir)
    if decon is None:
        decon = q_decontaminate(spark, sf_dir)
    split = split.select("doc_id", "split")
    dec = decon.select(
        "doc_id", F.col("contaminated").cast("long").alias("contaminated")
    )
    j = docs.join(split, "doc_id").join(dec, "doc_id")
    return (
        j.rollup("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens_total"),
            F.sum("contaminated").alias("n_contaminated"),
        )
        .select(
            F.coalesce(F.col("source"), F.lit("<all>")).alias("source"),
            F.coalesce(F.col("split"), F.lit("<all>")).alias("split"),
            "n_docs",
            "tokens_total",
            "n_contaminated",
        )
    )


def _oracle_release_datasheet() -> str:
    return f"""
    WITH docs AS (
        SELECT doc_id, source,
               CAST({T.n_tokens_sql('text')} AS BIGINT) AS n_tokens
        FROM documents WHERE source <> '{DECON_BENCH_SOURCE}'
    ),
    split_side AS ({ORACLE_TRAIN_SPLIT}),
    dec_side AS ({ORACLE_DECONTAMINATE}),
    j AS (
        SELECT d.doc_id, d.source, d.n_tokens, s.split,
               CAST(x.contaminated AS BIGINT) AS contaminated
        FROM docs d
        JOIN split_side s ON s.doc_id = d.doc_id
        JOIN dec_side x ON x.doc_id = d.doc_id
    )
    SELECT coalesce(source, '<all>') AS source,
           coalesce(split, '<all>') AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
           CAST(sum(contaminated) AS BIGINT) AS n_contaminated
    FROM j
    GROUP BY ROLLUP (source, split)
"""


# ---------------------------------------------------------------------------
# q_train_split — E62: deterministic stratified train/val/test split
# ---------------------------------------------------------------------------

SPLIT_HASH_P = 2_654_435_761  # Knuth multiplicative constant
SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 10  # test gets the remainder


def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified train/val/test assignment — the last
    step of every training-data release: each document lands in
    exactly one split, proportions hold EXACTLY within every source
    stratum (so no source is over-represented in eval), and the
    assignment is a pure function of (doc_id, source) — re-running
    the release or adding a replica can never reshuffle the splits.

    Mechanics: a multiplicative integer hash scrambles doc_id, a
    per-source window orders by (hash, doc_id) and row_number()/count
    give each doc an exact quantile position; the first 80% of each
    stratum is train, the next 10% val, the rest test (integer floor
    boundaries — no double percent_rank, no cross-engine tie issues).
    Scale posture: ONE source-keyed exchange serving both window
    functions (same partition spec), everything else narrow; at skew
    (one giant source) the window is a per-partition sort of ids +
    one long — the perplexity filter's documented remedy applies
    unchanged."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    h = ((F.col("doc_id") * SPLIT_HASH_P) % T.MOD).alias("h")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("h", "doc_id")
    wn = Window.partitionBy("source")
    ranked = docs.select("doc_id", "source", h).select(
        "doc_id",
        "source",
        "h",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n_source"),
    )
    return ranked.select(
        "doc_id",
        "source",
        "rn",
        "n_source",
        F.when(
            F.col("rn") <= F.expr(f"cast(floor(n_source * {SPLIT_TRAIN_PCT} / 100) as bigint)"),
            "train",
        )
        .when(
            F.col("rn")
            <= F.expr(
                f"cast(floor(n_source * {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} / 100) as bigint)"
            ),
            "val",
        )
        .otherwise("test")
        .alias("split"),
    )


ORACLE_TRAIN_SPLIT = f"""
    WITH ranked AS (
        SELECT doc_id, source,
               (doc_id * {SPLIT_HASH_P}) % {T.MOD} AS h,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY (doc_id * {SPLIT_HASH_P}) % {T.MOD} ASC, doc_id ASC
               ) AS BIGINT) AS rn,
               CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_source
        FROM documents
    )
    SELECT doc_id, source, rn, n_source,
           CASE WHEN rn <= CAST(floor(n_source * {SPLIT_TRAIN_PCT} / 100.0) AS BIGINT)
                THEN 'train'
                WHEN rn <= CAST(floor(n_source * {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} / 100.0) AS BIGINT)
                THEN 'val'
                ELSE 'test' END AS split
    FROM ranked
"""


# ---------------------------------------------------------------------------


def q_curation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-curation certification row: test-set decontamination,
    deterministic source-mixture rebalancing, PII redaction,
    context-window chunking, concat-and-split sequence packing (both
    the window form and the skew-safe indexed rewrite), the Gopher
    quality-rule filter, and the per-source quota cap, tagged by op
    and unioned in LONG format — (op, key, metric, value:bigint) — so
    heterogeneous curation branches share one schema and a new branch
    is one more stack().
    Chunking contributes per-doc aggregates (chunk count + fold of
    chunk fingerprints); chunk-level rows stay in the q_doc_chunks
    tail twin. The union is plan-level only (no cross-branch
    shuffle); single-op twins stay registered in the tail."""
    # Shared verdict frames: the decontaminate and split pipelines
    # feed BOTH their own branches and the E76 datasheet. Shared as
    # plain DataFrames (identical subtrees → Spark's ReuseExchange
    # dedupes the shuffles), NOT persisted: A/B at sf0.1 measured the
    # cache barriers SLOWER (min 6.9 s vs 5.3 s) because each verdict
    # pipeline is one cheap pass here — at real scale, where a verdict
    # pipeline is expensive, tracked_persist these two frames (the
    # q_text_mining_suite rule).
    dec_df = q_decontaminate(spark, sf_dir)
    split_df = q_train_split(spark, sf_dir)
    dec = dec_df.selectExpr(
        "'decontaminate' AS op",
        "cast(doc_id as string) AS key",
        "stack(2, 'n_shared_grams', n_shared_grams, "
        "'contaminated', cast(contaminated as bigint)) AS (metric, value)",
    )
    mix = q_source_mixture(spark, sf_dir).selectExpr(
        "'source_mixture' AS op",
        "source AS key",
        "stack(5, 'n_docs', n_docs, 'tokens_total', tokens_total, "
        "'keep_threshold', keep_threshold, 'n_docs_kept', n_docs_kept, "
        "'tokens_kept', tokens_kept) AS (metric, value)",
    )
    pii = q_pii_redact(spark, sf_dir).selectExpr(
        "'pii_redact' AS op",
        "cast(doc_id as string) AS key",
        "stack(4, 'n_emails', cast(n_emails as bigint), "
        "'n_ips', cast(n_ips as bigint), "
        "'n_phones', cast(n_phones as bigint), "
        "'redacted_fp', redacted_fp) AS (metric, value)",
    )
    chunk = (
        q_doc_chunks(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.min("chunk_fp").alias("chunk_fp_min"),
        )
        .selectExpr(
            "'chunking' AS op",
            "cast(doc_id as string) AS key",
            "stack(2, 'n_chunks', n_chunks, 'chunk_fp_min', chunk_fp_min) "
            "AS (metric, value)",
        )
    )
    pack = q_sequence_pack(spark, sf_dir).selectExpr(
        "'sequence_pack' AS op",
        "cast(doc_id as string) AS key",
        "stack(3, 'pack_id', pack_id, 'pack_offset', pack_offset, "
        "'crosses_boundary', cast(crosses_boundary as bigint)) AS (metric, value)",
    )
    packi = q_sequence_pack_indexed(spark, sf_dir).selectExpr(
        "'sequence_pack_indexed' AS op",
        "cast(doc_id as string) AS key",
        "stack(3, 'pack_id', pack_id, 'pack_offset', pack_offset, "
        "'crosses_boundary', cast(crosses_boundary as bigint)) AS (metric, value)",
    )
    # Doubles re-round to e6 integers (floor(x*1e6+0.5)) rather than
    # cast — Spark truncates double→bigint where DuckDB rounds.
    qual = q_quality_filter(spark, sf_dir).selectExpr(
        "'quality_filter' AS op",
        "cast(doc_id as string) AS key",
        "stack(4, 'n_words', cast(n_words as bigint), "
        "'mean_word_len_e6', cast(floor(mean_word_len * 1e6 + 0.5) as bigint), "
        "'stop_hits', cast(stop_hits as bigint), "
        "'keep', cast(keep as bigint)) AS (metric, value)",
    )
    quota = q_domain_quota(spark, sf_dir).selectExpr(
        "'domain_quota' AS op",
        "cast(doc_id as string) AS key",
        "stack(2, 'quota_rank', cast(quota_rank as bigint), "
        "'kept', cast(kept as bigint)) AS (metric, value)",
    )
    boiler = q_boilerplate_detect(spark, sf_dir).selectExpr(
        "'boilerplate' AS op",
        "cast(doc_id as string) AS key",
        "stack(3, 'n_chunks', n_chunks, "
        "'n_boilerplate', n_boilerplate, "
        "'boiler_frac_e6', boiler_frac_e6) AS (metric, value)",
    )
    temp = q_mixture_weights(spark, sf_dir).selectExpr(
        "'mixture_weights' AS op",
        "source AS key",
        "stack(4, 'tokens_total', tokens_total, "
        "'raw_share_e9', raw_share_e9, "
        "'temp_share_e9', temp_share_e9, "
        "'expected_tokens', expected_tokens) AS (metric, value)",
    )
    # E51: the LM-percentile cut (perplexity filtering).
    ppl = q_perplexity_filter(spark, sf_dir).selectExpr(
        "'ppl_filter' AS op",
        "cast(doc_id as string) AS key",
        "stack(3, 'nll_e6', nll_e6, 'pr_e6', pr_e6, "
        "'keep', cast(keep as bigint)) AS (metric, value)",
    )
    # E62: the stratified split assignment (split encoded as an int:
    # train=0 / val=1 / test=2 so the LONG value stays bigint).
    split = split_df.selectExpr(
        "'train_split' AS op",
        "cast(doc_id as string) AS key",
        "stack(3, 'rn', rn, 'n_source', n_source, "
        "'split_code', cast(CASE split WHEN 'train' THEN 0 "
        "WHEN 'val' THEN 1 ELSE 2 END as bigint)) AS (metric, value)",
    )
    # E76: the release datasheet (source × split rollup margins),
    # over the SAME persisted verdict frames.
    sheet = q_release_datasheet(
        spark, sf_dir, split=split_df, decon=dec_df
    ).selectExpr(
        "'datasheet' AS op",
        "concat(source, '|', split) AS key",
        "stack(3, 'n_docs', n_docs, 'tokens_total', tokens_total, "
        "'n_contaminated', n_contaminated) AS (metric, value)",
    )
    return (
        dec.unionByName(mix)
        .unionByName(pii)
        .unionByName(chunk)
        .unionByName(pack)
        .unionByName(packi)
        .unionByName(qual)
        .unionByName(quota)
        .unionByName(boiler)
        .unionByName(temp)
        .unionByName(ppl)
        .unionByName(split)
        .unionByName(sheet)
    )


ORACLE_CURATION_SUITE = f"""
    WITH dec_side AS ({ORACLE_DECONTAMINATE}),
    mix_side AS ({ORACLE_SOURCE_MIXTURE}),
    pii_side AS ({ORACLE_PII_REDACT}),
    chunk_side AS (
        SELECT doc_id, count(*) AS n_chunks, min(chunk_fp) AS chunk_fp_min
        FROM ({ORACLE_DOC_CHUNKS}) GROUP BY doc_id
    ),
    pack_side AS ({ORACLE_SEQUENCE_PACK}),
    qual_side AS ({ORACLE_QUALITY_FILTER}),
    quota_side AS ({ORACLE_DOMAIN_QUOTA}),
    boiler_side AS ({ORACLE_BOILERPLATE_DETECT}),
    temp_side AS ({ORACLE_MIXTURE_WEIGHTS})
    SELECT 'decontaminate' AS op, CAST(doc_id AS VARCHAR) AS key,
           'n_shared_grams' AS metric, n_shared_grams AS value FROM dec_side
    UNION ALL
    SELECT 'decontaminate', CAST(doc_id AS VARCHAR),
           'contaminated', CAST(contaminated AS BIGINT) FROM dec_side
    UNION ALL
    SELECT 'source_mixture', source, 'n_docs', n_docs FROM mix_side
    UNION ALL
    SELECT 'source_mixture', source, 'tokens_total', tokens_total FROM mix_side
    UNION ALL
    SELECT 'source_mixture', source, 'keep_threshold', keep_threshold FROM mix_side
    UNION ALL
    SELECT 'source_mixture', source, 'n_docs_kept', n_docs_kept FROM mix_side
    UNION ALL
    SELECT 'source_mixture', source, 'tokens_kept', tokens_kept FROM mix_side
    UNION ALL
    SELECT 'pii_redact', CAST(doc_id AS VARCHAR),
           'n_emails', CAST(n_emails AS BIGINT) FROM pii_side
    UNION ALL
    SELECT 'pii_redact', CAST(doc_id AS VARCHAR),
           'n_ips', CAST(n_ips AS BIGINT) FROM pii_side
    UNION ALL
    SELECT 'pii_redact', CAST(doc_id AS VARCHAR),
           'n_phones', CAST(n_phones AS BIGINT) FROM pii_side
    UNION ALL
    SELECT 'pii_redact', CAST(doc_id AS VARCHAR),
           'redacted_fp', redacted_fp FROM pii_side
    UNION ALL
    SELECT 'chunking', CAST(doc_id AS VARCHAR), 'n_chunks', n_chunks
    FROM chunk_side
    UNION ALL
    SELECT 'chunking', CAST(doc_id AS VARCHAR), 'chunk_fp_min', chunk_fp_min
    FROM chunk_side
    UNION ALL
    SELECT 'sequence_pack', CAST(doc_id AS VARCHAR), 'pack_id', pack_id
    FROM pack_side
    UNION ALL
    SELECT 'sequence_pack', CAST(doc_id AS VARCHAR), 'pack_offset', pack_offset
    FROM pack_side
    UNION ALL
    SELECT 'sequence_pack', CAST(doc_id AS VARCHAR),
           'crosses_boundary', CAST(crosses_boundary AS BIGINT)
    FROM pack_side
    UNION ALL
    SELECT 'sequence_pack_indexed', CAST(doc_id AS VARCHAR), 'pack_id', pack_id
    FROM pack_side
    UNION ALL
    SELECT 'sequence_pack_indexed', CAST(doc_id AS VARCHAR),
           'pack_offset', pack_offset
    FROM pack_side
    UNION ALL
    SELECT 'sequence_pack_indexed', CAST(doc_id AS VARCHAR),
           'crosses_boundary', CAST(crosses_boundary AS BIGINT)
    FROM pack_side
    UNION ALL
    SELECT 'quality_filter', CAST(doc_id AS VARCHAR),
           'n_words', CAST(n_words AS BIGINT) FROM qual_side
    UNION ALL
    SELECT 'quality_filter', CAST(doc_id AS VARCHAR),
           'mean_word_len_e6', CAST(floor(mean_word_len * 1e6 + 0.5) AS BIGINT)
    FROM qual_side
    UNION ALL
    SELECT 'quality_filter', CAST(doc_id AS VARCHAR),
           'stop_hits', CAST(stop_hits AS BIGINT) FROM qual_side
    UNION ALL
    SELECT 'quality_filter', CAST(doc_id AS VARCHAR),
           'keep', CAST(keep AS BIGINT) FROM qual_side
    UNION ALL
    SELECT 'domain_quota', CAST(doc_id AS VARCHAR),
           'quota_rank', CAST(quota_rank AS BIGINT) FROM quota_side
    UNION ALL
    SELECT 'domain_quota', CAST(doc_id AS VARCHAR),
           'kept', CAST(kept AS BIGINT) FROM quota_side
    UNION ALL
    SELECT 'boilerplate', CAST(doc_id AS VARCHAR),
           'n_chunks', n_chunks FROM boiler_side
    UNION ALL
    SELECT 'boilerplate', CAST(doc_id AS VARCHAR),
           'n_boilerplate', n_boilerplate FROM boiler_side
    UNION ALL
    SELECT 'boilerplate', CAST(doc_id AS VARCHAR),
           'boiler_frac_e6', boiler_frac_e6 FROM boiler_side
    UNION ALL
    SELECT 'mixture_weights', source, 'tokens_total', tokens_total
    FROM temp_side
    UNION ALL
    SELECT 'mixture_weights', source, 'raw_share_e9', raw_share_e9
    FROM temp_side
    UNION ALL
    SELECT 'mixture_weights', source, 'temp_share_e9', temp_share_e9
    FROM temp_side
    UNION ALL
    SELECT 'mixture_weights', source, 'expected_tokens', expected_tokens
    FROM temp_side
"""


# ---------------------------------------------------------------------------
# q_unigram_lm_score — E42: CCNet-style LM quality scoring
# ---------------------------------------------------------------------------

LM_TOP_V = 16  # vocabulary cap: only the top-V tokens carry their true
# count; everything else scores as an OOV singleton (count 1). The cap
# is what makes the model broadcastable at any corpus size — the same
# bounded-vocabulary contract as E31's PMI top-V.


def q_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram language-model score (CCNet-style corpus
    filtering): train a unigram LM on the corpus itself, then score
    every document by its mean negative log-likelihood — documents
    whose token distribution diverges from the corpus (gibberish,
    boilerplate, wrong-language) surface with high NLL and get culled
    by a percentile cut downstream.

    Two phases, one corpus-scale exchange total:

    1. **model**: token counts via groupBy (map-side partials — the
       exchange carries per-partition distinct tokens, not token
       instances), top-V head by (count desc, token asc), folded with
       the full-vocabulary token total into ONE broadcast row
       (`map_from_entries` + total).
    2. **score**: NARROW — each doc re-tokenizes, looks its tokens up
       in the broadcast map (OOV → count 1), sorts the count array so
       the double ln-fold is order-pinned cross-engine (q_entropy
       precedent), and emits mean NLL in nats as an e6 integer.

    At 100 TB the model phase is a bounded-output aggregation and the
    scoring phase touches each doc exactly once with zero shuffles —
    there is no per-token join back to the corpus."""
    return _lm_scored(spark, sf_dir).select("doc_id", "n_tokens", "nll_e6")


def _lm_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id, source, n_tokens, nll_e6 — the scored corpus, shared
    by q_unigram_lm_score and the E51 perplexity filter."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    # Persisted: the vocab-sized count table feeds BOTH the top-V head
    # and the token total — without the persist each consumer replays
    # the corpus-scale token exchange (the one expensive stage here).
    counts = tracked_persist(
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(LM_TOP_V)
    model = top.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("token", "n")))
        ).alias("vmap")
    ).crossJoin(
        F.broadcast(counts.agg(F.sum("n").alias("total")))
    )
    arr = "array_sort(transform(split(text, ' '), t -> coalesce(vmap[t], cast(1 as bigint))))"
    nll = (
        f"-aggregate({arr}, cast(0.0 as double), "
        "(acc, c) -> acc + ln(cast(c as double) / cast(total as double))) "
        "/ size(split(text, ' '))"
    )
    return docs.crossJoin(F.broadcast(model)).select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        F.expr(f"cast(floor(({nll}) * 1e6 + 0.5) as bigint)").alias("nll_e6"),
    )


ORACLE_UNIGRAM_LM_SCORE = f"""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    vocab AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY token),
    topv AS (SELECT token, n FROM vocab ORDER BY n DESC, token ASC LIMIT {LM_TOP_V}),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM vocab),
    inst AS (
        SELECT d.doc_id, u.token
        FROM documents d, unnest(string_split(d.text, ' ')) AS u(token)
    ),
    looked AS (
        SELECT i.doc_id, COALESCE(t.n, CAST(1 AS BIGINT)) AS c
        FROM inst i LEFT JOIN topv t ON i.token = t.token
    ),
    per_doc AS (
        SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens,
               list(c ORDER BY c ASC) AS arr
        FROM looked GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           CAST(floor((-(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(arr, c -> ln(CAST(c AS DOUBLE) / CAST(tot.total AS DOUBLE)))),
                (acc, v) -> acc + v)) / n_tokens) * 1e6 + 0.5) AS BIGINT) AS nll_e6
    FROM per_doc, tot
"""


# ---------------------------------------------------------------------------
# q_bigram_lm_score — E69: interpolated bigram LM scoring
# ---------------------------------------------------------------------------

BIGRAM_TOP_B = 64   # bigram model head (count desc, pair asc)
# unigram back-off reuses LM_TOP_V and the same OOV->1 convention


def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document INTERPOLATED bigram LM score — the next rung above
    E42's unigram filter (CCNet trains 5-grams; the bigram order
    exercises every mechanism: context counts, conditional
    probabilities, back-off interpolation): train bigram counts on the
    corpus, score each document by the mean negative log of
    p(tᵢ|tᵢ₋₁) = λ·c(tᵢ₋₁tᵢ)/c(tᵢ₋₁) + (1−λ)·c(tᵢ)/total with λ=0.5
    (binary-exact), unigram back-off guaranteeing p > 0 for unseen
    bigrams.

    Same two-phase shape as the unigram LM: the model phase is two
    bounded-output keyed aggregations (token counts and adjacent-pair
    counts — pair generation is a NARROW positional zip, no
    self-join), folded into broadcast maps (top-V unigrams, top-B
    bigrams); the scoring phase is zero-shuffle — each doc folds its
    own positions sequentially (position order IS the summation
    order, pinned identically in both engines; no sort needed).
    Documents shorter than 2 tokens score 0 by convention."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(F.split(F.col("text"), " ").alias("ts"))
    uni = tracked_persist(
        toks.select(F.explode("ts").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top_u = uni.orderBy(F.desc("n"), F.asc("token")).limit(LM_TOP_V)
    bi = (
        toks.select(
            # Guard 1-token docs (split('', ' ') = ['']): Spark's
            # sequence(2, 1) DESCENDS to [2, 1] and element_at(ts, 2)
            # throws, while DuckDB's generate_series(2, 1) is empty.
            # The scoring phase already guards with size(ts) < 2.
            F.explode(
                F.expr(
                    "CASE WHEN size(ts) < 2 THEN array() ELSE "
                    "transform(sequence(2, size(ts)), "
                    "i -> concat(element_at(ts, i - 1), ' ', element_at(ts, i))) END"
                )
            ).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top_b = bi.orderBy(F.desc("n"), F.asc("pair")).limit(BIGRAM_TOP_B)
    model = (
        top_u.agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("token", "n")))
            ).alias("vmap")
        )
        .crossJoin(
            F.broadcast(
                top_b.agg(
                    F.map_from_entries(
                        F.array_sort(F.collect_list(F.struct("pair", "n")))
                    ).alias("bmap")
                )
            )
        )
        .crossJoin(F.broadcast(uni.agg(F.sum("n").alias("total"))))
    )
    p = (
        "(0.5 * cast(coalesce(bmap[concat(element_at(ts, i - 1), ' ', "
        "element_at(ts, i))], cast(0 as bigint)) as double) "
        "/ cast(coalesce(vmap[element_at(ts, i - 1)], cast(1 as bigint)) as double) "
        "+ 0.5 * cast(coalesce(vmap[element_at(ts, i)], cast(1 as bigint)) as double) "
        "/ cast(total as double))"
    )
    nll = (
        f"CASE WHEN size(ts) < 2 THEN cast(0.0 as double) "
        f"ELSE -aggregate(sequence(2, size(ts)), cast(0.0 as double), "
        f"(acc, i) -> acc + ln({p})) / (size(ts) - 1) END"
    )
    return (
        docs.select("doc_id", F.split(F.col("text"), " ").alias("ts"))
        .crossJoin(F.broadcast(model))
        .select(
            "doc_id",
            F.size("ts").alias("n_tokens"),
            F.expr(f"cast(floor(({nll}) * 1e6 + 0.5) as bigint)").alias("bi_nll_e6"),
        )
    )


ORACLE_BIGRAM_LM_SCORE = f"""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    uni AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY token),
    top_u AS (SELECT token, n FROM uni ORDER BY n DESC, token ASC LIMIT {LM_TOP_V}),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM uni),
    pos AS (
        SELECT d.doc_id, d.ts[u.pos] AS token, CAST(u.pos AS BIGINT) AS pos
        FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents) d,
             unnest(generate_series(1, len(d.ts))) AS u(pos)
    ),
    bi AS (
        SELECT a.token || ' ' || b.token AS pair, CAST(count(*) AS BIGINT) AS n
        FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        GROUP BY 1
    ),
    top_b AS (SELECT pair, n FROM bi ORDER BY n DESC, pair ASC LIMIT {BIGRAM_TOP_B}),
    terms AS (
        SELECT b.doc_id, b.pos,
               ln(0.5 * CAST(COALESCE(tb.n, 0) AS DOUBLE)
                      / CAST(COALESCE(ua.n, 1) AS DOUBLE)
                  + 0.5 * CAST(COALESCE(ub.n, 1) AS DOUBLE)
                      / CAST(tot.total AS DOUBLE)) AS term
        FROM pos b
        JOIN pos a ON a.doc_id = b.doc_id AND a.pos = b.pos - 1
        LEFT JOIN top_b tb ON tb.pair = a.token || ' ' || b.token
        LEFT JOIN top_u ua ON ua.token = a.token
        LEFT JOIN top_u ub ON ub.token = b.token
        CROSS JOIN tot
    ),
    lens AS (
        SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens FROM pos GROUP BY doc_id
    ),
    folded AS (
        SELECT doc_id, list(term ORDER BY pos ASC) AS arr FROM terms GROUP BY doc_id
    )
    SELECT l.doc_id, l.n_tokens,
           CAST(floor((CASE WHEN l.n_tokens < 2 THEN 0.0
                ELSE -(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), f.arr),
                       (acc, v) -> acc + v)) / (l.n_tokens - 1) END)
                * 1e6 + 0.5) AS BIGINT) AS bi_nll_e6
    FROM lens l LEFT JOIN folded f ON f.doc_id = l.doc_id
"""


# ---------------------------------------------------------------------------
# q_perplexity_filter — E51: per-source percentile cut on the LM score
# ---------------------------------------------------------------------------

PPL_KEEP_FRAC = 0.90


def q_perplexity_filter(
    spark: SparkSession,
    sf_dir: str,
    skew_threshold: int = PPL_SKEW_THRESHOLD,
) -> DataFrame:
    """Perplexity filtering — THE standard LM-based curation cut
    (CCNet/LLaMA-style): score every document with the corpus unigram
    LM, then keep the lowest-NLL 90% WITHIN each source (per-source
    cut, so a clean source doesn't crowd out a noisy one's budget).
    The percentile is exact: percent_rank over (source, nll asc,
    doc_id asc) — integer rank arithmetic, no approximate quantiles,
    so the verdict hash-checks. Emits rank + verdict for EVERY doc
    (the q_domain_quota discipline: the hash pins the whole
    selection, not just survivors).

    Shape: the LM model phase owns the token exchange (see
    q_unigram_lm_score); scoring is narrow; the cut adds ONE window
    exchange on source. A dominant source at 100 TB would serialize
    that window partition, so when the measured source census (memoized
    per input dir; a production scheduler feeds this from
    q_skew_report) exceeds ``skew_threshold``, the cut switches to the
    distributed exact rank (operators/indexing.assign_grouped_rank:
    range-partition on (source, nll, doc_id) so the dominant source
    SPANS partitions, per-(partition, source) counts -> broadcast
    prefix offsets -> streamed rank assignment). Both paths replay
    percent_rank's exact arithmetic — (rank-1)/(n-1) in double —
    and are equality-tested on a skewed fixture."""
    scored = _lm_scored(spark, sf_dir)
    if _max_source_rows(spark, sf_dir) >= skew_threshold:
        from weatherflow_spark.operators.indexing import assign_grouped_rank

        ranked = assign_grouped_rank(
            scored.select("doc_id", "source", "nll_e6"),
            ["source"],
            ["nll_e6", "doc_id"],
            rank_col="__wf_rank",
        )
        totals = (
            scored.groupBy("source").agg(F.count(F.lit(1)).alias("__wf_n"))
        )
        return (
            ranked.join(F.broadcast(totals), "source")
            .select(
                "doc_id",
                "source",
                "nll_e6",
                F.expr(
                    "cast(floor((CASE WHEN __wf_n = 1 THEN cast(0.0 as double) "
                    "ELSE cast(__wf_rank - 1 as double) / cast(__wf_n - 1 as double) END) "
                    "* 1e6 + 0.5) as bigint)"
                ).alias("pr_e6"),
            )
            .withColumn(
                "keep",
                (F.col("pr_e6") <= F.lit(int(PPL_KEEP_FRAC * 1e6))).cast("int"),
            )
        )
    return scored.select(
        "doc_id",
        "source",
        "nll_e6",
        F.expr(
            f"cast(floor(percent_rank() over (partition by source "
            f"order by nll_e6 asc, doc_id asc) * 1e6 + 0.5) as bigint)"
        ).alias("pr_e6"),
    ).withColumn(
        "keep",
        (F.col("pr_e6") <= F.lit(int(PPL_KEEP_FRAC * 1e6))).cast("int"),
    )


ORACLE_PERPLEXITY_FILTER = f"""
    WITH lm AS ({ORACLE_UNIGRAM_LM_SCORE}),
    src AS (SELECT doc_id, source FROM documents),
    scored AS (
        SELECT lm.doc_id, src.source, lm.nll_e6
        FROM lm JOIN src USING (doc_id)
    )
    SELECT doc_id, source, nll_e6,
           CAST(floor(percent_rank() OVER (
               PARTITION BY source ORDER BY nll_e6 ASC, doc_id ASC
           ) * 1e6 + 0.5) AS BIGINT) AS pr_e6,
           CAST(CASE WHEN floor(percent_rank() OVER (
               PARTITION BY source ORDER BY nll_e6 ASC, doc_id ASC
           ) * 1e6 + 0.5) <= {int(PPL_KEEP_FRAC * 1e6)}
                THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM scored
"""


# The ppl_filter branch joins the curation-suite oracle here (rebound
# after ORACLE_PERPLEXITY_FILTER exists).
ORACLE_CURATION_SUITE = f"""
    WITH ppl_side AS ({ORACLE_PERPLEXITY_FILTER}),
    base AS ({ORACLE_CURATION_SUITE})
    SELECT * FROM base
    UNION ALL
    SELECT 'ppl_filter' AS op, CAST(doc_id AS VARCHAR) AS key,
           'nll_e6' AS metric, nll_e6 AS value
    FROM ppl_side
    UNION ALL
    SELECT 'ppl_filter', CAST(doc_id AS VARCHAR), 'pr_e6', pr_e6 FROM ppl_side
    UNION ALL
    SELECT 'ppl_filter', CAST(doc_id AS VARCHAR), 'keep',
           CAST(keep AS BIGINT) FROM ppl_side
"""

# The train_split + datasheet branches join the same way (second rebind).
ORACLE_CURATION_SUITE = f"""
    WITH split_side AS ({ORACLE_TRAIN_SPLIT}),
    sheet_side AS ({_oracle_release_datasheet()}),
    base AS ({ORACLE_CURATION_SUITE})
    SELECT * FROM base
    UNION ALL
    SELECT 'train_split' AS op, CAST(doc_id AS VARCHAR) AS key,
           'rn' AS metric, rn AS value
    FROM split_side
    UNION ALL
    SELECT 'train_split', CAST(doc_id AS VARCHAR), 'n_source', n_source
    FROM split_side
    UNION ALL
    SELECT 'train_split', CAST(doc_id AS VARCHAR), 'split_code',
           CAST(CASE split WHEN 'train' THEN 0 WHEN 'val' THEN 1 ELSE 2 END
                AS BIGINT)
    FROM split_side
    UNION ALL
    SELECT 'datasheet', source || '|' || split, 'n_docs', n_docs
    FROM sheet_side
    UNION ALL
    SELECT 'datasheet', source || '|' || split, 'tokens_total', tokens_total
    FROM sheet_side
    UNION ALL
    SELECT 'datasheet', source || '|' || split, 'n_contaminated',
           n_contaminated
    FROM sheet_side
"""


TEXT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_text_stats": q_text_stats,
    "q_repetition_filter": q_repetition_filter,
    "q_token_topk": q_token_topk,
    "q_lang_id": q_lang_id,
    "q_doc_fingerprint": q_doc_fingerprint,
    "q_string_funcs": q_string_funcs,
    "q_bpe_token_count": q_bpe_token_count,
    "q_decontaminate": q_decontaminate,
    "q_source_mixture": q_source_mixture,
    "q_pii_redact": q_pii_redact,
    "q_doc_chunks": q_doc_chunks,
    "q_sequence_pack": q_sequence_pack,
    "q_sequence_pack_indexed": q_sequence_pack_indexed,
    "q_quality_filter": q_quality_filter,
    "q_domain_quota": q_domain_quota,
    "q_train_split": q_train_split,
    "q_corpus_drift": q_corpus_drift,
    "q_release_datasheet": q_release_datasheet,
    "q_bigram_lm_score": q_bigram_lm_score,
    "q_boilerplate_detect": q_boilerplate_detect,
    "q_mixture_weights": q_mixture_weights,
    "q_unigram_lm_score": q_unigram_lm_score,
    "q_perplexity_filter": q_perplexity_filter,
    "q_curation_suite": q_curation_suite,
}

TEXT_ORACLES: dict[str, str] = {
    "q_unigram_lm_score": ORACLE_UNIGRAM_LM_SCORE,
    "q_perplexity_filter": ORACLE_PERPLEXITY_FILTER,
    "q_string_funcs": ORACLE_STRING_FUNCS,
    "q_text_stats": ORACLE_TEXT_STATS,
    "q_repetition_filter": ORACLE_REPETITION_FILTER,
    "q_token_topk": ORACLE_TOKEN_TOPK,
    "q_lang_id": _oracle_lang_id(),
    "q_doc_fingerprint": ORACLE_DOC_FINGERPRINT,
    "q_bpe_token_count": ORACLE_BPE_TOKEN_COUNT,
    "q_decontaminate": ORACLE_DECONTAMINATE,
    "q_source_mixture": ORACLE_SOURCE_MIXTURE,
    "q_pii_redact": ORACLE_PII_REDACT,
    "q_doc_chunks": ORACLE_DOC_CHUNKS,
    "q_sequence_pack": ORACLE_SEQUENCE_PACK,
    "q_sequence_pack_indexed": ORACLE_SEQUENCE_PACK_INDEXED,
    "q_quality_filter": ORACLE_QUALITY_FILTER,
    "q_domain_quota": ORACLE_DOMAIN_QUOTA,
    "q_train_split": ORACLE_TRAIN_SPLIT,
    "q_corpus_drift": ORACLE_CORPUS_DRIFT,
    "q_release_datasheet": _oracle_release_datasheet(),
    "q_bigram_lm_score": ORACLE_BIGRAM_LM_SCORE,
    "q_boilerplate_detect": ORACLE_BOILERPLATE_DETECT,
    "q_mixture_weights": ORACLE_MIXTURE_WEIGHTS,
    "q_curation_suite": ORACLE_CURATION_SUITE,
}
