"""Extension tier E1 (SURVEY §2.11): deduplication over `documents`.

Five dedup families, all first-class queries:

- **exact**        — hash-groupBy on sha256 of normalized text.
- **MinHash+LSH**  — 3-token shingles → 8 minhash perms → 4 bands of
                     2 → band-bucket equi-join → exact-Jaccard verify.
- **SimHash**      — 20-bit simhash per doc + Hamming-blocked pairs.
- **n-gram Jaccard** — blocked pairwise exact Jaccard (block = source).

Everything is hash-checked against DuckDB: the minhash/simhash math
is the cross-engine polynomial hash from
:mod:`weatherflow_spark.functions.text` (fixed literal permutation
constants, no runtime RNG), so even the LSH pipeline is bit-exact
reproducible in ANSI SQL.

Scale posture (100 TB): the *only* quadratic step anywhere is within
a blocking group (band bucket / source block), which is the standard
LSH contract — global work is O(n·bands) shuffle + per-bucket pairs.
The signature computation itself is narrow and pipelines into the
scan. Skewed buckets (giant clusters of near-identical docs) are the
known hazard: AQE skew-join handles moderate skew, and the band key
includes the band index so buckets never merge across bands.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from weatherflow_spark.functions import text as T
from weatherflow_spark.io import load_table

N_BANDS = 4
ROWS_PER_BAND = 2  # N_BANDS * ROWS_PER_BAND == T.N_HASHES
JACCARD_THRESHOLD = 0.5
SIMHASH_PREFIX_BITS = 8  # block key = top bits of the simhash
HAMMING_MAX = 6


# ---------------------------------------------------------------------------
# q_dedup_exact — hash-groupBy exact dedup
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one output row per distinct normalized text,
    keeping the lowest doc_id (deterministic survivor policy — never
    `dropDuplicates`, whose survivor depends on partition order).
    Map-side partial min/count keeps the shuffle to one aggregated
    row per group."""
    df = load_table(spark, sf_dir, "documents")
    return (
        df.select(
            F.sha2(F.trim(F.lower(F.col("text"))), 256).alias("content_hash"),
            F.col("doc_id"),
        )
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


ORACLE_DEDUP_EXACT = """
    SELECT
        sha256(trim(lower(text))) AS content_hash,
        min(doc_id) AS keep_doc_id,
        count(*) AS n_copies
    FROM documents
    GROUP BY 1
"""


# ---------------------------------------------------------------------------
# minhash signatures
# ---------------------------------------------------------------------------


def _with_minhash(df: DataFrame) -> DataFrame:
    """doc_id + mh_0..mh_7. Shape matters: exploding the shingle set
    and taking 8 ``min()`` aggregates computes each shingle hash
    exactly once and keeps every expression tiny (whole-stage
    codegen'd, map-side partial min before the doc_id shuffle). The
    tempting alternative — 8 inlined ``array_min(transform(...))``
    higher-order exprs — re-evaluates the char-fold per perm and
    builds an expression tree big enough to wreck codegen (measured
    ~100x slower at sf0.001). Docs with <3 tokens keep NULL
    signatures via the left join."""
    shingled = df.select(
        F.col("doc_id"),
        F.explode(F.expr(f"array_distinct({T.shingle_hashes_expr('text')})")).alias("h"),
    )
    aggs = [
        F.min(F.expr(f"(h * {a} + {b}) % {T.MOD}")).alias(f"mh_{i}")
        for i, (a, b) in enumerate(zip(T.MINHASH_A, T.MINHASH_B))
    ]
    sigs = shingled.groupBy("doc_id").agg(*aggs)
    return df.select("doc_id").join(sigs, "doc_id", "left")


def _minhash_sig_cte() -> str:
    """DuckDB twin of ``_with_minhash`` (same unnest+min shape so the
    shingle list is computed once per doc)."""
    mins = ", ".join(
        f"min((h * {a} + {b}) % {T.MOD}) AS mh_{i}"
        for i, (a, b) in enumerate(zip(T.MINHASH_A, T.MINHASH_B))
    )
    mh_cols = ", ".join(f"g.mh_{i}" for i in range(T.N_HASHES))
    return f"""
        exploded AS (
            SELECT doc_id, unnest(list_distinct({T.shingle_hashes_sql('text')})) AS h
            FROM documents
        ),
        grouped AS (
            SELECT doc_id, {mins} FROM exploded GROUP BY doc_id
        ),
        sigs AS (
            SELECT d.doc_id, {mh_cols}
            FROM documents d LEFT JOIN grouped g USING (doc_id)
        )
    """


def q_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MinHash signature (8 perms over 3-token shingle
    hashes)."""
    return _with_minhash(load_table(spark, sf_dir, "documents"))


ORACLE_MINHASH_SIGNATURE = f"""
    WITH {_minhash_sig_cte()}
    SELECT * FROM sigs
"""


# ---------------------------------------------------------------------------
# q_minhash_near_dup — full LSH pipeline with exact-Jaccard verify
# ---------------------------------------------------------------------------


def minhash_verified_pairs(docs: DataFrame, cache: bool = False) -> DataFrame:
    """LSH candidate pairs with exact-Jaccard verification — the
    shared edge-builder for `q_minhash_near_dup` and the
    connected-components clustering in :mod:`plans.iterative`.
    Returns (doc_a, doc_b, jaccard<raw double>, n_inter).

    ``cache`` trade-off (measured): the banded keys and shingle sets
    each feed BOTH sides of a self-join, and Spark re-derives the
    shingle→minhash pipeline per side (6 FileScans, 0
    ReusedExchange). For a one-shot run the recompute is cheap
    whole-stage-codegen work and pipelining beats cache
    materialization (sf0.1: 1.4 s uncached vs 1.8 s cached), so the
    default is off. Pass ``cache=True`` when the edge list is reused
    across jobs/rounds (connected components re-joins it every
    propagation round) — there the one materialization of the small
    derivatives (4 band keys/doc; distinct shingle hashes, not the
    text) amortizes immediately."""
    sigs = _with_minhash(docs)

    band_keys = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(b),
                *[F.col(f"mh_{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)],
            )
            for b in range(N_BANDS)
        ]
    )
    banded = sigs.where(F.col("mh_0").isNotNull()).select(
        F.col("doc_id"), F.explode(band_keys).alias("band_key")
    )
    if cache:
        banded = banded.persist()

    pairs = (
        banded.alias("a")
        .join(banded.alias("b"), "band_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )

    shingled = docs.select(
        F.col("doc_id"),
        F.expr(f"array_distinct({T.shingle_hashes_expr('text')})").alias("sh"),
    )
    if cache:
        shingled = shingled.persist()
    verified = (
        pairs.join(shingled.withColumnsRenamed({"doc_id": "doc_a", "sh": "sh_a"}), "doc_a")
        .join(shingled.withColumnsRenamed({"doc_id": "doc_b", "sh": "sh_b"}), "doc_b")
        .withColumn("n_inter", F.expr("size(array_intersect(sh_a, sh_b))"))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.expr("size(sh_a) + size(sh_b)") - F.col("n_inter")).cast("double"),
        )
    )
    return verified


def q_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH near-dup detection end-to-end:

    shingle → 8 minhashes → 4 band keys per doc → *equi-join on band
    key* (this is the scale trick: candidate generation is a keyed
    shuffle, never an all-pairs product) → dedup candidate pairs →
    exact Jaccard over distinct shingle sets → flag pairs ≥ 0.5.

    Output is every candidate pair with its exact Jaccard and an
    `is_dup` flag, so the query is meaningful even on corpora with
    no true near-dups (unit tests cover crafted dup clusters).
    """
    verified = minhash_verified_pairs(load_table(spark, sf_dir, "documents"))
    return verified.select(
        "doc_a",
        "doc_b",
        (F.floor(F.col("jaccard") * 1e6 + F.lit(0.5)) / 1e6).alias("jaccard"),
        (F.col("jaccard") >= JACCARD_THRESHOLD).cast("int").alias("is_dup"),
    )


def verified_pairs_cte() -> str:
    """DuckDB WITH-body twin of :func:`minhash_verified_pairs`
    (sigs → banded → pairs → shingled → verified), shared with the
    connected-components oracle in :mod:`plans.iterative`."""
    band_exprs = []
    for b in range(N_BANDS):
        parts = ", ".join(
            f"CAST(mh_{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
        )
        band_exprs.append(f"concat_ws(':', '{b}', {parts})")
    bands_list = ", ".join(band_exprs)
    return f"""{_minhash_sig_cte()},
        banded AS (
            SELECT doc_id, unnest([{bands_list}]) AS band_key
            FROM sigs WHERE mh_0 IS NOT NULL
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b USING (band_key)
            WHERE a.doc_id < b.doc_id
        ),
        shingled AS (
            SELECT doc_id, list_distinct({T.shingle_hashes_sql('text')}) AS sh
            FROM documents
        ),
        verified AS (
            SELECT
                p.doc_a, p.doc_b,
                len(list_intersect(sa.sh, sb.sh)) AS n_inter,
                CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                    / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
                    AS jaccard
            FROM pairs p
            JOIN shingled sa ON sa.doc_id = p.doc_a
            JOIN shingled sb ON sb.doc_id = p.doc_b
        )"""


def _oracle_minhash_near_dup() -> str:
    return f"""
        WITH {verified_pairs_cte()}
        SELECT
            doc_a, doc_b,
            floor(jaccard * 1e6 + 0.5) / 1e6 AS jaccard,
            CAST(jaccard >= {JACCARD_THRESHOLD} AS INTEGER) AS is_dup
        FROM verified
    """


# ---------------------------------------------------------------------------
# q_simhash + Hamming-blocked near-dup
# ---------------------------------------------------------------------------


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bit SimHash per document over token hashes, plus the
    prefix block key used for Hamming-blocked candidate pairing."""
    df = load_table(spark, sf_dir, "documents")
    th = f"transform({T.tokens_expr('text')}, tok -> {T._tok_hash_lambda_spark('tok')})"
    sim = F.expr(T.simhash_expr(th))
    return df.select(
        F.col("doc_id"),
        sim.alias("simhash"),
        F.expr(
            f"shiftright({T.simhash_expr(th)}, {T.SIMHASH_BITS - SIMHASH_PREFIX_BITS})"
        ).alias("block_key"),
    )


def _simhash_duck(col: str = "text") -> str:
    return T.simhash_sql(T.token_hashes_sql(col))


ORACLE_SIMHASH = f"""
    SELECT
        doc_id,
        {_simhash_duck()} AS simhash,
        ({_simhash_duck()} >> {T.SIMHASH_BITS - SIMHASH_PREFIX_BITS}) AS block_key
    FROM documents
"""


def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: candidate pairs share the 8-bit simhash
    prefix (keyed shuffle, not all-pairs); verify by Hamming distance
    (bit_count of xor) ≤ 6, reported as the 50 closest pairs. At
    scale the standard multi-probe trick (several rotated prefixes)
    raises recall, and thresholded pairs stream to a sink rather than
    a top-k — the limit here bounds the checkable artifact on corpora
    that cluster heavily in simhash space (word-soup test docs do)."""
    df = q_simhash(spark, sf_dir)
    a, b = df.alias("a"), df.alias("b")
    return (
        a.join(b, "block_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn(
            "hamming",
            F.expr("bit_count(a.simhash ^ b.simhash)").cast("int"),
        )
        .where(F.col("hamming") <= HAMMING_MAX)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("hamming"),
        )
        .orderBy(F.asc("hamming"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(50)
    )


ORACLE_SIMHASH_NEAR_DUP = f"""
    WITH s AS (
        SELECT doc_id,
               {_simhash_duck()} AS simhash,
               ({_simhash_duck()} >> {T.SIMHASH_BITS - SIMHASH_PREFIX_BITS}) AS block_key
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM s a JOIN s b USING (block_key)
    WHERE a.doc_id < b.doc_id
      AND bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
    ORDER BY hamming ASC, doc_a ASC, doc_b ASC
    LIMIT 50
"""


# ---------------------------------------------------------------------------
# q_ngram_jaccard — blocked pairwise exact n-gram Jaccard
# ---------------------------------------------------------------------------


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard over all pairs *within a source block*
    (the subquadratic contract: pairwise work bounded by block size),
    top-25 most-similar pairs. Ties broken by (doc_a, doc_b)."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id"),
        F.col("source"),
        F.expr(f"array_distinct({T.shingle_hashes_expr('text')})").alias("sh"),
    )
    a, b = docs.alias("a"), docs.alias("b")
    pairs = (
        a.join(b, "source")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn("n_inter", F.expr("size(array_intersect(a.sh, b.sh))"))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.expr("size(a.sh) + size(b.sh)") - F.col("n_inter")).cast("double"),
        )
    )
    return (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (F.floor(F.col("jaccard") * 1e6 + F.lit(0.5)) / 1e6).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(25)
    )


ORACLE_NGRAM_JACCARD = f"""
    WITH shingled AS (
        SELECT doc_id, source, list_distinct({T.shingle_hashes_sql('text')}) AS sh
        FROM documents
    ),
    pairs AS (
        SELECT
            a.doc_id AS doc_a, b.doc_id AS doc_b,
            CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        FROM shingled a JOIN shingled b USING (source)
        WHERE a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, floor(jaccard * 1e6 + 0.5) / 1e6 AS jaccard
    FROM pairs
    ORDER BY jaccard DESC, doc_a ASC, doc_b ASC
    LIMIT 25
"""


DEDUP_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_dedup_exact": q_dedup_exact,
    "q_minhash_signature": q_minhash_signature,
    "q_minhash_near_dup": q_minhash_near_dup,
    "q_simhash": q_simhash,
    "q_simhash_near_dup": q_simhash_near_dup,
    "q_ngram_jaccard": q_ngram_jaccard,
}

DEDUP_ORACLES: dict[str, str] = {
    "q_dedup_exact": ORACLE_DEDUP_EXACT,
    "q_minhash_signature": ORACLE_MINHASH_SIGNATURE,
    "q_minhash_near_dup": _oracle_minhash_near_dup(),
    "q_simhash": ORACLE_SIMHASH,
    "q_simhash_near_dup": ORACLE_SIMHASH_NEAR_DUP,
    "q_ngram_jaccard": ORACLE_NGRAM_JACCARD,
}
