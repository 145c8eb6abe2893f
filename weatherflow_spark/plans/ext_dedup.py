"""Extension tier E1 (SURVEY §2.11): deduplication over `documents`.

Eight dedup families plus entity resolution, all first-class queries:

- **exact**        — hash-groupBy on sha256 of normalized text.
- **MinHash+LSH**  — 3-token shingles → 8 minhash perms → 4 bands of
                     2 → band-bucket equi-join → exact-Jaccard verify.
- **SimHash**      — 60-bit wide simhash per doc, banded into 4×15-bit
                     block keys (band equi-join + Hamming verify).
- **n-gram Jaccard** — exact 4-gram Jaccard verify over MinHash band
                     candidates (gated, never block-×-block).
- **containment**  — asymmetric |A∩B|/min over the same gate (E60),
                     plus an inverted-index SWEEP branch (r8) whose
                     recall covers the extreme size ratios the
                     MinHash gate cannot see.
- **winnowing**    — MOSS local fingerprints, capped inverted index
                     (E67; guaranteed shared-run detection).
- **fuzzy strings** — blocked levenshtein over the name vocabulary
                     (E26), extended to canonical ENTITY CLUSTERS by
                     min-label propagation (E74).
- **repeated spans** — cross-document exact-substring dedup (E89):
                     n-token window hashes appearing in ≥ 2 docs,
                     merged per doc into maximal spans (Lee et al.
                     2022 — the span-level leak doc-level families
                     cannot see).
(The embedding-cosine and SemDeDup families live in ext_similarity.)

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
from weatherflow_spark.operators.caching import tracked_persist

N_BANDS = 4
ROWS_PER_BAND = 2  # N_BANDS * ROWS_PER_BAND == T.N_HASHES
JACCARD_THRESHOLD = 0.5
# Banded simhash blocking over the 60-bit wide simhash: 4 bands of 15
# bits (~32k key values per band — block count scales with the corpus,
# unlike a fixed-width prefix). Pigeonhole: any pair with Hamming ≤ 3
# agrees on at least one whole band, so recall is total up to 3 and
# best-effort (band-collision) for 4..HAMMING_MAX; guaranteeing 6
# would take 7 bands at ~8 bits each (smaller keys, bigger blocks).
N_SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = T.SIMHASH_WIDE_BITS // N_SIMHASH_BANDS  # 15
HAMMING_MAX = 6
NGRAM_VERIFY_N = 4  # n-gram width for the Jaccard verify stage


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


def minhash_band_keys(docs: DataFrame) -> DataFrame:
    """(doc_id, band_key): N_BANDS rows per signed document — the LSH
    blocking keys every candidate-generation join keys off (self-join
    in :func:`minhash_candidate_pairs`, batch-vs-corpus join in
    :func:`q_incremental_dedup`). Docs too short to sign (<3 tokens,
    NULL signature) emit no keys."""
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
    return sigs.where(F.col("mh_0").isNotNull()).select(
        F.col("doc_id"), F.explode(band_keys).alias("band_key")
    )


def minhash_candidate_pairs(docs: DataFrame, cache: bool = False) -> DataFrame:
    """MinHash-LSH candidate generation alone: banded signatures →
    band-key equi-join self-pair → distinct (doc_a < doc_b) id pairs.
    This is the shared gate for every pairwise-verify family (exact
    Jaccard in :func:`minhash_verified_pairs`, 4-gram Jaccard in
    :func:`q_ngram_jaccard`) — candidate count is bounded by band
    buckets, never by corpus²."""
    banded = minhash_band_keys(docs)
    if cache:
        banded = tracked_persist(banded)

    return (
        banded.alias("a")
        .join(banded.alias("b"), "band_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_verified_pairs(
    docs: DataFrame, cache: bool = False, pairs: DataFrame | None = None
) -> DataFrame:
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
    text) amortizes immediately. ``pairs`` lets a caller supply
    pre-computed (and typically persisted) candidate pairs so several
    verify stages can share one candidate-generation pass
    (q_near_dup_suite)."""
    if pairs is None:
        pairs = minhash_candidate_pairs(docs, cache=cache)

    shingled = docs.select(
        F.col("doc_id"),
        F.expr(f"array_distinct({T.shingle_hashes_expr('text')})").alias("sh"),
    )
    if cache:
        shingled = tracked_persist(shingled)
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
    return _minhash_flagged(verified)


def _minhash_flagged(verified: DataFrame) -> DataFrame:
    """Round + threshold-flag the verified-pair relation (shared by
    q_minhash_near_dup and the suite's minhash branch)."""
    return verified.select(
        "doc_a",
        "doc_b",
        (F.floor(F.col("jaccard") * 1e6 + F.lit(0.5)) / 1e6).alias("jaccard"),
        (F.col("jaccard") >= JACCARD_THRESHOLD).cast("int").alias("is_dup"),
    )


def candidate_pairs_cte() -> str:
    """DuckDB WITH-body twin of :func:`minhash_candidate_pairs`
    (sigs → banded → pairs)."""
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
        )"""


def verified_pairs_cte() -> str:
    """DuckDB WITH-body twin of :func:`minhash_verified_pairs`
    (candidate CTEs + shingled + verified), shared with the
    connected-components oracle in :mod:`plans.iterative`."""
    return f"""{candidate_pairs_cte()},
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


_TH_SPARK = f"transform({T.tokens_expr('text')}, tok -> {T._tok_hash_lambda_spark('tok')})"


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit wide SimHash per document (three permuted 20-bit
    streams, functions/text.py:simhash_wide_expr) — the signature the
    banded near-dup blocking keys off."""
    df = load_table(spark, sf_dir, "documents")
    return df.select(
        F.col("doc_id"),
        F.expr(T.simhash_wide_expr(_TH_SPARK)).alias("simhash"),
    )


def _simhash_duck(col: str = "text") -> str:
    return T.simhash_wide_sql(T.token_hashes_sql(col))


ORACLE_SIMHASH = f"""
    SELECT
        doc_id,
        {_simhash_duck()} AS simhash
    FROM documents
"""


def _simhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band_key, sim): one row per simhash band. The wide
    simhash is materialized once per document (persist) before the
    band explosion: it feeds BOTH sides of the candidate self-join,
    and unlike the cheap minhash derivation (see
    minhash_verified_pairs' measured cache trade-off) the 60-bit
    vote fold is expensive enough that recomputing it per side
    dominates the query (measured 4.1 s → 1.5 s at sf0.1). The
    persisted relation is two longs per doc — at 100 TB this is the
    signature table you would write to disk anyway."""
    df = load_table(spark, sf_dir, "documents")
    # Spread the signature computation: the corpus may arrive as few
    # (locally: one) parquet splits, and the 60-bit vote fold is the
    # dominant per-row cost — without the exchange it runs on one
    # core (measured 3.0 s single-partition vs 0.3 s spread at
    # sf0.1). Hash-repartition by doc_id is deterministic.
    par = spark.sparkContext.defaultParallelism
    sigs = (
        df.repartition(par, F.col("doc_id"))
        .select(F.col("doc_id"), F.expr(T.simhash_wide_expr(_TH_SPARK)).alias("sim"))
    )
    sigs = tracked_persist(sigs)
    return _explode_sim_bands(sigs)


def _explode_sim_bands(sigs: DataFrame) -> DataFrame:
    """(doc_id, sim) → one row per 15-bit band key — the shared band
    explosion for every 60-bit-signature family (SimHash, pHash).
    One definition so band width/key format can never silently
    diverge between families (r9 review)."""
    band_structs = (
        f"transform(sequence(0, {N_SIMHASH_BANDS - 1}), __b -> "
        f"concat(cast(__b as string), ':', cast("
        f"(sim div shiftleft(cast(1 as bigint), __b * {SIMHASH_BAND_BITS})) "
        f"% {1 << SIMHASH_BAND_BITS} as string)))"
    )
    return sigs.select(
        "doc_id", "sim", F.explode(F.expr(band_structs)).alias("band_key")
    )


def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup with banded blocking: each doc emits 4 band
    keys (15-bit slices of the 60-bit simhash); candidates share any
    band (keyed equi-join — mirror of the MinHash band join above);
    verify by Hamming distance ≤ 6, reported as the 50 closest pairs.
    Pigeonhole gives total recall at Hamming ≤ 3 and band-collision
    recall above; block count scales with the corpus (≤ 4·2^15 keys),
    so within-block pairing stays sub-quadratic globally."""
    banded = _simhash_banded(spark, sf_dir)
    a, b = banded.alias("a"), banded.alias("b")
    # Hamming-verify BEFORE deduplicating: clustered corpora make
    # band buckets huge (measured 3.2M raw candidate rows from 5k
    # docs at sf0.1), and bit_count runs in whole-stage codegen on
    # the join output — so the distinct's shuffle carries only the
    # surviving near-dup pairs instead of every raw candidate.
    pairs = (
        a.join(b, "band_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.sim ^ b.sim)").cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= HAMMING_MAX)
        .distinct()
    )
    return pairs.orderBy(F.asc("hamming"), F.asc("doc_a"), F.asc("doc_b")).limit(50)


ORACLE_SIMHASH_NEAR_DUP = f"""
    WITH sigs AS (
        SELECT doc_id, {_simhash_duck()} AS sim FROM documents
    ),
    banded AS (
        SELECT doc_id, sim,
               concat(CAST(b AS VARCHAR), ':',
                      CAST((sim // (CAST(1 AS BIGINT) << (b * {SIMHASH_BAND_BITS})))
                           % {1 << SIMHASH_BAND_BITS} AS VARCHAR)) AS band_key
        FROM sigs CROSS JOIN UNNEST(generate_series(0, {N_SIMHASH_BANDS - 1})) AS u(b)
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                        CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
        FROM banded a JOIN banded b USING (band_key)
        WHERE a.doc_id < b.doc_id
          AND bit_count(xor(a.sim, b.sim)) <= {HAMMING_MAX}
    )
    SELECT doc_a, doc_b, hamming
    FROM pairs
    ORDER BY hamming ASC, doc_a ASC, doc_b ASC
    LIMIT 50
"""


# ---------------------------------------------------------------------------
# q_phash_near_dup — perceptual-hash near-dup over the BINARY plane (E86)
# ---------------------------------------------------------------------------

PHASH_HAMMING_MAX = 12  # calibrated: testdata's identical-plane pairs sit at
# Hamming 0 and the near-profile tail at 8-12 (sf0.1 band-gated histogram:
# 8 pairs at 0, ~230 at <=12), while the random-pair mode is ~19-25.


def _phash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sim, band_key): one row per 15-bit band of the 60-bit
    perceptual hash — the multimodal mirror of ``_simhash_banded``.
    The hash itself comes through the binary-plane mapInPandas seam
    (multimodal/binary.make_phash: payload → decode stand-in →
    block-average bits), so the EXPENSIVE step is one narrow
    Arrow-batched pass; it is persisted (two longs per doc) before
    the band explosion because it feeds both sides of the candidate
    self-join, exactly the _simhash_banded trade. The repartition
    spreads the Python stage off the single-file scan."""
    docs = load_table(spark, sf_dir, "documents")
    from weatherflow_spark.multimodal.binary import multimodal_phash

    par = spark.sparkContext.defaultParallelism
    sigs = multimodal_phash(docs.repartition(par, F.col("doc_id"))).select(
        "doc_id", F.col("phash").alias("sim")
    )
    sigs = tracked_persist(sigs)
    return _explode_sim_bands(sigs)  # the shared 4x15-bit banding


def q_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E86: perceptual-hash near-dup detection over the BINARY plane —
    the multimodal member of the near-dup family. Byte-level
    near-identical planes (a re-encoded image, a few flipped bytes)
    defeat the exact content hash but land within a small Hamming
    distance of the 60-bit block-average perceptual hash
    (multimodal/binary.make_phash — decode stand-in through the same
    mapInPandas seam as E11, integer-exact cross-multiplied block
    compare). Blocking mirrors the SimHash discipline: 4 × 15-bit
    band keys, keyed equi-join (never all-pairs), Hamming-verify in
    whole-stage codegen BEFORE the distinct so the dedup shuffle
    carries only survivors, top-50 by (hamming, doc_a, doc_b).
    At 100 TB the signature table is two longs per object and the
    band join is the only exchange — the same sub-quadratic posture
    as every other family here."""
    banded = _phash_banded(spark, sf_dir)
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, "band_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.sim ^ b.sim)").cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= PHASH_HAMMING_MAX)
        .distinct()
    )
    return pairs.orderBy(F.asc("hamming"), F.asc("doc_a"), F.asc("doc_b")).limit(50)


# The oracle rebuilds the perceptual hash RELATIONALLY from `text`
# (ASCII plane: byte == codepoint): per-position block ids, grouped
# block sums, cross-multiplied integer compare, then the same banded
# candidate join — bit-for-bit the mapInPandas worker's contract.
ORACLE_PHASH_NEAR_DUP = f"""
    WITH pos AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n, u.i AS i,
               CAST(ascii(substring(text, CAST(u.i AS INTEGER), 1)) AS BIGINT)
                   AS c
        FROM documents,
             LATERAL (SELECT unnest(generate_series(1, length(text))) AS i) u
        WHERE length(text) > 0
    ),
    blocks AS (
        SELECT doc_id, n, ((i - 1) * 60) // n AS b,
               CAST(sum(c) AS BIGINT) AS bs,
               CAST(count(*) AS BIGINT) AS bl
        FROM pos GROUP BY doc_id, n, ((i - 1) * 60) // n
    ),
    tot AS (
        SELECT doc_id, n, CAST(sum(bs) AS BIGINT) AS total
        FROM blocks GROUP BY doc_id, n
    ),
    sigs0 AS (
        SELECT b.doc_id,
               CAST(sum(CASE WHEN b.bs * t.n > t.total * b.bl
                        THEN CAST(1 AS BIGINT) << CAST(b.b AS INTEGER)
                        ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sim
        FROM blocks b JOIN tot t USING (doc_id) GROUP BY b.doc_id
    ),
    sigs AS (
        SELECT d.doc_id, COALESCE(s.sim, CAST(0 AS BIGINT)) AS sim
        FROM documents d LEFT JOIN sigs0 s USING (doc_id)
    ),
    banded AS (
        SELECT doc_id, sim,
               concat(CAST(b AS VARCHAR), ':',
                      CAST((sim // (CAST(1 AS BIGINT) << (b * {SIMHASH_BAND_BITS})))
                           % {1 << SIMHASH_BAND_BITS} AS VARCHAR)) AS band_key
        FROM sigs CROSS JOIN UNNEST(generate_series(0, {N_SIMHASH_BANDS - 1})) AS u(b)
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                        CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
        FROM banded a JOIN banded b USING (band_key)
        WHERE a.doc_id < b.doc_id
          AND bit_count(xor(a.sim, b.sim)) <= {PHASH_HAMMING_MAX}
    )
    SELECT doc_a, doc_b, hamming
    FROM pairs
    ORDER BY hamming ASC, doc_a ASC, doc_b ASC
    LIMIT 50
"""


# ---------------------------------------------------------------------------
# q_ngram_jaccard — blocked pairwise exact n-gram Jaccard
# ---------------------------------------------------------------------------


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 4-gram Jaccard, gated on MinHash band candidates (never
    block-×-block on a low-cardinality key — block size would grow
    linearly with the corpus). Candidate generation is the 3-shingle
    MinHash band join; the verify stage re-measures each candidate
    with a *wider* 4-gram Jaccard (stricter n-gram contiguity than
    the candidate shingles). Top-25 most-similar pairs, ties broken
    by (doc_a, doc_b); 0/0 (a side with no 4-gram) is pinned to 0."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs)
    return _ngram_scored(pairs, docs)


def _ngram_scored(pairs: DataFrame, docs: DataFrame) -> DataFrame:
    """4-gram Jaccard verify over candidate id pairs (shared by
    q_ngram_jaccard and the suite's ngram branch)."""
    grams = docs.select(
        F.col("doc_id"),
        F.expr(
            f"array_distinct({T.shingle_hashes_expr('text', NGRAM_VERIFY_N)})"
        ).alias("gr"),
    )
    joined = (
        pairs.join(grams.withColumnsRenamed({"doc_id": "doc_a", "gr": "gr_a"}), "doc_a")
        .join(grams.withColumnsRenamed({"doc_id": "doc_b", "gr": "gr_b"}), "doc_b")
        .withColumn("n_inter", F.expr("size(array_intersect(gr_a, gr_b))"))
        .withColumn("n_union", F.expr("size(gr_a) + size(gr_b)") - F.col("n_inter"))
        .withColumn(
            "jaccard",
            F.when(F.col("n_union") == 0, F.lit(0.0)).otherwise(
                F.col("n_inter").cast("double") / F.col("n_union").cast("double")
            ),
        )
    )
    return (
        joined.select(
            "doc_a",
            "doc_b",
            (F.floor(F.col("jaccard") * 1e6 + F.lit(0.5)) / 1e6).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(25)
    )


ORACLE_NGRAM_JACCARD = f"""
    WITH {candidate_pairs_cte()},
    grams AS (
        SELECT doc_id, list_distinct({T.shingle_hashes_sql('text', NGRAM_VERIFY_N)}) AS gr
        FROM documents
    ),
    scored AS (
        SELECT
            p.doc_a, p.doc_b,
            CASE WHEN len(ga.gr) + len(gb.gr) - len(list_intersect(ga.gr, gb.gr)) = 0
                 THEN 0.0
                 ELSE CAST(len(list_intersect(ga.gr, gb.gr)) AS DOUBLE)
                      / (len(ga.gr) + len(gb.gr) - len(list_intersect(ga.gr, gb.gr)))
            END AS jaccard
        FROM pairs p
        JOIN grams ga ON ga.doc_id = p.doc_a
        JOIN grams gb ON gb.doc_id = p.doc_b
    )
    SELECT doc_a, doc_b, floor(jaccard * 1e6 + 0.5) / 1e6 AS jaccard
    FROM scored
    ORDER BY jaccard DESC, doc_a ASC, doc_b ASC
    LIMIT 25
"""


# ---------------------------------------------------------------------------
# q_containment — E60: asymmetric n-gram containment (quotation dup)
# ---------------------------------------------------------------------------


def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment C = |A∩B| / min(|A|, |B|) over the same
    MinHash-gated candidate pairs as the Jaccard verify — the measure
    that catches QUOTATION duplication (a short doc embedded in a
    long one), which symmetric Jaccard under-scores exactly when the
    sizes diverge. Same bounded physical shape as q_ngram_jaccard
    (band-key candidate join, never all-pairs); top-25 by the
    e6-rounded containment with full tie-breaks.

    Honest gate note: MinHash band collision probability tracks
    JACCARD, so extreme size-ratio containments can slip the gate —
    production containment sweeps post the smaller side's shingles
    into an inverted index instead (the q_inverted_index shape); this
    operator certifies the verify measure on the shared gate."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs)
    grams = docs.select(
        F.col("doc_id"),
        F.expr(
            f"array_distinct({T.shingle_hashes_expr('text', NGRAM_VERIFY_N)})"
        ).alias("gr"),
    )
    joined = (
        pairs.join(grams.withColumnsRenamed({"doc_id": "doc_a", "gr": "gr_a"}), "doc_a")
        .join(grams.withColumnsRenamed({"doc_id": "doc_b", "gr": "gr_b"}), "doc_b")
        .withColumn("n_inter", F.expr("size(array_intersect(gr_a, gr_b))"))
        .withColumn("n_min", F.expr("least(size(gr_a), size(gr_b))"))
        .withColumn(
            "containment_e6",
            F.when(F.col("n_min") == 0, F.lit(0)).otherwise(
                F.floor(
                    F.col("n_inter").cast("double")
                    / F.col("n_min").cast("double")
                    * 1e6
                    + F.lit(0.5)
                )
            ).cast("bigint"),
        )
    )
    return (
        joined.select(
            "doc_a",
            "doc_b",
            F.col("n_inter").cast("int").alias("n_inter"),
            F.col("n_min").cast("int").alias("n_min"),
            "containment_e6",
        )
        .orderBy(F.desc("containment_e6"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(25)
    )


ORACLE_CONTAINMENT = f"""
    WITH {candidate_pairs_cte()},
    grams AS (
        SELECT doc_id, list_distinct({T.shingle_hashes_sql('text', NGRAM_VERIFY_N)}) AS gr
        FROM documents
    ),
    scored AS (
        SELECT
            p.doc_a, p.doc_b,
            CAST(len(list_intersect(ga.gr, gb.gr)) AS INTEGER) AS n_inter,
            CAST(least(len(ga.gr), len(gb.gr)) AS INTEGER) AS n_min
        FROM pairs p
        JOIN grams ga ON ga.doc_id = p.doc_a
        JOIN grams gb ON gb.doc_id = p.doc_b
    )
    SELECT doc_a, doc_b, n_inter, n_min,
           CASE WHEN n_min = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(floor(CAST(n_inter AS DOUBLE)
                                / CAST(n_min AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
           END AS containment_e6
    FROM scored
    ORDER BY containment_e6 DESC, doc_a ASC, doc_b ASC
    LIMIT 25
"""


# ---------------------------------------------------------------------------
# q_containment_sweep — E60 second branch: inverted-index gate for
# extreme size ratios (the recall the MinHash gate cannot give)
# ---------------------------------------------------------------------------

# A doc with at most this many distinct verify shingles counts as
# "small" and posts its shingles into the inverted index. Quotation
# dup is short-into-long BY DEFINITION, so the posted side is bounded
# by construction — the big side is only ever probed.
SWEEP_SMALL_MAX_GRAMS = 20
# Per-gram posting cap (doc_id asc — deterministic): a stopword-like
# shingle shared by every small doc would otherwise fan the probe join
# out quadratically; capped postings trade bounded recall loss on
# junk grams for a hard fanout bound (the winnowing-postings rule).
SWEEP_POSTING_CAP = 16


def q_containment_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment via INVERTED-INDEX sweep — the E60 branch for
    extreme size ratios. MinHash band collisions track JACCARD, and a
    20-token quote inside a 2,000-token page has j ≈ 0.01: the banded
    gate misses it with near certainty while its containment is ~1.0.
    This branch posts each SMALL doc's distinct shingles into an
    inverted index (per-gram postings capped, doc_id asc) and probes
    it with every other doc's distinct shingles — candidate
    generation keyed on the GRAM, so recall no longer depends on
    whole-document signature collisions at all.

    Scale posture: the posted side is small-doc shingles only
    (quotation sources are short by definition), the probe is one
    equi-join on gram, the per-(pair) intersection count is a keyed
    aggregation with map-side partials, and the posting cap bounds
    per-gram fanout. Never all-pairs; both-small pairs dedup via
    (least, greatest) + distinct-gram counting.

    Certified top-25 by e6 containment with full tie-breaks, same
    schema as q_containment (the gate branch)."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        F.col("doc_id"),
        F.expr(
            f"array_distinct({T.shingle_hashes_expr('text', NGRAM_VERIFY_N)})"
        ).alias("gr"),
    )
    sizes = grams.select("doc_id", F.expr("size(gr)").alias("n_gr"))
    flat = grams.select("doc_id", F.explode("gr").alias("gram"))
    small = flat.join(
        F.broadcast(
            sizes.where(F.col("n_gr") <= SWEEP_SMALL_MAX_GRAMS).select("doc_id")
        ),
        "doc_id",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("gram").orderBy("doc_id")
    postings = (
        small.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= SWEEP_POSTING_CAP)
        .select(F.col("doc_id").alias("s_id"), "gram")
    )
    hits = (
        flat.join(postings, "gram")
        .where(F.col("doc_id") != F.col("s_id"))
        .select(
            F.least("doc_id", "s_id").alias("doc_a"),
            F.greatest("doc_id", "s_id").alias("doc_b"),
            "gram",
        )
    )
    inter = hits.groupBy("doc_a", "doc_b").agg(
        F.countDistinct("gram").alias("n_inter")
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_gr").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_gr").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("n_inter").cast("int").alias("n_inter"),
            F.expr("cast(least(na, nb) as int)").alias("n_min"),
            F.expr(
                "CASE WHEN least(na, nb) = 0 THEN cast(0 as bigint) "
                "ELSE cast(floor(cast(n_inter as double) "
                "/ cast(least(na, nb) as double) * 1e6 + 0.5) as bigint) END"
            ).alias("containment_e6"),
        )
        .orderBy(F.desc("containment_e6"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(25)
    )


ORACLE_CONTAINMENT_SWEEP = f"""
    WITH grams AS (
        SELECT doc_id,
               list_distinct({T.shingle_hashes_sql('text', NGRAM_VERIFY_N)}) AS gr
        FROM documents
    ),
    sizes AS (SELECT doc_id, CAST(len(gr) AS BIGINT) AS n_gr FROM grams),
    flat AS (SELECT doc_id, unnest(gr) AS gram FROM grams),
    postings AS (
        SELECT s_id, gram FROM (
            SELECT f.doc_id AS s_id, f.gram,
                   row_number() OVER (PARTITION BY f.gram
                                      ORDER BY f.doc_id ASC) AS rn
            FROM flat f JOIN sizes s ON s.doc_id = f.doc_id
            WHERE s.n_gr <= {SWEEP_SMALL_MAX_GRAMS}
        ) WHERE rn <= {SWEEP_POSTING_CAP}
    ),
    hits AS (
        SELECT least(f.doc_id, p.s_id) AS doc_a,
               greatest(f.doc_id, p.s_id) AS doc_b, f.gram
        FROM flat f JOIN postings p ON p.gram = f.gram
        WHERE f.doc_id <> p.s_id
    ),
    inter AS (
        SELECT doc_a, doc_b, CAST(count(DISTINCT gram) AS BIGINT) AS n_inter
        FROM hits GROUP BY doc_a, doc_b
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_inter AS INTEGER) AS n_inter,
           CAST(least(sa.n_gr, sb.n_gr) AS INTEGER) AS n_min,
           CASE WHEN least(sa.n_gr, sb.n_gr) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(floor(CAST(i.n_inter AS DOUBLE)
                     / CAST(least(sa.n_gr, sb.n_gr) AS DOUBLE) * 1e6 + 0.5)
                     AS BIGINT) END AS containment_e6
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    ORDER BY containment_e6 DESC, doc_a ASC, doc_b ASC
    LIMIT 25
"""


# ---------------------------------------------------------------------------
# q_fuzzy_join — entity resolution by blocked edit-distance join
# ---------------------------------------------------------------------------

FUZZY_LEV_MAX = 4


def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over part names: near-identical name pairs
    (edit distance ≤ 4) found by a blocked self-join — the sixth
    dedup family (approximate *string* matching, vs the set/bit
    signatures above).

    The scale story is the ENTITY-TABLE reduction: pairing runs on
    ``distinct p_name`` (vocabulary-sized — 64 names here, ~thousands
    at any SF) with per-name part counts carried from the corpus-
    sized aggregation, never on the part table itself. Candidates
    block on the name's last token (the product noun), so the
    within-block quadratic is over same-noun name variants only;
    ``levenshtein`` is built into both engines with identical
    edit-distance semantics, so the verify is hash-checkable."""
    part = load_table(spark, sf_dir, "part")
    names = (
        part.groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .select(
            F.col("p_name").alias("name"),
            F.col("n_parts"),
            F.expr(f"element_at({T.tokens_expr('p_name')}, -1)").alias("noun"),
        )
    )
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(b, "noun")
        .where(F.col("a.name") < F.col("b.name"))
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.levenshtein(F.col("a.name"), F.col("b.name")).alias("lev"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
        )
        .where(F.col("lev") <= FUZZY_LEV_MAX)
        .orderBy(F.asc("lev"), F.asc("name_a"), F.asc("name_b"))
        .limit(50)
    )


ORACLE_FUZZY_JOIN = f"""
    WITH names AS (
        SELECT p_name AS name,
               count(*) AS n_parts,
               list_extract({T.tokens_sql('p_name')}, -1) AS noun
        FROM part
        GROUP BY p_name
    )
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS INTEGER) AS lev,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM names a JOIN names b USING (noun)
    WHERE a.name < b.name
      AND levenshtein(a.name, b.name) <= {FUZZY_LEV_MAX}
    ORDER BY lev ASC, name_a ASC, name_b ASC
    LIMIT 50
"""


# ---------------------------------------------------------------------------
# q_incremental_dedup — new-batch-vs-existing-corpus dedup
# ---------------------------------------------------------------------------

# Deterministic batch split for the testdata: every 5th doc_id plays
# the "newly arrived batch", the rest the already-ingested corpus.
# In production the split is (today's landing batch) vs (the corpus
# table); the plan shape is identical.
INCR_BATCH_MOD = 5


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup — the admission decision a training
    pipeline runs on every new ingest batch: for each batch document,
    is it an exact duplicate of the corpus, a near-duplicate
    (MinHash-LSH candidate with exact Jaccard ≥ 0.5), or genuinely
    new? One verdict row per batch doc.

    Scale posture (the point of this op vs the self-join families
    above): the corpus side is NEVER shuffled —

    - exact stage: the corpus hash scan is probed with the
      *broadcast* batch hash set (batch ≪ corpus); matched hashes,
      bounded by batch size, broadcast back onto the batch.
    - near stage: corpus band keys join the *broadcast* batch band
      keys (broadcast hash join, corpus streams); candidates —
      bounded by band-bucket collisions with the batch — carry the
      batch shingle set and are broadcast against the corpus shingle
      scan for the exact-Jaccard verify.

    Total cost: three corpus scans, zero corpus shuffles, all wide
    state bounded by the batch. Precedence: exact_dup > near_dup >
    new (an exact copy is also a trivial LSH candidate)."""
    docs = load_table(spark, sf_dir, "documents")
    is_batch = F.col("doc_id") % INCR_BATCH_MOD == 0
    batch = docs.where(is_batch)
    corpus = docs.where(~is_batch)

    content_hash = F.sha2(F.trim(F.lower(F.col("text"))), 256)
    batch_h = batch.select("doc_id", content_hash.alias("content_hash"))
    matched_h = (
        corpus.select(content_hash.alias("content_hash"))
        .join(F.broadcast(batch_h.select("content_hash").distinct()), "content_hash")
        .distinct()
        .withColumn("is_exact", F.lit(1))
    )

    bands = minhash_band_keys(docs)
    batch_bands = bands.where(F.col("doc_id") % INCR_BATCH_MOD == 0).select(
        F.col("doc_id").alias("b_doc"), "band_key"
    )
    corpus_bands = bands.where(F.col("doc_id") % INCR_BATCH_MOD != 0).select(
        F.col("doc_id").alias("c_doc"), "band_key"
    )
    cand = (
        corpus_bands.join(F.broadcast(batch_bands), "band_key")
        .select("b_doc", "c_doc")
        .distinct()
    )
    sh = F.expr(f"array_distinct({T.shingle_hashes_expr('text')})")
    batch_sh = batch.select(F.col("doc_id").alias("b_doc"), sh.alias("sh_b"))
    corpus_sh = corpus.select(F.col("doc_id").alias("c_doc"), sh.alias("sh_c"))
    probe = cand.join(batch_sh, "b_doc")  # batch-bounded, carries sh_b
    best = (
        corpus_sh.join(F.broadcast(probe), "c_doc")
        .withColumn("n_inter", F.expr("size(array_intersect(sh_b, sh_c))"))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.expr("size(sh_b) + size(sh_c)") - F.col("n_inter")).cast("double"),
        )
        .groupBy("b_doc")
        .agg(F.max("jaccard").alias("best_jaccard"))
        .withColumnRenamed("b_doc", "doc_id")
    )

    return (
        batch_h.join(F.broadcast(matched_h), "content_hash", "left")
        .join(F.broadcast(best), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("is_exact") == 1, F.lit("exact_dup"))
            .when(F.col("best_jaccard") >= JACCARD_THRESHOLD, F.lit("near_dup"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
            (F.floor(F.col("best_jaccard") * 1e6 + F.lit(0.5)) / 1e6).alias(
                "best_jaccard"
            ),
        )
    )


def _oracle_incremental_dedup() -> str:
    bands = []
    for b in range(N_BANDS):
        parts = ", ".join(
            f"CAST(mh_{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
        )
        bands.append(f"concat_ws(':', '{b}', {parts})")
    bands_list = ", ".join(bands)
    return f"""
    WITH {_minhash_sig_cte()},
    banded AS (
        SELECT doc_id, unnest([{bands_list}]) AS band_key
        FROM sigs WHERE mh_0 IS NOT NULL
    ),
    cand AS (
        SELECT DISTINCT b.doc_id AS b_doc, c.doc_id AS c_doc
        FROM banded b JOIN banded c USING (band_key)
        WHERE b.doc_id % {INCR_BATCH_MOD} = 0
          AND c.doc_id % {INCR_BATCH_MOD} <> 0
    ),
    shingled AS (
        SELECT doc_id, list_distinct({T.shingle_hashes_sql('text')}) AS sh
        FROM documents
    ),
    best AS (
        SELECT b_doc AS doc_id,
               max(CAST(len(list_intersect(sb.sh, sc.sh)) AS DOUBLE)
                   / (len(sb.sh) + len(sc.sh) - len(list_intersect(sb.sh, sc.sh))))
                   AS best_jaccard
        FROM cand
        JOIN shingled sb ON sb.doc_id = cand.b_doc
        JOIN shingled sc ON sc.doc_id = cand.c_doc
        GROUP BY b_doc
    ),
    exact_hit AS (
        SELECT DISTINCT doc_id FROM documents
        WHERE doc_id % {INCR_BATCH_MOD} = 0
          AND sha256(trim(lower(text))) IN (
              SELECT sha256(trim(lower(text))) FROM documents
              WHERE doc_id % {INCR_BATCH_MOD} <> 0)
    )
    SELECT d.doc_id,
           CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                WHEN j.best_jaccard >= {JACCARD_THRESHOLD} THEN 'near_dup'
                ELSE 'new' END AS verdict,
           floor(j.best_jaccard * 1e6 + 0.5) / 1e6 AS best_jaccard
    FROM documents d
    LEFT JOIN exact_hit e ON e.doc_id = d.doc_id
    LEFT JOIN best j ON j.doc_id = d.doc_id
    WHERE d.doc_id % {INCR_BATCH_MOD} = 0
"""


# ---------------------------------------------------------------------------
# q_near_dup_suite — consolidated pairwise near-dup certification row
# ---------------------------------------------------------------------------
# q_entity_clusters — E74: entity-resolution clusters (fuzzy ⊕ LP)
# ---------------------------------------------------------------------------

ER_ROUNDS = 3


def q_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution CLUSTERS — the step after pairwise fuzzy
    matching that every master-data pipeline needs: near-identical
    name pairs (E26's blocked levenshtein join) become an undirected
    graph and min-label propagation assigns every variant its
    lexicographically-smallest reachable name as the canonical id.
    Pure composition of two certified operators (q_fuzzy_join edges ×
    the iterative module's _lp_round), inheriting both scale
    postures: vocabulary-sized pairing, per-round persisted labels
    (constant plan growth — the round-7 LP discipline), min-algebra
    over STRINGS (least() is lexicographic in both engines)."""
    from weatherflow_spark.plans.iterative import _lp_round

    pairs = q_fuzzy_join(spark, sf_dir).select("name_a", "name_b")
    edges = tracked_persist(
        pairs.select(F.col("name_a").alias("src"), F.col("name_b").alias("dst"))
        .unionAll(pairs.select(F.col("name_b").alias("src"), F.col("name_a").alias("dst")))
    )
    labels = tracked_persist(
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("label"))
    )
    for _ in range(ER_ROUNDS):
        labels = tracked_persist(_lp_round(edges, labels))
    return labels.select(
        F.col("doc_id").alias("name"), F.col("label").alias("canonical_name")
    )


def _oracle_entity_clusters() -> str:
    rounds = []
    prev = "l0"
    for r in range(1, ER_ROUNDS + 1):
        rounds.append(
            f"""
        l{r} AS (
            SELECT l.doc_id,
                   least(l.label, coalesce(min(n.label), l.label)) AS label
            FROM {prev} l
            LEFT JOIN edges e ON e.src = l.doc_id
            LEFT JOIN {prev} n ON n.doc_id = e.dst
            GROUP BY l.doc_id, l.label
        )"""
        )
        prev = f"l{r}"
    return f"""
    WITH fz AS ({ORACLE_FUZZY_JOIN}),
    edges AS (
        SELECT name_a AS src, name_b AS dst FROM fz
        UNION ALL
        SELECT name_b AS src, name_a AS dst FROM fz
    ),
    l0 AS (
        SELECT DISTINCT src AS doc_id, src AS label FROM edges
    ),{",".join(rounds)}
    SELECT doc_id AS name, label AS canonical_name FROM {prev}
"""


# ---------------------------------------------------------------------------
# q_winnow_fingerprint — E67: winnowing fingerprints (MOSS local sketch)
# ---------------------------------------------------------------------------

WINNOW_W = 4        # winnowing window over consecutive shingle hashes
WINNOW_POST_CAP = 50  # posting-list cap (drop boilerplate fingerprints)
WINNOW_TOP = 25


def _winnow_fp_spark(h: str) -> str:
    """Spark SQL: winnowing fingerprint set of a POSITIONAL shingle-
    hash array — the distinct minima of every WINNOW_W-wide sliding
    window (Schleimer/Wilkerson/Aiken's guarantee: two docs sharing a
    token run of length >= WINNOW_W + shingle_n - 1 share at least one
    fingerprint). Value-level dedup of the selected minima is the
    standard implementation form. The shingle array is LET-BOUND so it
    evaluates once per row — inlining it would re-run the char folds
    inside every window reference (the functions/text.py let trick;
    measured 14 s → sub-second at sf0.01)."""
    body = (
        f"CASE WHEN size(__wh) = 0 THEN array() "
        f"WHEN size(__wh) < {WINNOW_W} THEN array(array_min(__wh)) "
        f"ELSE array_distinct(transform(sequence(1, size(__wh) - {WINNOW_W} + 1), "
        f"i -> array_min(slice(__wh, i, {WINNOW_W})))) END"
    )
    return T.let_spark(h, "__wh", body)


def _winnow_fp_duck(h: str) -> str:
    body = (
        f"CASE WHEN len(__wh) = 0 THEN [] "
        f"WHEN len(__wh) < {WINNOW_W} THEN [list_min(__wh)] "
        f"ELSE list_distinct(list_transform("
        f"generate_series(1, len(__wh) - {WINNOW_W} + 1), "
        f"i -> list_min(list_slice(__wh, i, i + {WINNOW_W} - 1)))) END"
    )
    return T.let_duck(h, "__wh", body)


def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing near-dup detection — the MOSS plagiarism-detector
    sketch, the eighth dedup family: positional shingle hashes →
    sliding-window minima → distinct fingerprint set per document;
    documents sharing fingerprints pair through an inverted
    fingerprint index. Unlike MinHash (global random sample of the
    shingle set), winnowing GUARANTEES a shared fingerprint for any
    shared run of ≥ WINNOW_W + shingle_n − 1 tokens — the local-match
    detector that catches verbatim passages MinHash can miss at low
    overall Jaccard (the complement of q_containment's gate caveat).

    Scale posture: fingerprinting is NARROW (per-row higher-order
    exprs); the only corpus-scale exchange is the fingerprint
    explode+group; posting lists are capped at WINNOW_POST_CAP (a
    fingerprint shared by more docs than that is boilerplate — the
    q_boilerplate_detect rationale) so pair fan-out per fingerprint is
    bounded; pair counts and the two size joins are keyed on doc ids.
    Score = shared fingerprints / min(|fpA|, |fpB|), e6-pinned,
    heap top-{WINNOW_TOP}."""
    # Explicit spread off the raw file splits: the fingerprint
    # expression is CPU-heavy (char folds × sliding windows) and
    # single-file testdata starts every scan at one partition — the
    # q_feature_hash/q_knn_graph AQE-coalescing lesson.
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
    )
    fps = docs.select(
        "doc_id",
        F.expr(
            _winnow_fp_spark(T.shingle_hashes_expr("text", NGRAM_VERIFY_N))
        ).alias("fp"),
    ).select("doc_id", "fp", F.expr("size(fp)").cast("long").alias("nf"))
    posting = fps.select("doc_id", F.explode("fp").alias("f"))
    buckets = (
        posting.groupBy("f")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ds"))
        .where((F.size("ds") >= 2) & (F.size("ds") <= WINNOW_POST_CAP))
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ds, (x, i) -> "
                "transform(slice(ds, i + 2, size(ds)), y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    pc = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_shared"))
    sizes = fps.select("doc_id", "nf")
    scored = (
        pc.join(sizes.select(F.col("doc_id").alias("a"), F.col("nf").alias("nf_a")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("nf").alias("nf_b")), "b")
        .select(
            F.col("a").alias("doc_a"),
            F.col("b").alias("doc_b"),
            "n_shared",
            "nf_a",
            "nf_b",
            F.expr(
                "cast(floor(cast(n_shared as double) / least(nf_a, nf_b) * 1e6 + 0.5) "
                "as bigint)"
            ).alias("winnow_sim_e6"),
        )
    )
    return scored.orderBy(
        F.desc("winnow_sim_e6"), F.asc("doc_a"), F.asc("doc_b")
    ).limit(WINNOW_TOP)


ORACLE_WINNOW_FINGERPRINT = f"""
    WITH fps AS (
        SELECT doc_id, fp, CAST(len(fp) AS BIGINT) AS nf FROM (
            SELECT doc_id,
                   {_winnow_fp_duck(T.shingle_hashes_sql('text', NGRAM_VERIFY_N))}
                       AS fp
            FROM documents
        )
    ),
    posting AS (
        SELECT doc_id, unnest(fp) AS f FROM fps
    ),
    buckets AS (
        SELECT f, list_sort(list_distinct(list(doc_id))) AS ds
        FROM posting GROUP BY f
        HAVING len(list_distinct(list(doc_id))) BETWEEN 2 AND {WINNOW_POST_CAP}
    ),
    pairs AS (
        SELECT x.d AS a, y.d AS b FROM
            (SELECT f, unnest(ds) AS d FROM buckets) x
        JOIN
            (SELECT f, unnest(ds) AS d FROM buckets) y
          ON x.f = y.f AND x.d < y.d
    ),
    pc AS (
        SELECT a, b, CAST(count(*) AS BIGINT) AS n_shared
        FROM pairs GROUP BY a, b
    )
    SELECT pc.a AS doc_a, pc.b AS doc_b, pc.n_shared,
           fa.nf AS nf_a, fb.nf AS nf_b,
           CAST(floor(CAST(pc.n_shared AS DOUBLE) / least(fa.nf, fb.nf) * 1e6
                + 0.5) AS BIGINT) AS winnow_sim_e6
    FROM pc
    JOIN fps fa ON fa.doc_id = pc.a
    JOIN fps fb ON fb.doc_id = pc.b
    ORDER BY winnow_sim_e6 DESC, doc_a ASC, doc_b ASC
    LIMIT {WINNOW_TOP}
"""


# ---------------------------------------------------------------------------
# q_span_dedup — E89: cross-document repeated n-gram SPAN dedup
# ---------------------------------------------------------------------------

SPAN_N = 8  # window width in tokens; ~50 in production (Lee et al.),
            # 8 so the sf-scale word-soup corpus exercises every stage


def repeated_span_profile(docs: DataFrame, n: int = SPAN_N) -> DataFrame:
    """Exact substring (repeated n-gram span) dedup — the
    training-data operator from "Deduplicating Training Data Makes
    Language Models Better" (Lee et al., 2022): find every n-token
    window whose hash occurs in ≥ 2 DISTINCT documents, then merge
    overlapping windows per doc into maximal spans and profile the
    duplicated footprint. Doc-LEVEL near-dup (the other E1 families)
    misses this entirely: two long documents sharing one boilerplate
    paragraph are not near-dups, but the paragraph still leaks
    between train and eval. Within-doc repetition is deliberately
    excluded (that is q_repetition_filter's E25 contract).

    Pipeline (all Catalyst, cross-engine polynomial window hashes):
    1. posexplode the n-gram hash array → (doc_id, pos, h); the
       narrow tokenize+hash work is repartitioned off the
       single-file scan (AQE would otherwise 1-task it).
    2. duplicated hashes = groupBy(h) HAVING countDistinct(doc_id)≥2
       — partial-agg shuffle keyed by h, never a self-join of the
       position table.
    3. LEFT SEMI join positions against the duplicated-hash set
       (same h key; AQE broadcasts when the dup set is small).
    4. gaps-and-islands per doc: windows at positions i < j overlap
       or abut iff j ≤ i + n, so a break is pos − prev > n; spans
       aggregate min(pos) .. max(pos)+n−1.
    Steps 1–2 and 3 re-derive the exploded frame (two scans): the
    per-token frame is corpus-×-tokens sized, so persisting it is
    exactly what a 100 TB run cannot do — two pipelined passes is
    the scale-honest shape (the dup-hash side reduces map-side).

    Returns one row per document with ≥ 1 duplicated span:
    (doc_id, n_spans, dup_tokens, n_tokens, dup_ratio_e6) — all
    BIGINT, ratio as exact integer millionths (truncating DIV).
    """
    spark = docs.sparkSession
    par = spark.sparkContext.defaultParallelism
    sh = docs.repartition(par, "doc_id").select(
        "doc_id",
        F.expr(T.shingle_hashes_expr("text", n)).alias("sh"),
        F.expr(f"size({T.tokens_expr('text')})").cast("long").alias("n_tokens"),
    )
    exploded = sh.select(
        "doc_id", "n_tokens", F.posexplode("sh").alias("pos", "h")
    )
    dup = (
        exploded.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    marked = exploded.join(dup, "h", "left_semi")
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = (
        marked.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            "brk",
            F.when(F.col("pos") - F.col("prev") > n, F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
        .withColumn(
            "island",
            F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    spans = islands.groupBy("doc_id", "n_tokens", "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(n - 1)).alias("span_end"),
    )
    return (
        spans.groupBy("doc_id", "n_tokens")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("span_end") - F.col("span_start") + 1).alias(
                "dup_tokens"
            ),
        )
        .select(
            "doc_id",
            "n_spans",
            "dup_tokens",
            "n_tokens",
            F.expr(
                "CAST((dup_tokens * 1000000) DIV n_tokens AS BIGINT)"
            ).alias("dup_ratio_e6"),
        )
    )


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E89 registry entry: the repeated-span profile over the full
    documents table (see repeated_span_profile)."""
    return repeated_span_profile(load_table(spark, sf_dir, "documents"))


def _oracle_span_dedup() -> str:
    n = SPAN_N
    return f"""
    WITH sh AS (
        SELECT doc_id, {T.shingle_hashes_sql('text', n)} AS sh,
               len({T.tokens_sql('text')}) AS n_tokens
        FROM documents
    ),
    exploded AS (
        SELECT doc_id, n_tokens, i - 1 AS pos, sh[i] AS h
        FROM sh, LATERAL (SELECT unnest(generate_series(1, len(sh))) AS i) u
    ),
    dup AS (
        SELECT h FROM exploded GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ),
    marked AS (
        SELECT e.doc_id, e.n_tokens, e.pos,
               CASE WHEN e.pos - lag(e.pos) OVER (
                        PARTITION BY e.doc_id ORDER BY e.pos) > {n}
                    THEN 1 ELSE 0 END AS brk
        FROM exploded e JOIN dup USING (h)
    ),
    islands AS (
        SELECT doc_id, n_tokens, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS UNBOUNDED PRECEDING) AS island
        FROM marked
    ),
    spans AS (
        SELECT doc_id, n_tokens, island,
               min(pos) AS span_start, max(pos) + {n} - 1 AS span_end
        FROM islands GROUP BY doc_id, n_tokens, island
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(span_end - span_start + 1) AS BIGINT) AS dup_tokens,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((CAST(sum(span_end - span_start + 1) AS BIGINT) * 1000000)
                // n_tokens AS BIGINT) AS dup_ratio_e6
    FROM spans GROUP BY doc_id, n_tokens
"""


ORACLE_SPAN_DEDUP = _oracle_span_dedup()


# ---------------------------------------------------------------------------


def q_near_dup_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 consolidated certification row: the three pairwise near-dup
    families — MinHash-LSH with exact-Jaccard verify, banded SimHash
    with Hamming verify, and MinHash-gated 4-gram Jaccard — tagged by
    method and unioned. Each branch keeps its own physical strategy
    (band-key equi-joins for candidate generation, never all-pairs);
    the union is plan-level only — no cross-branch shuffle. ``score``
    is the branch's own measure (Jaccard similarity / Hamming
    distance); ``is_dup`` is the MinHash threshold flag, NULL for the
    branches whose output is already threshold-filtered or top-k.
    Single-method twins stay registered in the tail.

    The minhash and ngram branches gate on the SAME MinHash band-key
    candidate pairs, so a persisted shared candidate list looks
    attractive — measured slower at sf0.1 (2.72 s vs 1.74 s min-of-3,
    noop sink): the banded candidates are cheap whole-stage-codegen
    work re-derived inline, and per-branch pipelining beats the cache
    materialization barrier — the same trade-off documented on
    minhash_verified_pairs' ``cache`` flag. Both verifies therefore
    keep self-contained pipelined plans (``minhash_verified_pairs``
    accepts pre-computed ``pairs`` for callers that reuse the edge
    list across *jobs*, where the cache does amortize — see
    plans/iterative.py)."""
    null_flag = F.lit(None).cast("int").alias("is_dup")
    mh = q_minhash_near_dup(spark, sf_dir).select(
        F.lit("minhash").alias("method"),
        "doc_a",
        "doc_b",
        F.col("jaccard").alias("score"),
        "is_dup",
    )
    sh = q_simhash_near_dup(spark, sf_dir).select(
        F.lit("simhash").alias("method"),
        "doc_a",
        "doc_b",
        F.col("hamming").cast("double").alias("score"),
        null_flag,
    )
    ng = q_ngram_jaccard(spark, sf_dir).select(
        F.lit("ngram").alias("method"),
        "doc_a",
        "doc_b",
        F.col("jaccard").alias("score"),
        null_flag,
    )
    # Sixth family (E41 SemDeDup): embedding-cluster-blocked semantic
    # dup pairs over the embeddings table — score is NULL (the
    # threshold test is exact-integer, not a float measure).
    from weatherflow_spark.plans.ext_similarity import semantic_dup_pairs

    sem = semantic_dup_pairs(spark, sf_dir).select(
        F.lit("semantic").alias("method"),
        F.col("vec_a").alias("doc_a"),
        F.col("vec_b").alias("doc_b"),
        F.lit(None).cast("double").alias("score"),
        F.lit(1).cast("int").alias("is_dup"),
    )
    # Seventh family (E60): asymmetric containment over the shared
    # MinHash gate — quotation/subset duplication.
    cont = q_containment(spark, sf_dir).select(
        F.lit("containment").alias("method"),
        "doc_a",
        "doc_b",
        (F.col("containment_e6").cast("double") / 1e6).alias("score"),
        null_flag,
    )
    # Eighth family (E67): winnowing fingerprints — guaranteed local
    # match detection (shared run ≥ w + n − 1 tokens ⇒ shared fp).
    win = q_winnow_fingerprint(spark, sf_dir).select(
        F.lit("winnow").alias("method"),
        "doc_a",
        "doc_b",
        (F.col("winnow_sim_e6").cast("double") / 1e6).alias("score"),
        null_flag,
    )
    # Ninth branch (E60 second gate, r8): containment via the
    # inverted-index sweep — the recall path for extreme size ratios
    # the MinHash gate cannot see (20-token quote in a 2,000-token
    # page: j ≈ 0.01, containment ≈ 1.0).
    sweep = q_containment_sweep(spark, sf_dir).select(
        F.lit("containment_sweep").alias("method"),
        "doc_a",
        "doc_b",
        (F.col("containment_e6").cast("double") / 1e6).alias("score"),
        null_flag,
    )
    # Tenth family (E86, r9): perceptual-hash near-dup over the BINARY
    # plane — the multimodal member (block-average hash through the
    # E11 mapInPandas decode seam, banded Hamming buckets).
    ph = q_phash_near_dup(spark, sf_dir).select(
        F.lit("phash").alias("method"),
        "doc_a",
        "doc_b",
        F.col("hamming").cast("double").alias("score"),
        null_flag,
    )
    # Eleventh family (E89, r9): cross-document repeated n-gram SPAN
    # dedup — per-doc rows (doc_b NULL), score = exact duplicated-
    # token ratio; the full span profile stays in the q_span_dedup
    # single (tail parity + bench).
    span = q_span_dedup(spark, sf_dir).select(
        F.lit("span").alias("method"),
        F.col("doc_id").alias("doc_a"),
        F.lit(None).cast("long").alias("doc_b"),
        (F.col("dup_ratio_e6").cast("double") / 1e6).alias("score"),
        F.lit(1).cast("int").alias("is_dup"),
    )
    return (
        mh.unionByName(sh)
        .unionByName(ng)
        .unionByName(sem)
        .unionByName(cont)
        .unionByName(win)
        .unionByName(sweep)
        .unionByName(ph)
        .unionByName(span)
    )


def _oracle_near_dup_suite() -> str:
    from weatherflow_spark.plans.ext_similarity import ORACLE_SEMANTIC_PAIRS

    return f"""
    WITH mh_side AS ({_oracle_minhash_near_dup()}),
    sh_side AS ({ORACLE_SIMHASH_NEAR_DUP}),
    ng_side AS ({ORACLE_NGRAM_JACCARD}),
    sem_side AS ({ORACLE_SEMANTIC_PAIRS}),
    cont_side AS ({ORACLE_CONTAINMENT}),
    win_side AS ({ORACLE_WINNOW_FINGERPRINT}),
    sweep_side AS ({ORACLE_CONTAINMENT_SWEEP}),
    ph_side AS ({ORACLE_PHASH_NEAR_DUP}),
    span_side AS ({ORACLE_SPAN_DEDUP})
    SELECT 'minhash' AS method, doc_a, doc_b, jaccard AS score, is_dup
    FROM mh_side
    UNION ALL
    SELECT 'simhash', doc_a, doc_b, CAST(hamming AS DOUBLE),
           CAST(NULL AS INTEGER)
    FROM sh_side
    UNION ALL
    SELECT 'ngram', doc_a, doc_b, jaccard, CAST(NULL AS INTEGER)
    FROM ng_side
    UNION ALL
    SELECT 'semantic', vec_a, vec_b, CAST(NULL AS DOUBLE), 1
    FROM sem_side
    UNION ALL
    SELECT 'containment', doc_a, doc_b,
           CAST(containment_e6 AS DOUBLE) / 1e6, CAST(NULL AS INTEGER)
    FROM cont_side
    UNION ALL
    SELECT 'winnow', doc_a, doc_b,
           CAST(winnow_sim_e6 AS DOUBLE) / 1e6, CAST(NULL AS INTEGER)
    FROM win_side
    UNION ALL
    SELECT 'containment_sweep', doc_a, doc_b,
           CAST(containment_e6 AS DOUBLE) / 1e6, CAST(NULL AS INTEGER)
    FROM sweep_side
    UNION ALL
    SELECT 'phash', doc_a, doc_b, CAST(hamming AS DOUBLE),
           CAST(NULL AS INTEGER)
    FROM ph_side
    UNION ALL
    SELECT 'span', doc_id, CAST(NULL AS BIGINT),
           CAST(dup_ratio_e6 AS DOUBLE) / 1e6, 1
    FROM span_side
"""


DEDUP_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_dedup_exact": q_dedup_exact,
    "q_containment": q_containment,
    "q_containment_sweep": q_containment_sweep,
    "q_winnow_fingerprint": q_winnow_fingerprint,
    "q_entity_clusters": q_entity_clusters,
    "q_fuzzy_join": q_fuzzy_join,
    "q_minhash_signature": q_minhash_signature,
    "q_minhash_near_dup": q_minhash_near_dup,
    "q_simhash": q_simhash,
    "q_simhash_near_dup": q_simhash_near_dup,
    "q_phash_near_dup": q_phash_near_dup,
    "q_ngram_jaccard": q_ngram_jaccard,
    "q_span_dedup": q_span_dedup,
    "q_near_dup_suite": q_near_dup_suite,
    "q_incremental_dedup": q_incremental_dedup,
}

DEDUP_ORACLES: dict[str, str] = {
    "q_containment": ORACLE_CONTAINMENT,
    "q_containment_sweep": ORACLE_CONTAINMENT_SWEEP,
    "q_winnow_fingerprint": ORACLE_WINNOW_FINGERPRINT,
    "q_entity_clusters": _oracle_entity_clusters(),
    "q_dedup_exact": ORACLE_DEDUP_EXACT,
    "q_fuzzy_join": ORACLE_FUZZY_JOIN,
    "q_minhash_signature": ORACLE_MINHASH_SIGNATURE,
    "q_minhash_near_dup": _oracle_minhash_near_dup(),
    "q_simhash": ORACLE_SIMHASH,
    "q_simhash_near_dup": ORACLE_SIMHASH_NEAR_DUP,
    "q_phash_near_dup": ORACLE_PHASH_NEAR_DUP,
    "q_ngram_jaccard": ORACLE_NGRAM_JACCARD,
    "q_span_dedup": ORACLE_SPAN_DEDUP,
    "q_near_dup_suite": _oracle_near_dup_suite(),
    "q_incremental_dedup": _oracle_incremental_dedup(),
}
