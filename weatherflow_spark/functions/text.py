"""Text-analysis primitives: tokenization, cross-engine rolling hash,
shingles, MinHash, SimHash, language-ID heuristic, quality scoring.

Design goal (north-star extension E1/E3, SURVEY §2.11): every
primitive here is *oracle-checkable*, i.e. bit-identical between the
Spark plan and a DuckDB SQL twin. That rules out `xxhash64`/`hash`
(engine-private algorithms) and anything seeded at runtime. Instead
all hashing is a polynomial rolling hash in plain int64 arithmetic:

    char fold:     h = (h*31 + codepoint) mod P          (P = 1e9+7)
    shingle fold:  s = ((h1*131 + h2)*131 + h3) mod P
    minhash perm:  g_i(h) = (a_i*h + b_i) mod P          (a_i < 9e8)

Every intermediate stays below 2^63 (a_i*h <= 9e8 * 1e9 < 9.2e18), so
the same expression evaluates identically in Spark (JVM long) and
DuckDB (int64). Each builder therefore comes in two forms: a PySpark
``Column`` (via ``F.expr`` over higher-order functions — executed
JVM-side inside whole-stage codegen, *not* a Python UDF) and a SQL
string for the DuckDB oracle.

Scale notes (100 TB posture): all ops here are narrow (per-row) —
they pipeline into the parquet scan with zero shuffle. The only
shuffles in the downstream dedup/similarity queries are the
band-bucket exchanges, which are keyed and AQE-coalesced.

Reference parity: the reference (pratik-choudhari/WeatherFlow) has no
text surface at all (SURVEY §2.3 "String functions beyond date
formatting: ABSENT"); this module is the mandated extension tier.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

MOD = 1_000_000_007
CHAR_P = 31
TOK_P = 131

# MinHash permutation constants (fixed literals — deterministic across
# runs and engines; chosen odd, < 9e8 so a*h never overflows int64).
MINHASH_A = [
    387420489, 268435399, 715827883, 104395303,
    641234567, 179424673, 479001599, 87178291,
]
MINHASH_B = [
    12582917, 86028121, 4256233, 54018521,
    93554467, 2971215, 71123477, 33461213,
]
N_HASHES = len(MINHASH_A)
SIMHASH_BITS = 20

# Wide (banded) simhash: three independent 20-bit simhash streams —
# stream 0 over the raw token hashes, streams 1..2 over permuted
# copies ((a·h+b) mod P, a≠0 so the map is a bijection mod the prime)
# — packed into one 60-bit BIGINT. 60 bits splits into 4 bands of 15
# for the banded near-dup blocking in plans/ext_dedup.py: ~32k key
# values per band, so block count scales with the corpus instead of
# being pinned at 2^prefix, and pigeonhole guarantees any pair with
# Hamming distance ≤ 3 collides on at least one whole band.
SIMHASH_PERM_A = [1, 715827883, 268435399]
SIMHASH_PERM_B = [0, 54018521, 86028121]
SIMHASH_STREAMS = len(SIMHASH_PERM_A)
SIMHASH_WIDE_BITS = SIMHASH_STREAMS * SIMHASH_BITS  # 60

# Tiny per-language stopword lists for the language-ID heuristic
# (n-gram/stopword-hit scoring — the classic fastText-free fallback).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "est", "une", "les"],
    "zh": ["de", "le", "he", "shi", "zai", "wo", "you", "ta"],
}

STOPWORDS_COMMON = ["the", "a", "of", "and", "to", "in", "is", "it", "on", "for"]


# ---------------------------------------------------------------------------
# tokenization
# ---------------------------------------------------------------------------


def tokens_expr(col: str) -> str:
    """Whitespace tokens of trimmed, lowercased text (SQL text, valid
    in both Spark SQL and DuckDB modulo the split function name)."""
    return f"split(trim(lower({col})), ' +')"


def tokens_sql(col: str) -> str:
    return f"regexp_split_to_array(trim(lower({col})), ' +')"


def tokens(col: str) -> Column:
    return F.expr(tokens_expr(col))


# ---------------------------------------------------------------------------
# rolling hash (cross-engine deterministic)
# ---------------------------------------------------------------------------


def _tok_hash_lambda_spark(tok: str = "tok") -> str:
    """Spark-SQL lambda body hashing one token by char fold."""
    return (
        f"aggregate(sequence(1, length({tok})), cast(0 as bigint), "
        f"(acc, i) -> (acc * {CHAR_P} + ascii(substr({tok}, i, 1))) % {MOD})"
    )


def _tok_hash_lambda_duck(tok: str = "tok") -> str:
    """Same fold as DuckDB SQL (list_reduce needs a seeded prepend)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series(1, length({tok})), "
        f"i -> CAST(ascii(substring({tok}, i, 1)) AS BIGINT))), "
        f"(acc, c) -> (acc * {CHAR_P} + c) % {MOD})"
    )


def token_hashes(col: str) -> Column:
    """array<long>: rolling hash of each whitespace token."""
    return F.expr(
        f"transform({tokens_expr(col)}, tok -> {_tok_hash_lambda_spark('tok')})"
    )


def token_hashes_sql(col: str) -> str:
    return (
        f"list_transform({tokens_sql(col)}, tok -> {_tok_hash_lambda_duck('tok')})"
    )


def doc_fingerprint_expr(col: str) -> str:
    return (
        f"aggregate(transform({tokens_expr(col)}, tok -> {_tok_hash_lambda_spark('tok')}), "
        f"cast(0 as bigint), (acc, h) -> (acc * {TOK_P} + h) % {MOD})"
    )


def doc_fingerprint_sql(col: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {token_hashes_sql(col)}), "
        f"(acc, h) -> (acc * {TOK_P} + h) % {MOD})"
    )


# ---------------------------------------------------------------------------
# let-binding trick
# ---------------------------------------------------------------------------
#
# SQL has no let-expressions, and Spark's CollapseProject re-inlines
# any intermediate column, so a subexpression referenced k times in a
# higher-order function is *evaluated* k times (measured ~100x slowdown
# on the shingle pipeline). A single-element transform acts as a let:
# the lambda argument is evaluated once per row, and the body can
# reference it any number of times. Works identically in DuckDB.


def let_spark(bound: str, var: str, body: str) -> str:
    return f"transform(array({bound}), {var} -> {body})[0]"


def let_duck(bound: str, var: str, body: str) -> str:
    return f"list_transform([{bound}], {var} -> {body})[1]"


# ---------------------------------------------------------------------------
# shingles (n-gram of tokens, combined arithmetically from token hashes)
# ---------------------------------------------------------------------------


def shingle_hashes_expr(col: str, n: int = 3) -> str:
    """Spark SQL: array of hashes of each n-token shingle, combined as
    ((h1*P + h2)*P + h3) mod M from the token-hash array (no re-walk
    of the characters)."""
    th = f"transform({tokens_expr(col)}, tok -> {_tok_hash_lambda_spark('tok')})"
    comb = "__th[i]"
    for j in range(1, n):
        comb = f"(({comb}) * {TOK_P} + __th[i+{j}]) % {MOD}"
    # Spark sequence(0, -1) is *descending*, not empty — short docs
    # need an explicit empty-array branch. The let-binding evaluates
    # the token-hash array once, not once per shingle reference.
    body = (
        f"CASE WHEN size(__th) < {n} THEN array() "
        f"ELSE transform(sequence(0, size(__th) - {n}), i -> {comb}) END"
    )
    return let_spark(th, "__th", body)


def shingle_hashes(col: str, n: int = 3) -> Column:
    # Bind the token-hash array once with a let-style nested transform:
    # transform over index sequence re-references the array expr; Spark
    # CollapseProject + common-subexpression handles the duplication.
    return F.expr(shingle_hashes_expr(col, n))


def shingle_hashes_sql(col: str, n: int = 3) -> str:
    th = token_hashes_sql(col)
    comb = "__th[i+1]"
    for j in range(1, n):
        comb = f"(({comb}) * {TOK_P} + __th[i+{j}+1]) % {MOD}"
    # DuckDB lists are 1-indexed (hence the +1 offsets above); the
    # CASE mirrors the Spark side exactly for len<n docs.
    body = (
        f"CASE WHEN len(__th) < {n} THEN [] "
        f"ELSE list_transform(generate_series(0, len(__th) - {n}), i -> {comb}) END"
    )
    return let_duck(th, "__th", body)


# ---------------------------------------------------------------------------
# MinHash / SimHash
# ---------------------------------------------------------------------------


def minhash_sig_expr(hashes_expr: str, i: int) -> str:
    """Spark SQL: i-th minhash over a distinct-hash array expr."""
    a, b = MINHASH_A[i], MINHASH_B[i]
    return (
        f"array_min(transform(array_distinct({hashes_expr}), "
        f"h -> (h * {a} + {b}) % {MOD}))"
    )


def minhash_sig_sql(hashes_expr: str, i: int) -> str:
    a, b = MINHASH_A[i], MINHASH_B[i]
    return (
        f"list_min(list_transform(list_distinct({hashes_expr}), "
        f"h -> (h * {a} + {b}) % {MOD}))"
    )


def simhash_expr(hashes_expr: str, bits: int = SIMHASH_BITS) -> str:
    """Spark SQL: SimHash over the distinct token/shingle hashes — for
    each bit position, sign of sum(±1) across hashes; packed little-
    endian into one BIGINT."""
    body = (
        f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), (acc, i) -> "
        f"acc + (CASE WHEN aggregate(__hs, cast(0 as bigint), "
        f"(s, h) -> s + 2 * ((h div shiftleft(cast(1 as bigint), i)) % 2) - 1) > 0 "
        f"THEN shiftleft(cast(1 as bigint), i) ELSE cast(0 as bigint) END))"
    )
    return let_spark(f"array_distinct({hashes_expr})", "__hs", body)


def simhash_sql(hashes_expr: str, bits: int = SIMHASH_BITS) -> str:
    inner = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), __hs), "
        f"(s, h) -> s + 2 * ((h // (CAST(1 AS BIGINT) << i)) % 2) - 1)"
    )
    body = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series(0, {bits - 1}), i -> "
        f"CASE WHEN {inner} > 0 THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END)), "
        f"(acc, v) -> acc + v)"
    )
    return let_duck(f"list_distinct({hashes_expr})", "__hs", body)


def _simhash_core_spark(arr: str, bits: int, tag: str) -> str:
    """Bit-vote fold over a *bound* hash-array variable ``arr`` (the
    caller must let-bind it — this core references it once per bit, so
    passing a raw expression would re-evaluate it ``bits`` times).
    ``tag`` keeps lambda variable names unique across sibling streams."""
    return (
        f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), (acc{tag}, i{tag}) -> "
        f"acc{tag} + (CASE WHEN aggregate({arr}, cast(0 as bigint), "
        f"(s{tag}, h{tag}) -> s{tag} + 2 * ((h{tag} div shiftleft(cast(1 as bigint), i{tag})) % 2) - 1) > 0 "
        f"THEN shiftleft(cast(1 as bigint), i{tag}) ELSE cast(0 as bigint) END))"
    )


def _simhash_core_duck(arr: str, bits: int, tag: str) -> str:
    inner = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {arr}), "
        f"(s{tag}, h{tag}) -> s{tag} + 2 * ((h{tag} // (CAST(1 AS BIGINT) << i{tag})) % 2) - 1)"
    )
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series(0, {bits - 1}), i{tag} -> "
        f"CASE WHEN {inner} > 0 THEN (CAST(1 AS BIGINT) << i{tag}) ELSE CAST(0 AS BIGINT) END)), "
        f"(acc{tag}, v{tag}) -> acc{tag} + v{tag})"
    )


def simhash_wide_expr(hashes_expr: str) -> str:
    """Spark SQL: 60-bit simhash — three 20-bit streams over permuted
    hash copies, packed ``s0 | s1<<20 | s2<<40``. The distinct hash
    array is let-bound once; each permuted copy is let-bound once per
    stream, so the per-row cost is 3×(bits×hashes) votes with no
    re-evaluation of the token-hash fold."""
    parts = []
    for j, (a, b) in enumerate(zip(SIMHASH_PERM_A, SIMHASH_PERM_B)):
        if j == 0:
            core = _simhash_core_spark("__dh", SIMHASH_BITS, f"_{j}")
        else:
            permed = f"transform(__dh, __h{j} -> (__h{j} * {a} + {b}) % {MOD})"
            core = let_spark(
                permed, f"__p{j}", _simhash_core_spark(f"__p{j}", SIMHASH_BITS, f"_{j}")
            )
        parts.append(f"({core}) * cast({1 << (SIMHASH_BITS * j)} as bigint)")
    return let_spark(f"array_distinct({hashes_expr})", "__dh", " + ".join(parts))


def simhash_wide_sql(hashes_expr: str) -> str:
    parts = []
    for j, (a, b) in enumerate(zip(SIMHASH_PERM_A, SIMHASH_PERM_B)):
        if j == 0:
            core = _simhash_core_duck("__dh", SIMHASH_BITS, f"_{j}")
        else:
            permed = f"list_transform(__dh, __h{j} -> (__h{j} * {a} + {b}) % {MOD})"
            core = let_duck(
                permed, f"__p{j}", _simhash_core_duck(f"__p{j}", SIMHASH_BITS, f"_{j}")
            )
        parts.append(f"({core}) * CAST({1 << (SIMHASH_BITS * j)} AS BIGINT)")
    return let_duck(f"list_distinct({hashes_expr})", "__dh", " + ".join(parts))


# ---------------------------------------------------------------------------
# quality metrics / language ID / BPE-ish token count
# ---------------------------------------------------------------------------

BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def n_tokens(col: str) -> Column:
    return F.expr(f"size({tokens_expr(col)})").cast("int")


def n_tokens_sql(col: str) -> str:
    return f"CAST(len({tokens_sql(col)}) AS INTEGER)"


def bpe_token_count(col: str) -> Column:
    """BPE-ish subword count: letter runs + digit runs + single
    punctuation, over lowercased text."""
    return F.expr(f"size(regexp_extract_all(lower({col}), '{BPE_PATTERN}', 0))").cast("int")


def bpe_token_count_sql(col: str) -> str:
    return f"CAST(len(regexp_extract_all(lower({col}), '{BPE_PATTERN}')) AS INTEGER)"


def _stop_hits_expr(col: str, words: list[str]) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return (
        f"size(filter({tokens_expr(col)}, t -> array_contains(array({arr}), t)))"
    )


def _stop_hits_sql(col: str, words: list[str]) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({tokens_sql(col)}, t -> list_contains([{arr}], t)))"


def stopword_ratio(col: str) -> Column:
    return F.expr(
        f"cast({_stop_hits_expr(col, STOPWORDS_COMMON)} as double) / size({tokens_expr(col)})"
    )


def stopword_ratio_sql(col: str) -> str:
    return (
        f"CAST({_stop_hits_sql(col, STOPWORDS_COMMON)} AS DOUBLE) / len({tokens_sql(col)})"
    )


def lang_scores(col: str) -> dict[str, Column]:
    """Stopword-hit count per candidate language."""
    return {
        lang: F.expr(_stop_hits_expr(col, words)).cast("int")
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_scores_sql(col: str) -> dict[str, str]:
    return {
        lang: f"CAST({_stop_hits_sql(col, words)} AS INTEGER)"
        for lang, words in LANG_STOPWORDS.items()
    }
