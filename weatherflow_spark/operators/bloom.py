"""Explicit Bloom-filter semi-join pruning (runtime-filter pattern).

The dominant cost of a selective fact ⋈ dim join at 100 TB is
shuffling fact rows that will never match. Spark's optimizer injects
this filter itself in some shapes
(``spark.sql.optimizer.runtime.bloomFilter.enabled``); this operator
builds the same structure explicitly so ANY plan — including ones the
optimizer won't rewrite, e.g. a pre-aggregation before the join — can
prune the fact scan early. The filter is *transparent*: false
positives are removed by the real join, so results are exactly those
of the unfiltered plan (which is what the DuckDB oracle of
``q_bloom_semi_join`` checks).

Determinism: bit positions come from the engine's fixed polynomial
hash family (functions/text.py MINHASH_A/B over a prime modulus), not
from engine-private hashes — the filter contents are a pure function
of the key set.

Scale posture: the build is one aggregation producing at most
``m_bits/64`` (word, mask) rows — a **bounded** driver collect (8 KiB
of longs for m=2^16), independent of dim cardinality, exactly what
Spark's own runtime filter does when it broadcasts the bloom. The
probe is a narrow per-row expression over a literal array evaluated
JVM-side inside whole-stage codegen; the array literal appears once
in the plan (referenced from inside a ``forall`` lambda).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from weatherflow_spark.functions.text import MINHASH_A, MINHASH_B, MOD

BLOOM_K = 4


def _positions_expr(key_col: str, m_bits: int) -> str:
    """Spark SQL array of BLOOM_K bit positions for an integer key."""
    a = ", ".join(f"{MINHASH_A[j]}L" for j in range(BLOOM_K))
    b = ", ".join(f"{MINHASH_B[j]}L" for j in range(BLOOM_K))
    h = f"pmod(cast({key_col} as bigint), {MOD})"
    return (
        f"zip_with(array({a}), array({b}), "
        f"(a, b) -> (({h} * a + b) % {MOD}) % {m_bits})"
    )


def build_bloom(df: DataFrame, key_col: str, m_bits: int = 1 << 16) -> list[int]:
    """Aggregate the key set of ``df`` into a bloom bitmap, returned
    as ``m_bits/64`` little-endian words. One shuffle of (word, bit)
    pairs with map-side bit_or partials; the collect is bounded by
    the bitmap size, never by the data."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    words = [0] * (m_bits // 64)
    rows = (
        df.select(F.explode(F.expr(_positions_expr(key_col, m_bits))).alias("p"))
        .groupBy(F.expr("cast(p div 64 as int)").alias("w"))
        .agg(
            F.expr(
                "bit_or(shiftleft(cast(1 as bigint), cast(p % 64 as int)))"
            ).alias("mask")
        )
        .collect()
    )
    for r in rows:
        words[r["w"]] = r["mask"]
    return words


def might_contain_expr(key_col: str, words: list[int], m_bits: int) -> str:
    """Spark SQL boolean: all BLOOM_K bits for ``key_col`` are set in
    ``words`` (the literal bitmap). Usable directly in ``.where()``
    ahead of the real join."""
    wlit = "array(" + ", ".join(f"{w}L" for w in words) + ")"
    return (
        f"forall({_positions_expr(key_col, m_bits)}, p -> "
        f"(element_at({wlit}, cast(p div 64 as int) + 1) & "
        f"shiftleft(cast(1 as bigint), cast(p % 64 as int))) != 0)"
    )


def bloom_prune(fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str,
                m_bits: int = 1 << 16) -> DataFrame:
    """Return ``fact`` filtered to rows whose key *might* be in
    ``dim``'s key set. Follow with the real join for exact results."""
    words = build_bloom(dim, dim_key, m_bits)
    return fact.where(F.expr(might_contain_expr(fact_key, words, m_bits)))
