"""Z-order (Morton curve) clustering: multi-column file skipping.

Range-sorting a table on ONE column (operators/layout.py) gives tight
per-file min/max stats on that column only; a predicate on any other
column still scans every file. Interleaving the bits of two (or more)
columns into one Morton z-value and range-sorting on *that* gives
every file a small axis-aligned rectangle of the key space, so
predicates on EITHER column skip most files — the standard lakehouse
layout trick for multi-dimensional pruning, expressed here as plain
Spark SQL bit arithmetic (no engine extension needed).

Scale posture: the z-value is a narrow per-row expression; the write
is one range exchange (sampled equi-depth boundaries on z). Pruning
effectiveness is bounded by the curve's locality: a predicate
selecting fraction f of one dimension touches ~O(sqrt(f)·files)
files, vs all files under single-column sorting.

Determinism: the z-value is pure integer arithmetic on already-
integer inputs — cross-engine identical, so z-keyed queries are
oracle-checkable (plans/sketches.py:q_zorder_key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _spread_expr(x: str, bits: int) -> str:
    """Spark SQL: spread the low ``bits`` bits of a non-negative
    integer expression so bit i lands at bit 2i — the constant-time
    magic-number interleave half (5 shift/mask steps over a 64-bit
    lane) instead of a per-row ``aggregate(sequence(...))`` lambda
    fold, which allocates a ``bits``-element array and runs a
    2·``bits``-step interpreted fold per row (guide §4.1: prefer
    flat built-in expressions; measured on q_zorder_skipping's 6M-row
    Morton build). Exactly equal to the fold for every non-negative
    input: the leading mask keeps only the low ``bits`` bits, just as
    the fold reads exactly ``bits`` bit positions."""
    e = f"(cast({x} as bigint) & {(1 << bits) - 1})"
    for shift, mask in (
        (16, 0x0000FFFF0000FFFF),
        (8, 0x00FF00FF00FF00FF),
        (4, 0x0F0F0F0F0F0F0F0F),
        (2, 0x3333333333333333),
        (1, 0x5555555555555555),
    ):
        e = f"((({e}) | shiftleft(({e}), {shift})) & {mask})"
    return e


def zvalue_expr(a: str, b: str, bits: int = 16) -> str:
    """Spark SQL: interleave the low ``bits`` bits of two non-negative
    integer expressions — a occupies even bit positions, b odd. With
    bits ≤ 31 the result stays under 2^62 (BIGINT-safe in any engine).
    Inputs must already be bounded to [0, 2^bits): callers clamp via
    pmod / width_bucket-style binning first. Implemented as the
    constant-time magic-number bit spread (see :func:`_spread_expr`);
    value-identical to the DuckDB fold twin :func:`zvalue_sql`."""
    return f"({_spread_expr(a, bits)} + 2 * {_spread_expr(b, bits)})"


def zvalue_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`zvalue_expr` (same fold, 0-indexed
    generate_series)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series(0, {bits - 1}), i -> "
        f"((CAST({a} AS BIGINT) // (CAST(1 AS BIGINT) << i)) % 2) "
        f"* (CAST(1 AS BIGINT) << (2 * i)) "
        f"+ ((CAST({b} AS BIGINT) // (CAST(1 AS BIGINT) << i)) % 2) "
        f"* (CAST(1 AS BIGINT) << (2 * i + 1)))), "
        f"(acc, v) -> acc + v)"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int,
    bits: int | None = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Morton interleave of
    ``col_a`` and ``col_b`` (both must be non-negative ints below
    2^bits). One range exchange on the z-value, in-partition sort,
    drop the helper column on write. Every output file then covers a
    compact rectangle of (a, b) space and parquet min/max stats prune
    scans filtered on either column.

    ``bits=None`` DERIVES the width from the columns' actual maxima
    (one column-pruned agg — a small fraction of the rewrite this
    call already is), and every call VALIDATES the precondition
    (r13 advice, low): a key ≥ 2^bits would silently lose its high
    bits, z-rectangles of far-apart keys would alias, and downstream
    skipping certifications would raise spuriously — at sf ~2.8 the
    TPC-H orderkey outgrows the old fixed 24-bit width. Keys that
    need > 31 bits must be binned/clamped by the caller first (the
    interleave must stay BIGINT-safe)."""
    zorder_arrange(df, col_a, col_b, num_files, bits).write.mode(
        "overwrite"
    ).parquet(path)


def zorder_arrange(
    df: DataFrame,
    col_a: str,
    col_b: str,
    num_files: int,
    bits: int | None = None,
) -> DataFrame:
    """The Morton ARRANGEMENT as a DataFrame transform (r14): one
    range exchange on the interleaved z-value, in-partition sort,
    helper column dropped — each output task then holds a compact
    (a, b)-rectangle. Shared by :func:`write_zordered` (fresh layout)
    and ``layout.compact(zorder=...)`` (the versioned Z-preserving
    rewrite — folding a deletion vector through plain ``compact``
    would 1-D-sort the table and silently destroy the two-axis
    pruning E106 certifies). Validates the bit-width precondition;
    ``bits=None`` derives it from the columns' maxima."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    if min(lo_a or 0, lo_b or 0) < 0:
        raise ValueError(
            f"z-order inputs must be non-negative: min({col_a})={lo_a}, "
            f"min({col_b})={lo_b}"
        )
    need = max(int(hi_a or 0).bit_length(), int(hi_b or 0).bit_length(), 1)
    if bits is None:
        bits = need
    elif need > bits:
        raise ValueError(
            f"z-order bits={bits} too narrow: max({col_a})={hi_a}, "
            f"max({col_b})={hi_b} need {need} bits — widen bits (or "
            "pass bits=None to derive), or bin/clamp the keys first; "
            "silently dropping high bits would alias far-apart keys "
            "into one z-rectangle"
        )
    if bits > 31:
        raise ValueError(
            f"z-order bits={bits} exceeds 31 (BIGINT-safe interleave "
            "limit) — bin/clamp the keys below 2^31 first"
        )
    z = F.expr(zvalue_expr(col_a, col_b, bits))
    return (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
