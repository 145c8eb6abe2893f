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


def zvalue_expr(a: str, b: str, bits: int = 16) -> str:
    """Spark SQL: interleave the low ``bits`` bits of two non-negative
    integer expressions — a occupies even bit positions, b odd. With
    bits ≤ 31 the result stays under 2^62 (BIGINT-safe in any engine).
    Inputs must already be bounded to [0, 2^bits): callers clamp via
    pmod / width_bucket-style binning first."""
    return (
        f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), (acc, i) -> "
        f"acc + ((cast({a} as bigint) div shiftleft(cast(1 as bigint), i)) % 2) "
        f"* shiftleft(cast(1 as bigint), 2 * i) "
        f"+ ((cast({b} as bigint) div shiftleft(cast(1 as bigint), i)) % 2) "
        f"* shiftleft(cast(1 as bigint), 2 * i + 1))"
    )


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
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Morton interleave of
    ``col_a`` and ``col_b`` (both must be non-negative ints below
    2^bits). One range exchange on the z-value, in-partition sort,
    drop the helper column on write. Every output file then covers a
    compact rectangle of (a, b) space and parquet min/max stats prune
    scans filtered on either column."""
    z = F.expr(zvalue_expr(col_a, col_b, bits))
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
