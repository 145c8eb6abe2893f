"""Numeric helpers with cross-engine-deterministic semantics.

Spark's ``F.round`` on doubles rounds HALF_UP on the value's
*shortest decimal representation* (JVM ``BigDecimal.valueOf``), while
DuckDB/C engines round the raw binary double — the two disagree
whenever the shortest repr terminates in an exact decimal tie (e.g.
a double printing as ``4.895``: Spark → 4.90, DuckDB → 4.89). This
engine therefore defines decimal rounding as

    round_half_up(x, d) = floor(x * 10^d + 0.5) / 10^d

which is a pure IEEE-double composition, bit-identical in every
engine, and matches the reference's intent (dags/etl.py:78,82 uses
Python ``round``, whose banker's tie-break was already flagged as a
non-goal in SURVEY §2.3 F14).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def round_half_up(x: Column, scale: int = 2) -> Column:
    """Deterministic decimal rounding (half away from zero for
    positives; half toward +inf in general). Returns double."""
    p = F.lit(float(10**scale))
    return F.floor(x * p + F.lit(0.5)) / p


def round_half_up_sql(expr: str, scale: int = 2) -> str:
    """The identical computation as ANSI/DuckDB SQL text."""
    p = float(10**scale)
    return f"floor(({expr}) * {p} + 0.5) / {p}"
