"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) handles moderate
join skew at runtime, but a *hot grouping key* (one key holding a
large fraction of all rows — think the empty-string language tag on
a web corpus) still funnels one reducer. The classic fix is salting:

  phase 1: group by (key, salt) where salt = hash(row) % N  → N
           partial aggregates per hot key, spread over N reducers
  phase 2: group by key over the partials → final result

Sums/counts recombine exactly; the integer-scaled sum pattern keeps
phase-2 addition order-independent, so salting does not perturb
hash-checked results (tested in tests/test_scale_ops.py against the
unsalted plan)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_count_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    scale: int = 100,
) -> DataFrame:
    """groupBy(key).agg(count, exact-sum(value)) computed via a salt
    split. The salt derives from a *high-cardinality* column set
    (all columns) so hot keys spread evenly. Output columns:
    key_cols + [n, sum_value]."""
    p = F.lit(float(scale))
    # pmod, not abs(hash)%n: abs(Int.MinValue) overflows negative (ANSI
    # off) which would land ~1/2^32 rows in a nonexistent salt bucket.
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.floor(F.col(value_col) * p + F.lit(0.5))).alias("__s"),
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("__n").alias("n"),
        (F.sum("__s") / p).alias("sum_value"),
    )


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Salted join for a skewed fact key against a small dim:
    replicate the dim n_salts times (explode) and spread fact rows by
    salt — every reducer sees ~1/n of the hot key. With a genuinely
    small dim, prefer plain ``broadcast(dim)`` (no shuffle at all);
    this form is for when the dim is too big to broadcast but the
    fact key is hot. Exact same result set as a plain inner join."""
    dim_rep = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    fact_salted = fact.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    )
    return fact_salted.join(dim_rep, on=[key, "__salt"], how="inner").drop("__salt")
