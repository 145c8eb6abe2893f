"""Bucketed tables: shuffle-free co-located joins (100 TB posture).

At warehouse scale the dominant cost of fact⋈fact joins (e.g.
lineitem⋈orders) is the shuffle of both sides. Writing both tables
bucketed by the join key with the same bucket count lets Spark plan a
sort-merge join with **zero Exchange**: each task reads bucket i of
both tables. This module wraps the write/read pattern and is verified
by tests/test_scale_ops.py::test_bucketed_join_no_shuffle asserting
the join plan contains no shuffle Exchange operator.

Notes:
- Bucketing requires ``saveAsTable`` (metastore-backed); plain
  ``.parquet(path)`` writes lose bucket metadata.
- Bucket count is a layout decision: pick ~(table size / 128 MB)
  rounded to a power of two, identical on both join sides. Changing
  it means rewriting the table — choose for the largest join family.
- ``spark.sql.sources.bucketing.enabled`` is on by default;
  ``bucketing.autoBucketedScan.enabled`` lets Catalyst fall back to a
  non-bucketed scan when the bucket layout doesn't help.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by the join
    key. Sorting within buckets additionally removes the Sort from
    sort-merge joins — the join becomes a pure streaming merge.
    ``path`` makes the table external (data at a caller-chosen
    location instead of the session warehouse dir) — scratch-backed
    certification queries use it so nothing lands in the repo's cwd."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join_is_shuffle_free(joined: DataFrame) -> bool:
    """True iff the physical plan contains no shuffle Exchange of ANY
    flavor — ``Exchange hashpartitioning``, ``Exchange
    rangepartitioning`` (an AQE re-plan or a sort can insert one),
    ``Exchange SinglePartition``, round-robin REBALANCE — the
    assertion that bucketing actually paid off. Matching only the
    hash flavor would let a range-partitioned or rebalanced plan pass
    as "shuffle-free" (r10 verdict). ``BroadcastExchange`` is NOT a
    shuffle and is deliberately excluded: callers certifying a
    co-located layout must separately disable broadcast and require a
    SortMergeJoin, or a small build side makes the check vacuous.
    (AQE wraps the plan; inspect the executed/final plan string.)"""
    import re

    plan = joined._jdf.queryExecution().executedPlan().toString()
    # \bExchange\b: no word boundary splits "BroadcastExchange", so
    # only the shuffle operator (whose node name IS "Exchange") hits.
    return re.search(r"\bExchange\b", plan) is None


# Backwards-compatible alias for the typo'd pre-r11 name.
cocated_join_is_shuffle_free = colocated_join_is_shuffle_free
