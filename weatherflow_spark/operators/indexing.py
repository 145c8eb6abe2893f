"""Global row indexing at scale: assign a dense 0..N-1 index in a
chosen total order WITHOUT a single-partition window.

``row_number() OVER (ORDER BY key)`` is the semantic spec, but its
physical plan funnels every row through ONE task (a global window has
one partition) — a non-starter at 100 TB. The distributed form is the
classic two-pass zipWithIndex:

  pass 1: range-repartition by the order key (sampled equi-depth
          boundaries), sort within partitions, count rows per
          partition — a cheap agg over partition ids;
  pass 2: broadcast the exclusive-prefix-sum of counts as each
          partition's base offset; each task assigns
          ``offset + local position`` while streaming its sorted
          partition. No global shuffle beyond the range exchange.

Deterministic whenever the order key is unique (ties across
partition boundaries would otherwise land nondeterministically);
equals the window spec bit-for-bit, which tests assert.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from weatherflow_spark.operators.caching import tracked_persist
from pyspark.sql.types import LongType, StructField, StructType


def assign_global_index(
    df: DataFrame,
    order_col: str,
    num_partitions: int = 32,
    index_col: str = "row_index",
) -> DataFrame:
    """Dense global index in ``order_col`` order (must be unique).
    Two jobs: a per-partition count (tiny — one row per partition),
    then the indexed pass. Output schema: input columns + index.
    """
    # persist BEFORE the count pass: repartitionByRange samples its
    # boundaries per job, so without a shared materialization the
    # count job and the index job could see different partitionings
    # (and the offsets would index the wrong partitions). In a
    # production pipeline, checkpoint/write instead of cache.
    #
    # The partition id is BAKED INTO THE CACHED DATA as a column
    # (evaluated once, in the cache-build stage) rather than read
    # from TaskContext at consume time: a downstream union/coalesce
    # re-numbers stage partitions (UnionRDD concatenates child
    # partitions), so runtime partition ids silently index the wrong
    # offsets whenever the result is composed into a larger plan —
    # the r8 q_serving_suite regression.
    pid_col = "__wf_pid"
    ranged = tracked_persist(
        df.repartitionByRange(num_partitions, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn(pid_col, F.spark_partition_id())
    )

    counts = (
        ranged.groupBy(pid_col).agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r[pid_col]):
        offsets[row[pid_col]] = acc
        acc += row.cnt

    out_schema = StructType(df.schema.fields + [StructField(index_col, LongType())])
    idx_name = index_col

    def add_index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One task streams one cached partition (a single pid value),
        # but positions are tracked per pid so even a coalesced read
        # of several partitions indexes correctly.
        pos: dict[int, int] = {}
        for pdf in batches:
            pdf = pdf.copy()
            pids = pdf[pid_col].to_numpy()
            idx = pd.array([0] * len(pdf), dtype="int64")
            start = 0
            while start < len(pids):
                end = start
                while end < len(pids) and pids[end] == pids[start]:
                    end += 1
                pid = int(pids[start])
                base = pos.get(pid, offsets.get(pid, 0))
                n = end - start
                idx[start:end] = range(base, base + n)
                pos[pid] = base + n
                start = end
            pdf[idx_name] = idx
            yield pdf.drop(columns=[pid_col])

    return ranged.mapInPandas(add_index, out_schema)
