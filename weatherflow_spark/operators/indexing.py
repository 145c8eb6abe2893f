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
    ranged = tracked_persist(
        df.repartitionByRange(num_partitions, F.col(order_col))
        .sortWithinPartitions(order_col)
    )

    counts_schema = StructType(
        [StructField("pid", LongType()), StructField("cnt", LongType())]
    )

    def count_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = 0
        for pdf in batches:
            n += len(pdf)
        yield pd.DataFrame({"pid": [pid], "cnt": [n]})

    counts = ranged.mapInPandas(count_partition, counts_schema).collect()
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r.pid):
        offsets[row.pid] = acc
        acc += row.cnt

    out_schema = StructType(df.schema.fields + [StructField(index_col, LongType())])
    idx_name = index_col

    def add_index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pos = offsets.get(pid, 0)
        for pdf in batches:
            pdf = pdf.copy()
            pdf[idx_name] = range(pos, pos + len(pdf))
            pdf[idx_name] = pdf[idx_name].astype("int64")
            pos += len(pdf)
            yield pdf

    return ranged.mapInPandas(add_index, out_schema)
