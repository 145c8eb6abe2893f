"""Global-index operator tests (operators/indexing.py): the two-pass
distributed zipWithIndex must equal the single-partition window spec
bit-for-bit, while planning no global window."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from tests.conftest import SF_SMALL
from weatherflow_spark.io import load_table
from weatherflow_spark.operators.indexing import assign_global_index


def test_global_index_matches_window_spec(spark):
    orders = load_table(spark, SF_SMALL, "orders")
    got = {
        r.o_orderkey: r.row_index
        for r in assign_global_index(orders, "o_orderkey", num_partitions=8).collect()
    }
    w = Window.orderBy("o_orderkey")
    want = {
        r.o_orderkey: r.idx
        for r in orders.select(
            "o_orderkey", (F.row_number().over(w) - 1).cast("long").alias("idx")
        ).collect()
    }
    assert got == want


def test_global_index_is_dense_and_ordered(spark):
    orders = load_table(spark, SF_SMALL, "orders")
    rows = assign_global_index(orders, "o_orderkey", num_partitions=8).collect()
    n = orders.count()
    idxs = sorted(r.row_index for r in rows)
    assert idxs == list(range(n))  # dense 0..N-1, no gaps or dups
    by_idx = sorted(rows, key=lambda r: r.row_index)
    keys = [r.o_orderkey for r in by_idx]
    assert keys == sorted(keys)  # index order == key order
