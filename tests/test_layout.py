"""Layout-operator tests: range-sorted writes must produce
non-overlapping files whose min/max stats prune range scans, and
compaction must hit the target file count idempotently."""

from __future__ import annotations

import shutil
import tempfile

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMALL
from weatherflow_spark.io import load_table
from weatherflow_spark.operators.layout import compact, parquet_files, write_range_sorted


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="wf-layout-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_range_sorted_files_do_not_overlap(spark, tmpdir):
    df = load_table(spark, SF_SMALL, "orders")
    path = f"{tmpdir}/orders_sorted"
    write_range_sorted(df, path, "o_totalprice", num_partitions=4)

    spans = []
    for f in parquet_files(path):
        t = pq.read_table(f, columns=["o_totalprice"]).column(0).to_pylist()
        if t:
            spans.append((min(t), max(t)))
    spans.sort()
    assert len(spans) >= 2
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo  # ranges are disjoint → min/max stats can prune


def test_range_scan_prunes_row_groups(spark, tmpdir):
    df = load_table(spark, SF_SMALL, "orders")
    path = f"{tmpdir}/orders_sorted"
    write_range_sorted(df, path, "o_totalprice", num_partitions=4)

    # A selective range predicate must read fewer rows than the table
    # holds (parquet row-group skipping via min/max on the sort key).
    pruned = (
        spark.read.parquet(path).where("o_totalprice > 490000").count()
    )
    total = spark.read.parquet(path).count()
    assert pruned < total


def test_compact_reaches_target_and_is_idempotent(spark, tmpdir):
    df = load_table(spark, SF_SMALL, "lineitem").repartition(16)
    path = f"{tmpdir}/li"
    df.write.parquet(path)
    assert len(parquet_files(path)) == 16

    before = spark.read.parquet(path).count()
    n1 = compact(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert n1 < 16
    assert spark.read.parquet(path).count() == before  # no data loss
    n2 = compact(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert n2 == n1  # idempotent


def test_compact_with_sort_restores_clustering(spark, tmpdir):
    df = load_table(spark, SF_SMALL, "orders").repartition(8)
    path = f"{tmpdir}/orders"
    df.write.parquet(path)

    compact(spark, path, target_file_bytes=32 * 1024, sort_col="o_orderkey")
    spans = []
    for f in parquet_files(path):
        t = pq.read_table(f, columns=["o_orderkey"]).column(0).to_pylist()
        if t:
            assert t == sorted(t)  # sorted within file
            spans.append((min(t), max(t)))
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo
