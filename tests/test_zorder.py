"""Z-order layout: multi-column file-skipping + sketch properties."""

from __future__ import annotations

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from weatherflow_spark.io import load_table
from weatherflow_spark.operators.layout import parquet_files
from weatherflow_spark.operators.zorder import write_zordered
from weatherflow_spark.plans.sketches import q_cms_heavy_hitters
from tests.conftest import SF_SMALL

BITS = 8  # bins in [0, 256)
N_FILES = 16


def _overlapping_files(path: str, col: str, lo: int, hi: int) -> int:
    """Files whose parquet row-group min/max on ``col`` intersects
    [lo, hi] — what a stats-pruning scan would have to read."""
    n = 0
    for f in sorted(parquet_files(path)):
        meta = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(meta.num_row_groups):
            rg_meta = meta.row_group(rg)
            stats = next(
                rg_meta.column(i).statistics
                for i in range(rg_meta.num_columns)
                if rg_meta.column(i).path_in_schema == col
            )
            fmin = stats.min if fmin is None else min(fmin, stats.min)
            fmax = stats.max if fmax is None else max(fmax, stats.max)
        if fmin is not None and not (fmax < lo or fmin > hi):
            n += 1
    return n


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """Range-sorting on the Morton interleave must let a narrow
    predicate on EITHER column skip most files; single-column sorting
    only prunes its own column."""
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey",
        F.expr(f"pmod(o_custkey, {1 << BITS})").alias("bin_a"),
        F.expr(f"pmod(o_orderkey, {1 << BITS})").alias("bin_b"),
    )
    zpath = str(tmp_path / "zorder")
    write_zordered(orders, zpath, "bin_a", "bin_b", N_FILES, bits=BITS)

    # baseline: sorted on bin_a only
    apath = str(tmp_path / "aorder")
    (
        orders.repartitionByRange(N_FILES, F.col("bin_a"))
        .sortWithinPartitions("bin_a")
        .write.mode("overwrite")
        .parquet(apath)
    )

    total = len(parquet_files(zpath))
    assert total >= N_FILES // 2  # enough files for skipping to mean anything

    # an eighth of the key space in each dimension
    lo, hi = 0, (1 << BITS) // 8 - 1
    z_a = _overlapping_files(zpath, "bin_a", lo, hi)
    z_b = _overlapping_files(zpath, "bin_b", lo, hi)
    base_b = _overlapping_files(apath, "bin_b", lo, hi)

    # z-order prunes both dimensions...
    assert z_a < total, "bin_a predicate should skip z-ordered files"
    assert z_b < total, "bin_b predicate should skip z-ordered files"
    # ...single-column layout cannot prune the other dimension
    assert base_b == len(parquet_files(apath))

    # layout preserved content
    got = spark.read.parquet(zpath).count()
    assert got == orders.count()


def test_cms_estimate_dominates_exact(spark):
    """Count-min property: estimate >= exact count for every heavy
    hitter (and exact at small scale where buckets don't collide
    across the heavy mass)."""
    out = q_cms_heavy_hitters(spark, SF_SMALL).collect()
    assert len(out) == 10
    for r in out:
        assert r.cms_est >= r.exact_n
