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

import os

from pyspark.sql import DataFrame, SparkSession

# Columns the bucketed warehouse keeps — the orderkey join family's
# working set (Q3/Q18 and kin). A layout is a standing decision: add
# columns here (and rebuild) rather than minting per-query layouts.
BW_LINEITEM_COLS = [
    "l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
    "l_shipdate",
]
BW_ORDERS_COLS = [
    "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
    "o_orderpriority",
]


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


def bucketed_warehouse(
    spark: SparkSession,
    sf_dir: str,
    scratch_base: str,
    n_buckets: int = 8,
) -> tuple[str, str]:
    """The WAREHOUSE-ADOPTED bucketed layout (r10 verdict #2): build
    lineitem and orders ONCE as co-bucketed tables (bucketBy + sortBy
    ``orderkey``, same bucket count) and return their catalog names
    ``(lineitem_table, orders_table)``. Every orderkey-join query
    routed through these tables plans its fact⋈fact join — and any
    groupBy on a superset of the orderkey — with ZERO shuffle
    Exchange; at 100 TB that shuffle is the dominant cost of the
    whole TPC-H Q3/Q18 family (module doc), paid once at layout time
    instead of per query.

    A layout decision is made once and amortized: the build is
    CACHED per (scratch_base, process) — our own completion marker,
    written after both saveAsTable calls return, gates the skip (a
    bare directory from a crashed build is rebuilt, and a fresh
    process/session rebuilds because bucket metadata lives in the
    session catalog). External ``path=`` keeps the data out of the
    repo's warehouse dir; per-process names keep a driver run and a
    concurrent pytest from interleaving."""
    import shutil

    from weatherflow_spark.io import load_table

    tag = (
        sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
        + f"_{os.getpid()}"
    )
    t_li, t_ord = f"wf_bw_lineitem_{tag}", f"wf_bw_orders_{tag}"
    # The data dir carries the SAME (sf, pid) tag as the table names:
    # a shared base under a caller-chosen scratch_base would let a
    # second process (or a second sf in this process) rmtree the live
    # files backing the first one's still-registered external tables
    # (r11 review).
    base = os.path.join(scratch_base, f"bucketed_wh_{tag}")
    marker = os.path.join(base, "_WF_BUILT")
    if (
        os.path.isfile(marker)
        and spark.catalog.tableExists(t_li)
        and spark.catalog.tableExists(t_ord)
    ):
        return t_li, t_ord
    # Reclaim siblings left by DEAD processes (r11 review: each run
    # otherwise strands a full bucketed lineitem+orders copy forever).
    # pid-liveness is meaningful here — scratch is host-local.
    try:
        for n in os.listdir(scratch_base):
            if not n.startswith("bucketed_wh_") or n == os.path.basename(base):
                continue
            try:
                pid = int(n.rsplit("_", 1)[-1])
                os.kill(pid, 0)
            except ValueError:
                continue  # foreign name shape: not ours to sweep
            except ProcessLookupError:
                shutil.rmtree(
                    os.path.join(scratch_base, n), ignore_errors=True
                )
            except OSError:
                continue  # alive-but-not-ours or unknowable: keep
    except OSError:
        pass
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    li = load_table(spark, sf_dir, "lineitem").select(*BW_LINEITEM_COLS)
    orders = load_table(spark, sf_dir, "orders").select(*BW_ORDERS_COLS)
    write_bucketed(
        li, t_li, ["l_orderkey"], n_buckets,
        sort_cols=["l_orderkey"], path=os.path.join(base, "lineitem"),
    )
    write_bucketed(
        orders, t_ord, ["o_orderkey"], n_buckets,
        sort_cols=["o_orderkey"], path=os.path.join(base, "orders"),
    )
    with open(marker, "w") as f:
        f.write(f"{t_li} {t_ord}\n")
    return t_li, t_ord


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
