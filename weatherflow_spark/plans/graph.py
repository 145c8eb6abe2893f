"""Fixed-round scaled-integer PageRank over the customer-supplier
trade graph (extension tier, sibling of :mod:`plans.iterative`).

Graph: the bipartite "customer bought from supplier" relation —
distinct (o_custkey, l_suppkey) pairs from orders ⋈ lineitem — made
symmetric (each undirected edge is two directed edges). Node ids are
namespaced into one bigint space: customer c → 2c, supplier s →
2s+1.

Determinism contract (same as k-means / label propagation in
plans/iterative.py): ranks are **scaled integers** (initial mass
``SCALE = 10^9`` per node) and every transition uses only integer
division and order-independent integer sums, so the result is a pure
function of the input and the DuckDB oracle replays the rounds as
unrolled CTEs bit-for-bit:

    contrib(e) = r(src) div outdeg(src)
    r'(v)      = floor(0.15 * SCALE) + (85 * sum contrib) div 100

Every node has at least one outgoing and one incoming edge by
construction (symmetry), so no dangling-mass term is needed.

Scale posture (100 TB): each round is one shuffle join
(edges ⋈ ranks on src — ranks is node-sized, edges dominate) plus one
keyed aggregation with map-side partials; the per-round degree join
is precomputed once. State lives in DataFrames, nothing on the
driver. This is the canonical Spark iteration shape; production runs
checkpoint lineage every ~5 rounds and iterate to an L1 fixpoint with
the identical round body.

DuckDB note: ``sum(BIGINT)`` promotes to HUGEINT — the oracle wraps
each new rank in ``CAST(... AS BIGINT)`` to keep the schema aligned.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from weatherflow_spark.io import load_table
from weatherflow_spark.operators.caching import tracked_persist

PR_SCALE = 1_000_000_000
PR_ROUNDS = 3
PR_TOP = 20
_TELEPORT = PR_SCALE * 15 // 100


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round scaled-int PageRank on the symmetric customer-supplier
    graph; top-20 nodes by rank (ties broken on node id), with the
    side decoded from the id parity."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    # Push the distinct below the join: lineitem has ~7 lines/order,
    # so deduping (l_orderkey, l_suppkey) BEFORE probing orders
    # shrinks the join probe ~7x and the pair-distinct shuffle with
    # it. The result set is identical — distinct-of-join ==
    # distinct-of-join-of-distinct when the join key is part of the
    # deduped tuple. (Structural win only: local timings are noise-
    # dominated at sf0.1 and show parity; the payoff is the smaller
    # shuffle, which is what matters at 100 TB.)
    li_pairs = lineitem.select("l_orderkey", "l_suppkey").distinct()
    pairs = (
        orders.select("o_orderkey", "o_custkey")
        .join(li_pairs, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    fwd = pairs.select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    edges = fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # The weighted edge list is the loop-invariant operand of every
    # round's join — pre-shuffle it onto the join key once and
    # persist, so each round's sort-merge join reuses the cached
    # src-partitioned relation instead of re-shuffling the edges
    # (at cluster scale: cache/checkpoint the edge relation, or
    # write it bucketed by src, before iterating).
    ew = tracked_persist(edges.join(deg, "src").repartition("src"))
    ranks = deg.select(F.col("src").alias("node"), F.lit(PR_SCALE).cast("long").alias("r"))
    for _ in range(PR_ROUNDS):
        contribs = ew.join(ranks, ew["src"] == ranks["node"]).select(
            F.col("dst").alias("node"), F.expr("r div d").alias("c")
        )
        ranks = contribs.groupBy("node").agg(
            (F.lit(_TELEPORT) + F.expr("85 * sum(c) div 100")).cast("long").alias("r")
        )
    return (
        ranks.orderBy(F.desc("r"), F.asc("node"))
        .limit(PR_TOP)
        .select(
            "node",
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            F.col("r").alias("rank_scaled"),
        )
    )


def _round_cte(prev: str, cur: str) -> str:
    return f"""
    {cur} AS (
        SELECT e.dst AS node,
               CAST({_TELEPORT} + (85 * sum(r.r // e.d)) // 100 AS BIGINT) AS r
        FROM ew e JOIN {prev} r ON e.src = r.node
        GROUP BY e.dst
    )"""


ORACLE_PAGERANK = f"""
    WITH li_pairs AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ),
    pairs AS (
        SELECT DISTINCT o_custkey, l_suppkey
        FROM orders JOIN li_pairs ON o_orderkey = l_orderkey
    ),
    edges AS (
        SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM pairs
        UNION ALL
        SELECT l_suppkey * 2 + 1 AS src, o_custkey * 2 AS dst FROM pairs
    ),
    deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
    ew AS (SELECT e.src, e.dst, deg.d FROM edges e JOIN deg ON deg.src = e.src),
    r0 AS (SELECT src AS node, CAST({PR_SCALE} AS BIGINT) AS r FROM deg),
    {_round_cte('r0', 'r1')},
    {_round_cte('r1', 'r2')},
    {_round_cte('r2', 'r3')}
    SELECT
        node,
        CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
        r AS rank_scaled
    FROM r3
    ORDER BY r DESC, node ASC
    LIMIT {PR_TOP}
"""


GRAPH_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_pagerank": q_pagerank,
}

GRAPH_ORACLES: dict[str, str] = {
    "q_pagerank": ORACLE_PAGERANK,
}
