"""PageRank structural properties (oracle hash parity is covered by
test_oracle_parity)."""

from __future__ import annotations

from tests.conftest import SF_SMALL
from weatherflow_spark.plans.graph import PR_SCALE, PR_TOP, q_pagerank


def test_pagerank_shape_and_hubs(spark):
    rows = q_pagerank(spark, SF_SMALL).collect()
    assert len(rows) == PR_TOP
    # ranks are sorted desc with id tiebreak and strictly positive
    ranks = [r["rank_scaled"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r > 0 for r in ranks)
    # the bipartite graph has far fewer suppliers than customers, so
    # the top ranks are led by supplier hubs (sf0.001 has only ~10
    # suppliers total — they can't fill all 20 slots)
    assert rows[0]["node_type"] == "supplier"
    n_supp = sum(1 for r in rows if r["node_type"] == "supplier")
    assert n_supp >= PR_TOP // 4
    # hubs concentrate more than the initial uniform mass
    assert ranks[0] > PR_SCALE
