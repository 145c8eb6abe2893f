"""Cache hygiene: every query that persists a loop-invariant must
leave ZERO cached blocks once the caller releases tracked caches —
a long-lived shared session must not accumulate evicted-but-pinned
storage from query to query (bench.py releases between queries; the
per-job driver gets the same effect from JVM exit)."""

from __future__ import annotations

import pytest

from weatherflow_spark.operators.caching import release_caches
from weatherflow_spark.plans import QUERIES
from tests.conftest import SF_SMALL

# Every query whose plan persists a loop-invariant relation.
CACHE_USERS = [
    "q_pagerank",
    "q_kmeans",
    "q_dedup_clusters",
    "q_source_mixture",
    "q_simhash_near_dup",
    "q_embedding_near_dup",
]


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


@pytest.mark.parametrize("name", CACHE_USERS)
def test_release_caches_leaves_no_blocks(spark, name):
    release_caches()  # drain anything a prior test left tracked
    spark.catalog.clearCache()
    assert _n_persistent(spark) == 0

    QUERIES[name](spark, SF_SMALL).collect()
    assert release_caches() >= 1, f"{name} no longer persists anything tracked"
    assert _n_persistent(spark) == 0, (
        f"{name} left cached blocks after release_caches()"
    )
