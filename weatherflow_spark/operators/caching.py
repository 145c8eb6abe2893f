"""Cache hygiene for loop-invariant persists.

Iterative plans (pagerank, k-means, label propagation) and
multi-consumer scans (source-mixture totals) persist a loop-invariant
relation so every round/consumer reuses one materialization. A query
builder returns a LAZY DataFrame, so it cannot unpersist that relation
itself — the blocks are still needed when the caller finally acts on
the plan. In a per-job session (the driver, bench.py, spark-submit)
the JVM exit releases them; in a long-lived shared session they would
accumulate and evict useful data.

``tracked_persist`` registers every such persist; callers in
long-lived sessions call ``release_caches()`` after consuming a
query's result (bench.py does, between queries). The registry holds
strong references — a builder-local DataFrame must survive until its
cached blocks are released — and is bounded by the handful of
persists a query plans before the caller's release.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + registration for later release."""
    df.persist()
    _TRACKED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked relation; returns how many were
    released. Safe to call repeatedly."""
    released = 0
    while _TRACKED:
        _TRACKED.pop().unpersist()
        released += 1
    return released
