"""Concurrent construction of independent suite branches.

Certification suites union N INDEPENDENT branches (each a registered
single: own scratch paths, own raise checks, own oracle CTE). Built
serially, every branch's small Spark jobs leave the rest of the
cluster idle — exactly the idle-capacity problem the optimization
playbook solves by submitting independent jobs from a driver thread
pool so the next job's tasks back-fill executors freed by the current
job's tail (Spark's scheduler is FIFO across concurrently submitted
jobs, which is the desired back-fill behaviour).

``overlap_branches`` runs the branch BUILDERS in a small thread pool
and returns their DataFrames in input order, so the suite's union —
and therefore its result, plan shape, and oracle hash — is unchanged;
only the wall-clock scheduling of the branches' (real, per-branch)
I/O and actions moves. Branch exceptions (the raise checks) propagate
exactly as in the serial form.

Safety preconditions (hold for every converted suite):

- branches touch DISJOINT scratch paths (each single namespaces its
  own tables) and never clear session-global state (no
  ``catalog.clearCache``/``release_caches`` inside query builders —
  grep-audited);
- per-dataset commit locks are path-keyed, so concurrent branches
  never contend on a lock;
- ``tracked_persist``'s registry is append-only under the GIL.

Worker count: ``WF_SUITE_OVERLAP`` (default 4) — deliberately small.
The point is back-fill, not saturation: branch jobs are short and
overhead-dominated, so 3-4 in flight keeps the scheduler busy at any
executor count (the playbook's "2-3 jobs in flight is plenty"), and
the value is a conf, not a core-count function, so the bench stays
comparable when the driver re-runs it at a lower core count.
"""

from __future__ import annotations

import os
import threading
from collections.abc import Callable, Sequence
from concurrent.futures import ThreadPoolExecutor
from typing import TypeVar

T = TypeVar("T")

OVERLAP_WORKERS = int(os.environ.get("WF_SUITE_OVERLAP", "4"))

# --- shared no-auto-broadcast guard -----------------------------------
# The bucketed-layout certifications force the sort-merge path by
# setting spark.sql.autoBroadcastJoinThreshold=-1 around plan build +
# raise check. SQL confs are SESSION-wide, so two overlapped branches
# using plain save/restore race: the first branch's restore re-enables
# broadcast while a sibling is still planning, SortMergeJoin vanishes,
# and the sibling's certification raises spuriously. Every toggler
# wants the SAME value (-1), so the fix is a refcount, not a mutex:
# the first enter saves the previous threshold and sets -1, the last
# exit restores it, and concurrent togglers keep overlapping.
_NB_LOCK = threading.Lock()
_NB_DEPTH = 0
_NB_PREV: str | None = None


def no_broadcast_enter(spark) -> None:
    """Disable auto-broadcast (refcounted; thread-safe across
    overlapped suite branches). Pair with ``no_broadcast_exit`` in a
    try/finally."""
    global _NB_DEPTH, _NB_PREV
    with _NB_LOCK:
        if _NB_DEPTH == 0:
            _NB_PREV = spark.conf.get(
                "spark.sql.autoBroadcastJoinThreshold"
            )
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        _NB_DEPTH += 1


def no_broadcast_exit(spark) -> None:
    """Release one hold on the no-auto-broadcast guard; the last
    holder restores the saved session threshold."""
    global _NB_DEPTH, _NB_PREV
    with _NB_LOCK:
        _NB_DEPTH -= 1
        if _NB_DEPTH == 0 and _NB_PREV is not None:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", _NB_PREV
            )
            _NB_PREV = None


def overlap_branches(
    thunks: Sequence[Callable[[], T]], max_workers: int | None = None
) -> list[T]:
    """Run independent branch builders concurrently; results in input
    order. Falls back to serial for a single branch or workers<=1."""
    n = max_workers if max_workers is not None else OVERLAP_WORKERS
    n = min(n, len(thunks))
    if n <= 1 or len(thunks) <= 1:
        return [t() for t in thunks]
    try:
        # Documented way to run driver threads so JVM thread-local
        # properties (job group/description) are inherited + cleaned.
        from pyspark import inheritable_thread_target as _itt
    except ImportError:  # pragma: no cover - very old pyspark
        def _itt(f):
            return f
    with ThreadPoolExecutor(max_workers=n) as pool:
        futures = [pool.submit(_itt(t)) for t in thunks]
        # Collect in order; .result() re-raises a branch's raise check.
        return [f.result() for f in futures]


def overlap_materialize(
    thunks: Sequence[Callable[[], T]], max_workers: int | None = None
) -> list[T]:
    """``overlap_branches`` for PURE-COMPUTE suites: build AND
    materialize each branch concurrently (persist + count in the
    pool), so the suite's single downstream action reads the branch
    caches instead of executing one mega-union plan whose independent
    legs the scheduler walks mostly serially.

    Why this is the right shape for the compute suites (guide §2.6):
    the serving suites' branches carry their own real I/O actions, so
    overlapping the BUILDERS overlaps the work. A compute suite's
    branches are lazy — all cost lands in one giant union action
    where (a) catalyst analyzes/optimizes the whole 10-20-branch plan
    as one unit and (b) each leg's stage chain serializes behind
    shared scheduler breadth. Materializing per-branch turns that
    into N small independent jobs that back-fill each other, while
    the returned union — and therefore column order, row set, and
    oracle hash — is byte-identical (branch outputs are the
    certification digests themselves: top-k rows, merge tables,
    grouped tallies — KBs, so the persists are negligible and are
    released by the bench/parity harness via ``release_caches``).
    """
    from weatherflow_spark.operators.caching import tracked_persist

    def _eager(build: Callable[[], T]) -> Callable[[], T]:
        def run() -> T:
            df = tracked_persist(build())
            df.count()
            return df

        return run

    return overlap_branches([_eager(t) for t in thunks], max_workers)
