"""Concurrent-writer safety for non-transactional parquet datasets.

Two writers race on the same dataset directory in this engine:
incremental loads (operators/upsert.py — dynamic partition overwrite,
keyed upsert) and background compaction (operators/layout.py). With
plain parquet there is no table-format transaction log, so the commit
protocol lives here:

1. **Advisory commit lock** (``dataset_lock``): every mutation of the
   dataset's file set — a load's write commit, compaction's swap —
   runs inside an exclusive advisory lock (an ``O_EXCL``-created
   ``<path>.__lock`` file; oldest-wins stale expiry so a crashed
   holder cannot wedge the dataset). The lock serializes COMMITS, not
   jobs: long read/rewrite phases run unlocked.

2. **Optimistic validate-and-swap** for compaction: compaction
   snapshots the data-file set BEFORE reading, rewrites to a sibling
   directory unlocked (loads proceed freely), then — under the lock —
   re-snapshots and swaps ONLY if the file set is unchanged. Any load
   that committed during the rewrite changes the file set (dynamic
   overwrite replaces part files; appends add them), so the swap
   aborts with ``CompactionConflict`` and nothing is lost; the caller
   simply re-runs compaction. Lost-update windows are closed by the
   lock: a load cannot commit between the validate and the swap.

This is the local/HDFS form (directory rename is atomic). On an
object store, the same two ideas become a catalog pointer swap with a
conditional-put (compare-and-set on the manifest version) — the
validate step IS the compare, the swap IS the set.

Scope: this protects the file SET against concurrent structural
changes. Two concurrent keyed upserts to the same partition remain
last-writer-wins on content (each is individually atomic under the
lock); serializing merge CONTENT requires a table format with
row-level conflict detection, out of scope for plain parquet.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager


class CompactionConflict(RuntimeError):
    """A writer committed between compaction's read and its swap; the
    swap was aborted and the dataset is untouched. Re-run compaction."""


class DatasetLockTimeout(RuntimeError):
    """Could not acquire the dataset's advisory commit lock in time."""


def _lock_path(path: str) -> str:
    return path.rstrip("/") + ".__lock"


@contextmanager
def dataset_lock(path: str, timeout: float = 60.0, stale_after: float = 600.0):
    """Exclusive advisory lock on a dataset directory's COMMITS.

    Acquisition is O_EXCL file creation (atomic on POSIX and HDFS-like
    stores). A lock older than ``stale_after`` seconds is presumed
    crashed and broken by the next acquirer (the holder's pid+time are
    recorded for diagnosis). Commits are metadata-speed (rename /
    footer writes), so contention windows are milliseconds."""
    lp = _lock_path(path)
    # First-ever write: the dataset's parent may not exist yet (the
    # writer would create it) — the lock file needs it now.
    parent = os.path.dirname(lp)
    if parent:
        os.makedirs(parent, exist_ok=True)
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(lp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, f"{os.getpid()} {time.time()}\n".encode())
            os.close(fd)
            break
        except FileExistsError:
            try:
                age = time.time() - os.path.getmtime(lp)
            except OSError:
                continue  # holder released between EXISTS and stat
            if age > stale_after:
                try:
                    os.unlink(lp)  # break the crashed holder's lock
                except OSError:
                    pass
                continue
            if time.monotonic() > deadline:
                raise DatasetLockTimeout(
                    f"lock on {path} held for {age:.0f}s; timed out"
                )
            time.sleep(0.05)
    try:
        yield
    finally:
        try:
            os.unlink(lp)
        except OSError:
            pass


def dataset_snapshot(path: str) -> frozenset[tuple[str, int]]:
    """The dataset's data-file set as (relative path, size) pairs —
    the optimistic-concurrency token. Spark part files carry unique
    task UUIDs, so ANY commit (append, dynamic overwrite, upsert)
    changes this set; success/CRC markers are excluded."""
    out = []
    for root, _, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            full = os.path.join(root, f)
            out.append((os.path.relpath(full, path), os.path.getsize(full)))
    return frozenset(out)
