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


# Per-process reentrancy: a writer that takes the lock for its whole
# read-modify-write calls helpers (overwrite_partitions) that take it
# again — the inner acquisition must not deadlock on our own lock.
# Writers are driver-side and single-threaded per dataset (foreachBatch
# sinks, CLI jobs), which this counter assumes.
_HELD: dict[str, int] = {}


def _holder_alive(lp: str) -> bool:
    """Best-effort liveness of the recorded holder pid (local form;
    on a shared filesystem across hosts, age is the only signal)."""
    try:
        with open(lp) as f:
            pid = int(f.read().split()[0])
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, just not ours to signal
    except (OSError, ValueError, IndexError):
        return False


@contextmanager
def dataset_lock(path: str, timeout: float = 60.0, stale_after: float = 3600.0):
    """Exclusive (per-process reentrant) advisory lock on a dataset
    directory's COMMITS.

    Acquisition is O_EXCL file creation (atomic on POSIX and HDFS-like
    stores). A lock whose holder is provably dead (pid gone, local
    form) or older than ``stale_after`` is presumed crashed and broken
    ATOMICALLY: the breaker renames the stale file aside — rename of
    one source succeeds for exactly one waiter, so two waiters can
    never both break-and-acquire. ``stale_after`` defaults to an hour
    because writers hold the lock for their full merge WRITE (not just
    a metadata rename); deployments should size it beyond their
    longest load."""
    lp = _lock_path(path)
    if _HELD.get(lp, 0) > 0:  # reentrant: already ours
        _HELD[lp] += 1
        try:
            yield
        finally:
            _HELD[lp] -= 1
        return
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
            if age > stale_after or (age > 1.0 and not _holder_alive(lp)):
                # Atomic break: exactly one waiter wins the rename;
                # losers hit ENOENT and loop back to O_EXCL-create.
                broken = f"{lp}.broken.{os.getpid()}.{time.monotonic_ns()}"
                try:
                    os.rename(lp, broken)
                    os.unlink(broken)
                except OSError:
                    pass
                continue
            if time.monotonic() > deadline:
                raise DatasetLockTimeout(
                    f"lock on {path} held for {age:.0f}s; timed out"
                )
            time.sleep(0.05)
    _HELD[lp] = 1
    try:
        yield
    finally:
        _HELD[lp] = 0
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
