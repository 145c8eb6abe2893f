"""Snapshot log + time-travel reads (E90): versioned datasets on top
of the commit protocol.

The reference's warehouse has no history at all — every load mutates
the MySQL tables in place (reference dags/utils/database.py:25-34), so
"what did the table say yesterday" is unanswerable. The r9 commit
protocol (operators/commit.py) already gives each dataset an advisory
commit lock and a partition-version manifest; this module adds the
remaining lakehouse piece, the public Delta/Iceberg pattern re-derived
for the engine's parquet layout:

- **Commit log** (``<path>.__snaplog/v000001.json`` …): one entry per
  content commit, recording the dataset's complete data-file set
  (relative path + size) at that commit. Written atomically
  (tmp + ``os.replace``) under the dataset lock, so versions are a
  gap-free monotone sequence and never interleave.
- **Retention store** (``<path>.__retain/<relpath>``): every committed
  data file is HARD-LINKED (same inode — zero data copy; ``copy2``
  fallback for cross-device) into a directory that mirrors the live
  hive layout. Dynamic partition overwrite and compaction DELETE
  replaced live files; the retained links keep those bytes readable,
  which is exactly what makes old versions reconstructible. Because
  Spark part-file names carry job-unique task UUIDs, a relpath is
  never reused for different content — "already linked" is a safe
  skip.
- **Time-travel read** (:func:`read_version`): reads a version's file
  list straight FROM the retention mirror with ``basePath`` set to it,
  so hive partition columns are recovered by Spark's own partition
  discovery — live files are never touched, and a reader holds no
  lock (writers never modify retained inodes, they only add links).
  This is snapshot isolation for free: a long analytical read pinned
  to version N is immune to every concurrent upsert/compaction.
- **Vacuum** (:func:`vacuum_versions`): bounds history — drops log
  entries beyond ``keep_last`` and unlinks retained files no surviving
  version references (live files are never deleted).

Opt-in by design: :func:`init_snapshot_log` creates the log dirs, and
the shared write choke point (``upsert.overwrite_partitions`` — every
keyed upsert, CDC apply, and rollup refresh routes through it, r9)
records a commit automatically ONLY when the log exists, so tables
that don't want history pay nothing.

Scale posture (100 TB): the log entry is O(files) metadata, not data;
linking is an exists-check skip for every unchanged file, so a
micro-batch touching one hour of a table links only that hour's new
files. On an object store (no hard links, but PUTs are immutable and
never overwrite), the retention store degenerates to the manifest
alone — the log's file list IS the snapshot, the Iceberg manifest-list
shape. The local/HDFS link form here keeps the same read API. The
walk in :func:`record_commit` is O(total files) per commit; a
production writer would pass the task-commit file list instead
(Spark's commit protocol knows it) — the log format already supports
that via the ``files`` parameter.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _log_dir(path: str) -> str:
    # Siblings of the dataset dir (like the lock + version manifest):
    # they survive full overwrites and compaction's directory swap,
    # and are invisible to Spark's file index by construction.
    return path.rstrip("/") + ".__snaplog"


def _retain_dir(path: str) -> str:
    return path.rstrip("/") + ".__retain"


def snapshot_enabled(path: str) -> bool:
    """True once :func:`init_snapshot_log` ran for this dataset."""
    return os.path.isdir(_log_dir(path))


def init_snapshot_log(path: str) -> None:
    """Opt this dataset into versioned commits (idempotent)."""
    os.makedirs(_log_dir(path), exist_ok=True)
    os.makedirs(_retain_dir(path), exist_ok=True)


def _entry_path(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"v{version:06d}.json")


def versions(path: str) -> list[int]:
    """Committed version numbers, ascending (empty if log absent)."""
    try:
        names = os.listdir(_log_dir(path))
    except OSError:
        return []
    out = []
    for n in names:
        if n.startswith("v") and n.endswith(".json"):
            try:
                out.append(int(n[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _walk_data_files(path: str) -> list[tuple[str, int]]:
    out = []
    for root, _, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            full = os.path.join(root, f)
            try:
                size = os.path.getsize(full)
            except OSError:
                size = -1  # vanished mid-walk; conservative sentinel
            out.append((os.path.relpath(full, path), size))
    return out


def record_commit(
    path: str, files: list[tuple[str, int]] | None = None
) -> int:
    """Record the dataset's CURRENT file set as the next version and
    retain every file. Runs under the dataset lock (reentrant — the
    write choke point already holds it; explicit callers after a bulk
    build don't need to). Returns the new version number.

    ``files`` lets a writer that already knows its committed file list
    skip the O(total files) walk; sizes of files it did not touch must
    still match the live tree (they do — untouched files are
    untouched).
    """
    from weatherflow_spark.operators.commit import dataset_lock

    if not snapshot_enabled(path):
        raise ValueError(
            f"{path}: snapshot log not initialised (init_snapshot_log)"
        )
    with dataset_lock(path):
        listed = files if files is not None else _walk_data_files(path)
        retain = _retain_dir(path)
        for rel, _size in listed:
            dst = os.path.join(retain, rel)
            if os.path.exists(dst):
                continue  # part names are job-unique: same rel == same bytes
            parent = os.path.dirname(dst)
            if parent:
                os.makedirs(parent, exist_ok=True)
            src = os.path.join(path, rel)
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)  # cross-device fallback
        vs = versions(path)
        n = (vs[-1] if vs else 0) + 1
        tmp = _entry_path(path, n) + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"version": n, "files": sorted(listed)}, f)
        os.replace(tmp, _entry_path(path, n))
        return n


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """The dataset AS OF ``version`` (default: latest). Reads the
    version's file list from the retention mirror only — no lock, no
    dependence on what concurrent writers are doing to the live tree.
    Partition columns come back via Spark's partition discovery
    (``basePath`` = the mirror, which replicates the hive layout).
    """
    vs = versions(path)
    if not vs:
        raise ValueError(f"{path}: no committed versions")
    if version is None:
        version = vs[-1]
    if version not in vs:
        raise ValueError(
            f"{path}: version {version} not in log "
            f"(have {vs[0]}..{vs[-1]}, vacuumed versions are gone)"
        )
    with open(_entry_path(path, version)) as f:
        entry = json.load(f)
    retain = _retain_dir(path)
    paths = [os.path.join(retain, rel) for rel, _ in entry["files"]]
    if not paths:
        raise ValueError(f"{path}: version {version} recorded no files")
    return spark.read.option("basePath", retain).parquet(*paths)


def vacuum_versions(path: str, keep_last: int = 1) -> dict[str, int]:
    """Bound history: keep only the newest ``keep_last`` versions'
    log entries, and unlink retained files referenced by NO surviving
    version. Never touches live data files. Returns counts for the
    caller's log line (``{"dropped_versions": d, "removed_files": r}``).
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    from weatherflow_spark.operators.commit import dataset_lock

    with dataset_lock(path):
        vs = versions(path)
        drop, keep = vs[:-keep_last], vs[-keep_last:]
        referenced: set[str] = set()
        for v in keep:
            with open(_entry_path(path, v)) as f:
                referenced.update(rel for rel, _ in json.load(f)["files"])
        for v in drop:
            os.unlink(_entry_path(path, v))
        removed = 0
        retain = _retain_dir(path)
        for root, _, files in os.walk(retain, topdown=False):
            for f in files:
                full = os.path.join(root, f)
                if os.path.relpath(full, retain) not in referenced:
                    try:
                        os.unlink(full)
                        removed += 1
                    except OSError:
                        pass
            if root != retain and not os.listdir(root):
                os.rmdir(root)
        return {"dropped_versions": len(drop), "removed_files": removed}
