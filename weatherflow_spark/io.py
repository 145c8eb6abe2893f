"""Table IO: the engine's source layer over the driver's parquet testdata.

The reference's sources are a MySQL JDBC scan (reference
dags/utils/api.py:18-21) and a REST point source (api.py:23-35); its
sink is MySQL INSERTs (dags/etl.py:96-123). Here the warehouse format
is Parquet — scans get predicate pushdown + column pruning from
Catalyst for free — with JDBC kept behind :mod:`sources.jdbc` for
fidelity.

Normalization performed at load:

- ``events.ts`` is normalized to microsecond TIMESTAMP_NTZ whatever
  the physical parquet type: TIMESTAMP(MICROS) files (the shipped
  testdata) read natively, while a TIMESTAMP(NANOS) file surfaces as
  raw long nanos under ``spark.sql.legacy.parquet.nanosAsLong`` and
  is converted here (floor-truncating, which matches DuckDB's read
  of the same file). :func:`normalize_events` is the single place
  this decision lives — the streaming source reuses it, so the batch
  and stream paths cannot diverge on units.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from weatherflow_spark.session import configure_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_events(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to microsecond TIMESTAMP_NTZ regardless
    of the physical storage type. Shared by :func:`load_table` and the
    streaming source (streaming/pipeline.read_events_stream) so a
    storage-unit change can never silently split the two paths."""
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # TIMESTAMP(NANOS) file read as raw long nanos (nanosAsLong):
        # nanos → microsecond-truncated naive timestamp (DuckDB-parity).
        # Integer DIV, not `/`: epoch nanos (~1.7e18) exceed double's
        # 2^53 exact-integer range, so float division is off by ±1 µs.
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz"),
        )
    elif ts_type == "timestamp":
        # Session TZ is pinned UTC, so the cast preserves wall-clock.
        df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing types to engine conventions."""
    configure_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events(df)
    return df


def table_bytes(sf_dir: str, name: str) -> int:
    """On-disk (compressed parquet) byte size of one testdata table —
    the input to size-based broadcast decisions (r13 verdict #8): a
    dim that outgrows the threshold must degrade to a shuffle join
    instead of OOMing the driver. Handles both single-file and
    directory-shaped parquet datasets; 0 when absent (callers treat
    unknown as small — the explicit-path caller knows its data)."""
    p = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isfile(p):
        return os.path.getsize(p)
    total = 0
    for root, _, files in os.walk(p):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink. At warehouse scale, partition facts by a date
    column (the reference's ``record_date`` analog) so time-range
    queries prune partitions; dims stay unpartitioned."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
