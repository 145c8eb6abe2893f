"""Table IO: the engine's source layer over the driver's parquet testdata.

The reference's sources are a MySQL JDBC scan (reference
dags/utils/api.py:18-21) and a REST point source (api.py:23-35); its
sink is MySQL INSERTs (dags/etl.py:96-123). Here the warehouse format
is Parquet — scans get predicate pushdown + column pruning from
Catalyst for free — with JDBC kept behind :mod:`sources.jdbc` for
fidelity.

Normalization performed at load:

- ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark
  cannot read natively; with ``spark.sql.legacy.parquet.nanosAsLong``
  we read raw nanos and convert to microsecond TIMESTAMP_NTZ here
  (floor-truncating, which matches DuckDB's read of the same file).
  All other timestamp columns already arrive as TIMESTAMP_NTZ.
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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing types to engine conventions."""
    configure_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos → microsecond-truncated naive timestamp (DuckDB-parity).
        # Integer DIV, not `/`: epoch nanos (~1.7e18) exceed double's
        # 2^53 exact-integer range, so float division is off by ±1 µs.
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz"),
        )
    return df


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
