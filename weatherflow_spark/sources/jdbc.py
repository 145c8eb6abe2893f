"""JDBC source/sink — fidelity interface for the reference's MySQL
warehouse (reference dags/utils/database.py:12-34, SQL scan at
api.py:18-21), kept behind this module so tests run against files.

Semantics mapping:

- ``read_jdbc_table`` with ``predicates``/``partition_column`` is the
  scan S1 (`SELECT ... WHERE enabled = 1`): Spark pushes filters and
  projections into the database, and partitioned reads parallelize
  the scan (the reference reads single-threaded, database.py:16-23).
- ``write_jdbc_table`` replaces the reference's per-record
  5-INSERT transaction (database.py:25-34): batched INSERTs
  (``batchsize``) under Spark's job-commit protocol; idempotence
  comes from deterministic surrogate keys (operators/star.py), not
  rollback.

No MySQL server (or JDBC driver) exists in the test container, so
this module is exercised for plan construction only; the same
DataFrames round-trip through parquet in tests."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Partition-parallel JDBC scan. With a numeric
    ``partition_column`` + bounds, Spark issues ``num_partitions``
    range-sliced queries instead of one cursor — the difference
    between a single-stream dump and a parallel ingest at warehouse
    scale."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> None:
    """Batched JDBC sink (vs the reference's one INSERT per row per
    table, dags/etl.py:105-122)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
