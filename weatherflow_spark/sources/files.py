"""File-format sources/sinks beyond parquet (SURVEY §2.1, file-format
surface row): JSON and CSV read/write with explicit schemas.

The reference's only storage is MySQL; its one JSON artifact is a
saved API response (reference sample.json). This engine treats
Parquet as the warehouse format (columnar, statistics, pushdown) and
offers JSON/CSV for interchange. Explicit schemas everywhere —
``inferSchema`` costs a full extra pass at 100 TB and can silently
flip types between runs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """NDJSON source. multiLine stays off: line-delimited JSON splits
    by newline and parallelizes per-block; a multiLine document forces
    one task per file."""
    return spark.read.schema(schema).json(path)


def read_json_permissive(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """NDJSON with dirty-data quarantine: PERMISSIVE mode routes any
    unparseable line's raw bytes into ``_corrupt_record`` instead of
    failing the job or silently dropping rows — the ingestion
    contract a 100 TB feed needs (one bad producer must not kill the
    load). The passed schema is extended with the quarantine column;
    good rows have it NULL.

    CAVEAT (Spark restriction): a query that references ONLY the
    internal corrupt-record column (e.g.
    ``df.where("_corrupt_record IS NOT NULL").count()``) raises
    AnalysisException on the raw frame — Spark forbids it because the
    JSON parser would have nothing else to parse. Split good/bad rows
    through :func:`dead_letter`, which caches first (the sanctioned
    workaround), instead of filtering this frame directly."""
    from pyspark.sql.types import StringType, StructField

    full = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def dead_letter(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a :func:`read_json_permissive` frame into
    ``(good, bad)``: good rows with the quarantine column dropped,
    bad rows as (raw line) for a dead-letter sink. Caches the frame
    first — Spark's corrupt-record restriction (see the caveat above)
    requires the split to run over materialized rows, and the cache
    also means the input is parsed once for both halves. Caller
    releases via ``operators.caching.release_caches()`` (or the
    write-path JVM exit)."""
    from weatherflow_spark.operators.caching import tracked_persist

    cached = tracked_persist(df)
    good = cached.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = cached.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw")
    )
    return good, bad


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    return spark.read.schema(schema).options(header=str(header).lower(), **options).csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — the other columnar warehouse format (native Spark
    reader; predicate pushdown and column pruning work the same as
    parquet, including into the ORC stripe statistics)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)
