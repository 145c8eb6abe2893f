"""Station dimension: the reference's W_STATION seed and the
enabled-stations scan that drives every poll cycle.

Behavioral spec: reference ``SQL/insert_stations.sql:1-4`` seeds four
Canadian stations (two enabled); ``dags/utils/api.py:20`` selects
``station_id, city, country_code FROM W_STATION WHERE enabled = 1``
before each fetch. Here the seed is a deterministic in-memory
DataFrame with the W_STATION schema (``SQL/create_tables.sql:2-9``)
and the scan is the same predicate+projection — at deployment scale
the station dimension would live as a (tiny, broadcast-able) parquet
table instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATION_SCHEMA = StructType(
    [
        StructField("station_id", LongType()),
        StructField("lat", DoubleType()),
        StructField("long", DoubleType()),
        StructField("city", StringType()),
        StructField("country_code", StringType()),
        StructField("enabled", IntegerType()),
    ]
)

# insert_stations.sql:1-4, verbatim.
STATION_SEED = [
    (1, 42.317432, -83.026772, "Windsor", "CA", 1),
    (2, 43.70011, -79.4163, "Toronto", "CA", 1),
    (3, 42.98339, -81.23304, "London", "CA", 0),
    (4, 47.16679, -81.9998, "Sudbury", "CA", 0),
]


def station_seed(spark: SparkSession) -> DataFrame:
    """The 4-row W_STATION seed as a DataFrame."""
    return spark.createDataFrame(STATION_SEED, STATION_SCHEMA)


def enabled_stations(stations: DataFrame) -> DataFrame:
    """The reference's poll-cycle scan (api.py:20): S1 predicate +
    projection; Catalyst pushes both into the source."""
    return stations.where(F.col("enabled") == 1).select(
        "station_id", "city", "country_code"
    )
