"""REST point source: the OpenWeatherMap ingestion path (SURVEY §2.1
S2/S3) re-expressed engine-side.

The reference polls `GET /data/2.5/weather?q={city},{country}` per
enabled station and hand-projects 15 leaf fields out of the nested
JSON response (reference dags/utils/api.py:23-35). Network ingestion
is driver-side by nature; the engine's job is (a) a typed schema for
the response, (b) the flatten projection as a declarative plan
(``from_json`` + struct field access — Catalyst prunes unread JSON
branches), and (c) batch construction from fetched records. The HTTP
fetch itself is stubbed (no network in tests) behind
``fetch_observations``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed schema of the OpenWeatherMap current-weather response, to the
# depth the reference consumes (api.py:30-34). Unread branches
# (weather[], coord, ...) are omitted: from_json ignores extra fields,
# and declaring less lets Catalyst prune the parse.
RESPONSE_SCHEMA = StructType(
    [
        StructField(
            "main",
            StructType(
                [
                    StructField("temp", DoubleType()),
                    StructField("temp_min", DoubleType()),
                    StructField("temp_max", DoubleType()),
                    StructField("feels_like", DoubleType()),
                    StructField("pressure", DoubleType()),
                    StructField("humidity", DoubleType()),
                ]
            ),
        ),
        StructField(
            "wind",
            StructType(
                [StructField("speed", DoubleType()), StructField("deg", DoubleType())]
            ),
        ),
        StructField("clouds", StructType([StructField("all", DoubleType())])),
        StructField("visibility", DoubleType()),
        StructField("dt", LongType()),
        StructField(
            "sys",
            StructType(
                [StructField("sunrise", LongType()), StructField("sunset", LongType())]
            ),
        ),
        StructField("timezone", LongType()),
    ]
)

RAW_SCHEMA = StructType(
    [StructField("station_id", LongType()), StructField("body", StringType())]
)


def flatten_responses(raw: DataFrame, body_col: str = "body") -> DataFrame:
    """The 15-field flatten projection (api.py:30-34) as one narrow
    select over the parsed JSON struct — field names match the
    reference's output record exactly."""
    j = F.from_json(F.col(body_col), RESPONSE_SCHEMA)
    return raw.select(
        F.col("station_id"),
        j["main"]["temp"].alias("temp"),
        j["main"]["temp_min"].alias("temp_min"),
        j["main"]["temp_max"].alias("temp_max"),
        j["main"]["feels_like"].alias("feels_like"),
        j["wind"]["speed"].alias("wind_speed"),
        j["wind"]["deg"].alias("wind_direction"),
        j["main"]["pressure"].alias("pressure"),
        j["main"]["humidity"].alias("humidity"),
        j["visibility"].alias("visibility"),
        j["clouds"]["all"].alias("cloudiness"),
        j["dt"].alias("timestamp"),
        j["sys"]["sunrise"].alias("sunrise_ts"),
        j["sys"]["sunset"].alias("sunset_ts"),
        j["timezone"].alias("timezone"),
    )


def default_http_get() -> Callable[[str], str] | None:
    """A thin ``requests``-backed GET if the library is importable,
    else None. Kept out of the engine's hard dependencies: containers
    without network (or without requests) still import this module,
    and tests keep injecting canned clients through the same seam."""
    try:
        import requests
    except ImportError:
        return None

    def _get(url: str) -> str:
        resp = requests.get(url, timeout=30)
        resp.raise_for_status()
        return resp.text

    return _get


def fetch_observations(
    stations: Iterable[tuple[int, str, str]],
    http_get: Callable[[str], str] | None = None,
) -> list[tuple[int, str]]:
    """Driver-side fetch loop (api.py:23-28). ``http_get`` is
    injectable (tests pass a canned-response callable); when omitted,
    a ``requests``-backed default is used if requests is importable,
    otherwise this raises rather than silently returning nothing.

    Runnable ingestion example (deployment with network access)::

        records = fetch_observations([(1, "London", "uk")])
        df = observations_to_df(spark, records)
    """
    if http_get is None:
        http_get = default_http_get()
    if http_get is None:
        raise NotImplementedError(
            "no HTTP client available — install requests or inject http_get"
        )
    out = []
    for station_id, city, country in stations:
        url = (
            "https://api.openweathermap.org/data/2.5/weather"
            f"?q={city},{country}&units=metric"
        )
        out.append((station_id, http_get(url)))
    return out


def observations_to_df(
    spark: SparkSession, records: list[tuple[int, str]]
) -> DataFrame:
    """Batch construction + flatten: the engine-side entry for one
    poll cycle."""
    return flatten_responses(spark.createDataFrame(records, RAW_SCHEMA))
