"""Source-layer tests: JSON/CSV round-trips with explicit schemas and
the REST point-source flatten (stubbed HTTP)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from weatherflow_spark.io import load_table
from weatherflow_spark.sources.files import read_csv, read_json, write_csv, write_json
from weatherflow_spark.sources.weather_api import (
    fetch_observations,
    observations_to_df,
)
from tests.conftest import SF_SMALL

_SCHEMA = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_acctbal", DoubleType()),
    ]
)


def test_json_roundtrip(spark, tmp_path):
    df = load_table(spark, SF_SMALL, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    write_json(df, str(tmp_path / "j"))
    back = read_json(spark, str(tmp_path / "j"), _SCHEMA)
    assert back.schema == _SCHEMA
    assert sorted(back.collect()) == sorted(df.collect())


def test_orc_roundtrip(spark, tmp_path):
    """ORC sink/source: schema-preserving round trip, and the filter
    still reaches the ORC scan (PushedFilters) like parquet."""
    from weatherflow_spark.sources.files import read_orc, write_orc

    df = load_table(spark, SF_SMALL, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    write_orc(df, str(tmp_path / "o"))
    back = read_orc(spark, str(tmp_path / "o"))
    assert back.schema == df.schema
    assert sorted(back.collect()) == sorted(df.collect())
    plan = (
        back.where("c_custkey = 7")
        ._sc._jvm.PythonSQLUtils.explainString(
            back.where("c_custkey = 7")._jdf.queryExecution(), "formatted"
        )
    )
    assert "PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,7)]" in plan, plan


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitioned parquet (write_table partition_by): a
    predicate on the partition column must become a PartitionFilter —
    non-matching partitions never reach the scan. This is the #1
    data-skipping lever at 100 TB (time-partitioned facts)."""
    from weatherflow_spark.io import write_table

    ev = load_table(spark, SF_SMALL, "events")
    write_table(ev, str(tmp_path / "part_ev"), partition_by=["event_type"])
    back = spark.read.parquet(str(tmp_path / "part_ev"))
    one = back.where(F.col("event_type") == "purchase")
    plan = one._sc._jvm.PythonSQLUtils.explainString(
        one._jdf.queryExecution(), "formatted"
    )
    import re

    assert re.search(
        r"PartitionFilters: \[isnotnull\(event_type#\d+\), "
        r"\(event_type#\d+ = purchase\)\]",
        plan,
    ), plan
    want = ev.where(F.col("event_type") == 'purchase').count()
    assert one.count() == want


def test_csv_roundtrip(spark, tmp_path):
    df = load_table(spark, SF_SMALL, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    write_csv(df, str(tmp_path / "c"))
    back = read_csv(spark, str(tmp_path / "c"), _SCHEMA)
    assert sorted(back.collect()) == sorted(df.collect())


_SAMPLE_RESPONSE = {
    "main": {
        "temp": 21.5,
        "temp_min": 19.0,
        "temp_max": 24.0,
        "feels_like": 21.0,
        "pressure": 1012.0,
        "humidity": 64.0,
    },
    "wind": {"speed": 3.6, "deg": 160.0},
    "clouds": {"all": 75.0},
    "visibility": 10000.0,
    "dt": 1_700_000_000,
    "sys": {"sunrise": 1_699_980_000, "sunset": 1_700_020_000},
    "timezone": -18000,
    "unread_field": {"ignored": True},  # extra branches must not break parsing
}


def test_rest_point_source_flatten(spark):
    stations = [(1, "City", "CC"), (2, "Other", "DD")]
    records = fetch_observations(stations, http_get=lambda url: json.dumps(_SAMPLE_RESPONSE))
    df = observations_to_df(spark, records)
    rows = {r.station_id: r for r in df.collect()}
    assert set(rows) == {1, 2}
    r = rows[1]
    # the 15-field record of reference api.py:30-34
    assert r.temp == 21.5 and r.temp_min == 19.0 and r.temp_max == 24.0
    assert r.wind_speed == 3.6 and r.wind_direction == 160.0
    assert r.pressure == 1012.0 and r.humidity == 64.0
    assert r.visibility == 10000.0 and r.cloudiness == 75.0
    assert r.timestamp == 1_700_000_000
    assert r.sunrise_ts == 1_699_980_000 and r.sunset_ts == 1_700_020_000
    assert r.timezone == -18000
    assert len(df.columns) == 15


def test_rest_fetch_requires_client(monkeypatch):
    # With neither an injected client nor an importable requests
    # module, the fetch must fail loudly, not return nothing.
    from weatherflow_spark.sources import weather_api

    monkeypatch.setattr(weather_api, "default_http_get", lambda: None)
    with pytest.raises(NotImplementedError):
        fetch_observations([(1, "X", "Y")])


def test_rest_fetch_uses_default_client(monkeypatch):
    # When no client is injected, the requests-backed default (seam:
    # default_http_get) is picked up automatically.
    from weatherflow_spark.sources import weather_api

    calls = []

    def fake_default():
        def _get(url):
            calls.append(url)
            return json.dumps(_SAMPLE_RESPONSE)

        return _get

    monkeypatch.setattr(weather_api, "default_http_get", fake_default)
    records = weather_api.fetch_observations([(7, "Toronto", "CA")])
    assert len(records) == 1 and records[0][0] == 7
    assert calls and "Toronto,CA" in calls[0]


def test_station_seed_matches_reference(spark):
    """The W_STATION seed (insert_stations.sql:1-4) and the poll-cycle
    scan (api.py:20): 4 rows, 2 enabled, exact contents."""
    from weatherflow_spark.sources.stations import enabled_stations, station_seed

    seed = station_seed(spark)
    rows = {r.station_id: r for r in seed.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1].city == "Windsor" and rows[1].enabled == 1
    assert rows[2].city == "Toronto" and rows[2].enabled == 1
    assert rows[3].city == "London" and rows[3].enabled == 0
    assert rows[4].city == "Sudbury" and rows[4].enabled == 0
    assert rows[1].lat == 42.317432 and rows[1].long == -83.026772

    scanned = enabled_stations(seed).collect()
    assert sorted((r.station_id, r.city, r.country_code) for r in scanned) == [
        (1, "Windsor", "CA"),
        (2, "Toronto", "CA"),
    ]


def test_rest_flatten_feeds_transform_core(spark):
    """The fetched batch must run straight through the fidelity
    pipeline (enrich + metrics + star build) — the full reference DAG
    on a real API-shaped record."""
    from weatherflow_spark.functions.calendar import enrich_datetime
    from weatherflow_spark.functions.weather import add_calc_attributes
    from weatherflow_spark.operators.star import build_weather_star

    records = fetch_observations(
        [(7, "C", "C")], http_get=lambda url: json.dumps(_SAMPLE_RESPONSE)
    )
    enriched = add_calc_attributes(enrich_datetime(observations_to_df(spark, records)))
    tables = build_weather_star(enriched)
    assert tables["w_fact"].count() == 1
    temp_row = tables["w_temp_dim"].collect()[0]
    assert temp_row.temp == 21.5
    # dew_point lives in W_PARAM_DIM (create_tables.sql:38), not temp dim
    param_row = tables["w_param_dim"].collect()[0]
    assert param_row.dew_point == round(21.5 - (100 - 64) / 5, 2)


def test_sql_entry_style_matches_dataframe(spark):
    """SURVEY §3.3: the SQL-over-views entry style must produce the
    same result (and the same optimized plan shape) as the DataFrame
    API for the star-join workload."""
    from weatherflow_spark import sql as wf_sql
    from weatherflow_spark.plans.relational import q_star_join_agg

    views = wf_sql.register_views(spark, SF_SMALL, prefix="v_")
    assert "v_lineitem" in views and "v_nation" in views

    got = wf_sql.execute(
        spark,
        """
        SELECT n_name,
               count(*) AS n_items,
               sum(floor(l_extendedprice * (1.0D - l_discount) * 10000.0D + 0.5D)) / 10000.0D
                   AS revenue
        FROM v_lineitem
        JOIN v_orders ON l_orderkey = o_orderkey
        JOIN v_customer ON o_custkey = c_custkey
        JOIN v_nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """,
    )
    want = q_star_join_agg(spark, SF_SMALL)
    a = {r["n_name"]: (r["n_items"], r["revenue"]) for r in got.collect()}
    b = {r["n_name"]: (r["n_items"], r["revenue"]) for r in want.collect()}
    assert a == b


def test_json_permissive_quarantines_corrupt_rows(spark, tmp_path):
    """Dirty-feed contract: a malformed NDJSON line must land in
    _corrupt_record (dead-letter filterable), good rows parse with it
    NULL, and the job never fails."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from weatherflow_spark.sources.files import read_json_permissive

    p = tmp_path / "dirty.json"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "{this is not json}\n"
        '{"id": 2, "name": "also ok"}\n'
        '{"id": "NaN-ish", "name": 3}\n'
    )
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    df = read_json_permissive(spark, str(p), schema).cache()
    good = df.where("_corrupt_record IS NULL")
    bad = df.where("_corrupt_record IS NOT NULL")
    assert df.count() == 4
    assert sorted(r.id for r in good.collect()) == [1, 2]
    assert bad.count() == 2
    raw = [r._corrupt_record for r in bad.collect()]
    assert any("not json" in s for s in raw)
    df.unpersist()


def test_dead_letter_splits_good_and_bad(spark, tmp_path):
    """The sanctioned split path: dead_letter() must cache internally
    (Spark's corrupt-record restriction forbids filtering the raw
    frame on _corrupt_record alone) and return clean good rows plus
    raw quarantined lines."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from weatherflow_spark.operators.caching import release_caches
    from weatherflow_spark.sources.files import dead_letter, read_json_permissive

    p = tmp_path / "dirty.json"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "{broken\n"
        '{"id": 2, "name": "fine"}\n'
    )
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    df = read_json_permissive(spark, str(p), schema)
    try:
        good, bad = dead_letter(df)
        # bad-only action: exactly the query shape that raises
        # AnalysisException on the uncached frame
        assert bad.count() == 1
        assert "_corrupt_record" not in good.columns
        assert sorted(r.id for r in good.collect()) == [1, 2]
        assert "{broken" in bad.collect()[0].raw
    finally:
        release_caches()
