"""Kafka-shaped streaming source seam (SURVEY §2.9; VERDICT r7
'What's missing' #3).

The reference polls a REST API on a 5-minute Airflow schedule
(dags/etl.py:129); a production deployment of this pipeline would
consume a message bus instead. This module mirrors the HTTP seam of
``sources/weather_api.py`` for streams: the PIPELINE depends only on
an injectable source contract, the real Kafka connector binds behind
it when the environment provides one, and tests inject a stub through
the SAME seam — so the decode + transform path the tests certify is
byte-identical to what the connector path runs.

The contract
------------

A *bus source* is any callable ``(SparkSession) -> DataFrame`` whose
result is STREAMING and carries the Kafka record shape (the de-facto
bus interchange schema — Kafka, Redpanda, Event Hubs and Pulsar's
Kafka API all surface it)::

    key        binary      partition  int
    value      binary      offset     long
    topic      string      timestamp  timestamp

``decode_events`` is the single shared decode from that shape to the
canonical events schema: value bytes → JSON → typed columns →
``io.normalize_events`` (the same normalizer the batch loader uses —
never a second unit-conversion path). Everything downstream
(tumbling/session aggs, stateful dedup, the star-load sink) consumes
the decoded stream and cannot tell which source produced it.

Offsets/replay: exactly-once comes from the same two ingredients as
the file path — checkpointed source offsets (Kafka offsets are the
native analog of file-source file lists) + idempotent foreachBatch
sinks keyed by deterministic surrogate keys. Nothing in the pipeline
assumes file semantics.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from weatherflow_spark.io import normalize_events
from weatherflow_spark.streaming.pipeline import EVENTS_FALLBACK_SCHEMA

BusSource = Callable[[SparkSession], DataFrame]

_KAFKA_COLS = ["key", "value", "topic", "partition", "offset", "timestamp"]


def kafka_bus_source(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> BusSource:
    """The real-connector binding: ``readStream.format("kafka")``.

    Guarded like ``weather_api.default_http_get`` — this container
    ships no Kafka connector jar (and no broker), so building the
    reader raises Spark's missing-data-source error at call time;
    deployments add ``spark-sql-kafka`` to the session and the same
    pipeline runs unchanged. Tests never call this; they inject
    :func:`file_bus_stub` through the same seam."""

    def _load(spark: SparkSession) -> DataFrame:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
            .select(*_KAFKA_COLS)
        )

    return _load


def file_bus_stub(ndjson_dir: str, topic: str = "events") -> BusSource:
    """Stub bus: an NDJSON landing dir re-shaped into Kafka records.

    Each JSON line becomes one record: ``value`` = the line's bytes
    (exactly what a producer would publish), ``key`` = the event_id
    bytes, ``partition`` = a stable hash-bucket of the key (what a
    keyed producer yields), ``offset`` = event_id (monotone per key —
    a stand-in; real offsets are per-partition monotone). The decode
    path neither reads ``partition`` nor ``offset`` for semantics —
    they exist so the stub exercises the full record shape."""

    def _load(spark: SparkSession) -> DataFrame:
        lines = (
            spark.readStream.format("text")
            .option("wholetext", "false")
            .load(ndjson_dir)
        )
        parsed = lines.select(
            F.from_json(F.col("value"), EVENTS_FALLBACK_SCHEMA).alias("e"),
            F.col("value").alias("line"),
        )
        return parsed.select(
            F.col("e.event_id").cast("string").cast("binary").alias("key"),
            F.col("line").cast("binary").alias("value"),
            F.lit(topic).alias("topic"),
            F.pmod(F.hash(F.col("e.event_id")), F.lit(8)).alias("partition"),
            F.col("e.event_id").alias("offset"),
            F.col("e.ts").cast("timestamp").alias("timestamp"),
        )

    return _load


def decode_events_with_dead_letter(
    bus_df: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Kafka record shape → ``(events, dead)``: the streaming mirror
    of the batch quarantine (``sources/files.dead_letter`` — r9,
    VERDICT r8 'What's missing' #3). ``from_json`` yields a NULL
    struct for an unparseable value (and a null ``event_id`` for valid
    JSON that isn't an event); before this split those records flowed
    on as all-null rows — polluting aggregates silently, the one thing
    a 100 TB feed must never do. Now:

    - ``events``: parseable records with a non-null key, normalized
      through the SAME ``io.normalize_events`` as the batch loader.
    - ``dead``: the raw value bytes plus full bus provenance (topic /
      partition / offset / timestamp) — everything an operator needs
      to replay or indict the producer. Attach it to a quarantine
      sink; both halves are streaming frames off ONE source, so each
      micro-batch is split exactly (nothing dropped, nothing dual-
      counted).
    """
    parsed = bus_df.select(
        "value",
        "topic",
        "partition",
        "offset",
        "timestamp",
        F.from_json(
            F.col("value").cast("string"), EVENTS_FALLBACK_SCHEMA
        ).alias("e"),
    )
    is_bad = F.col("e").isNull() | F.col("e.event_id").isNull()
    events = normalize_events(parsed.where(~is_bad).select("e.*"))
    dead = parsed.where(is_bad).select(
        F.col("value").cast("string").alias("raw"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    )
    return events, dead


def decode_events(bus_df: DataFrame) -> DataFrame:
    """Kafka record shape → canonical events: parse the value bytes
    as one JSON event and normalize through the SAME
    ``io.normalize_events`` the batch loader uses. This is the single
    decode both the connector path and the stub path share — the seam
    guarantees tests certify the deployed decode. Corrupt records are
    EXCLUDED here (they are the dead half of
    :func:`decode_events_with_dead_letter`, which callers should sink
    to a quarantine — never silently flow null rows downstream)."""
    events, _ = decode_events_with_dead_letter(bus_df)
    return events


def events_from_bus(spark: SparkSession, source: BusSource) -> DataFrame:
    """The pipeline's entry: bind ANY bus source and decode. Streaming
    queries (tumbling/session aggs, dedup, star load) consume this
    exactly as they consume ``read_events_stream``."""
    return decode_events(source(spark))
