"""Multimodal column plumbing: opaque binary payloads + typed
metadata, processed by Arrow-batched Pandas UDFs (north-star
extension, SURVEY §2.11 / task brief "Multimodal columns").

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (`decode_image_stub`) with a deterministic fake
implementation; everything Spark-side — binary schema, metadata
struct, `mapInPandas` batch iteration, Arrow transfer shape,
partitioning — is real and tested.

Scale posture: feature extraction is `mapInPandas` (narrow, no
shuffle, Arrow-vectorized batches of `spark.sql.execution.arrow
.maxRecordsPerBatch` rows). At 100 TB the payload column dominates
I/O: keep payloads in their own parquet column (columnar pruning
skips them when untouched) and size `files.maxPartitionBytes` so one
task's batch of payloads fits executor memory.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from weatherflow_spark.functions.text import MOD

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("header_byte", IntegerType()),
        StructField("checksum", LongType()),
        StructField("mime", StringType()),
    ]
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload column + typed metadata struct
    to the documents table (UTF-8 bytes of `text` stand in for an
    image/audio blob — the plumbing is payload-agnostic)."""
    return docs.select(
        F.col("doc_id"),
        F.encode(F.col("text"), "UTF-8").cast(BinaryType()).alias("payload"),
        F.struct(
            F.length(F.encode(F.col("text"), "UTF-8")).cast("int").alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def decode_image_stub(payload: bytes) -> bytes:
    """STUB: real deployments decode image/audio here (PIL/ffmpeg —
    not in this container). Deterministic fake: the payload itself is
    treated as the decoded byte plane."""
    return payload


def make_extract_features(
    decode: Callable[[bytes], bytes] | None = None,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Build the mapInPandas worker function as a *closure* so
    cloudpickle serializes it by value — executors in a foreign
    driver process (the round driver's plain SparkSession) have no
    `weatherflow_spark` on their sys.path, so a module-level function
    (pickled by reference) would raise ModuleNotFoundError on the
    worker. Everything the closure touches is a local or a stdlib/
    pandas name."""
    mod = MOD
    if decode is None:
        # Local re-definition of the stub (NOT the module-level one):
        # a module-global default would be pickled by reference and
        # reintroduce the import dependency on the worker.
        def decode(payload: bytes) -> bytes:
            return payload

    def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Per Arrow batch: 'decode' each payload, emit fixed-width
        # features. The checksum (sum of byte values mod P) mirrors
        # the engine's cross-engine polynomial hash so the result is
        # oracle-checkable in SQL for ASCII payloads.
        import pandas as pd  # re-import inside the worker process

        for pdf in batches:
            decoded = pdf["payload"].map(decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": decoded.map(len).astype("int32"),
                    "header_byte": decoded.map(lambda b: b[0] if len(b) else 0).astype("int32"),
                    "checksum": decoded.map(lambda b: sum(b) % mod).astype("int64"),
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                }
            )

    return extract_features


def multimodal_features(docs: DataFrame) -> DataFrame:
    """The full pipeline: attach payload → mapInPandas feature
    extraction with an explicit output schema."""
    return with_binary_payload(docs).mapInPandas(make_extract_features(), FEATURE_SCHEMA)
