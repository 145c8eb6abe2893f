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

from weatherflow_spark.functions.text import CHAR_P, MOD

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


def decode_image_pillow(payload: bytes) -> bytes:
    """REAL decode branch: image payload (PNG/JPEG/...) → raw RGB byte
    plane via Pillow. Same bytes→bytes interface as the stub, so every
    mapInPandas worker takes either interchangeably. The PIL import
    happens inside the call, on the executor — but note this function
    is module-level, so cloudpickle ships it BY REFERENCE: use it from
    sessions whose workers can import weatherflow_spark (the package's
    own tests/jobs), not from a foreign driver (the round driver's
    plain session uses the closure-local stub default instead — see
    make_extract_features)."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as img:
        return img.convert("RGB").tobytes()


def default_decoder() -> Callable[[bytes], bytes]:
    """The Pillow decoder where Pillow is importable, else the stub —
    the import-guard seam that makes the operator production-credible
    without codecs in this sandbox."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        return decode_image_stub
    return decode_image_pillow


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


# ---------------------------------------------------------------------------
# frame sampling — the video path: one input row → N frame rows
# ---------------------------------------------------------------------------

N_FRAMES = 4
FRAME_LEN = 32

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_offset", IntegerType()),
        StructField("frame_len", IntegerType()),
        StructField("frame_hash", LongType()),
    ]
)


def make_sample_frames(
    decode: Callable[[bytes], bytes] | None = None,
    n_frames: int = N_FRAMES,
    frame_len: int = FRAME_LEN,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Build the frame-sampling mapInPandas worker (closure — see
    make_extract_features for why). This is the row-multiplying UDF
    shape a video pipeline needs: each payload yields up to
    ``n_frames`` rows at evenly-strided offsets (stride = n_bytes //
    n_frames; a payload shorter than the stride yields one frame).
    Real deployments put the ffmpeg keyframe extraction inside
    ``decode``; the stub treats the payload bytes as the decoded
    stream. Frame hash is the engine's polynomial char fold, so the
    output is oracle-checkable for ASCII payloads.
    """
    mod, char_p = MOD, CHAR_P
    if decode is None:

        def decode(payload: bytes) -> bytes:
            return payload

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd  # re-import inside the worker process

        for pdf in batches:
            ids, idxs, offs, lens, hashes = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                stream = decode(payload)
                nb = len(stream)
                step = nb // n_frames
                for i in range(n_frames if step > 0 else 1):
                    off = i * step
                    frame = stream[off : off + frame_len]
                    h = 0
                    for b in frame:
                        h = (h * char_p + b) % mod
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(off)
                    lens.append(len(frame))
                    hashes.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_offset": pd.Series(offs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "frame_hash": pd.Series(hashes, dtype="int64"),
                }
            )

    return sample_frames


def multimodal_frames(docs: DataFrame) -> DataFrame:
    """Attach payload → mapInPandas frame sampling (1 row → ≤4 frame
    rows). Narrow (no shuffle); the row multiplication happens inside
    the Arrow batch, so downstream operators see ordinary rows."""
    return with_binary_payload(docs).mapInPandas(make_sample_frames(), FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# resize — binary→binary transform with metadata update
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", IntegerType()),
        StructField("target_bytes", IntegerType()),
        StructField("was_truncated", IntegerType()),
    ]
)


def make_resize(
    target_bytes: int,
    resize: Callable[[bytes, int], bytes] | None = None,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Build the binary→binary resize worker (closure — see
    make_extract_features). Real deployments put the PIL
    ``Image.resize`` / audio resample inside ``resize``; the stub
    truncates or zero-pads the byte plane to ``target_bytes`` —
    deterministic, and shape-faithful to a fixed-resolution decode.
    The payload column flows binary-in/binary-out through Arrow,
    which is the property this exhibit certifies."""
    tb = int(target_bytes)
    if resize is None:

        def resize(payload: bytes, n: int) -> bytes:
            return payload[:n] + b"\x00" * max(0, n - len(payload))

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd  # re-import inside the worker process

        for pdf in batches:
            resized = pdf["payload"].map(lambda p: resize(p, tb))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "n_bytes": resized.map(len).astype("int32"),
                    "target_bytes": pd.Series([tb] * len(pdf), dtype="int32"),
                    "was_truncated": pdf["payload"]
                    .map(lambda p: 1 if len(p) > tb else 0)
                    .astype("int32"),
                }
            )

    return do_resize


def multimodal_resize(docs: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Attach payload → mapInPandas resize to a fixed byte plane."""
    return with_binary_payload(docs).mapInPandas(
        make_resize(target_bytes), RESIZED_SCHEMA
    )


# ---------------------------------------------------------------------------
# perceptual hash — block-average (aHash-family) over the byte plane
# ---------------------------------------------------------------------------

PHASH_BITS = 60  # 4 x 15-bit bands, mirroring the SimHash banding


PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("phash", LongType()),
    ]
)


def make_phash(
    decode: Callable[[bytes], bytes] | None = None,
    n_bits: int = PHASH_BITS,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Build the perceptual-hash mapInPandas worker (closure — see
    make_extract_features for why). Block-average hash, the aHash
    member of the pHash family: the decoded byte plane is split into
    ``n_bits`` contiguous blocks (position p → block p·n_bits // n),
    and bit b is set iff block b's mean byte value exceeds the plane's
    global mean — compared CROSS-MULTIPLIED in integers
    (block_sum·n > total·block_len), so no float ever enters the hash
    and the DuckDB oracle reproduces it bit-for-bit from `text`
    (ASCII plane: byte == codepoint). A few flipped bytes move a few
    block means, so near-identical planes land within a small Hamming
    distance while the exact content hash already differs — the
    property the banded near-dup join exploits. Real deployments put
    the image decode + DCT low-pass in ``decode``; the per-plane body
    is numpy-vectorized (bincount over block ids), not per-byte
    Python."""
    nb_bits = int(n_bits)
    if decode is None:

        def decode(payload: bytes) -> bytes:
            return payload

    def phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd  # re-import inside the worker process

        def one(payload: bytes) -> int:
            plane = decode(payload)
            n = len(plane)
            if n == 0:
                return 0
            arr = np.frombuffer(plane, dtype=np.uint8).astype(np.int64)
            total = int(arr.sum())
            blocks = (np.arange(n, dtype=np.int64) * nb_bits) // n
            sums = np.bincount(blocks, weights=arr, minlength=nb_bits)
            counts = np.bincount(blocks, minlength=nb_bits)
            mask = sums.astype(np.int64) * n > total * counts.astype(np.int64)
            h = 0
            for b in np.nonzero(mask)[0]:
                h |= 1 << int(b)
            return h

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": pd.Series(
                        [one(p) for p in pdf["payload"]], dtype="int64"
                    ),
                }
            )

    return phash_batches


def multimodal_phash(docs: DataFrame) -> DataFrame:
    """Attach payload → mapInPandas perceptual hash: (doc_id, phash).
    Narrow (no shuffle); callers band the hash for the candidate
    join (plans/ext_dedup.q_phash_near_dup)."""
    return with_binary_payload(docs).mapInPandas(make_phash(), PHASH_SCHEMA)


# ---------------------------------------------------------------------------
# window energy — the audio path: fixed frames → energy → VAD-style activity
# ---------------------------------------------------------------------------

ENERGY_WIN = 16  # bytes per analysis window (the stand-in "frame")

ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("widx", IntegerType()),
        StructField("w_offset", IntegerType()),
        StructField("w_len", IntegerType()),
        StructField("energy", LongType()),
        StructField("active", IntegerType()),
    ]
)


def make_window_energy(
    decode: Callable[[bytes], bytes] | None = None,
    win: int = ENERGY_WIN,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Build the frame-energy mapInPandas worker (closure — see
    make_extract_features). The audio analog of the frame sampler:
    the decoded byte plane splits into fixed ``win``-byte windows,
    each emitting an integer ENERGY (sum of squared byte values) and
    a VAD-style activity flag — active iff the window's energy
    exceeds the plane's MEAN window energy, compared cross-multiplied
    in integers (energy · n_windows > total_energy), so the whole
    row set is reproducible in SQL from the ASCII stand-in plane.
    Real deployments put PCM decode in ``decode`` and keep everything
    downstream unchanged. numpy-vectorized per plane (pad to a
    multiple of ``win`` with zeros, reshape, row sums) — no per-byte
    Python."""
    w = int(win)
    if decode is None:

        def decode(payload: bytes) -> bytes:
            return payload

    def energy_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd  # re-import inside the worker process

        for pdf in batches:
            ids, idxs, offs, lens, energies, actives = [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                plane = decode(payload)
                n = len(plane)
                if n == 0:
                    continue
                arr = np.frombuffer(plane, dtype=np.uint8).astype(np.int64)
                sq = arr * arr
                nw = (n + w - 1) // w
                padded = np.zeros(nw * w, dtype=np.int64)
                padded[:n] = sq
                e = padded.reshape(nw, w).sum(axis=1)
                total = int(e.sum())
                act = (e * nw) > total
                ids.extend([doc_id] * nw)
                idxs.extend(range(nw))
                offs.extend(i * w for i in range(nw))
                lens.extend(min(w, n - i * w) for i in range(nw))
                energies.extend(int(x) for x in e)
                actives.extend(int(b) for b in act)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "widx": pd.Series(idxs, dtype="int32"),
                    "w_offset": pd.Series(offs, dtype="int32"),
                    "w_len": pd.Series(lens, dtype="int32"),
                    "energy": pd.Series(energies, dtype="int64"),
                    "active": pd.Series(actives, dtype="int32"),
                }
            )

    return energy_batches


def multimodal_window_energy(docs: DataFrame) -> DataFrame:
    """Attach payload → mapInPandas frame-energy rows (1 → N windows).
    Narrow; segmentation over the result is pure Catalyst
    (plans/ext_udf.q_media_segments — gaps-and-islands)."""
    return with_binary_payload(docs).mapInPandas(
        make_window_energy(), ENERGY_SCHEMA
    )
