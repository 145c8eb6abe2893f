"""UDF-surface queries (SURVEY §2.10 X1/X2): the engine's sanctioned
Python escape hatches — Arrow-vectorized `pandas_udf` and
`mapInPandas` — each hash-checked against a pure-SQL oracle to prove
the UDF path computes exactly what the declarative path would.

The reference's entire transform layer is row-at-a-time interpreted
Python (dags/etl.py:20-84); this engine keeps Python off the hot
path (every fidelity operator is a Catalyst expression) and reserves
these two entry points for genuinely non-expressible logic, always
Arrow-batched, never row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from weatherflow_spark.io import load_table
from weatherflow_spark.multimodal.binary import multimodal_features, multimodal_frames
from weatherflow_spark.functions.text import CHAR_P, MOD
from weatherflow_spark.plans.queries import events_weather
from weatherflow_spark.plans.oracles import EVENTS_SIM


# ---------------------------------------------------------------------------
# q_pandas_udf_metric — vectorized scalar pandas_udf
# ---------------------------------------------------------------------------


def _make_dew_point_udf():
    """Construct the UDF from a closure so cloudpickle serializes it
    by value — a module-level function would be pickled by reference
    and fail to import on executors of a foreign driver process (the
    round driver's session has no weatherflow_spark on worker paths)."""

    def dew_point_fn(temp: pd.Series, humidity: pd.Series) -> pd.Series:
        # Dew point (etl.py:78 semantics), elementwise IEEE double ops
        # — bit-identical to the column-expression form and the oracle.
        import numpy as np
        import pandas as pd

        raw = temp - (100.0 - humidity) / 5.0
        return pd.Series(np.floor(raw * 100.0 + 0.5) / 100.0)

    return pandas_udf(DoubleType())(dew_point_fn)


def q_pandas_udf_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas_udf path for F11 (dew point): same numbers as the
    expression path in q_derived_metrics, demonstrating that the UDF
    surface preserves engine semantics. Arrow transfer, one Python
    worker call per batch — still the slow path; use only when
    built-ins can't express the logic."""
    df = events_weather(spark, sf_dir)
    return df.select(
        F.col("event_id"),
        _make_dew_point_udf()(F.col("temp"), F.col("humidity")).alias("dew_point"),
    )


ORACLE_PANDAS_UDF_METRIC = f"""
    WITH w AS ({EVENTS_SIM})
    SELECT event_id, floor((temp - (100.0 - humidity) / 5.0) * 100.0 + 0.5) / 100.0 AS dew_point
    FROM w
"""


# ---------------------------------------------------------------------------
# q_multimodal_features — mapInPandas over binary payloads
# ---------------------------------------------------------------------------


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline over `documents` (payload = UTF-8
    bytes): metadata struct + mapInPandas feature extraction with a
    stubbed decoder. Oracle-checkable because the fake features are
    deterministic byte arithmetic and the corpus is ASCII (byte value
    == codepoint), so SQL can recompute them from `text`."""
    return multimodal_features(load_table(spark, sf_dir, "documents"))


ORACLE_MULTIMODAL_FEATURES = f"""
    SELECT
        doc_id,
        CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        CAST(CASE WHEN length(text) > 0 THEN ascii(substring(text, 1, 1)) ELSE 0 END
             AS INTEGER) AS header_byte,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(generate_series(1, length(text)),
                           i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))),
            (acc, c) -> acc + c) % {MOD} AS checksum,
        'application/octet-stream' AS mime
    FROM documents
"""


# ---------------------------------------------------------------------------
# q_multimodal_frames — row-multiplying mapInPandas (the video path)
# ---------------------------------------------------------------------------


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads: each document yields ≤4
    frame rows at evenly-strided offsets (multimodal/binary.py
    ``make_sample_frames`` — decode stubbed, Arrow batch shape and
    1→N row multiplication real). Hash-checked: the frame hash is
    the engine's polynomial char fold, recomputable in SQL from
    `text` because the corpus is ASCII (byte == codepoint)."""
    return multimodal_frames(load_table(spark, sf_dir, "documents"))


ORACLE_MULTIMODAL_FRAMES = f"""
    WITH d AS (
        SELECT doc_id, text,
               CAST(length(text) AS BIGINT) AS nb,
               CAST(length(text) // 4 AS BIGINT) AS step
        FROM documents
    ),
    f AS (
        SELECT d.doc_id,
               CAST(r.i AS INTEGER) AS frame_idx,
               CAST(r.i * d.step AS INTEGER) AS frame_offset,
               substring(d.text, CAST(r.i * d.step AS INTEGER) + 1, 32) AS ftxt
        FROM d, LATERAL (SELECT unnest(range(4)) AS i) r
        WHERE r.i = 0 OR d.step > 0
    )
    SELECT doc_id, frame_idx, frame_offset,
           CAST(length(ftxt) AS INTEGER) AS frame_len,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, length(ftxt)),
                              i -> CAST(ascii(substring(ftxt, i, 1)) AS BIGINT))),
               (acc, c) -> (acc * {CHAR_P} + c) % {MOD}) AS frame_hash
    FROM f
"""


# ---------------------------------------------------------------------------
# q_media_segments — E87: frame energy (audio path) → VAD-style islands
# ---------------------------------------------------------------------------


def q_media_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E87: activity SEGMENTATION over binary planes — the audio
    member of the multimodal family (voice-activity detection shape).
    The decode seam emits per-frame integer energies with an adaptive
    above-mean activity flag (multimodal/binary.make_window_energy,
    one narrow Arrow pass); everything after is pure Catalyst: the
    classic gaps-and-islands (widx − row_number) groups consecutive
    active frames into segments with start/end offsets, frame counts
    and summed energy. Python only where the codec would live; the
    relational half stays in whole-stage codegen. The per-doc window
    is bounded by one media object's frame count (seconds-to-minutes
    of audio — a pathological single object would switch to the E77
    grouped rank, same contract as everywhere)."""
    from pyspark.sql import Window

    from weatherflow_spark.multimodal.binary import multimodal_window_energy

    docs = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    wins = multimodal_window_energy(docs.repartition(par, F.col("doc_id")))
    act = wins.where(F.col("active") == 1)
    w = Window.partitionBy("doc_id").orderBy("widx")
    isl = act.withColumn("grp", F.col("widx") - F.row_number().over(w))
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("w_offset").cast("bigint").alias("seg_start"),
            F.max(F.col("w_offset") + F.col("w_len")).cast("bigint").alias(
                "seg_end"
            ),
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("energy").alias("energy"),
        )
        .select("doc_id", "seg_start", "seg_end", "n_windows", "energy")
    )


ORACLE_MEDIA_SEGMENTS = """
    WITH pos AS (
        SELECT doc_id, u.i AS i,
               CAST(ascii(substring(text, CAST(u.i AS INTEGER), 1)) AS BIGINT)
                   AS c
        FROM documents,
             LATERAL (SELECT unnest(generate_series(1, length(text))) AS i) u
        WHERE length(text) > 0
    ),
    wins AS (
        SELECT doc_id, CAST((i - 1) // 16 AS BIGINT) AS widx,
               CAST(sum(c * c) AS BIGINT) AS energy,
               CAST(count(*) AS BIGINT) AS w_len
        FROM pos GROUP BY doc_id, (i - 1) // 16
    ),
    tot AS (
        SELECT doc_id, CAST(sum(energy) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS nw
        FROM wins GROUP BY doc_id
    ),
    act AS (
        SELECT w.doc_id, w.widx, w.energy, w.w_len
        FROM wins w JOIN tot t USING (doc_id)
        WHERE w.energy * t.nw > t.total
    ),
    isl AS (
        SELECT doc_id, widx, energy, w_len,
               widx - row_number() OVER (PARTITION BY doc_id ORDER BY widx)
                   AS grp
        FROM act
    )
    SELECT doc_id,
           CAST(min(widx) * 16 AS BIGINT) AS seg_start,
           CAST(max(widx * 16 + w_len) AS BIGINT) AS seg_end,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(energy) AS BIGINT) AS energy
    FROM isl GROUP BY doc_id, grp
"""


# ---------------------------------------------------------------------------
# q_grouped_quantiles_udf — X3/E53: grouped-map applyInPandas
# ---------------------------------------------------------------------------

_QUANTILE_PCTS = (25, 50, 75, 95)
_GROUPED_Q_SCHEMA = (
    "source string, n long, " + ", ".join(f"p{p} long" for p in _QUANTILE_PCTS)
)


def _make_grouped_quantiles_fn() -> Callable:
    """Closure-built (pickles by VALUE — executors don't have the
    repo on sys.path; see _make_user_stats_fn / multimodal/binary.py
    for the precedent). Per-group EXACT order statistics: sort, then
    pick the value at integer index ((n−1)·pct)//100 — pure integer
    index arithmetic, no interpolation and no float percent math, so
    the DuckDB twin (1-based list index, same formula) is
    value-identical."""
    pcts = _QUANTILE_PCTS

    def grouped_quantiles(pdf):
        import pandas as pd

        v = sorted(int(x) for x in pdf["n_chars"])
        n = len(v)
        row = {"source": pdf["source"].iloc[0], "n": n}
        for p in pcts:
            row[f"p{p}"] = v[((n - 1) * p) // 100]
        return pd.DataFrame([row])

    return grouped_quantiles


def q_grouped_quantiles_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third sanctioned Python entry point — grouped-map
    ``applyInPandas`` (whole group in, whole result out; Arrow both
    ways): per-source exact length quantiles, the "custom per-group
    algorithm" shape (think per-group sklearn fit) that neither a
    scalar pandas_udf nor mapInPandas expresses.

    Scale contract: one shuffle on the group key and the ENTIRE group
    materializes in one worker's memory — correct only under the
    bounded-group assumption (sources here; a hot key needs the
    salted/two-phase path instead). Exact order statistics keep it
    hash-checkable where approx quantiles are rows-only."""
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    return docs.groupBy("source").applyInPandas(
        _make_grouped_quantiles_fn(), _GROUPED_Q_SCHEMA
    )


ORACLE_GROUPED_QUANTILES = f"""
    WITH g AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n,
               list(CAST(n_chars AS BIGINT) ORDER BY n_chars ASC) AS v
        FROM documents GROUP BY source
    )
    SELECT source, n,
           {", ".join(f"v[((n - 1) * {p}) // 100 + 1] AS p{p}"
                      for p in _QUANTILE_PCTS)}
    FROM g
"""


# ---------------------------------------------------------------------------
# q_udf_suite — certification row: all four Python entry points
# ---------------------------------------------------------------------------


def q_udf_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF-surface certification row: the vectorized scalar
    pandas_udf (X1), the 1→1 and 1→N mapInPandas multimodal paths
    (X2), and the grouped-map applyInPandas (X3), tagged and unioned
    in LONG format — (op, key, metric, value:bigint), doubles
    re-rounded to e6. One hash certifies that every sanctioned Python
    escape hatch computes exactly what the declarative path would.
    Union is plan-level only; singles stay registered in the tail."""
    pu = q_pandas_udf_metric(spark, sf_dir).selectExpr(
        "'pandas_udf' AS op",
        "cast(event_id as string) AS key",
        "stack(1, 'dew_point_e6', cast(floor(dew_point * 1e6 + 0.5) as bigint)) "
        "AS (metric, value)",
    )
    mf = q_multimodal_features(spark, sf_dir).selectExpr(
        "'mm_features' AS op",
        "cast(doc_id as string) AS key",
        "stack(3, 'n_bytes', cast(n_bytes as bigint), "
        "'header_byte', cast(header_byte as bigint), "
        "'checksum', checksum) AS (metric, value)",
    )
    fr = q_multimodal_frames(spark, sf_dir).selectExpr(
        "'mm_frames' AS op",
        "concat(cast(doc_id as string), '|', cast(frame_idx as string)) AS key",
        "stack(3, 'frame_offset', cast(frame_offset as bigint), "
        "'frame_len', cast(frame_len as bigint), "
        "'frame_hash', frame_hash) AS (metric, value)",
    )
    gq_stack = ", ".join(f"'p{p}', p{p}" for p in _QUANTILE_PCTS)
    gq = q_grouped_quantiles_udf(spark, sf_dir).selectExpr(
        "'grouped_quantiles' AS op",
        "source AS key",
        f"stack({1 + len(_QUANTILE_PCTS)}, 'n', n, {gq_stack}) "
        "AS (metric, value)",
    )
    # r9: the audio path (E87) — frame energy through the decode seam,
    # VAD-style islands in pure Catalyst.
    sg = q_media_segments(spark, sf_dir).selectExpr(
        "'mm_segments' AS op",
        "concat(cast(doc_id as string), '|', cast(seg_start as string)) AS key",
        "stack(3, 'seg_end', seg_end, 'n_windows', n_windows, "
        "'energy', energy) AS (metric, value)",
    )
    return (
        pu.unionByName(mf).unionByName(fr).unionByName(gq).unionByName(sg)
    )


def _oracle_udf_suite() -> str:
    gq_rows = "\n        UNION ALL\n".join(
        f"        SELECT 'grouped_quantiles', source, 'p{p}', p{p} FROM gq_side"
        for p in _QUANTILE_PCTS
    )
    return f"""
        WITH pu_side AS ({ORACLE_PANDAS_UDF_METRIC}),
        mf_side AS ({ORACLE_MULTIMODAL_FEATURES}),
        fr_side AS ({ORACLE_MULTIMODAL_FRAMES}),
        gq_side AS ({ORACLE_GROUPED_QUANTILES}),
        sg_side AS ({ORACLE_MEDIA_SEGMENTS})
        SELECT 'pandas_udf' AS op, CAST(event_id AS VARCHAR) AS key,
               'dew_point_e6' AS metric,
               CAST(floor(dew_point * 1e6 + 0.5) AS BIGINT) AS value
        FROM pu_side
        UNION ALL
        SELECT 'mm_features', CAST(doc_id AS VARCHAR), 'n_bytes',
               CAST(n_bytes AS BIGINT) FROM mf_side
        UNION ALL
        SELECT 'mm_features', CAST(doc_id AS VARCHAR), 'header_byte',
               CAST(header_byte AS BIGINT) FROM mf_side
        UNION ALL
        SELECT 'mm_features', CAST(doc_id AS VARCHAR), 'checksum',
               checksum FROM mf_side
        UNION ALL
        SELECT 'mm_frames',
               CAST(doc_id AS VARCHAR) || '|' || CAST(frame_idx AS VARCHAR),
               'frame_offset', CAST(frame_offset AS BIGINT) FROM fr_side
        UNION ALL
        SELECT 'mm_frames',
               CAST(doc_id AS VARCHAR) || '|' || CAST(frame_idx AS VARCHAR),
               'frame_len', CAST(frame_len AS BIGINT) FROM fr_side
        UNION ALL
        SELECT 'mm_frames',
               CAST(doc_id AS VARCHAR) || '|' || CAST(frame_idx AS VARCHAR),
               'frame_hash', frame_hash FROM fr_side
        UNION ALL
        SELECT 'grouped_quantiles', source, 'n', n FROM gq_side
        UNION ALL
{gq_rows}
        UNION ALL
        SELECT 'mm_segments',
               CAST(doc_id AS VARCHAR) || '|' || CAST(seg_start AS VARCHAR),
               'seg_end', seg_end FROM sg_side
        UNION ALL
        SELECT 'mm_segments',
               CAST(doc_id AS VARCHAR) || '|' || CAST(seg_start AS VARCHAR),
               'n_windows', n_windows FROM sg_side
        UNION ALL
        SELECT 'mm_segments',
               CAST(doc_id AS VARCHAR) || '|' || CAST(seg_start AS VARCHAR),
               'energy', energy FROM sg_side
    """


UDF_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_udf_suite": q_udf_suite,
    "q_pandas_udf_metric": q_pandas_udf_metric,
    "q_multimodal_features": q_multimodal_features,
    "q_multimodal_frames": q_multimodal_frames,
    "q_media_segments": q_media_segments,
    "q_grouped_quantiles_udf": q_grouped_quantiles_udf,
}

UDF_ORACLES: dict[str, str] = {
    "q_udf_suite": _oracle_udf_suite(),
    "q_pandas_udf_metric": ORACLE_PANDAS_UDF_METRIC,
    "q_multimodal_features": ORACLE_MULTIMODAL_FEATURES,
    "q_multimodal_frames": ORACLE_MULTIMODAL_FRAMES,
    "q_media_segments": ORACLE_MEDIA_SEGMENTS,
    "q_grouped_quantiles_udf": ORACLE_GROUPED_QUANTILES,
}
