"""Persisted IVF vector index — ANN serving without rescanning the
corpus (r9; the vector-tier member of the maintain-then-serve family:
sig_index.py for documents, the sketch cube for distincts, this for
embeddings).

``plans/ext_similarity.q_ann_ivf_topk`` certifies the IVF DECISION but
recomputes centroids and rescans every cell on each query. At 1e9
vectors that is a full-corpus pass per search; the deployable shape is
FAISS's: build the coarse quantizer ONCE, store each vector in its
cell, and serve a query by ranking the (tiny) centroid table and
scanning ONLY the probed cells. Layout (parquet):

- ``<path>/centroids``: (label, centroid array<double>) — one row per
  cell, integer-scaled means (the engine's order-independent centroid
  arithmetic, byte-identical to the one-shot query's).
- ``<path>/vectors``:   (vec_id, label, embedding) PARTITIONED BY
  label — the probe's ``label IN (...)`` predicate prunes to the
  probed cells at the FILE level, so a search reads ~n_probe/n_cells
  of the data (plan-audited: PartitionFilters carries the IN-list).

Certification: ``plans/serving.q_pipeline_suite``'s 'ann_serve'
branch builds the index and serves the standard query through it,
hash-matched against the EXACT SAME oracle as the one-shot
``q_ann_ivf_topk`` — index-served search is decision-identical to
recomputation, through real writes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def build_ivf_index(emb: DataFrame, path: str) -> None:
    """Materialize the two-table IVF index (overwrite). Centroid
    arithmetic mirrors q_ann_ivf_topk exactly: per-(cell, dim)
    integer-scaled sums → mean arrays — order-independent, so the
    stored centroids are byte-identical to a recompute."""
    from weatherflow_spark.plans.ext_similarity import CENTROID_SCALE

    flat = emb.select("label", F.posexplode("embedding").alias("pos", "x"))
    centroids = (
        flat.groupBy("label", "pos")
        .agg(
            F.sum(
                F.floor(F.col("x").cast("double") * CENTROID_SCALE).cast("long")
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, s, n))), "
                f"p -> cast(p.s as double) / ({float(CENTROID_SCALE)} * p.n))"
            ).alias("centroid")
        )
    )
    centroids.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    emb.select("vec_id", "label", "embedding").write.mode(
        "overwrite"
    ).partitionBy("label").parquet(os.path.join(path, "vectors"))


def search_ivf_index(
    spark: SparkSession,
    path: str,
    query: DataFrame,
    n_probe: int | None = None,
    top_k: int | None = None,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Serve one ANN query from the PERSISTED index: rank the stored
    centroid table by cosine to the query (tiny, broadcast), take the
    best ``n_probe`` cells, and scan ONLY those cells' partitions for
    the exact re-rank — the corpus outside the probed cells is never
    read (the literal IN-list reaches the scan as a PartitionFilter).
    ``query`` is a 1-row (q_emb array<double>) frame."""
    from weatherflow_spark.plans.ext_similarity import (
        N_PROBE,
        TOP_K,
        cosine_expr,
    )

    n_probe = N_PROBE if n_probe is None else n_probe
    top_k = TOP_K if top_k is None else top_k
    q = F.broadcast(query)
    centroids = spark.read.parquet(os.path.join(path, "centroids"))
    probed = [
        r.label
        for r in (
            centroids.crossJoin(q)
            .select(
                "label", F.expr(cosine_expr("centroid", "q_emb")).alias("c_cos")
            )
            .orderBy(F.desc("c_cos"), F.asc("label"))
            .limit(n_probe)
            .collect()
        )
    ]
    vectors = spark.read.parquet(os.path.join(path, "vectors")).where(
        F.col("label").isin(probed)  # partition-pruned: probed cells only
    )
    if exclude_vec_id is not None:
        vectors = vectors.where(F.col("vec_id") != exclude_vec_id)
    return (
        vectors.crossJoin(q)
        .select(
            "vec_id",
            "label",
            F.expr(cosine_expr("embedding", "q_emb")).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(top_k)
    )
