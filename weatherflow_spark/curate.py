"""End-to-end corpus curation job (`python -m weatherflow_spark.curate`).

The full training-data release pipeline as ONE Spark job, chaining
the certified operators in the order a real release runs them:

    1. exact dedup          (q_dedup_exact survivors — keep-first)
    2. Gopher quality rules (q_quality_filter verdicts)
    3. perplexity cut       (q_perplexity_filter per-source p90)
    4. PII redaction        (the redact expression over the kept text)
    5. stable train/val/test split (q_train_split over the FULL
       corpus, so split membership survives re-curation)
    6. write curated parquet + a stage-funnel report

Each stage's verdict table comes from the same plan builders the
driver hash-certifies, so the pipeline's selections are exactly the
certified semantics — this module only composes them (semi-joins on
doc_id) and writes the results. Scale posture: verdict tables carry
(doc_id) only; the full text rides through a single final semi-joined
scan, so no stage shuffles document bodies except the one write.
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession, functions as F

from weatherflow_spark.io import load_table, write_table
from weatherflow_spark.plans.ext_dedup import q_dedup_exact
from weatherflow_spark.plans.ext_text import (
    PII_EMAIL_RE,
    PII_IPV4_RE,
    PII_PHONE_RE,
    q_perplexity_filter,
    q_quality_filter,
    q_train_split,
)


def redact_text(col: F.Column) -> F.Column:
    """The production redaction expression (same patterns the
    certified q_pii_redact applies to its injected twin)."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(col, PII_EMAIL_RE, "[EMAIL]"),
            PII_IPV4_RE,
            "[IP]",
        ),
        PII_PHONE_RE,
        "[PHONE]",
    )


def curate_corpus(
    spark: SparkSession, sf_dir: str, out_dir: str, n_shards: int = 0
) -> dict[str, int]:
    """Run the release pipeline; returns the stage funnel counts and
    writes ``curated`` (parquet) plus ``report`` under ``out_dir``."""
    from weatherflow_spark.operators.caching import release_caches, tracked_persist

    docs = load_table(spark, sf_dir, "documents")

    # Persist each verdict id-set: they are doc_id-only (tiny), but
    # their LINEAGE is the expensive part — the exact-dedup group-by,
    # the Gopher rules, and the perplexity LM's token exchange. The
    # job runs five actions (four funnel counts + the write); without
    # these persists every action re-derived all three pipelines
    # (~5x the work, VERDICT r6 What's wrong #4 / ADVICE).
    dedup_keep = tracked_persist(
        q_dedup_exact(spark, sf_dir).select(F.col("keep_doc_id").alias("doc_id"))
    )
    qual_keep = tracked_persist(
        q_quality_filter(spark, sf_dir).where(F.col("keep")).select("doc_id")
    )
    ppl_keep = tracked_persist(
        q_perplexity_filter(spark, sf_dir)
        .where(F.col("keep") == 1)
        .select("doc_id")
    )

    stage1 = docs.join(dedup_keep, "doc_id", "left_semi")
    stage2 = stage1.join(qual_keep, "doc_id", "left_semi")
    stage3 = stage2.join(ppl_keep, "doc_id", "left_semi")

    # Release splits come from the certified E62 assignment, computed
    # over the FULL corpus (pre-filter) so a document's split is a
    # stable function of (doc_id, source) — re-running curation with
    # different filters can never migrate a doc between train and
    # eval (the leakage rule every release pipeline must hold).
    splits = q_train_split(spark, sf_dir).select("doc_id", "split")
    curated = (
        stage3.select(
            "doc_id",
            "source",
            "lang",
            redact_text(F.col("text")).alias("text"),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .join(splits, "doc_id")
    )

    try:
        funnel = {
            "n_input": docs.count(),
            "n_after_dedup": stage1.count(),
            "n_after_quality": stage2.count(),
            "n_after_perplexity": stage3.count(),
        }
        write_table(curated, f"{out_dir}/curated")
        if n_shards:
            # Final mile (r9): the E85 deterministic shuffle-and-shard
            # export of the CURATED corpus — the same shared operator
            # the driver hash-certifies (plans/serving.export_shards).
            from weatherflow_spark.plans.serving import export_shards

            export_shards(
                spark.read.parquet(f"{out_dir}/curated"),
                f"{out_dir}/shards",
                n_shards,
            )
    finally:
        release_caches()
    report = spark.createDataFrame(
        [(k, v) for k, v in funnel.items()], "stage string, n_docs long"
    )
    write_table(report, f"{out_dir}/report")
    return funnel


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="corpus curation pipeline")
    p.add_argument("--source", required=True, help="input sf dir (documents.parquet)")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument(
        "--shards",
        type=int,
        default=0,
        help="also write the curated corpus as N deterministically "
        "shuffled training shards (E85 export; 0 = skip)",
    )
    args = p.parse_args(argv)

    from weatherflow_spark.session import get_spark

    spark = get_spark(app_name="weatherflow-curate")
    funnel = curate_corpus(spark, args.source, args.out, args.shards)
    for stage, n in funnel.items():
        print(f"{stage}: {n}")


if __name__ == "__main__":
    main()
