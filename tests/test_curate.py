"""End-to-end corpus curation pipeline: the composed release job must
apply exactly the certified per-stage verdicts, write a readable
curated corpus, and report a monotone stage funnel."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from weatherflow_spark.curate import curate_corpus, main
from weatherflow_spark.io import load_table
from weatherflow_spark.plans.ext_dedup import q_dedup_exact
from weatherflow_spark.plans.ext_text import q_perplexity_filter, q_quality_filter
from tests.conftest import SF_SMALL


def test_curate_funnel_matches_certified_verdicts(spark, tmp_path):
    out = str(tmp_path / "release")
    funnel = curate_corpus(spark, SF_SMALL, out)

    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert funnel["n_input"] == n_docs
    # monotone funnel, nothing invented
    assert (
        funnel["n_input"]
        >= funnel["n_after_dedup"]
        >= funnel["n_after_quality"]
        >= funnel["n_after_perplexity"]
        > 0
    )
    # survivors must be exactly the intersection of the certified
    # verdict tables, recomputed independently here
    keep = {
        r.doc_id
        for r in q_dedup_exact(spark, SF_SMALL)
        .select(F.col("keep_doc_id").alias("doc_id"))
        .collect()
    }
    keep &= {
        r.doc_id
        for r in q_quality_filter(spark, SF_SMALL).where("keep").collect()
    }
    keep &= {
        r.doc_id
        for r in q_perplexity_filter(spark, SF_SMALL).where("keep = 1").collect()
    }
    curated = spark.read.parquet(f"{out}/curated")
    got_ids = {r.doc_id for r in curated.select("doc_id").collect()}
    assert got_ids == keep
    assert funnel["n_after_perplexity"] == len(keep)
    # report written and consistent
    rep = {
        r.stage: r.n_docs
        for r in spark.read.parquet(f"{out}/report").collect()
    }
    assert rep == funnel
    # schema contract: text present, recomputed length column
    row = curated.orderBy("doc_id").first()
    assert row.n_chars == len(row.text)
    # release splits: every survivor carries the certified E62
    # assignment, which is computed over the FULL corpus — identical
    # doc_id -> split mapping as the standalone query
    from weatherflow_spark.plans.ext_text import q_train_split

    want_split = {
        r.doc_id: r.split for r in q_train_split(spark, SF_SMALL).collect()
    }
    got_split = {r.doc_id: r.split for r in curated.select("doc_id", "split").collect()}
    assert got_split == {d: want_split[d] for d in got_ids}
    assert set(got_split.values()) <= {"train", "val", "test"}


def test_curate_cli_entry(spark, tmp_path):
    out = str(tmp_path / "cli_release")
    main(["--source", SF_SMALL, "--out", out])
    assert spark.read.parquet(f"{out}/curated").count() > 0


def test_curate_shard_export_final_mile(spark, tmp_path):
    """r9: --shards finishes the release with the E85 deterministic
    export of the CURATED corpus — every curated doc lands in exactly
    one shard, within-shard positions are dense 1..n, and the shard
    assignment is a pure function of doc_id (re-running produces the
    identical layout)."""
    out = str(tmp_path / "rel")
    curate_corpus(spark, SF_SMALL, out, n_shards=4)
    curated = spark.read.parquet(f"{out}/curated")
    shards = spark.read.parquet(f"{out}/shards")

    assert shards.count() == curated.count()
    assert shards.select("doc_id").distinct().count() == curated.count()
    assert shards.select("shard_id").distinct().count() <= 4
    # dense 1..n positions per shard
    from pyspark.sql import functions as F

    per = shards.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
        F.countDistinct("pos").alias("npos"),
    )
    for r in per.collect():
        assert (r.lo, r.hi, r.npos) == (1, r.n, r.n), r
    # determinism + rerun safety: re-exporting INTO THE EXISTING dir
    # (the CLI-run-twice case) must not raise path-already-exists and
    # must reproduce the identical layout, and a re-export with fewer
    # shards must leave no stale shard dirs behind (static overwrite).
    first = {
        r.doc_id: (r.shard_id, r.pos) for r in shards.collect()
    }
    from weatherflow_spark.plans.serving import export_shards

    export_shards(curated, f"{out}/shards", 4)
    again = {
        r.doc_id: (r.shard_id, r.pos)
        for r in spark.read.parquet(f"{out}/shards").collect()
    }
    assert again == first
    export_shards(curated, f"{out}/shards", 2)
    slim = spark.read.parquet(f"{out}/shards")
    assert slim.count() == curated.count()
    assert slim.select("shard_id").distinct().count() <= 2
