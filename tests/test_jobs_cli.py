"""End-to-end smoke of the CLI entry point (`python -m
weatherflow_spark.jobs`): one availableNow micro-batch must land all
five star tables in the warehouse with referential integrity."""

from __future__ import annotations

import os

from weatherflow_spark.jobs import main
from tests.conftest import SF_SMALL

STAR_TABLES = ("w_fact", "w_time_dim", "w_param_dim", "w_temp_dim",
               "w_heat_index_dim")


def test_cli_batch_run_builds_star(spark, tmp_path):
    wh = str(tmp_path / "warehouse")
    main(["--source", SF_SMALL, "--warehouse", wh,
          "--checkpoint", str(tmp_path / "ckpt")])

    n_events = spark.read.parquet(os.path.join(SF_SMALL, "events.parquet")).count()
    counts = {
        t: spark.read.parquet(os.path.join(wh, t)).count() for t in STAR_TABLES
    }
    assert all(c == n_events for c in counts.values()), counts
    fact = spark.read.parquet(os.path.join(wh, "w_fact"))
    time_dim = spark.read.parquet(os.path.join(wh, "w_time_dim"))
    assert fact.join(time_dim, "time_id", "inner").count() == n_events
