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


def test_cli_quality_gate_blocks_bad_load(spark, tmp_path):
    """r9: --quality-gate runs the pinned-budget invariant tier BEFORE
    the load — a clean source loads normally; a source with duplicated
    order pks aborts with exit code 2 and writes NOTHING."""
    import glob
    import shutil

    import pytest

    # clean source: gate passes, warehouse builds
    wh1 = str(tmp_path / "wh_ok")
    main(["--source", SF_SMALL, "--warehouse", wh1,
          "--checkpoint", str(tmp_path / "ck1"), "--quality-gate"])
    assert os.path.isdir(os.path.join(wh1, "w_fact"))

    # corrupted source: duplicate every order row (pk_dupes > 0)
    bad = tmp_path / "bad_sf"
    bad.mkdir()
    for f in glob.glob(os.path.join(SF_SMALL, "*.parquet")):
        shutil.copy(f, bad / os.path.basename(f))
    orders = spark.read.parquet(os.path.join(SF_SMALL, "orders.parquet"))
    orders.unionAll(orders).coalesce(1).write.mode("overwrite").parquet(
        str(bad / "orders.parquet")
    )
    wh2 = str(tmp_path / "wh_blocked")
    with pytest.raises(SystemExit) as exc:
        main(["--source", str(bad), "--warehouse", wh2,
              "--checkpoint", str(tmp_path / "ck2"), "--quality-gate"])
    assert exc.value.code == 2
    assert not os.path.exists(os.path.join(wh2, "w_fact"))  # nothing written


def test_cli_maintenance_flags(spark, tmp_path):
    """--maintenance-every wires the between-loads pass into the
    production runner; --keep-last-loads without it is refused."""
    import pytest

    from weatherflow_spark.operators.whlog import warehouse_loads

    wh = str(tmp_path / "wh_m")
    main(["--source", SF_SMALL, "--warehouse", wh,
          "--checkpoint", str(tmp_path / "ckm"),
          "--maintenance-every", "1", "--keep-last-loads", "1"])
    assert os.path.isdir(os.path.join(wh, "w_fact"))
    assert len(warehouse_loads(wh)) >= 1  # bounded, not emptied

    with pytest.raises(SystemExit):
        main(["--source", SF_SMALL, "--warehouse", wh,
              "--checkpoint", str(tmp_path / "ckm2"),
              "--keep-last-loads", "2"])

    # r12 ADVICE: a zero/negative cadence makes (batch_id + 1) % N == 0
    # true for every batch — reject at the CLI and in the topology.
    for bad in ("0", "-1"):
        with pytest.raises(SystemExit):
            main(["--source", SF_SMALL, "--warehouse", wh,
                  "--checkpoint", str(tmp_path / "ckm3"),
                  "--maintenance-every", bad])
    from weatherflow_spark.streaming.pipeline import weather_etl_stream

    with pytest.raises(ValueError, match="maintenance_every"):
        weather_etl_stream(
            spark, SF_SMALL, wh, str(tmp_path / "ckm4"),
            maintenance_every=-1,
        )
