"""Shared pytest fixtures: one local SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from weatherflow_spark.session import get_spark

    import tempfile

    wh = tempfile.mkdtemp(prefix="wf-warehouse-")
    spark = get_spark(
        app_name="weatherflow-tests",
        shuffle_partitions=8,
        # static conf: bucketed saveAsTable targets (tests only)
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield spark
    spark.stop()
