"""Replica of the driver's t2 gate at sf0.001: every registered query
must hash-match its DuckDB oracle (or at least run, for rows-only)."""

from __future__ import annotations

import pytest

from weatherflow_spark.plans import QUERIES
from weatherflow_spark.plans.parity import check_query
from tests.conftest import SF_SMALL


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(spark, name):
    rep = check_query(spark, name, SF_SMALL)
    assert rep.ok, str(rep)
