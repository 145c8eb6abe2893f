"""The engine's second entry style: ANSI SQL over registered views.

The reference's only ad-hoc query path is raw SQL handed to MySQL
(reference dags/utils/database.py:16-23 — `execute(sql) -> DataFrame`);
SURVEY §3.3 commits this engine to exposing the same style through
``spark.sql()`` over temp views of the warehouse tables, alongside the
DataFrame API. Both styles compile to the same Catalyst plans, so
pushdown/broadcast/AQE behavior is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from weatherflow_spark.io import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Register every warehouse table under ``{prefix}{name}`` as a
    temp view (normalized exactly like :func:`io.load_table`, so SQL
    and DataFrame queries see identical schemas). Returns the view
    names registered."""
    names = []
    for t in TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            load_table(spark, sf_dir, t).createOrReplaceTempView(f"{prefix}{t}")
            names.append(f"{prefix}{t}")
    return names


def execute(spark: SparkSession, sql: str) -> DataFrame:
    """SQL string in, DataFrame out — the reference's
    ``MySQLHandler.execute`` surface on Catalyst (database.py:16-23),
    minus the injection-prone f-string interpolation (etl.py:105-120),
    which has no equivalent here: callers pass complete statements and
    parameterization belongs to the caller's binding layer."""
    return spark.sql(sql)
