"""Query plans: the engine's registered query surface.

``queries.QUERIES`` maps query name → callable(spark, sf_dir) →
DataFrame; ``oracles.ORACLES`` maps the same names to ANSI-SQL
equivalents runnable by DuckDB over the same parquet (the driver's
correctness gate). Names without an oracle entry get a rows-only
check (approx / hash-seeded / streaming operators).
"""

from weatherflow_spark.plans.queries import QUERIES, flagship
from weatherflow_spark.plans.relational import RELATIONAL_QUERIES
from weatherflow_spark.plans.oracles import ORACLES

QUERIES = {**QUERIES, **RELATIONAL_QUERIES}

__all__ = ["QUERIES", "ORACLES", "flagship"]
