"""Query plans: the engine's registered query surface.

``QUERIES`` maps query name → callable(spark, sf_dir) → DataFrame;
``ORACLES`` maps the same names to ANSI-SQL equivalents runnable by
DuckDB over the same parquet (the driver's correctness gate). Names
without an oracle entry get a rows-only check (approx / hash-seeded /
streaming operators).

Modules: ``queries`` (reference-fidelity scalar transforms),
``relational`` (joins/aggs/windows/sets/star schema), ``ext_text``
(E3 text analysis), ``ext_dedup`` (E1 dedup families),
``ext_similarity`` (E2 vector search), ``ext_udf`` (pandas_udf +
multimodal mapInPandas).
"""

from weatherflow_spark.plans.queries import QUERIES as _CORE, flagship
from weatherflow_spark.plans.relational import RELATIONAL_QUERIES
from weatherflow_spark.plans.oracles import ORACLES as _CORE_ORACLES
from weatherflow_spark.plans.ext_text import TEXT_QUERIES, TEXT_ORACLES
from weatherflow_spark.plans.ext_dedup import DEDUP_QUERIES, DEDUP_ORACLES
from weatherflow_spark.plans.ext_similarity import SIMILARITY_QUERIES, SIMILARITY_ORACLES
from weatherflow_spark.plans.ext_udf import UDF_QUERIES, UDF_ORACLES
from weatherflow_spark.plans.temporal import TEMPORAL_QUERIES, TEMPORAL_ORACLES
from weatherflow_spark.plans.advanced import ADVANCED_QUERIES, ADVANCED_ORACLES
from weatherflow_spark.plans.analytics import ANALYTICS_QUERIES, ANALYTICS_ORACLES
from weatherflow_spark.plans.iterative import ITERATIVE_QUERIES, ITERATIVE_ORACLES
from weatherflow_spark.plans.stats import STATS_QUERIES, STATS_ORACLES
from weatherflow_spark.plans.tpch import TPCH_QUERIES, TPCH_ORACLES

QUERIES = {
    **_CORE,
    **RELATIONAL_QUERIES,
    **TEMPORAL_QUERIES,
    **ADVANCED_QUERIES,
    **ANALYTICS_QUERIES,
    **ITERATIVE_QUERIES,
    **STATS_QUERIES,
    **TPCH_QUERIES,
    **TEXT_QUERIES,
    **DEDUP_QUERIES,
    **SIMILARITY_QUERIES,
    **UDF_QUERIES,
}

ORACLES = {
    **_CORE_ORACLES,
    **TEMPORAL_ORACLES,
    **ADVANCED_ORACLES,
    **ANALYTICS_ORACLES,
    **ITERATIVE_ORACLES,
    **STATS_ORACLES,
    **TPCH_ORACLES,
    **TEXT_ORACLES,
    **DEDUP_ORACLES,
    **SIMILARITY_ORACLES,
    **UDF_ORACLES,
}

__all__ = ["QUERIES", "ORACLES", "flagship"]
