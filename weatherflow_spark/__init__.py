"""weatherflow_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``pratik-choudhari/WeatherFlow`` project (an Airflow + pandas + MySQL
weather-ETL star-schema warehouse, see ``/root/reference``) as an
idiomatic Apache Spark engine:

- the reference's row-at-a-time pandas transforms (dags/etl.py:20-94)
  become vectorized Catalyst column expressions
  (:mod:`weatherflow_spark.functions`);
- its MySQL star-schema load (dags/etl.py:96-123) becomes a
  deterministic DataFrame star-build over Parquet
  (:mod:`weatherflow_spark.operators.star`);
- its 5-minute Airflow micro-batch loop (dags/etl.py:125-159) becomes
  Structured Streaming (:mod:`weatherflow_spark.streaming`);
- plus the large-scale training-data-pipeline extensions (dedup,
  similarity search, text analysis, multimodal columns) the star
  schema implies at 100 TB scale.

No code is copied from the reference; it is cited (file:line) in
docstrings as the behavioral specification only.
"""

__version__ = "0.1.0"

from weatherflow_spark.session import configure_session, get_spark
from weatherflow_spark.io import load_table, TABLES

__all__ = ["configure_session", "get_spark", "load_table", "TABLES", "__version__"]
