"""Airflow DAG reproducing the reference topology — orchestration
only, zero logic in tasks (SURVEY §7 Phase 4).

The reference schedules extract >> [enrich_datetime,
add_calc_attributes] >> merge_transform >> load every 5 minutes
(reference dags/etl.py:125-159). In this engine the four transform
tasks collapse into ONE Spark job (a single narrow plan — see
streaming/pipeline.weather_transform_core), so the DAG body is a
single spark-submit; the fan-out/fan-in exists only in the
reference's process-per-task model, where every edge pays a JSON
round-trip through XCom (etl.py:18-21 etc.).

Import-gated: Airflow is not installed in the test container; this
file documents the production topology and is exercised only for
importability. The scheduled-batch style and Structured Streaming
with ``trigger(processingTime="5 minutes")`` (pipeline.py) are
equivalent runners of the same core — pick per deployment.
"""

from __future__ import annotations

try:
    from datetime import datetime, timedelta

    from airflow import DAG
    from airflow.operators.bash import BashOperator

    with DAG(
        dag_id="weatherflow_spark_etl",
        # reference cadence: etl.py:129 (5 minutes), etl.py:131 (no catchup)
        schedule=timedelta(minutes=5),
        start_date=datetime(2024, 1, 1),
        catchup=False,
    ) as dag:
        # One job replaces the reference's 4-task fan-out: Catalyst
        # already runs enrich ∥ calc inside one whole-stage-codegen
        # projection, and the keyed merge is a no-op on one lineage.
        run_pipeline = BashOperator(
            task_id="spark_weather_etl",
            bash_command=(
                "spark-submit --deploy-mode cluster "
                "-c spark.sql.session.timeZone=UTC "
                "-c spark.sql.adaptive.enabled=true "
                "-m weatherflow_spark.jobs "
                "--source {{ var.value.wf_source_dir }} "
                "--warehouse {{ var.value.wf_warehouse_dir }}"
            ),
        )
except ModuleNotFoundError:  # pragma: no cover - airflow absent in tests
    dag = None
