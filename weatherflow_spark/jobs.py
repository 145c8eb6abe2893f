"""CLI job entry points (`python -m weatherflow_spark.jobs ...`).

The production runner the Airflow DAG (streaming/airflow_dag.py)
submits: batch mode executes one micro-batch of the reference
pipeline (extract → transform core → star load, the whole of
reference dags/etl.py as one Spark job); ``--streaming`` runs the
same core continuously under Structured Streaming with the
reference's 5-minute trigger cadence (etl.py:129).
"""

from __future__ import annotations

import argparse

from weatherflow_spark.session import get_spark


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="weatherflow_spark ETL runner")
    p.add_argument("--source", required=True, help="events source directory")
    p.add_argument("--warehouse", required=True, help="star-schema output directory")
    p.add_argument("--checkpoint", default=None, help="stream checkpoint dir")
    p.add_argument(
        "--streaming",
        action="store_true",
        help="run continuously (5-minute trigger) instead of one batch",
    )
    p.add_argument(
        "--quality-gate",
        action="store_true",
        help="block the load on the pinned-budget invariant gate "
        "(plans/quality.q_quality_gate): any hard-check violation in "
        "the source tables aborts with exit code 2 BEFORE anything "
        "is written",
    )
    p.add_argument(
        "--maintenance-every",
        type=int,
        default=None,
        metavar="N",
        help="run the between-loads maintenance pass "
        "(whlog.maintain_warehouse: segment-planned compaction, "
        "metadata re-cut load, load-aware vacuum) inside the sink "
        "after every Nth data load — at the 288-loads/day cadence the "
        "unbounded load history is what grows, so the stream bounds "
        "its own",
    )
    p.add_argument(
        "--keep-last-loads",
        type=int,
        default=None,
        metavar="K",
        help="maintenance vacuum retention: keep the last K warehouse "
        "loads (requires --maintenance-every)",
    )
    args = p.parse_args(argv)
    if args.keep_last_loads is not None and args.maintenance_every is None:
        p.error("--keep-last-loads requires --maintenance-every")
    if args.maintenance_every is not None and args.maintenance_every < 1:
        # a negative N makes (batch_id + 1) % N == 0 true for every
        # batch — reject the typo here too (r12 ADVICE)
        p.error("--maintenance-every must be >= 1")

    spark = get_spark(app_name="weatherflow-etl")

    if args.quality_gate:
        # The scheduler-gate story made executable (r9): the cheap
        # GATE_SECTIONS tier (< 1 s at sf0.1, budget-pinned in
        # tests/test_plans.py) runs first; a violated hard invariant
        # (pass = 0) aborts the job before the warehouse is touched.
        # The report is ~a dozen rows — the collect is bounded.
        import sys

        from weatherflow_spark.plans.quality import q_quality_gate

        failures = [
            (r.tbl, r.check, r.value)
            for r in q_quality_gate(spark, args.source).collect()
            if r["pass"] == 0
        ]
        if failures:
            for tbl, check, value in failures:
                print(f"QUALITY GATE FAILED: {tbl}.{check} = {value}",
                      file=sys.stderr)
            raise SystemExit(2)

    from weatherflow_spark.streaming.pipeline import weather_etl_stream

    trigger = (
        {"processingTime": "5 minutes"} if args.streaming else {"availableNow": True}
    )
    q = weather_etl_stream(
        spark,
        args.source,
        args.warehouse,
        args.checkpoint or f"{args.warehouse}/_checkpoint",
        trigger=trigger,
        maintenance_every=args.maintenance_every,
        maintenance_keep_last_loads=args.keep_last_loads,
    )
    q.awaitTermination()


if __name__ == "__main__":
    main()
