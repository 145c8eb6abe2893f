"""Behavioral tests for the event-stream analytics (funnel ordering,
cohort retention offsets) on crafted events where conversion is
partial — the sf testdata is dense enough that every user converts,
which would let an ordering bug pass unnoticed."""

from __future__ import annotations

from datetime import datetime

from weatherflow_spark.plans.analytics import q_funnel, q_retention


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, ts, uid, et, 1.0, "{}") for i, (ts, uid, et) in enumerate(rows)],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_funnel_requires_stage_order(spark, tmp_path):
    t = lambda h: datetime(2024, 1, 1, h)  # noqa: E731
    rows = [
        # user 1: signup → click → purchase, in order → full conversion
        (t(1), 1, "signup"), (t(2), 1, "click"), (t(3), 1, "purchase"),
        # user 2: purchase BEFORE any click → stops at stage 2
        (t(1), 2, "signup"), (t(2), 2, "purchase"), (t(3), 2, "click"),
        # user 3: click/purchase but never signed up → not in the funnel
        (t(1), 3, "click"), (t(2), 3, "purchase"),
        # user 4: click before signup only → stops at stage 1
        (t(1), 4, "click"), (t(2), 4, "signup"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {r.stage: r for r in q_funnel(spark, sf).collect()}
    assert out["1_signup"].n_users == 3          # users 1, 2, 4
    assert out["2_click_after_signup"].n_users == 2   # users 1, 2
    assert out["3_purchase_after_click"].n_users == 1  # user 1 only
    assert out["1_signup"].conv_vs_first == 1.0
    assert out["3_purchase_after_click"].conv_vs_first == 0.333333


def test_retention_offsets_and_counts(spark, tmp_path):
    d = lambda day, uid, h=9: (datetime(2024, 1, day, h), uid, "view")  # noqa: E731
    rows = [
        d(1, 1), d(2, 1), d(4, 1),   # user 1: cohort Jan 1, back days 1 and 3
        d(1, 2),                      # user 2: cohort Jan 1, never returns
        d(2, 3), d(3, 3),             # user 3: cohort Jan 2, back day 1
        d(1, 1, 23),                  # same-day repeat must not double count
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        (r.cohort_date, r.day_offset): r.n_active
        for r in q_retention(spark, sf).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-02", 0): 1,
        ("2024-01-02", 1): 1,
    }
