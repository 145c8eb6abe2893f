"""As-of / range join semantics on crafted rows (tie and no-match
edges that the synthetic events table doesn't pin down)."""

from __future__ import annotations

import datetime as dt

from weatherflow_spark.plans.temporal import q_asof_join, q_range_join


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_semantics(spark, tmp_path):
    rows = [
        # user 1: view@10, view@20, purchase@20 (tie→included), purchase@15
        (100, _t(10), 1, "view", 1.0, "{}"),
        (101, _t(20), 1, "view", 1.0, "{}"),
        (102, _t(20), 1, "purchase", 9.0, "{}"),
        (103, _t(15), 1, "purchase", 9.0, "{}"),
        # user 2: purchase with no prior view
        (200, _t(5), 2, "purchase", 9.0, "{}"),
        (201, _t(9), 2, "view", 1.0, "{}"),
        # user 1: two views at the SAME ts → max event_id wins
        (104, _t(30), 1, "view", 1.0, "{}"),
        (105, _t(30), 1, "view", 1.0, "{}"),
        (106, _t(31), 1, "purchase", 9.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    got = {r.purchase_id: r for r in q_asof_join(spark, str(tmp_path)).collect()}

    assert got[102].view_id == 101 and got[102].gap_s == 0   # tie at equal ts included
    assert got[103].view_id == 100 and got[103].gap_s == 5   # strictly-latest earlier view
    assert got[200].view_id is None and got[200].gap_s is None  # no prior view → NULL
    assert got[106].view_id == 105                            # same-ts views → max id


def test_range_join_counts_window(spark, tmp_path):
    rows = [
        (1, _t(0), 1, "click", 1.0, "{}"),     # 40s before → outside 30s? (30 MIN window: inside)
        (2, _t(30), 1, "click", 1.0, "{}"),
        (3, _t(40), 1, "purchase", 9.0, "{}"),
        (4, _t(40), 1, "click", 1.0, "{}"),    # at purchase ts → excluded (half-open)
        (5, _t(50), 2, "purchase", 9.0, "{}"), # other user: zero clicks
    ]
    _write_events(spark, tmp_path, rows)
    got = {r.purchase_id: r.n_clicks_30m for r in q_range_join(spark, str(tmp_path)).collect()}
    assert got[3] == 2   # clicks at t0 and t30 inside (40s < 30min); t40 excluded
    assert got[5] == 0   # left join keeps zero-click purchases
