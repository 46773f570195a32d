"""Product-analytics operators: funnel, retention, rolling actives
(operators/product.py) on tiny hand-computable fixtures. Fixture-scale
oracle equivalence runs in test_oracle_parity.py."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from pyspark_unload_to_gcs_spark.operators.product import (
    funnel,
    retention_cohorts,
    rolling_active_users,
)

DAY = 86_400_000


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string")


def ts(day, hour=0):
    return datetime(2024, 1, day, hour)


def test_funnel_strict_order_first_touch(spark):
    ev = _events(
        spark,
        [
            # u1 completes all three in order
            (1, ts(1), "view"), (1, ts(2), "click"), (1, ts(3), "purchase"),
            # u2: click BEFORE view never counts; no click after view
            (2, ts(1), "click"), (2, ts(2), "view"), (2, ts(3), "purchase"),
            # u3: view only
            (3, ts(5), "view"),
            # u4: no view at all -> excluded entirely
            (4, ts(1), "click"), (4, ts(2), "purchase"),
            # u5: first-touch — the EARLIEST view gates, later repeats ignored
            (5, ts(1), "view"), (5, ts(2), "view"), (5, ts(3), "click"),
            (5, ts(4), "click"), (5, ts(5), "purchase"),
        ],
    )
    out = {r.user_id: r for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2, 3, 5}
    assert (out[1].step1_ms, out[1].step2_ms, out[1].step3_ms) != (None, None, None)
    assert out[1].step3_ms is not None
    assert out[2].step2_ms is None and out[2].step3_ms is None
    assert out[3].step2_ms is None
    # u5: step1 at day1, step2 at day3 (first click after view), step3 day5
    assert out[5].step1_ms < out[5].step2_ms < out[5].step3_ms


def test_funnel_same_timestamp_not_counted(spark):
    # click at exactly the view timestamp: strict > excludes it
    ev = _events(spark, [(1, ts(1), "view"), (1, ts(1), "click")])
    row = funnel(ev, ["view", "click"]).collect()[0]
    assert row.step1_ms is not None and row.step2_ms is None


def test_funnel_requires_two_steps(spark):
    with pytest.raises(ValueError):
        funnel(_events(spark, [(1, ts(1), "view")]), ["view"])


def test_retention_cohorts_counts(spark):
    # period = 7-day epoch buckets; 2024-01-01 is in period 2817 (day 19723)
    ev = _events(
        spark,
        [
            (1, ts(1), "view"),    # cohort P
            (1, ts(10), "view"),   # P+1
            (1, ts(24), "view"),   # P+3
            (2, ts(2), "click"),   # cohort P
            (3, ts(10), "view"),   # cohort P+1 (bucket = days Jan 4-10)
            (3, ts(9), "view"),    # same period — deduped
        ],
    )
    out = {(r.cohort_period - 2817, r.period_offset): r.n_users
           for r in retention_cohorts(ev, period_days=7).collect()}
    assert out[(0, 0)] == 2        # u1, u2 in their cohort period
    assert out[(0, 1)] == 1        # u1 returns next period
    assert out[(0, 3)] == 1        # u1 returns period+3
    assert out[(1, 0)] == 1        # u3's own cohort
    assert (1, 1) not in out


def test_rolling_active_users_window(spark):
    ev = _events(
        spark,
        [
            (1, ts(1), "view"),
            (2, ts(1), "view"),
            (1, ts(5), "view"),
            (3, ts(9), "view"),   # day 9: u1@5 within trailing 7 (days 3..9), u2@1 not
        ],
    )
    out = {r.day_num - 19723: (r.dau, r.wau)
           for r in rolling_active_users(ev, window_days=7).collect()}
    assert out[0] == (2, 2)   # day 1: u1, u2
    assert out[4] == (1, 2)   # day 5: dau u1; trailing includes day1 users
    assert out[8] == (1, 2)   # day 9: dau u3; u1@day5 in window, day1 aged out


def test_funnel_pre_epoch_timestamps(spark):
    # step 1 must be ungated: events before 1970 (negative epoch ms) count
    ev = _events(
        spark,
        [
            (1, datetime(1969, 12, 31, 23), "view"),
            (1, datetime(1970, 1, 1, 1), "click"),
        ],
    )
    row = funnel(ev, ["view", "click"]).collect()[0]
    assert row.step1_ms < 0 < row.step2_ms


def test_rolling_active_users_approx_close_to_exact(spark, sf_dir):
    import os

    from pyspark_unload_to_gcs_spark.operators.product import (
        rolling_active_users,
        rolling_active_users_approx,
    )
    from pyspark_unload_to_gcs_spark.sources.catalog import load_parquet

    ev = load_parquet(spark, os.path.join(sf_dir, "events.parquet"))
    exact = {r.day_num: (r.dau, r.wau) for r in rolling_active_users(ev).collect()}
    approx = {r.day_num: (r.dau_approx, r.wau_approx)
              for r in rolling_active_users_approx(ev).collect()}
    assert set(approx) == set(exact)  # same observed-day set
    for d, (dau, wau) in exact.items():
        da, wa = approx[d]
        assert abs(da - dau) <= max(2, 0.05 * dau), (d, dau, da)
        assert abs(wa - wau) <= max(2, 0.05 * wau), (d, wau, wa)


def test_growth_accounting_lifecycle(spark):
    from pyspark_unload_to_gcs_spark.operators.product import growth_accounting

    # periods (7-day buckets): P=2817 covers Jan 1-3; P+1 Jan 4-10; P+2 Jan 11-17; P+3 Jan 18-24
    ev = _events(
        spark,
        [
            (1, ts(1), "view"),    # u1: P, P+1, skips P+2, back P+3 (resurrected)
            (1, ts(5), "view"),
            (1, ts(20), "view"),
            (2, ts(2), "view"),    # u2: P only -> churns at P+1
            (3, ts(6), "view"),    # u3: new at P+1, retained P+2
            (3, ts(12), "view"),
        ],
    )
    out = {r.period - 2817: (r.n_new, r.n_retained, r.n_resurrected, r.n_churned)
           for r in growth_accounting(ev, period_days=7).collect()}
    assert out[0] == (2, 0, 0, 0)          # u1, u2 new
    assert out[1] == (1, 1, 0, 1)          # u3 new, u1 retained, u2 churned
    assert out[2] == (0, 1, 0, 1)          # u3 retained, u1 churned (absent P+2)
    assert out[3] == (0, 0, 1, 1)          # u1 resurrected; u3 churned
    # u1's final churn at P+4 is outside observed periods -> absent
    assert 4 not in out
