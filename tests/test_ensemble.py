"""Multi-signal quality ensemble (operators/quality_filters.py
``ensemble_quality_score``) vs an independent python model: z-score
arithmetic under the DECIMAL discipline, NULL-neutral signals,
constant-signal suppression, weight validation."""

import decimal
import math
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark_unload_to_gcs_spark.operators.quality_filters import (  # noqa: E402
    ensemble_quality_score,
)


def _r(x, n):
    return float(
        decimal.Decimal(x).quantize(
            decimal.Decimal(1).scaleb(-n),
            rounding=decimal.ROUND_HALF_UP,
        )
    )


def _model(rows, cols, ws):
    stats = []
    for i, _ in enumerate(cols):
        xs = [
            decimal.Decimal(str(_r(r[i], 6)))
            for r in rows
            if r[i] is not None
        ]
        n = max(len(xs), 1)
        s = sum(xs, decimal.Decimal(0))
        q = sum((x * x for x in xs), decimal.Decimal(0))
        mean = decimal.Decimal(str(_r(s / n, 9)))
        var = decimal.Decimal(str(_r(q / n - mean * mean, 9)))
        std = _r(math.sqrt(float(max(var, 0))), 6)
        stats.append((mean, std))
    out = []
    for r in rows:
        score, present = 0.0, 0
        for i, w in enumerate(ws):
            mean, std = stats[i]
            if r[i] is not None and std > 0:
                x = decimal.Decimal(str(_r(r[i], 6)))
                score += w * (float(x - mean) / std)
            if r[i] is not None:
                present += 1
        out.append((score, present))
    return out


def test_ensemble_matches_model(spark):
    rows = [
        (0.9, -2.5, 100.0), (0.1, -5.0, 10.0), (0.5, -3.0, None),
        (None, -4.0, 50.0), (0.7, None, 30.0), (0.3, -3.5, 70.0),
    ]
    cols = ["a", "b", "c"]
    ws = [2, 1, 3]
    df = spark.createDataFrame(
        [(i,) + r for i, r in enumerate(rows)],
        "id long, a double, b double, c double",
    )
    got = {
        r["id"]: (r["ensemble_score"], r["signals_present"])
        for r in ensemble_quality_score(df, cols, weights=ws).collect()
    }
    want = _model(rows, cols, ws)
    for i in range(len(rows)):
        assert got[i][1] == want[i][1], i
        assert got[i][0] == pytest.approx(want[i][0], abs=1e-12), i


def test_ensemble_constant_signal_contributes_zero(spark):
    df = spark.createDataFrame(
        [(1, 0.9, 5.0), (2, 0.1, 5.0), (3, 0.5, 5.0)],
        "id long, a double, flat double",
    )
    both = {
        r["id"]: r["ensemble_score"]
        for r in ensemble_quality_score(df, ["a", "flat"]).collect()
    }
    only_a = {
        r["id"]: r["ensemble_score"]
        for r in ensemble_quality_score(df, ["a"]).collect()
    }
    assert both == only_a


def test_ensemble_ranks_by_quality(spark):
    """Higher signals everywhere => higher combined score; the weights
    steer which signal dominates a conflict."""
    df = spark.createDataFrame(
        [(1, 0.9, 0.9), (2, 0.1, 0.1), (3, 0.9, 0.1), (4, 0.1, 0.9)],
        "id long, a double, b double",
    )
    s = {
        r["id"]: r["ensemble_score"]
        for r in ensemble_quality_score(
            df, ["a", "b"], weights=[3, 1]
        ).collect()
    }
    assert s[1] > s[3] > s[4] > s[2]


def test_ensemble_validations(spark):
    df = spark.createDataFrame([(0.5,)], "a double")
    with pytest.raises(ValueError):
        ensemble_quality_score(df, [])
    with pytest.raises(ValueError):
        ensemble_quality_score(df, ["a"], weights=[1, 2])
    with pytest.raises(ValueError):
        ensemble_quality_score(df, ["a"], weights=[0.5])


def test_ensemble_plan_one_agg_plus_broadcast(spark):
    df = spark.createDataFrame([(0.5, 0.5)], "a double, b double")
    plan = (
        ensemble_quality_score(df, ["a", "b"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    # the 1-row stats frame joins via broadcast nested loop (a true
    # cross join of one row) — the data side is never shuffled
    assert plan.count("Exchange") <= 2


def test_ensemble_small_scale_signal_still_ranks(spark):
    """Signals in [0, 0.001] (defect rates, boundary probabilities):
    the sum-of-squares must stay exact DECIMAL — the old (28,12)
    square clipped to scale 6, zeroed the variance, and the signal
    silently could not rank (code-review regression)."""
    rows = [(1, 0.000123), (2, 0.000456), (3, 0.000789)]
    df = spark.createDataFrame(rows, "id long, a double")
    s = {
        r["id"]: r["ensemble_score"]
        for r in ensemble_quality_score(df, ["a"]).collect()
    }
    assert s[1] < s[2] < s[3]
    assert s[3] > 0.5  # a real z, not a degenerate 0.0
    want = _model([(v,) for _, v in rows], ["a"], [1])
    for i, (rid, _) in enumerate(rows):
        assert s[rid] == pytest.approx(want[i][0], abs=1e-9), rid


def test_ensemble_nan_is_absent_not_poisonous(spark):
    """A NaN signal must behave exactly like NULL: z = 0 for that
    row, excluded from the signal's corpus stats, not counted
    present — one upstream 0/0 must not NULL the row's score or bias
    every other row's mean (code-review regression)."""
    nan = float("nan")
    with_nan = [(1, 1.0), (2, 2.0), (3, nan)]
    with_null = [(1, 1.0), (2, 2.0), (3, None)]
    out = {}
    for tag, rows in (("nan", with_nan), ("null", with_null)):
        df = spark.createDataFrame(rows, "id long, a double")
        out[tag] = {
            r["id"]: (r["ensemble_score"], r["signals_present"])
            for r in ensemble_quality_score(df, ["a"]).collect()
        }
    assert out["nan"] == out["null"]
    assert out["nan"][3] == (0.0, 0)
    assert out["nan"][1][0] < 0 < out["nan"][2][0]


def test_ensemble_overflow_is_loud_not_silent(spark):
    """The binding input bound is the MEAN's DECIMAL(18,9) cast:
    |mean| >= 1e9 overflows to NULL under non-ANSI casts and used to
    silently NULL every row's score (ADVICE r13). The stats leg now
    asserts and the job fails with a named error instead. Under ANSI
    mode (this engine's Spark 4 default) the decimal cast itself
    raises first — loud either way; the tripwire is the non-ANSI
    backstop."""
    from pyspark.errors.exceptions.captured import (
        ArithmeticException,
        SparkRuntimeException,
    )

    df = spark.createDataFrame(
        [(1, 2.0e9), (2, 2.0e9 + 1.0)], "id long, a double"
    )
    with pytest.raises(ArithmeticException, match="NUMERIC_VALUE_OUT_OF_RANGE"):
        ensemble_quality_score(df, ["a"]).collect()
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(
            (SparkRuntimeException, Exception), match="overflowed the decimal"
        ):
            ensemble_quality_score(df, ["a"]).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)
    # just inside the bound still scores (and an all-NULL signal is
    # legitimately NULL-stats without tripping the tripwire)
    ok = spark.createDataFrame(
        [(1, 9.0e8, None), (2, -9.0e8, None)],
        "id long, a double, b double",
    )
    rows = {
        r["id"]: (r["ensemble_score"], r["signals_present"])
        for r in ensemble_quality_score(ok, ["a", "b"]).collect()
    }
    assert rows[1][0] > 0 > rows[2][0]
    assert rows[1][1] == 1
