"""Classifier calibration + AUC diagnostics (operators/diagnostics.py)
vs independent python re-implementations: bin placement and clamping,
exact ppm arithmetic, ECE weighting, tie-corrected AUC, NULL and
degenerate-corpus discipline."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark_unload_to_gcs_spark.operators.diagnostics import (  # noqa: E402
    calibration_bins,
    score_auc,
)


def _round_half_up_ppm(s):
    # mirrors Spark/DuckDB round(x * 1e6) HALF_UP on doubles
    import decimal

    return int(
        decimal.Decimal(s * 1_000_000.0).quantize(
            0, rounding=decimal.ROUND_HALF_UP
        )
    )


def _calib_model(rows, n_bins=10):
    bins = {}
    for score, label in rows:
        if score is None or label is None:
            continue
        b = min(max(int(score * n_bins // 1), 0), n_bins - 1)
        d = bins.setdefault(b, {"n": 0, "pos": 0, "conf": 0})
        d["n"] += 1
        d["pos"] += 1 if label else 0
        d["conf"] += _round_half_up_ppm(min(max(score, 0.0), 1.0))
    out = {}
    for b, d in bins.items():
        rate = d["pos"] * 1_000_000 // d["n"]
        conf = d["conf"] // d["n"]
        out[b] = {
            "bin_lo_ppm": b * 1_000_000 // n_bins,
            "n": d["n"],
            "positives": d["pos"],
            "pos_rate_ppm": rate,
            "confidence_ppm": conf,
            "gap_ppm": abs(rate - conf),
        }
    total = sum(d["n"] for d in out.values())
    ece = sum(d["gap_ppm"] * d["n"] for d in out.values()) // total
    for d in out.values():
        d["ece_ppm"] = ece
    return out


def _auc_model(rows, decimals=6):
    from collections import defaultdict

    buckets = defaultdict(lambda: [0, 0])
    for score, label in rows:
        if score is None or label is None:
            continue
        s = round(score, decimals)
        buckets[s][0 if label else 1] += 1
    pos = sum(v[0] for v in buckets.values())
    neg = sum(v[1] for v in buckets.values())
    if pos == 0 or neg == 0:
        auc = None
    else:
        acc, neg_below = 0, 0
        for s in sorted(buckets):
            p, n = buckets[s]
            acc += p * (2 * neg_below + n)
            neg_below += n
        auc = acc * 1_000_000 // (2 * pos * neg)
    return {
        "n_pos": pos,
        "n_neg": neg,
        "n_score_buckets": len(buckets),
        "auc_ppm": auc,
    }


_ROWS = [
    (0.05, False), (0.08, False), (0.15, False), (0.18, True),
    (0.32, False), (0.35, True), (0.55, True), (0.58, False),
    (0.72, True), (0.75, True), (0.78, False), (0.95, True),
    (0.97, True), (1.0, True),          # 1.0 clamps into the top bin
    (-0.2, False), (1.3, True),         # out-of-range clamp both ways
    (None, True), (0.5, None),          # excluded
    (0.55, True),                       # tie with an earlier score
]


def _run_calib(spark, rows, n_bins=10):
    df = spark.createDataFrame(rows, "score double, label boolean")
    return {
        r["bin"]: {k: v for k, v in r.asDict().items() if k != "bin"}
        for r in calibration_bins(
            df, "score", "label", n_bins=n_bins
        ).collect()
    }


def test_calibration_bins_match_model(spark):
    for n_bins in (10, 4, 1):
        assert _run_calib(spark, _ROWS, n_bins) == _calib_model(
            _ROWS, n_bins
        ), n_bins


def test_calibration_perfectly_calibrated_ece_zero(spark):
    # bins where confidence == observed rate exactly
    rows = (
        [(0.25, True)] + [(0.25, False)] * 3     # bin 2: rate 25%
        + [(0.75, True)] * 3 + [(0.75, False)]   # bin 7: rate 75%
    )
    got = _run_calib(spark, rows)
    assert got[2]["gap_ppm"] == 0
    assert got[7]["gap_ppm"] == 0
    assert got[2]["ece_ppm"] == 0


def test_score_auc_matches_model(spark):
    df = spark.createDataFrame(_ROWS, "score double, label boolean")
    got = score_auc(df, "score", "label").first().asDict()
    assert got == _auc_model(_ROWS)
    # sanity: better-than-random ordering on this fixture
    assert got["auc_ppm"] > 500_000


def test_score_auc_extremes(spark):
    # perfect separation -> 1e6; inverted -> 0; all-ties -> 500000
    perfect = [(0.9, True)] * 3 + [(0.1, False)] * 4
    inverted = [(0.1, True)] * 3 + [(0.9, False)] * 4
    ties = [(0.5, True)] * 3 + [(0.5, False)] * 4
    for rows, want in ((perfect, 1_000_000), (inverted, 0), (ties, 500_000)):
        df = spark.createDataFrame(rows, "score double, label boolean")
        assert score_auc(df, "score", "label").first()["auc_ppm"] == want


def test_score_auc_degenerate_is_null(spark):
    """P == 0 or N == 0 cannot grade an ordering — NULL, never a fake
    coin-flip 500000."""
    df = spark.createDataFrame(
        [(0.5, True), (0.9, True)], "score double, label boolean"
    )
    row = score_auc(df, "score", "label").first()
    assert row["auc_ppm"] is None
    assert row["n_neg"] == 0


def test_calibration_validations(spark):
    df = spark.createDataFrame([(0.5, True)], "score double, label boolean")
    with pytest.raises(ValueError):
        calibration_bins(df, "score", "label", n_bins=0)


def test_calibration_and_auc_fuzz(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    row = st.tuples(
        st.one_of(
            st.none(),
            st.floats(
                min_value=-0.5, max_value=1.5, allow_nan=False
            ).map(lambda x: round(x, 4)),
        ),
        st.one_of(st.none(), st.booleans()),
    )

    @settings(max_examples=6, deadline=None)
    @given(rows=st.lists(row, min_size=1, max_size=30))
    def run(rows):
        labeled = [
            r for r in rows if r[0] is not None and r[1] is not None
        ]
        df = spark.createDataFrame(rows, "score double, label boolean")
        if labeled:
            assert _run_calib(spark, rows, 5) == _calib_model(rows, 5)
        assert score_auc(df, "score", "label").first().asDict() == (
            _auc_model(rows)
        ), rows

    run()


def test_plans_stay_bounded(spark):
    """calibration: one groupBy + a window over <= n_bins rows;
    auc: bucket agg + cumulative window over the bucket frame +
    global agg. No Python stages either way."""
    df = spark.createDataFrame(
        [(0.5, True), (0.2, False)], "score double, label boolean"
    )
    for frame in (
        calibration_bins(df, "score", "label"),
        score_auc(df, "score", "label"),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan


def test_nan_scores_excluded_like_null(spark):
    """A NaN score passes isNotNull(); without the explicit isnan gate
    it lands in bin 0 with confidence_ppm 1,000,000 (greatest/least
    NaN ordering) — a fabricated max-confidence point — and inflates
    AUC bucket counts (ADVICE r13). NaN must behave exactly like NULL
    for both diagnostics."""
    nan = float("nan")
    clean = [(0.25, True), (0.75, False), (0.6, True)]
    for extra in ([(nan, True)], [(nan, False)], [(nan, True), (nan, False)]):
        noisy = clean + extra
        a = spark.createDataFrame(clean, "score double, label boolean")
        b = spark.createDataFrame(noisy, "score double, label boolean")
        assert (
            sorted(map(tuple, calibration_bins(a, "score", "label").collect()))
            == sorted(map(tuple, calibration_bins(b, "score", "label").collect()))
        )
        assert (
            score_auc(a, "score", "label").first().asDict()
            == score_auc(b, "score", "label").first().asDict()
        )
