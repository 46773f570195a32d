"""Exact bucketed percentiles + winsorized clip
(operators/diagnostics.py) vs an independent python model: lower-rank
(PERCENTILE_DISC) semantics, integer rank arithmetic, NULL/empty
discipline, unrounded pass-through of interior values."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark_unload_to_gcs_spark.operators.diagnostics import (  # noqa: E402
    exact_percentiles,
    winsorize,
)


def _pct_model(vals, ps):
    # test values carry <= 6 decimals, so rounding is the identity
    xs = sorted(v for v in vals if v is not None)
    n = len(xs)
    out = {}
    for p in ps:
        if n == 0:
            out[p] = {"value": None, "rank": None, "n": 0}
        else:
            r = max((p * n + 999_999) // 1_000_000, 1)
            out[p] = {"value": xs[r - 1], "rank": r, "n": n}
    return out


def _run_pct(spark, vals, ps):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    return {
        r["p_ppm"]: {
            "value": r["value"], "rank": r["rank"], "n": r["n"]
        }
        for r in exact_percentiles(df, "x", ps).collect()
    }


_VALS = [5.0, 1.0, 3.5, 2.25, None, 4.0, 2.25, 100.0, -7.5, 3.5]


def test_percentiles_match_model(spark):
    ps = [0, 100_000, 250_000, 500_000, 900_000, 1_000_000]
    got = _run_pct(spark, _VALS, ps)
    want = _pct_model(_VALS, ps)
    assert got == want
    # spot anchors on the 9 non-NULL values
    assert got[0]["value"] == -7.5        # rank 1
    assert got[500_000]["value"] == 3.5   # rank ceil(4.5)=5
    assert got[1_000_000]["value"] == 100.0


def test_percentiles_all_null_and_empty(spark):
    for vals in ([None, None], []):
        df = spark.createDataFrame(
            [(v,) for v in vals], "x double"
        )
        got = {
            r["p_ppm"]: r.asDict()
            for r in exact_percentiles(df, "x", [500_000]).collect()
        }
        assert got[500_000]["value"] is None
        assert got[500_000]["rank"] is None
        assert got[500_000]["n"] == 0


def test_percentiles_validations(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        exact_percentiles(df, "x", [])
    with pytest.raises(ValueError):
        exact_percentiles(df, "x", [1_000_001])
    with pytest.raises(ValueError):
        exact_percentiles(df, "x", [1, 1])


def test_percentiles_fuzz_matches_model(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    val = st.one_of(
        st.none(),
        st.integers(min_value=-50, max_value=50).map(
            lambda i: i / 4.0
        ),
    )

    @settings(max_examples=6, deadline=None)
    @given(
        vals=st.lists(val, min_size=1, max_size=30),
        ps=st.lists(
            st.integers(min_value=0, max_value=1_000_000),
            min_size=1, max_size=4, unique=True,
        ),
    )
    def run(vals, ps):
        assert _run_pct(spark, vals, ps) == _pct_model(vals, ps), (
            vals, ps,
        )

    run()


def test_winsorize_clips_at_exact_bounds(spark):
    # 11 values 0..9 + an outlier; p10=1.0 (rank ceil(1.2)=2), p90 at
    # rank ceil(10.8)=11 -> 1000.0? no: sorted 0..9,1000 -> rank 11 is
    # 1000. Use tighter bounds instead and assert via the model.
    vals = [float(i) for i in range(10)] + [1000.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    model = _pct_model(vals, [200_000, 800_000])
    lo, hi = model[200_000]["value"], model[800_000]["value"]
    got = {
        r["x"]: (r["x_winsor"], r["clipped"])
        for r in winsorize(
            df, "x", lo_ppm=200_000, hi_ppm=800_000
        ).collect()
    }
    for v in vals:
        want = min(max(v, lo), hi)
        assert got[v] == (want, v < lo or v > hi), v
    assert got[1000.0][0] == hi


def test_winsorize_null_and_degenerate(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (2.0,), (3.0,)], "x double"
    )
    rows = {
        r["x"]: r
        for r in winsorize(
            df, "x", lo_ppm=500_000, hi_ppm=500_000
        ).collect()
    }
    # lo == hi: everything clips to the median (rank ceil(1.5)=2 -> 2.0)
    assert rows[1.0]["x_winsor"] == 2.0 and rows[1.0]["clipped"]
    assert rows[3.0]["x_winsor"] == 2.0 and rows[3.0]["clipped"]
    assert rows[2.0]["x_winsor"] == 2.0 and not rows[2.0]["clipped"]
    assert rows[None]["x_winsor"] is None
    assert rows[None]["clipped"] is None
    with pytest.raises(ValueError):
        winsorize(df, "x", lo_ppm=600_000, hi_ppm=500_000)


def test_percentiles_plan_has_no_global_sort_of_data(spark):
    """The only ordered window runs over the rounded-value bucket
    frame; the data side is one groupBy. No Python stages."""
    df = spark.createDataFrame([(1.0,)], "x double")
    plan = (
        exact_percentiles(df, "x", [500_000])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_percentiles_by_group_matches_model(spark):
    from pyspark_unload_to_gcs_spark.operators.diagnostics import (
        exact_percentiles_by,
    )

    rows = [
        ("en", 1.0), ("en", 2.0), ("en", 3.0), ("en", 100.0),
        ("de", 5.0), ("de", None), ("de", 7.0),
        ("zz", None),            # all-NULL group: absent from output
        (None, 9.0), (None, 11.0),  # NULL group key is a group
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    ps = [0, 500_000, 1_000_000]
    got = {
        (r["g"], r["p_ppm"]): (r["value"], r["rank"], r["n"])
        for r in exact_percentiles_by(df, "g", "x", ps).collect()
    }
    by_g = {}
    for g, x in rows:
        if x is not None:
            by_g.setdefault(g, []).append(x)
    want = {}
    for g, xs in by_g.items():
        for p, d in _pct_model(xs, ps).items():
            want[(g, p)] = (d["value"], d["rank"], d["n"])
    assert got == want
    assert ("zz", 0) not in got
    assert got[("en", 500_000)] == (2.0, 2, 4)
    assert got[(None, 1_000_000)] == (11.0, 2, 2)


def test_percentiles_by_fuzz(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pyspark_unload_to_gcs_spark.operators.diagnostics import (
        exact_percentiles_by,
    )

    row = st.tuples(
        st.sampled_from(["a", "b", None]),
        st.one_of(
            st.none(),
            st.integers(min_value=-20, max_value=20).map(
                lambda i: i / 2.0
            ),
        ),
    )

    @settings(max_examples=6, deadline=None)
    @given(rows=st.lists(row, min_size=1, max_size=25))
    def run(rows):
        df = spark.createDataFrame(rows, "g string, x double")
        ps = [250_000, 750_000]
        got = {
            (r["g"], r["p_ppm"]): (r["value"], r["rank"], r["n"])
            for r in exact_percentiles_by(df, "g", "x", ps).collect()
        }
        by_g = {}
        for g, x in rows:
            if x is not None:
                by_g.setdefault(g, []).append(x)
        want = {
            (g, p): (d["value"], d["rank"], d["n"])
            for g, xs in by_g.items()
            for p, d in _pct_model(xs, ps).items()
        }
        assert got == want, rows

    run()


def test_percentiles_and_winsorize_nan_discipline(spark):
    """NaN is not a distribution point: it must not inflate n,
    surface as a high percentile, or get clipped into a fabricated
    concrete value (code-review regression)."""
    import math

    from pyspark_unload_to_gcs_spark.operators.diagnostics import (
        exact_percentiles_by,
    )

    nan = float("nan")
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (nan,)], "x double"
    )
    got = {
        r["p_ppm"]: r.asDict()
        for r in exact_percentiles(df, "x", [1_000_000]).collect()
    }
    assert got[1_000_000] == {
        "p_ppm": 1_000_000, "value": 2.0, "rank": 2, "n": 2
    }
    nan_row = [
        r for r in winsorize(
            df, "x", lo_ppm=0, hi_ppm=500_000
        ).collect()
        if r["x"] is not None and math.isnan(r["x"])
    ][0]
    assert math.isnan(nan_row["x_winsor"])
    assert nan_row["clipped"] is False
    # grouped variant shares the discipline
    gdf = spark.createDataFrame(
        [("a", 1.0), ("a", nan), ("b", nan)], "g string, x double"
    )
    grows = exact_percentiles_by(gdf, "g", "x", [500_000]).collect()
    assert {(r["g"], r["n"]) for r in grows} == {("a", 1)}


def test_percentiles_by_rejects_reserved_group_name(spark):
    from pyspark_unload_to_gcs_spark.operators.diagnostics import (
        exact_percentiles_by,
    )

    df = spark.createDataFrame([("a", 1.0)], "n string, x double")
    with pytest.raises(ValueError):
        exact_percentiles_by(df, "n", "x", [500_000])
