"""Post-export mixture audit (operators/sampling.py
``mix_deviation_report``) vs an independent python model: exact ppm
arithmetic, contamination strata, missing target strata, and the
shipped-gate scalar."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark_unload_to_gcs_spark.operators.sampling import (  # noqa: E402
    mix_deviation_report,
)


def _model(strata, targets):
    from collections import Counter

    n = Counter(strata)
    total = sum(n.values())
    keys = set(n) | set(targets)
    out = {}
    for k in keys:
        obs = n.get(k, 0) * 1_000_000 // max(total, 1)
        tgt = targets.get(k, 0)
        out[k] = {
            "n_docs": n.get(k, 0),
            "observed_ppm": obs,
            "target_ppm": tgt,
            "dev_ppm": obs - tgt,
            "abs_dev_ppm": abs(obs - tgt),
        }
    mx = max(v["abs_dev_ppm"] for v in out.values())
    for v in out.values():
        v["max_abs_dev_ppm"] = mx
    return out


def _run(spark, strata, targets):
    df = spark.createDataFrame([(s,) for s in strata], "source string")
    return {
        r["source"]: {
            k: v for k, v in r.asDict().items() if k != "source"
        }
        for r in mix_deviation_report(df, "source", targets).collect()
    }


def test_mix_deviation_matches_model(spark):
    strata = ["web"] * 70 + ["code"] * 20 + ["books"] * 10
    targets = {"web": 700_000, "code": 250_000, "books": 50_000}
    got = _run(spark, strata, targets)
    want = _model(strata, targets)
    assert got == want
    assert got["web"]["dev_ppm"] == 0
    assert got["code"]["dev_ppm"] == -50_000
    assert got["books"]["dev_ppm"] == 50_000
    assert got["web"]["max_abs_dev_ppm"] == 50_000


def test_mix_deviation_contamination_and_missing_source(spark):
    """A stratum not in the targets audits against 0 (contamination);
    a target stratum missing from the data emits an n_docs=0 row."""
    strata = ["web"] * 9 + ["spam"]
    targets = {"web": 900_000, "wiki": 100_000}
    got = _run(spark, strata, targets)
    want = _model(strata, targets)
    assert got == want
    assert got["spam"]["target_ppm"] == 0
    assert got["spam"]["dev_ppm"] == 100_000
    assert got["wiki"]["n_docs"] == 0
    assert got["wiki"]["dev_ppm"] == -100_000
    assert set(got) == {"web", "spam", "wiki"}


def test_mix_deviation_validation(spark):
    df = spark.createDataFrame([("a",)], "source string")
    with pytest.raises(ValueError):
        mix_deviation_report(df, "source", {"a": 1_000_001})


def test_mix_deviation_fuzz(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=6, deadline=None)
    @given(
        strata=st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=1, max_size=40
        ),
        targets=st.dictionaries(
            st.sampled_from(["a", "b", "d"]),
            st.integers(min_value=0, max_value=1_000_000),
            min_size=1,
            max_size=3,
        ),
    )
    def run(strata, targets):
        assert _run(spark, strata, targets) == _model(strata, targets)

    run()


def test_mix_deviation_plan_is_one_scan(spark):
    df = spark.createDataFrame([("a",)], "source string")
    plan = (
        mix_deviation_report(df, "source", {"a": 1_000_000})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_mix_deviation_rejects_fraction_targets(spark):
    """Fraction-style targets (0.7 instead of 700000 ppm) must raise,
    not int()-truncate to 0 and report fake contamination
    (code-review regression)."""
    df = spark.createDataFrame([("a",)], "source string")
    with pytest.raises(ValueError):
        mix_deviation_report(df, "source", {"a": 0.7})
    with pytest.raises(ValueError):
        mix_deviation_report(df, "source", {"a": True})
