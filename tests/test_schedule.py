"""Token-budget epoch scheduling and domain-fair quality keep
(operators/sampling.py) vs independent python re-implementations:
exact budget fill, max_epochs caps, weight overrides, closure crumbs,
floor-ppm keep rule, NULL-score ordering."""

import sys
from collections import Counter
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark_unload_to_gcs_spark.operators.sampling import (  # noqa: E402
    domain_fair_keep,
    repeat_epoch_schedule,
)


def _schedule_model(docs, budget, max_epochs=4, weights=None, rounds=3):
    """Independent python twin of repeat_epoch_schedule over
    [(domain, tokens)]."""
    avail = Counter()
    for d, t in docs:
        avail[d] += t
    w = {
        d: (weights[d] if weights and d in weights else avail[d])
        for d in avail
    }
    cap = {d: avail[d] * max_epochs for d in avail}
    served = dict.fromkeys(avail, 0)
    for _ in range(rounds):
        active = [d for d in avail if cap[d] - served[d] > 0]
        W = sum(w[d] for d in active)
        B = budget - sum(served.values())
        if W > 0 and B > 0:
            for d in active:
                served[d] += min(cap[d] - served[d], (B * w[d]) // W)
    left = budget - sum(served.values())
    csum = 0
    for d in sorted(avail, key=lambda d: (-w[d], d)):
        room = cap[d] - served[d]
        if room > 0:
            if left > 0:
                served[d] += min(room, max(left - csum, 0))
            csum += room
    total = sum(served.values())
    return {
        d: {
            "avail_tokens": avail[d],
            "cap_tokens": cap[d],
            "served_tokens": served[d],
            "epochs_ppm": served[d] * 1_000_000 // max(avail[d], 1),
            "share_ppm": served[d] * 1_000_000 // max(total, 1),
        }
        for d in avail
    }


def _run_schedule(spark, docs, **kw):
    df = spark.createDataFrame(docs, "domain string, tokens long")
    weights = kw.pop("weights", None)
    wdf = (
        spark.createDataFrame(
            list(weights.items()), "domain string, weight long"
        )
        if weights
        else None
    )
    out = repeat_epoch_schedule(
        df, "domain", "tokens", weights=wdf, **kw
    )
    return {
        r["domain"]: {
            k: v for k, v in r.asDict().items() if k != "domain"
        }
        for r in out.collect()
    }


_DOCS = [
    ("web", 700), ("web", 300),      # 1000 avail
    ("code", 100), ("code", 100),    # 200 avail
    ("books", 50),                   # 50 avail
]


def test_schedule_fills_budget_exactly_when_supply_allows(spark):
    got = _run_schedule(spark, _DOCS, budget=2000, max_epochs=4)
    want = _schedule_model(_DOCS, budget=2000)
    assert got == want
    assert sum(v["served_tokens"] for v in got.values()) == 2000
    # natural proportions: web gets the lion's share
    assert got["web"]["served_tokens"] > got["code"]["served_tokens"]


def test_schedule_caps_at_max_epochs_when_budget_exceeds_supply(spark):
    # supply = (1000+200+50)*2 = 2500 < budget
    got = _run_schedule(spark, _DOCS, budget=10_000, max_epochs=2)
    want = _schedule_model(_DOCS, budget=10_000, max_epochs=2)
    assert got == want
    for d in got:
        assert got[d]["served_tokens"] == got[d]["cap_tokens"]
        assert got[d]["epochs_ppm"] == 2_000_000


def test_schedule_saturated_domain_redistributes(spark):
    """A tiny high-weight domain hits its epoch cap; the freed budget
    water-fills into the others instead of vanishing."""
    weights = {"books": 1000, "web": 1, "code": 1}
    got = _run_schedule(
        spark, _DOCS, budget=2000, max_epochs=4, weights=weights
    )
    want = _schedule_model(_DOCS, budget=2000, weights=weights)
    assert got == want
    assert got["books"]["served_tokens"] == 200  # 50 * 4, saturated
    assert sum(v["served_tokens"] for v in got.values()) == 2000


def test_schedule_weight_fallback_and_zero_weight(spark):
    """Domains missing from the weights frame fall back to natural
    availability; an all-crumbs zero-weight domain only fills via the
    greedy closure."""
    weights = {"code": 0}
    got = _run_schedule(
        spark, _DOCS, budget=5000, max_epochs=4, weights=weights
    )
    want = _schedule_model(_DOCS, budget=5000, weights=weights)
    assert got == want
    assert sum(v["served_tokens"] for v in got.values()) == 5000


def test_schedule_validations(spark):
    df = spark.createDataFrame(_DOCS, "domain string, tokens long")
    with pytest.raises(ValueError):
        repeat_epoch_schedule(df, "domain", "tokens", budget=-1)
    with pytest.raises(ValueError):
        repeat_epoch_schedule(
            df, "domain", "tokens", budget=1, max_epochs=0
        )
    with pytest.raises(ValueError):
        repeat_epoch_schedule(
            df, "domain", "tokens", budget=1, rounds=0
        )


def test_schedule_fuzz_matches_model(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    doc = st.tuples(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=0, max_value=500),
    )

    @settings(max_examples=6, deadline=None)
    @given(
        docs=st.lists(doc, min_size=1, max_size=8),
        budget=st.integers(min_value=0, max_value=4000),
        epochs=st.integers(min_value=1, max_value=4),
    )
    def run(docs, budget, epochs):
        got = _run_schedule(
            spark, docs, budget=budget, max_epochs=epochs
        )
        want = _schedule_model(docs, budget=budget, max_epochs=epochs)
        assert got == want, (docs, budget, epochs)
        total = sum(v["served_tokens"] for v in got.values())
        supply = sum(v["cap_tokens"] for v in got.values())
        assert total == min(budget, supply)

    run()


def test_schedule_plan_is_jvm_side(spark):
    df = spark.createDataFrame(_DOCS, "domain string, tokens long")
    plan = (
        repeat_epoch_schedule(df, "domain", "tokens", budget=100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def _fair_model(rows, keep_ppm):
    by_dom = {}
    for r in rows:
        by_dom.setdefault(r[1], []).append(r)
    kept = {}
    for dom, rs in by_dom.items():
        rs = sorted(
            rs, key=lambda r: (r[2] is None, -(r[2] or 0), r[0])
        )
        n_keep = keep_ppm * len(rs) // 1_000_000
        for rank, r in enumerate(rs, 1):
            kept[r[0]] = {
                "domain_rank": rank,
                "domain_n": len(rs),
                "kept": rank <= n_keep,
            }
    return kept


def test_domain_fair_keep_matches_model(spark):
    rows = [
        (1, "web", 0.9), (2, "web", 0.5), (3, "web", 0.7),
        (4, "web", None), (5, "web", 0.7),
        (6, "code", 0.1), (7, "code", 0.2),
        (8, "books", 0.99),
    ]
    df = spark.createDataFrame(
        rows, "id long, domain string, score double"
    )
    for ppm in (0, 400_000, 600_000, 1_000_000):
        got = {
            r["id"]: {
                "domain_rank": r["domain_rank"],
                "domain_n": r["domain_n"],
                "kept": r["kept"],
            }
            for r in domain_fair_keep(
                df, "domain", "score", "id", keep_ppm=ppm
            ).collect()
        }
        assert got == _fair_model(rows, ppm), ppm
    # 40%: web keeps exactly 2 (its best two), NULL score ranks last
    got = domain_fair_keep(
        df, "domain", "score", "id", keep_ppm=400_000
    )
    kept_ids = {r["id"] for r in got.collect() if r["kept"]}
    assert kept_ids == {1, 3}  # web floor(0.4*5)=2: 0.9 then 0.7@id3
    with pytest.raises(ValueError):
        domain_fair_keep(
            df, "domain", "score", "id", keep_ppm=1_000_001
        )


def test_domain_fair_keep_single_shuffle(spark):
    """Both windows share the domain partitioning — one exchange, no
    global sort, no Python."""
    df = spark.createDataFrame(
        [(1, "a", 0.5)], "id long, domain string, score double"
    )
    plan = (
        domain_fair_keep(df, "domain", "score", "id", keep_ppm=500_000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 2
    assert "BatchEvalPython" not in plan
