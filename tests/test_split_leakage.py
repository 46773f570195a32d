"""Train/test split leakage audit (operators/sampling.py
``split_leakage_audit``) vs an independent python model: duplicate
content straddling the deterministic_split boundary is a leak, NULL
content never fabricates one, and every count is exact."""

import hashlib
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark_unload_to_gcs_spark.operators.sampling import (  # noqa: E402
    split_leakage_audit,
    split_threshold_hex,
)


def _side(i, frac=0.8):
    pref = hashlib.md5(str(i).encode()).hexdigest()[:4]
    return "train" if pref < split_threshold_hex(frac) else "test"


def _norm(s):
    # ASCII twin of text.normalize_text
    s = re.sub(r"[^a-zA-Z0-9\s]", " ", s.lower())
    return re.sub(r"\s+", " ", s).strip()


def _model(rows, frac=0.8):
    groups = {}
    for i, text in rows:
        key = ("t", _norm(text)) if text is not None else ("id", i)
        g = groups.setdefault(key, {"n": 0, "tr": 0, "te": 0})
        g["n"] += 1
        g["tr" if _side(i, frac) == "train" else "te"] += 1
    leaked = [g for g in groups.values() if g["tr"] > 0 and g["te"] > 0]
    n_rows = sum(g["n"] for g in groups.values())
    leaked_rows = sum(g["n"] for g in leaked)
    return {
        "n_rows": n_rows,
        "n_groups": len(groups),
        "n_dup_groups": sum(1 for g in groups.values() if g["n"] > 1),
        "n_leaked_groups": len(leaked),
        "leaked_rows": leaked_rows,
        "leaked_ppm": leaked_rows * 1_000_000 // max(n_rows, 1),
    }


def _ids_by_side(n=2000, frac=0.8):
    tr = [i for i in range(n) if _side(i, frac) == "train"]
    te = [i for i in range(n) if _side(i, frac) == "test"]
    return tr, te


def _run(spark, rows, frac=0.8):
    df = spark.createDataFrame(rows, "id long, text string")
    return (
        split_leakage_audit(
            df, "id", ["text"], train_fraction=frac
        )
        .first()
        .asDict()
    )


def test_leakage_audit_matches_model(spark):
    tr, te = _ids_by_side()
    rows = [
        # a leak: same normalized content, one id per side
        (tr[0], "The Quick   Brown Fox!"),
        (te[0], "the quick brown fox"),
        # a duplicate fully inside train: dup group, NOT a leak
        (tr[1], "all aboard"),
        (tr[2], "ALL ABOARD"),
        # uniques on both sides
        (tr[3], "solo train doc"),
        (te[1], "solo test doc"),
        # NULL content on both sides: id-keyed, never a leak
        (tr[4], None),
        (te[2], None),
    ]
    got = _run(spark, rows)
    want = _model(rows)
    assert got == want
    assert got["n_leaked_groups"] == 1
    assert got["leaked_rows"] == 2
    assert got["n_dup_groups"] == 2  # the leak pair + the train pair
    assert got["n_groups"] == 6
    assert got["leaked_ppm"] == 250_000


def test_leakage_audit_clean_corpus_is_zero(spark):
    rows = [(i, f"unique doc {i}") for i in range(50)]
    got = _run(spark, rows)
    assert got["n_leaked_groups"] == 0
    assert got["leaked_rows"] == 0
    assert got["leaked_ppm"] == 0
    assert got["n_groups"] == 50


def test_leakage_audit_three_way_copy_counts_all_rows(spark):
    tr, te = _ids_by_side()
    rows = [
        (tr[0], "  shared   text "),
        (tr[1], "shared text"),
        (te[0], "Shared Text"),
        (te[1], "other"),
    ]
    got = _run(spark, rows)
    assert got == _model(rows)
    assert got["leaked_rows"] == 3  # every row of the leaking group
    assert got["leaked_ppm"] == 750_000


def test_leakage_audit_fuzz_matches_model(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    text = st.one_of(
        st.none(), st.sampled_from(["a b", "A  b.", "c", "d e f", "c!"])
    )

    @settings(max_examples=6, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(st.integers(min_value=0, max_value=40), text),
            min_size=1,
            max_size=25,
            unique_by=lambda r: r[0],
        ),
        frac=st.sampled_from([0.0, 0.5, 0.8, 1.0]),
    )
    def run(rows, frac):
        assert _run(spark, rows, frac) == _model(rows, frac), (
            rows,
            frac,
        )

    run()


def test_leakage_audit_plan_is_two_aggregates(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    plan = (
        split_leakage_audit(df, "id", ["text"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # one shuffle for the key groupBy, one for the global agg
    assert plan.count("Exchange") <= 3


def test_multi_column_null_patterns_do_not_collide(spark):
    """('x', NULL) vs (NULL, 'x') share no content — the NULL-flag
    encoding in dedup.content_key must keep them distinct instead of
    concat_ws silently skipping the NULL (code-review regression)."""
    from pyspark_unload_to_gcs_spark.operators.sampling import (
        split_leakage_audit as audit,
    )

    tr, te = _ids_by_side()
    df = spark.createDataFrame(
        [
            (tr[0], "hello world", None),
            (te[0], None, "hello world"),
        ],
        "id long, title string, body string",
    )
    got = audit(df, "id", ["title", "body"]).first()
    assert got["n_leaked_groups"] == 0
    assert got["leaked_rows"] == 0
    assert got["n_groups"] == 2


def test_contentless_rows_key_on_id(spark):
    """Punctuation-only docs normalize to '' — contentless, id-keyed,
    never one giant fabricated leak group (code-review regression);
    same for raw-empty strings and all-NULL rows."""
    tr, te = _ids_by_side()
    rows = [
        (tr[0], "!!!"), (te[0], "???"), (tr[1], ""), (te[1], None),
    ]
    got = _run(spark, rows)
    assert got["n_leaked_groups"] == 0
    assert got["leaked_rows"] == 0
    assert got["n_groups"] == 4
    assert got["n_dup_groups"] == 0
