"""Line-level dedup (operators/paragraphs.py) vs an independent python
re-implementation: corpus-scope boilerplate drops, document-scope
first-k retention, blank-line structure preservation, NULL/empty
propagation, and reassembly order."""

import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark_unload_to_gcs_spark.operators.paragraphs import (  # noqa: E402
    line_dedup,
)


def _key(line, normalize):
    if not normalize:
        return line  # raw bytes: whitespace-distinct lines stay distinct
    return re.sub(r"[ \t\r]+", " ", line).strip().lower()


def _model(docs, scope="corpus", max_occurrences=1, normalize=True):
    """Independent python twin of line_dedup over {id: text|None}."""
    out = {}
    split = {
        i: (t.split("\n") if t is not None else None)
        for i, t in docs.items()
    }
    counts = Counter(
        _key(ln, normalize)
        for lines in split.values()
        if lines is not None
        for ln in lines
        if _key(ln, normalize) != ""
    )
    for i, lines in split.items():
        if lines is None:
            out[i] = {
                "text_dedup": None,
                "n_lines": None,
                "n_lines_removed": None,
            }
            continue
        kept, removed, seen = [], 0, Counter()
        for ln in lines:
            k = _key(ln, normalize)
            if k == "":
                kept.append(ln)
                continue
            if scope == "corpus":
                keep = counts[k] <= max_occurrences
            else:
                seen[k] += 1
                keep = seen[k] <= max_occurrences
            if keep:
                kept.append(ln)
            else:
                removed += 1
        out[i] = {
            "text_dedup": "\n".join(kept),
            "n_lines": len(lines),
            "n_lines_removed": removed,
        }
    return out


def _run(spark, docs, **kw):
    df = spark.createDataFrame(
        list(docs.items()), "id long, text string"
    )
    return {
        r["id"]: {k: v for k, v in r.asDict().items() if k != "id"}
        for r in line_dedup(df, **kw).collect()
    }


_DOCS = {
    1: "unique alpha\nSubscribe to our newsletter\nunique beta",
    2: "subscribe   to our\tnewsletter\nunique gamma\n\nunique delta",
    3: "Subscribe to our newsletter\n\nunique epsilon",
    4: "repeat me\nrepeat me\nrepeat me\nunique zeta",
    5: None,
    6: "",
    7: "Subscribe to our newsletter",  # every line is boilerplate
}


def test_corpus_scope_matches_model(spark):
    got = _run(spark, _DOCS, scope="corpus")
    want = _model(_DOCS, scope="corpus")
    assert got == want
    # the normalized banner (3 docs) dropped everywhere, incl. doc 7
    assert "ubscribe" not in got[1]["text_dedup"]
    assert got[7]["text_dedup"] == ""  # present but empty
    assert got[7]["n_lines_removed"] == 1
    # intra-doc 'repeat me' x3 also exceeds the corpus threshold
    assert got[4]["text_dedup"] == "unique zeta"
    # blank lines survive as structure
    assert got[2]["text_dedup"].split("\n") == [
        "unique gamma", "", "unique delta"
    ]


def test_document_scope_matches_model(spark):
    got = _run(spark, _DOCS, scope="document")
    want = _model(_DOCS, scope="document")
    assert got == want
    # cross-doc banner survives once per doc under document scope
    assert got[1]["text_dedup"] == _DOCS[1]
    assert got[7]["text_dedup"] == _DOCS[7]
    # intra-doc repeats keep only the first occurrence
    assert got[4]["text_dedup"] == "repeat me\nunique zeta"
    assert got[4]["n_lines_removed"] == 2


def test_max_occurrences_and_raw_keys(spark):
    got = _run(
        spark, _DOCS, scope="document", max_occurrences=2
    )
    assert got[4]["text_dedup"] == "repeat me\nrepeat me\nunique zeta"
    # normalize=False: doc 2's case/whitespace banner variant stops
    # colliding (it survives), while the byte-identical banner in
    # docs 1/3/7 still counts 3 and drops
    got = _run(spark, _DOCS, scope="corpus", normalize=False)
    want = _model(_DOCS, scope="corpus", normalize=False)
    assert got == want
    assert got[2]["text_dedup"].startswith("subscribe   to our")
    assert "Subscribe" not in got[1]["text_dedup"]


def test_null_and_empty_propagate(spark):
    got = _run(spark, _DOCS, scope="corpus")
    assert got[5]["text_dedup"] is None
    assert got[5]["n_lines"] is None
    assert got[5]["n_lines_removed"] is None
    # empty text is a present page with one blank line
    assert got[6]["text_dedup"] == ""
    assert got[6]["n_lines"] == 1
    assert got[6]["n_lines_removed"] == 0


def test_identity_when_no_repeats(spark):
    docs = {i: f"only line {i}\nsecond {i}" for i in range(10)}
    for scope in ("corpus", "document"):
        got = _run(spark, docs, scope=scope)
        for i, t in docs.items():
            assert got[i]["text_dedup"] == t
            assert got[i]["n_lines_removed"] == 0


def test_plan_no_python_and_no_global_sort(spark):
    """The hot path must stay JVM-side; reassembly must be an
    in-group sort_array, never a global Sort."""
    df = spark.createDataFrame(
        [(1, "a\nb"), (2, "a\nc")], "id long, text string"
    )
    for scope in ("corpus", "document"):
        plan = (
            line_dedup(df, scope=scope)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
    # corpus scope: the boilerplate key set joins back, it is not a
    # per-line count window (which would shuffle the whole corpus)
    assert "Window" not in (
        line_dedup(df, scope="corpus")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_line_dedup_fuzz_matches_model(spark):
    """Hypothesis fuzz over small corpora drawn from a tiny line
    alphabet (maximizing collisions, case/whitespace variants, blanks,
    trailing newlines): Spark and the python model must agree under
    both scopes and thresholds 1-2."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    line = st.sampled_from(
        ["dup", "Dup", " dup ", "dup\t", "x", "y", "", " ", "z q"]
    )
    text = st.lists(line, min_size=0, max_size=6).map("\n".join)
    docs_st = st.lists(
        st.one_of(st.none(), text), min_size=1, max_size=5
    ).map(lambda ts: dict(enumerate(ts)))

    @settings(max_examples=6, deadline=None)
    @given(
        docs=docs_st,
        scope=st.sampled_from(["corpus", "document"]),
        k=st.integers(min_value=1, max_value=2),
    )
    def run(docs, scope, k):
        got = _run(spark, docs, scope=scope, max_occurrences=k)
        want = _model(docs, scope=scope, max_occurrences=k)
        assert got == want, (docs, scope, k)

    run()
