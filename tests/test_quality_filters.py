"""Gopher / C4 quality-filter rules, each pinned by a doc built to fail
exactly one rule (operators/quality_filters.py)."""

from pyspark.sql import functions as F

from pyspark_unload_to_gcs_spark.operators.quality_filters import (
    c4_clean,
    gopher_filter,
    gopher_quality_flags,
)

GOOD = (
    "The quick brown fox jumps over the lazy dog and then runs away to "
    "the forest with great speed because it wants to be home before "
    "dark. The weather that day have been fine and the road was clear "
    "of traffic so the fox made good time on its journey home tonight."
)


def _flags(spark, text, **kw):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(gopher_quality_flags(F.col("text"), **kw).alias("g")).first().g


def test_gopher_good_doc_passes(spark):
    g = _flags(spark, GOOD)
    assert g.passes, g


def test_gopher_word_count_rule(spark):
    assert not _flags(spark, "too short to pass the gate").word_count_ok
    assert not _flags(spark, GOOD, max_words=10).word_count_ok


def test_gopher_mean_word_length_rule(spark):
    long_words = " ".join(["pneumonoultramicroscopic"] * 60)
    g = _flags(spark, long_words)
    assert not g.mean_word_ok


def test_gopher_symbol_ratio_rule(spark):
    hashy = GOOD + " " + "# # # # # # # # # # # # # # # # # # # # # #"
    assert not _flags(spark, hashy).symbol_ok
    assert _flags(spark, GOOD).symbol_ok


def test_gopher_bullet_and_ellipsis_rules(spark):
    bullets = "\n".join(f"- bullet line {i}" for i in range(10))
    assert not _flags(spark, bullets, max_bullet_line_frac=0.5).bullet_ok
    dots = "\n".join(f"line number {i} trails off..." for i in range(10))
    assert not _flags(spark, dots).ellipsis_ok
    assert _flags(spark, GOOD).ellipsis_ok


def test_gopher_alpha_word_rule(spark):
    numbery = GOOD + " " + " ".join(str(i) for i in range(80))
    assert not _flags(spark, numbery).alpha_ok


def test_gopher_stopword_rule(spark):
    no_stop = " ".join(["zorp glik snar blint"] * 20)
    assert not _flags(spark, no_stop).stopword_ok
    assert _flags(spark, GOOD).stopword_ok


def test_gopher_filter_on_fixture_is_deterministic(spark, sf_dir):
    from pyspark_unload_to_gcs_spark.sources.catalog import load_parquet
    import os

    docs = load_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    a = gopher_filter(docs, min_words=10).count()
    b = gopher_filter(docs, min_words=10).count()
    assert a == b
    assert 0 <= a <= docs.count()


def test_c4_line_and_page_rules(spark):
    pages = [
        # survives: 3 keepable lines (terminal punct, >=5 words)
        (1, "This is the first good line here.\n"
            "Here is another quite good line too!\n"
            "Surely a third fine line appears here.\n"
            "short line.\n"
            "no terminal punctuation in this line at all"),
        # killed: lorem ipsum
        (2, "This is the first good line here.\n"
            "Here is another quite good line too!\n"
            "Surely a third fine line appears here.\n"
            "lorem ipsum dolor sit amet consectetur."),
        # killed: curly brace (code)
        (3, "This is the first good line here.\n"
            "Here is another quite good line too!\n"
            "function f() { return 1; } appears in this line."),
        # killed: only 2 keepable lines
        (4, "This is the first good line here.\n"
            "Here is another quite good line too!\n"
            "tiny.\n"
            "also without ending"),
        # killed: javascript line filtered, drops below 3
        (5, "This is the first good line here.\n"
            "Here is another quite good line too!\n"
            "Please enable JavaScript to view the comments properly."),
    ]
    df = spark.createDataFrame(pages, "doc_id long, text string")
    out = c4_clean(df).orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == [1]
    r = out[0]
    assert r.c4_lines_total == 5 and r.c4_lines_kept == 3
    assert r.text.count("\n") == 2
    assert "no terminal punctuation" not in r.text


def test_gopher_repetition_dup_lines_hand_computed(spark):
    from pyspark_unload_to_gcs_spark.operators.quality_filters import (
        gopher_repetition_profile,
    )

    # 4 lines, one exact repeat of "same line here" (14 chars);
    # line chars: 14 + 12 + 14 + 16 = 56; dup-beyond-first = 14
    text = "same line here\nanother line\nsame line here\nthird line other"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = gopher_repetition_profile(df).first()
    assert abs(r.dup_line_frac - 1 / 4) < 1e-9
    assert abs(r.dup_line_char_frac - 14 / 56) < 1e-9


def test_gopher_repetition_top_ngram_dominance(spark):
    from pyspark_unload_to_gcs_spark.operators.quality_filters import (
        gopher_repetition_profile,
    )

    spam = " ".join(["buy now"] * 40)          # "buy now" 2-gram dominates
    clean = (
        "every word in this sentence differs from the rest so that no "
        "single short phrase can dominate the character mass of the text"
    )
    df = spark.createDataFrame(
        [(1, spam), (2, clean)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in gopher_repetition_profile(df).collect()}
    assert rows[1].top_2gram_char_frac > 0.5
    assert not rows[1].repetition_ok
    assert rows[2].top_2gram_char_frac < 0.2
    assert rows[2].repetition_ok


def test_gopher_repetition_on_fixture_runs(spark, sf_dir):
    import os

    from pyspark_unload_to_gcs_spark.operators.quality_filters import (
        gopher_repetition_profile,
    )
    from pyspark_unload_to_gcs_spark.sources.catalog import load_parquet

    docs = load_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    out = gopher_repetition_profile(docs)
    n = out.count()
    assert n == docs.count()
    row = out.agg(F.sum(F.col("repetition_ok").cast("int"))).first()
    assert row[0] is not None  # computed for every doc, no nulls


def test_gopher_flags_whitespace_invariance(spark):
    """Leading/trailing whitespace and repeated inner spaces must not
    change any word-level rule (words come from a \\s+ split of the
    trimmed text)."""
    base = GOOD
    variants = ["   " + base, base + "  \t ", base.replace(" ", "  ", 5)]
    ref = _flags(spark, base)
    for v in variants:
        g = _flags(spark, v)
        for f in ("word_count_ok", "mean_word_ok", "alpha_ok", "stopword_ok", "passes"):
            assert getattr(g, f) == getattr(ref, f), (f, v[:30])


def test_c4_clean_dropping_rules_are_monotone(spark):
    """Appending a lorem-ipsum line or a brace to a surviving page must
    drop it; appending another keepable line must not."""
    page = (
        "This is the first good line here.\n"
        "Here is another quite good line too!\n"
        "Surely a third fine line appears here."
    )
    df = spark.createDataFrame(
        [
            (1, page),
            (2, page + "\nlorem ipsum dolor sit amet."),
            (3, page + "\nbad brace { in a line."),
            (4, page + "\nA fourth keepable line is added here."),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in c4_clean(df).collect()}
    assert set(out) == {1, 4}
    assert out[4].c4_lines_kept == 4


# --------------------------------------------------------------------------
# fold/arrow twin equivalence for the repetition profile (VERDICT r05 #1
# + stretch #10: the brute-force Python referee)
# --------------------------------------------------------------------------

ADVERSARIAL_DOCS = [
    (0, ""),
    (1, None),
    (2, "   "),
    (3, "\n\n\n"),
    (4, "\tfoo bar\t"),             # trim strips SPACES only, not tabs
    (5, " foo \x0b barbaz "),       # \x0b is Java \s (vertical tab)
    (6, "one"),
    (7, "a b"),                     # exactly one 2-gram
    (8, "a b a b a b a b"),         # dominant 2-gram
    (9, "x\ny\nx\ny\nz"),           # duplicate lines
    (10, "tok " * 12),              # trailing space -> trailing empty token
    (11, "\nlead\nnewline doc\n"),  # leading \n -> leading empty token
    (12, "a a a a a a a a a a a a"),  # every n collapses to one run
    (13, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"),  # all-unique windows
    (14, "line one\nline one\nline one\nother"),
    (15, "ab cd ef"),          # NBSP is NOT Java \s: stays inside a token
]


def _rep_referee(text):
    """Brute-force referee: true token-tuple n-gram counting, no
    hashing, no arrays — independent of both production paths."""
    import re as _re

    from pyspark_unload_to_gcs_spark.operators.quality_filters import (
        DUP_NGRAM_LIMITS,
        MAX_DUP_LINE_CHAR_FRAC,
        MAX_DUP_LINE_FRAC,
        TOP_NGRAM_LIMITS,
    )

    t = "" if text is None else str(text)
    lines = [ln for ln in t.split("\n") if ln.strip(" ") != ""]
    dup_line_frac = dup_line_char_frac = 0.0
    if lines:
        seen, dup_n, dup_c, tot_c = set(), 0, 0, 0
        for ln in lines:
            tot_c += len(ln)
            if ln in seen:
                dup_n, dup_c = dup_n + 1, dup_c + len(ln)
            else:
                seen.add(ln)
        dup_line_frac = dup_n / len(lines)
        dup_line_char_frac = (dup_c / tot_c) if tot_c > 0 else 0.0
    trimmed = t.strip(" ")
    toks = [] if trimmed == "" else _re.split(r"\s+", trimmed, flags=_re.ASCII)
    chars = float(len(trimmed))
    denom = max(chars, 1.0)
    out = {
        "dup_line_frac": dup_line_frac,
        "dup_line_char_frac": dup_line_char_frac,
    }
    ok = dup_line_frac <= MAX_DUP_LINE_FRAC and dup_line_char_frac <= MAX_DUP_LINE_CHAR_FRAC
    for kind, limits in (("top", TOP_NGRAM_LIMITS), ("dup", DUP_NGRAM_LIMITS)):
        for n, limit in limits.items():
            counts = {}
            for i in range(len(toks) - n + 1):
                g = tuple(toks[i : i + n])
                counts[g] = counts.get(g, 0) + 1
            if kind == "top":
                best = 0
                if counts:
                    c, length = max(
                        (c, sum(len(w) for w in g) + n - 1) for g, c in counts.items()
                    )
                    if c > 1:
                        best = c * length
                frac = min(best / denom, 1.0)
            else:
                dup = sum(
                    c * (sum(len(w) for w in g) + n - 1)
                    for g, c in counts.items()
                    if c > 1
                )
                frac = min(dup / denom, 1.0)
            out[f"{kind}_{n}gram_char_frac"] = frac
            ok = ok and frac <= limit
    out["repetition_ok"] = ok
    return out


def test_repetition_fold_arrow_equivalence_adversarial(spark):
    """The fold (builtin HOF) and arrow (numpy mapInPandas) paths must
    be BIT-EQUAL — including on whitespace edge cases where the two
    tokenizers could plausibly diverge (Spark trim strips spaces only;
    split keeps leading/trailing empty tokens; Java vs Python \\s)."""
    from pyspark_unload_to_gcs_spark.operators.quality_filters import (
        gopher_repetition_profile,
    )

    df = spark.createDataFrame(ADVERSARIAL_DOCS, "doc_id long, text string")
    fold = gopher_repetition_profile(df, method="fold").orderBy("doc_id").collect()
    arrow = gopher_repetition_profile(df, method="arrow").orderBy("doc_id").collect()
    assert [tuple(r) for r in fold] == [tuple(r) for r in arrow]
    # and both agree with the brute-force referee
    for r in arrow:
        ref = _rep_referee(dict(ADVERSARIAL_DOCS)[r.doc_id])
        for k, v in ref.items():
            assert getattr(r, k) == v, (r.doc_id, k, getattr(r, k), v)


def test_repetition_fold_arrow_equivalence_fixture(spark, sf_dir):
    from pyspark_unload_to_gcs_spark.operators.quality_filters import (
        gopher_repetition_profile,
    )
    from pyspark_unload_to_gcs_spark.sources.catalog import load_parquet
    import os

    docs = load_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    fold = gopher_repetition_profile(docs, method="fold").orderBy("doc_id").collect()
    arrow = gopher_repetition_profile(docs, method="arrow").orderBy("doc_id").collect()
    assert [tuple(r) for r in fold] == [tuple(r) for r in arrow]


def test_repetition_arrow_core_matches_referee_property():
    """Hypothesis property (VERDICT r05 stretch #10): the numpy
    run-count core equals the brute-force token-tuple referee on
    adversarially small alphabets (maximal gram collisions/repeats and
    whitespace-only corners). Combined with the bit-equality tests
    above, this transitively property-checks the fold path too."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pyspark_unload_to_gcs_spark.operators.quality_filters import (
        repetition_profile_pandas,
    )

    doc = st.text(alphabet=list("ab \n\t"), max_size=60)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=8))
    def check(texts):
        pdf = pd.DataFrame(
            {"doc_id": list(range(len(texts))), "text": texts}
        )
        got = repetition_profile_pandas(pdf)
        for i, text in enumerate(texts):
            ref = _rep_referee(text)
            row = got.iloc[i]
            for k, v in ref.items():
                assert row[k] == v, (text, k, row[k], v)

    check()


def test_compression_ratio_quality_matches_zlib_referee(spark):
    import zlib

    from pyspark_unload_to_gcs_spark.operators.quality_filters import (
        compression_ratio_quality,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 3),
        (2, "spam " * 400),            # boilerplate -> very high ratio
        (3, "k9!x#q7@z$m2&visdkfh"),  # junk -> ratio ~1
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_ratio_quality(df).collect()}
    for doc_id, text in rows:
        b = (text or "").encode("utf-8")
        assert got[doc_id]["raw_bytes"] == len(b)
        want_c = len(zlib.compress(b, 6)) if b else 0
        assert got[doc_id]["compressed_bytes"] == want_c
        if b:
            assert abs(got[doc_id]["compression_ratio"] - len(b) / want_c) < 1e-12
    assert got[2]["compression_ratio"] > 10 and not got[2]["compression_ok"]
    assert got[3]["compression_ratio"] < 1.2 and not got[3]["compression_ok"]
    assert got[1]["compression_ok"]
    assert got[4]["compression_ratio"] == 0.0 and got[5]["compression_ratio"] == 0.0


def test_compression_ratio_quality_rejects_bad_level(spark):
    import pytest as _pytest

    from pyspark_unload_to_gcs_spark.operators.quality_filters import (
        compression_ratio_quality,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="zlib level"):
        compression_ratio_quality(df, level=0)
