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
