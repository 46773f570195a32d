"""interval_overlap_join: exactness vs a brute-force referee, grid
invariance, and edge semantics (half-open ends, touching intervals,
empty intervals, grid-collision non-overlaps)."""

import sys
from pathlib import Path

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark_unload_to_gcs_spark.operators.interval import interval_overlap_join


def _run(spark, lrows, rrows, g):
    left = spark.createDataFrame(lrows, "lid long, ls long, le long")
    right = spark.createDataFrame(rrows, "rid long, rs long, re long")
    out = interval_overlap_join(
        left,
        right,
        left_start="ls",
        left_end="le",
        right_start="rs",
        right_end="re",
        granularity=g,
    )
    return {(r["lid"], r["rid"]) for r in out.collect()}, out


def _referee(lrows, rrows):
    return {
        (lid, rid)
        for lid, ls, le in lrows
        for rid, rs, re in rrows
        if ls < re and rs < le and le > ls and re > rs
    }


def test_basic_overlap_and_half_open_touching(spark):
    lrows = [(1, 0, 10), (2, 10, 20), (3, 5, 15)]
    rrows = [(10, 10, 12), (11, 0, 5), (12, 19, 30)]
    got, out = _run(spark, lrows, rrows, g=4)
    # [0,10) does NOT overlap [10,12) (touching at the half-open end)
    assert got == _referee(lrows, rrows) == {(2, 10), (3, 10), (1, 11), (2, 12)}
    # each pair exactly once
    assert out.count() == len(got)


def test_empty_and_inverted_intervals_emit_nothing(spark):
    got, _ = _run(spark, [(1, 5, 5), (2, 9, 3)], [(10, 0, 100)], g=10)
    assert got == set()


def test_grid_collision_without_overlap_is_dropped(spark):
    # both inside cell 0 (g=100) but disjoint
    got, _ = _run(spark, [(1, 0, 10)], [(10, 50, 60)], g=100)
    assert got == set()


@pytest.mark.parametrize("g", [1, 3, 7, 50, 1000])
def test_grid_invariance(spark, g):
    lrows = [(i, 3 * i, 3 * i + 7) for i in range(12)]
    rrows = [(100 + i, 5 * i + 1, 5 * i + 9) for i in range(9)]
    got, out = _run(spark, lrows, rrows, g)
    assert got == _referee(lrows, rrows)
    assert out.count() == len(got)  # exactly-once at every granularity


def test_rejects_shared_column_names(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a long, s long, e long")
    with pytest.raises(ValueError, match="disjoint"):
        interval_overlap_join(
            df, df, left_start="s", left_end="e",
            right_start="s", right_end="e", granularity=10,
        )


def test_rejects_nonpositive_granularity(spark):
    l = spark.createDataFrame([(1, 0, 5)], "lid long, ls long, le long")
    r = spark.createDataFrame([(2, 0, 5)], "rid long, rs long, re long")
    with pytest.raises(ValueError, match="granularity"):
        interval_overlap_join(
            l, r, left_start="ls", left_end="le",
            right_start="rs", right_end="re", granularity=0,
        )


@settings(max_examples=20, deadline=None)
@given(
    lrows=st.lists(
        st.tuples(
            st.integers(0, 30), st.integers(-50, 50), st.integers(-50, 50)
        ),
        min_size=0,
        max_size=12,
    ),
    rrows=st.lists(
        st.tuples(
            st.integers(100, 130), st.integers(-50, 50), st.integers(-50, 50)
        ),
        min_size=0,
        max_size=12,
    ),
    g=st.sampled_from([1, 2, 5, 13, 64]),
)
def test_matches_referee_fuzz(spark, lrows, rrows, g):
    # ids may repeat across hypothesis draws; pair-set semantics still
    # hold per (lid, rid) MULTISET — dedupe ids to keep the set compare
    lrows = list({t[0]: t for t in lrows}.values())
    rrows = list({t[0]: t for t in rrows}.values())
    got, out = _run(spark, lrows, rrows, g)
    assert got == _referee(lrows, rrows)
    assert out.count() == len(got)
