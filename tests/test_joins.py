"""Bucket-bloom join pruning (operators/joins.py) and the count-min
join-size estimator (operators/diagnostics.py)."""

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark_unload_to_gcs_spark.operators.diagnostics import (
    cm_join_size_estimate,
)
from pyspark_unload_to_gcs_spark.operators.joins import bucket_bloom_prune


@pytest.mark.parametrize("method", ["xxhash64", "md5"])
def test_bloom_prune_no_false_negatives_and_bounded_leakage(spark, method):
    """Every probe row that would join survives the prune (the Bloom
    no-false-negative contract) under BOTH hash arms; false positives
    exist but are a strict subset of the non-matching rows."""
    probe = spark.range(0, 2000).select(F.col("id").alias("k"))
    build = spark.createDataFrame([(7,), (42,), (1999,)], "bk long")
    pruned = bucket_bloom_prune(
        probe, build, probe_key="k", build_key="bk", num_buckets=256, method=method
    )
    kept = {r.k for r in pruned.collect()}
    assert {7, 42, 1999} <= kept, "false negative: a joinable row was pruned"
    # the prune did something: with 3 build buckets of 256, expected
    # leakage ~ 3/256 of the probe — assert well under half survives
    assert len(kept) < 1000
    # exact-join-after-prune == exact-join-without-prune
    direct = probe.join(build, probe["k"] == build["bk"]).count()
    after = pruned.join(build, pruned["k"] == build["bk"]).count()
    assert direct == after == 3


def test_bloom_prune_drops_null_probe_keys(spark):
    probe = spark.createDataFrame([(1,), (None,), (2,)], "k long")
    build = spark.createDataFrame([(1,), (2,)], "bk long")
    kept = {
        r.k
        for r in bucket_bloom_prune(
            probe, build, probe_key="k", build_key="bk", num_buckets=64
        ).collect()
    }
    assert kept == {1, 2}


def test_bloom_prune_bad_method_raises(spark):
    probe = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="unknown method"):
        bucket_bloom_prune(
            probe, probe, probe_key="k", build_key="k", method="sha1"
        ).collect()


def test_cm_join_size_never_underestimates_and_tight_when_sparse(spark):
    """The CM inner-product estimate is truth + non-negative collision
    terms, so est >= truth ALWAYS; with far fewer keys than buckets,
    collisions are (deterministically, given the fixed md5 hash)
    absent and the estimate is exact."""
    left = spark.createDataFrame(
        [(k,) for k in [1, 1, 1, 2, 2, 3] * 4], "k long"
    )
    right = spark.createDataFrame([(1,), (2,), (2,), (9,)], "k long")
    truth = (
        left.groupBy("k")
        .count()
        .join(right.groupBy("k").count().withColumnRenamed("count", "c2"), "k")
        .agg(F.sum(F.col("count") * F.col("c2")))
        .collect()[0][0]
    )
    est = cm_join_size_estimate(
        left, right, left_key="k", right_key="k", rows=4, width=2048
    ).collect()[0]["join_size_est"]
    assert truth == 12 * 1 + 8 * 2  # k=1: 12x1, k=2: 8x2, k=3/9 unmatched
    assert est >= truth
    assert est == truth  # 4 distinct keys in 2048 buckets: no collision


def test_cm_join_size_null_keys_excluded(spark):
    left = spark.createDataFrame([(1,), (None,), (1,)], "k long")
    right = spark.createDataFrame([(1,), (None,)], "k long")
    est = cm_join_size_estimate(
        left, right, left_key="k", right_key="k"
    ).collect()[0]["join_size_est"]
    assert est == 2  # NULLs never join and never enter the sketch


def test_cm_join_size_disjoint_keys_is_zero_not_null(spark):
    """Disjoint key sets (or an empty side) leave the sketches with no
    shared (r,b) bucket; the estimate must be an exact 0, never NULL
    (review r11: min over an empty aggregate)."""
    left = spark.createDataFrame([(1,), (2,)], "k long")
    right = spark.createDataFrame([], "k long")
    row = cm_join_size_estimate(
        left, right, left_key="k", right_key="k"
    ).collect()[0]
    assert row["join_size_est"] == 0


def test_cm_join_size_zero_shared_bucket_rows_count_toward_min(spark):
    """A sketch row with NO shared (r,b) buckets has inner product 0
    and must participate in the row-minimum (ADVICE r11: the inner
    join dropped it, so disjoint multisets whose keys collide in SOME
    rows returned a positive estimate where the documented estimator
    says 0). Keys "0" and "2" at width=8 collide in row 0's bucket but
    in none of rows 1-3 (fixed md5 hash), so the min must be 0."""
    left = spark.createDataFrame([("0",)], "k string")
    right = spark.createDataFrame([("2",)], "k string")
    row = cm_join_size_estimate(
        left, right, left_key="k", right_key="k", rows=4, width=8
    ).collect()[0]
    assert row["join_size_est"] == 0


def test_temperature_mix_quotas_flatten_head_stratum(spark):
    """tau=0.5 quotas are floor(B*sqrt(n_s)/W): the head stratum's
    share of the selection is LOWER than its natural share, tail
    strata's higher, totals never exceed the budget, and selection is
    deterministic (md5 order)."""
    import math

    from pyspark_unload_to_gcs_spark.operators.sampling import (
        quota_temperature_mix as temperature_mix,
    )

    rows = [(i, "big") for i in range(900)] + [
        (i + 1000, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "id long, src string")
    out = temperature_mix(df, "src", "id", budget=500, tau=0.5)
    got = {r.src: 0 for r in out.collect()}
    for r in out.collect():
        got[r.src] = got.get(r.src, 0) + 1
    w = math.sqrt(900) + math.sqrt(100)
    assert got["big"] == math.floor(500 * math.sqrt(900) / w)  # 375
    # quota 125 exceeds the stratum's 100 rows: selection caps at n_s
    # (a quota is a ceiling, not a guarantee — tiny strata can't be
    # upsampled by selection alone)
    assert got["small"] == 100
    # flattening: natural share of 'big' is 90%; sqrt share is 75%
    assert got["big"] / (got["big"] + got["small"]) < 0.9
    # deterministic: same call, same rows
    again = {(r.id, r.src) for r in temperature_mix(df, "src", "id", budget=500).collect()}
    assert again == {(r.id, r.src) for r in out.collect()}


@pytest.mark.parametrize("method", ["xxhash64", "md5"])
def test_bloom_anti_join_equals_plain_left_anti(spark, method):
    """bucket_bloom_anti_join == left_anti exactly, including NULL left
    keys (kept) and keys sharing a bucket with a deleted key but not
    equal to it (the false-positive band must survive via the exact
    branch)."""
    from pyspark_unload_to_gcs_spark.operators.joins import bucket_bloom_anti_join

    left = spark.createDataFrame(
        [(i,) for i in range(500)] + [(None,)], "k long"
    )
    right = spark.createDataFrame([(3,), (250,), (499,)], "dk long")
    got = {
        r.k
        for r in bucket_bloom_anti_join(
            left, right, left_key="k", right_key="dk",
            num_buckets=64, method=method,
        ).collect()
    }
    want = {r.k for r in left.join(right, left["k"] == right["dk"], "left_anti").collect()}
    assert got == want
    assert None in got and 3 not in got and 250 not in got
    # the canonical same-name-key shape must not raise
    # AMBIGUOUS_REFERENCE (review r11)
    same = spark.createDataFrame([(3,), (250,)], "k long")
    got2 = {
        r.k
        for r in bucket_bloom_anti_join(
            left, same, left_key="k", right_key="k",
            num_buckets=64, method=method,
        ).collect()
    }
    assert 3 not in got2 and 250 not in got2 and 499 in got2 and None in got2
    assert len(got2) == 501 - 2


@pytest.mark.parametrize("method", ["xxhash64", "md5"])
def test_key_bucket_null_key_is_null_bucket(spark, method):
    """NULL key -> NULL bucket under BOTH hash arms (ADVICE r11: raw
    xxhash64(NULL) returns the seed's hash, a real shareable bucket —
    a NULL-keyed build row then plants a permanent false-positive
    bucket). Pinned end-to-end: an all-NULL build side prunes
    EVERYTHING, because NULL keys contribute no buckets."""
    from pyspark_unload_to_gcs_spark.operators.joins import (
        bucket_bloom_prune,
        key_bucket,
    )

    one = spark.range(1).select(
        key_bucket(F.lit(None).cast("long"), 64, method=method).alias("b")
    )
    assert one.collect()[0]["b"] is None

    probe = spark.createDataFrame([(i,) for i in range(100)], "k long")
    build = spark.createDataFrame([(None,), (None,)], "dk long")
    assert (
        bucket_bloom_prune(
            probe, build, probe_key="k", build_key="dk",
            num_buckets=64, method=method,
        ).count()
        == 0
    )


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    lk=st.lists(st.one_of(st.integers(0, 40), st.none()), min_size=0, max_size=30),
    rk=st.lists(st.integers(0, 40), min_size=0, max_size=10),
    buckets=st.sampled_from([4, 16, 256]),
)
def test_bloom_join_family_model_fuzz(spark, lk, rk, buckets):
    """Model-based fuzz under adversarial bucket collisions (down to 4
    buckets — heavy false-positive pressure): prune keeps a superset of
    the matching rows and the exact join after it equals the direct
    join; anti equals plain left_anti exactly."""
    from pyspark_unload_to_gcs_spark.operators.joins import (
        bucket_bloom_anti_join,
        bucket_bloom_prune,
    )

    left = spark.createDataFrame([(k,) for k in lk] or [(None,)], "k long")
    if not lk:
        left = left.limit(0)
    right = spark.createDataFrame([(k,) for k in rk] or [(0,)], "rk long")
    if not rk:
        right = right.limit(0)

    rset = set(rk)
    pruned = {
        r.k
        for r in bucket_bloom_prune(
            left, right, probe_key="k", build_key="rk",
            num_buckets=buckets, method="md5",
        ).collect()
    }
    matching = {k for k in lk if k is not None and k in rset}
    assert matching <= pruned  # no false negatives, ever
    assert pruned <= {k for k in lk if k is not None}  # subset of probe

    anti = sorted(
        (r.k if r.k is not None else -1)
        for r in bucket_bloom_anti_join(
            left, right, left_key="k", right_key="rk",
            num_buckets=buckets, method="md5",
        ).collect()
    )
    want = sorted((k if k is not None else -1) for k in lk if k is None or k not in rset)
    assert anti == want


def test_temperature_mix_tau_extremes(spark):
    """tau=1 reproduces natural proportions (quota_s = B*n_s/N); tau=0
    gives equal quotas regardless of stratum size (uniform mixing)."""
    rows = [(i, "big") for i in range(800)] + [
        (i + 1000, "small") for i in range(200)
    ]
    from pyspark_unload_to_gcs_spark.operators.sampling import (
        quota_temperature_mix,
    )

    df = spark.createDataFrame(rows, "id long, src string")
    nat = {r.src for r in df.select("src").distinct().collect()}
    assert nat == {"big", "small"}

    got1: dict = {}
    for r in quota_temperature_mix(df, "src", "id", budget=500, tau=1.0).collect():
        got1[r.src] = got1.get(r.src, 0) + 1
    assert got1 == {"big": 400, "small": 100}  # floor(500 * n_s / 1000)

    got0: dict = {}
    for r in quota_temperature_mix(df, "src", "id", budget=100, tau=0.0).collect():
        got0[r.src] = got0.get(r.src, 0) + 1
    assert got0 == {"big": 50, "small": 50}  # n^0 = 1: equal quotas


def test_ivf_drift_report_empty_input_all_zero(spark):
    """An empty vector frame (a not-yet-populated index is a valid
    pre-flight input) yields an all-zero integer row — never NULLs or a
    division error (review r11)."""
    from pyspark_unload_to_gcs_spark.operators.similarity import ivf_drift_report

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    row = ivf_drift_report(empty, cents, cents).collect()[0]
    assert (
        row["n_vectors"],
        row["n_moved"],
        row["moved_ppm"],
        row["max_cell_share_ppm_old"],
        row["max_cell_share_ppm_new"],
    ) == (0, 0, 0, 0, 0)
