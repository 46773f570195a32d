"""Unit tests for the k-anonymity / l-diversity release gates."""

import pytest
from pyspark.sql import functions as F

from pyspark_unload_to_gcs_spark.operators.privacy import (
    k_anonymity_profile,
    k_anonymity_suppress,
    l_diversity_profile,
)


@pytest.fixture()
def people(spark):
    # (zip, age) quasi — one group of 3, one of 2, one singleton
    rows = [
        (1, "94110", 30, "flu"), (2, "94110", 30, "cold"), (3, "94110", 30, "flu"),
        (4, "10001", 40, "flu"), (5, "10001", 40, "flu"),
        (6, "60601", 50, "ok"),
    ]
    return spark.createDataFrame(rows, "id bigint, zip string, age int, dx string")


def test_k_anonymity_profile_flags_small_groups(people):
    prof = {(r.zip, r.age): (r.n, r.at_risk)
            for r in k_anonymity_profile(people, ["zip", "age"], k=3).collect()}
    assert prof == {
        ("94110", 30): (3, False),
        ("10001", 40): (2, True),
        ("60601", 50): (1, True),
    }


def test_k_anonymity_suppress_drops_exactly_at_risk_rows(people):
    kept = {r.id for r in k_anonymity_suppress(people, ["zip", "age"], k=3).collect()}
    assert kept == {1, 2, 3}
    # k=1 keeps everything
    all_kept = k_anonymity_suppress(people, ["zip", "age"], k=1).count()
    assert all_kept == 6


def test_k_anonymity_suppression_join_is_broadcast(people):
    plan = k_anonymity_suppress(people, ["zip", "age"], k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_l_diversity_profile_counts_distinct_sensitive(people):
    prof = {(r.zip, r.age): (r.n, r.n_distinct_sensitive, r.at_risk)
            for r in l_diversity_profile(people, ["zip", "age"], "dx", l=2).collect()}
    # the size-3 group has 2 distinct dx (diverse); the size-2 group
    # has only 'flu' (at risk even though it is the larger of the two)
    assert prof[("94110", 30)] == (3, 2, False)
    assert prof[("10001", 40)] == (2, 1, True)
    assert prof[("60601", 50)] == (1, 1, True)


def test_empty_quasi_rejected(people):
    with pytest.raises(ValueError):
        k_anonymity_profile(people, [], k=3)
    with pytest.raises(ValueError):
        l_diversity_profile(people, [], "dx", l=2)
