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


# ---------------------------------------------------------------------------
# memorization canaries
# ---------------------------------------------------------------------------


def test_canary_plant_detect_survival_roundtrip(spark):
    from pyspark.sql import functions as F

    from pyspark_unload_to_gcs_spark.operators.privacy import (
        canary_manifest,
        canary_survival,
        detect_canaries,
        plant_canaries,
    )

    docs = spark.createDataFrame(
        [(i, f"plain text of document {i}") for i in range(400)],
        "doc_id long, text string",
    )
    planted = plant_canaries(
        docs, "doc_id", "text", rate_ppm=200_000, secret="s1"
    )
    manifest = canary_manifest(docs, "doc_id", "text", rate_ppm=200_000, secret="s1")
    m = {r["doc_id"]: r["canary"] for r in manifest.collect()}
    assert 0 < len(m) < 400  # a real subset at 20%
    # planting is deterministic and exactly the manifest's pairs
    found = {
        (r["doc_id"], r["canary"])
        for r in detect_canaries(planted, "doc_id", "text").collect()
    }
    assert found == set(m.items())
    again = {
        (r["doc_id"], r["canary"])
        for r in detect_canaries(
            plant_canaries(docs, "doc_id", "text", rate_ppm=200_000, secret="s1"),
            "doc_id",
            "text",
        ).collect()
    }
    assert again == found
    # a different secret plants a disjoint canary set
    other = canary_manifest(docs, "doc_id", "text", rate_ppm=200_000, secret="s2")
    assert not (
        {r["canary"] for r in other.collect()} & set(m.values())
    )

    # full survival before any processing
    surv = canary_survival(planted, manifest, "doc_id", "text").collect()
    assert all(r["survived"] and r["found_in"] == r["planted_in"] for r in surv)
    assert len(surv) == len(m)

    # a scrubbing stage kills every canary; a doc-dropping stage kills
    # exactly the dropped ones
    scrubbed = planted.withColumn(
        "text", F.regexp_replace("text", "zqcanary[0-9a-f]{12}", "")
    )
    assert all(
        not r["survived"]
        for r in canary_survival(scrubbed, manifest, "doc_id", "text").collect()
    )
    halved = planted.filter(F.col("doc_id") % 2 == 0)
    surv2 = {
        r["planted_in"]: r["survived"]
        for r in canary_survival(halved, manifest, "doc_id", "text").collect()
    }
    assert surv2 == {d: d % 2 == 0 for d in m}

    # packing/concatenation leaks a FOREIGN canary into another doc —
    # the detector must attribute it to where it now lives
    victim = min(m)
    packed = planted.withColumn(
        "text",
        F.when(
            F.col("doc_id") == 399,
            F.concat(
                F.col("text"),
                F.lit(" "),
                F.lit(m[victim]),
            ),
        ).otherwise(F.col("text")),
    )
    hits = {
        (r["doc_id"], r["canary"])
        for r in detect_canaries(packed, "doc_id", "text").collect()
    }
    assert (399, m[victim]) in hits

    with pytest.raises(ValueError, match="rate_ppm"):
        plant_canaries(docs, "doc_id", "text", rate_ppm=0, secret="s")
    with pytest.raises(ValueError, match="rate_ppm"):
        canary_manifest(docs, "doc_id", "text", rate_ppm=0, secret="s")

    # NULL-text documents are never selected: planting can't silently
    # swallow the token while the manifest claims it (review r12)
    withnull = docs.unionByName(
        spark.createDataFrame([(9000 + i, None) for i in range(50)],
                              "doc_id long, text string")
    )
    mn = canary_manifest(withnull, "doc_id", "text",
                         rate_ppm=500_000, secret="s3")
    assert mn.filter(F.col("doc_id") >= 9000).count() == 0
    pn = plant_canaries(withnull, "doc_id", "text",
                        rate_ppm=500_000, secret="s3")
    sv = canary_survival(pn, mn, "doc_id", "text").collect()
    assert sv and all(r["survived"] for r in sv)  # no false scrubbed verdicts


def test_canary_survival_null_id_rows_still_count(spark):
    """A canary living in a NULL-id row (repacking stages emit id-less
    rows) is PRESENT — survived must flag on detection, not on the
    survivor id's nullness (review r12)."""
    from pyspark.sql import functions as F

    from pyspark_unload_to_gcs_spark.operators.privacy import (
        canary_manifest,
        canary_survival,
        plant_canaries,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "doc_id long, text string"
    )
    planted = plant_canaries(docs, "doc_id", "text", rate_ppm=500_000, secret="n")
    manifest = canary_manifest(docs, "doc_id", "text", rate_ppm=500_000, secret="n")
    nulled = planted.withColumn("doc_id", F.lit(None).cast("long"))
    surv = canary_survival(nulled, manifest, "doc_id", "text").collect()
    assert surv and all(r["survived"] and r["found_in"] is None for r in surv)
