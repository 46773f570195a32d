"""Runtime smoke for the Delta sources (S2-S4) behind a feature probe
(VERDICT r05 #6): the moment an environment provides delta-spark, these
tests give sources/delta.py real execution evidence with ZERO code
change — history probe, timestampAsOf time travel, and a CDF window
read through the exact option spellings pinned un-gated in
tests/test_delta_options.py.

In THIS container the module skips: delta-spark is not installed and
the build environment forbids installing packages (NOTES.md round-1).
The gate is the ``delta_available()`` import probe — the skip shows up
as 4 skipped tests with this module's reason string in every pytest
run, so a probe flip (either direction) is visible in the counts.
"""

import sys
import time
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark_unload_to_gcs_spark.sources.delta import delta_available

pytestmark = pytest.mark.skipif(
    not delta_available(),
    reason="delta-spark not installed (env-blocked; see NOTES.md) — "
    "S2-S4 runtime evidence activates automatically when it is",
)


@pytest.fixture(scope="module")
def delta_spark(tmp_path_factory):
    """A session with the Delta extension enabled — built fresh (not the
    shared test session) because the extension must be set at session
    build time."""
    from pyspark.sql import SparkSession

    try:
        from delta import configure_spark_with_delta_pip
    except ImportError:
        pytest.skip("delta-spark python package incomplete")

    builder = (
        SparkSession.builder.appName("delta-smoke")
        .master("local[4]")
        .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.warehouse.dir",
            str(tmp_path_factory.mktemp("delta_warehouse")),
        )
    )
    spark = configure_spark_with_delta_pip(builder).getOrCreate()
    yield spark
    spark.stop()


@pytest.fixture(scope="module")
def delta_table(delta_spark):
    """A tiny Delta table with CDF enabled and two commits."""
    name = "delta_smoke_t"
    delta_spark.sql(f"DROP TABLE IF EXISTS {name}")
    delta_spark.sql(
        f"CREATE TABLE {name} (id BIGINT, v STRING) USING delta "
        "TBLPROPERTIES (delta.enableChangeDataFeed = true)"
    )
    delta_spark.sql(f"INSERT INTO {name} VALUES (1, 'a'), (2, 'b')")
    time.sleep(1.1)  # commit timestamps have 1 s granularity in history
    delta_spark.sql(f"UPDATE {name} SET v = 'b2' WHERE id = 2")
    return name


def test_history_probe_returns_latest_commit_ms(delta_spark, delta_table):
    from pyspark_unload_to_gcs_spark.sources.delta import latest_commit_timestamp_ms

    ts = latest_commit_timestamp_ms(delta_spark, delta_table)
    now_ms = int(time.time() * 1000)
    assert 0 < ts <= now_ms + 60_000


def test_time_travel_snapshot_at_latest_commit(delta_spark, delta_table):
    from pyspark_unload_to_gcs_spark.sources.delta import (
        latest_commit_timestamp_ms,
        snapshot_at_ms,
    )

    ts = latest_commit_timestamp_ms(delta_spark, delta_table)
    snap = snapshot_at_ms(delta_spark, delta_table, ts)
    rows = {(r.id, r.v) for r in snap.collect()}
    assert rows == {(1, "a"), (2, "b2")}


def test_change_feed_window_sees_the_update(delta_spark, delta_table):
    from pyspark_unload_to_gcs_spark.operators.cdc import change_type_mapping
    from pyspark_unload_to_gcs_spark.sources.delta import (
        change_feed,
        latest_commit_timestamp_ms,
    )

    end = latest_commit_timestamp_ms(delta_spark, delta_table)
    cdf = change_feed(delta_spark, delta_table, 0, end)
    types = {r._change_type for r in cdf.select("_change_type").collect()}
    assert "insert" in types
    assert {"update_preimage", "update_postimage"} <= types
    mapped = change_type_mapping(cdf)
    assert {r._mp_change_type for r in mapped.collect()} <= {"INSERT", "DELETE"}


def test_cdf_start_past_last_commit_returns_empty(delta_spark, delta_table):
    from pyspark_unload_to_gcs_spark.sources.delta import (
        change_feed,
        latest_commit_timestamp_ms,
    )

    end = latest_commit_timestamp_ms(delta_spark, delta_table)
    # the timestampOutOfRange conf makes this empty instead of an error
    assert change_feed(delta_spark, delta_table, end + 3_600_000, end + 7_200_000).count() == 0
