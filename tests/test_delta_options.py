"""Spelling pins for the Delta reader options (VERDICT r04 #9).

delta-spark cannot be installed in this environment, so the S2-S4
readers (sources/delta.py) are import-guarded and never execute here.
The residual risk the round-4 verdict called out is the literal OSS
option spellings — a typo would hide behind the guard until the code
meets a real Delta deployment. The option dicts are therefore built by
PURE functions, and these tests assert the exact strings Delta Lake OSS
documents: ``timestampAsOf`` (time travel), ``readChangeFeed`` /
``startingTimestamp`` / ``endingTimestamp`` (Change Data Feed), and the
``timestampOutOfRange`` conf key. No SparkSession, no delta import.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark_unload_to_gcs_spark.sources.delta import (
    CDF_OUT_OF_RANGE_CONF,
    change_feed_read_options,
    snapshot_read_options,
)

JAN10_MS = 1704844800000  # 2024-01-10T00:00:00Z
JAN21_MS = 1705795200000  # 2024-01-21T00:00:00Z


def test_snapshot_option_spelling_is_timestampAsOf():
    opts = snapshot_read_options(JAN10_MS)
    assert opts == {"timestampAsOf": "2024-01-10T00:00:00+00:00"}


def test_change_feed_option_spellings():
    opts = change_feed_read_options(JAN10_MS + 1, JAN21_MS)
    assert set(opts) == {"readChangeFeed", "startingTimestamp", "endingTimestamp"}
    assert opts["readChangeFeed"] == "true"  # string, not bool
    # the +1 ms half-open start must survive into the option value
    assert opts["startingTimestamp"] == "2024-01-10T00:00:00.001000+00:00"
    assert opts["endingTimestamp"] == "2024-01-21T00:00:00+00:00"


def test_cdf_out_of_range_conf_spelling():
    key, value = CDF_OUT_OF_RANGE_CONF
    assert key == "spark.databricks.delta.changeDataFeed.timestampOutOfRange.enabled"
    assert value == "true"


def test_timestamps_are_utc_iso8601():
    """Delta parses ISO-8601 with an explicit offset; a naive local
    datetime here would shift the window by the cluster timezone."""
    for v in (
        snapshot_read_options(JAN10_MS)["timestampAsOf"],
        change_feed_read_options(JAN10_MS, JAN21_MS)["startingTimestamp"],
        change_feed_read_options(JAN10_MS, JAN21_MS)["endingTimestamp"],
    ):
        assert v.endswith("+00:00")
