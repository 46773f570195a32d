from datetime import datetime, timezone

from pyspark_unload_to_gcs_spark.timeutil import (
    datetime_to_ms,
    exclusive_start_ms,
    ms_to_datetime,
)


def test_ms_to_datetime_utc():
    dt = ms_to_datetime(1709251200000)
    assert dt == datetime(2024, 3, 1, tzinfo=timezone.utc)
    assert dt.tzinfo is timezone.utc


def test_roundtrip():
    ms = 1709251200123
    assert datetime_to_ms(ms_to_datetime(ms)) == ms


def test_datetime_to_ms_truncates_sub_ms():
    # sub-millisecond precision truncates (not rounds) — reference
    # watermark semantics (export.py:14-16)
    dt = datetime(2024, 3, 1, 0, 0, 0, 999999, tzinfo=timezone.utc)
    assert datetime_to_ms(dt) == 1709251200999


def test_exclusive_start():
    assert exclusive_start_ms(0) == 1
    assert exclusive_start_ms(1709251200000) == 1709251200001
