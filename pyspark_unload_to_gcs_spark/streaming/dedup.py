"""Streaming exact dedup — the streaming twin of
``operators/dedup.py::exact_dedup`` for at-least-once upstream sources
(Kafka replays, file redeliveries).

``dropDuplicatesWithinWatermark`` (Spark 3.5+) keys state by the dedup
columns and EXPIRES each key once the event-time watermark passes its
first-seen time + delay, so state is bounded by the duplicate-arrival
window instead of growing with the whole stream — the property that
matters at 100 TB/day. Plain ``dropDuplicates`` on a stream keeps every
key forever; use it only when the key space is small and closed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def stream_exact_dedup(
    events: DataFrame,
    key_columns: Sequence[str],
    *,
    time_column: str = "ts",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Drop re-deliveries of the same ``key_columns`` arriving within
    ``watermark_delay`` of the first copy (event time). Emits the FIRST
    arrival of each key; state for a key is dropped once the watermark
    passes, so a duplicate arriving later than the delay would pass
    through — choose the delay from the source's redelivery bound."""
    return events.withWatermark(time_column, watermark_delay).dropDuplicatesWithinWatermark(
        list(key_columns)
    )
