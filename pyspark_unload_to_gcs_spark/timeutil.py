"""Epoch-milliseconds <-> datetime conversions (the watermark currency).

Capability parity: the reference's orchestrator exchanges watermarks as
epoch-ms integers and converts with UTC-aware datetimes, truncating
sub-millisecond precision (reference export.py:9-16; truncation
asserted by its tests/test_export.py:22-36). We keep those exact
semantics: half-open incremental windows depend on them.
"""

from __future__ import annotations

from datetime import datetime, timezone

MS_PER_SECOND = 1000


def ms_to_datetime(ms: int) -> datetime:
    """Epoch milliseconds -> timezone-aware UTC datetime."""
    return datetime.fromtimestamp(ms / MS_PER_SECOND, tz=timezone.utc)


def datetime_to_ms(dt: datetime) -> int:
    """Datetime -> epoch milliseconds, truncating sub-ms precision.

    ``int()`` truncation (not rounding) is intentional: the watermark
    protocol treats 1 ms as the finest granularity, and the +1 ms
    exclusive-start arithmetic (operators/filters.py) assumes floor.
    """
    return int(dt.timestamp() * MS_PER_SECOND)


def exclusive_start_ms(time_cutoff_ms: int) -> int:
    """Start bound for an incremental window: last watermark + 1 ms.

    Makes windows half-open ``(last, now]`` at ms precision so rows at
    exactly the previous watermark are not re-exported (reference
    export.py:91-92, 115-116).
    """
    return time_cutoff_ms + 1
