"""Epoch-milliseconds <-> datetime conversions (the watermark currency).

Capability parity: the reference's orchestrator exchanges watermarks as
epoch-ms integers and converts with UTC-aware datetimes, truncating
sub-millisecond precision (reference export.py:9-16; truncation
asserted by its tests/test_export.py:22-36). We keep those exact
semantics: half-open incremental windows depend on them.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

MS_PER_SECOND = 1000

_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def ms_to_datetime(ms: int) -> datetime:
    """Epoch milliseconds -> timezone-aware UTC datetime.

    Integer timedelta arithmetic, NOT ``fromtimestamp(ms / 1000)``: the
    float division loses ulps (32181/1000 = 32.180999...), which after
    ``datetime_to_ms`` truncation shifts the watermark by 1 ms — enough
    to re-export or skip a boundary row. (The reference has this float
    round-trip wart, export.py:9-16; deliberate fix.)
    """
    return _EPOCH + timedelta(milliseconds=ms)


def datetime_to_ms(dt: datetime) -> int:
    """Datetime -> epoch milliseconds, truncating sub-ms precision.

    Truncation (not rounding) is intentional and reference-asserted
    (its tests/test_export.py:22-36): the watermark protocol treats
    1 ms as the finest granularity, and the +1 ms exclusive-start
    arithmetic (operators/filters.py) assumes floor. Exact integer
    arithmetic over the timedelta components; naive datetimes are
    interpreted as UTC wall clock.
    """
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    delta = dt - _EPOCH
    return (delta.days * 86400 + delta.seconds) * MS_PER_SECOND + delta.microseconds // MS_PER_SECOND


def exclusive_start_ms(time_cutoff_ms: int) -> int:
    """Start bound for an incremental window: last watermark + 1 ms.

    Makes windows half-open ``(last, now]`` at ms precision so rows at
    exactly the previous watermark are not re-exported (reference
    export.py:91-92, 115-116).
    """
    return time_cutoff_ms + 1
