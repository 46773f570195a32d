"""Timezone-robust timestamp helpers.

Parquet sources mix TIMESTAMP (instant / LTZ) and TIMESTAMP_NTZ
(isAdjustedToUTC=false) columns. Watermark arithmetic is epoch-ms based
and must produce identical values regardless of the session timezone,
so NTZ columns are anchored to the epoch *wall clock* (the same
convention DuckDB's ``epoch_ms`` uses for naive timestamps) instead of
being cast through the session zone.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, TimestampNTZType

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _is_ntz(dtype: DataType) -> bool:
    return isinstance(dtype, TimestampNTZType)


def epoch_ms(df: DataFrame, column: str) -> Column:
    """Epoch milliseconds of a timestamp column, session-tz independent.

    LTZ: ``unix_millis`` (an instant already). NTZ: wall-clock delta from
    1970-01-01 00:00:00 — matches DuckDB ``epoch_ms`` on naive timestamps.
    """
    if _is_ntz(df.schema[column].dataType):
        return F.expr(f"timestampdiff(MILLISECOND, {_EPOCH_NTZ}, `{column}`)")
    return F.unix_millis(F.col(column))


def ts_bound_literal(df: DataFrame, column: str, epoch_seconds: int) -> Column:
    """A timestamp literal comparable against ``column`` without session-tz
    dependence: epoch-based for LTZ, wall-clock UTC string for NTZ."""
    if _is_ntz(df.schema[column].dataType):
        wall = datetime.fromtimestamp(epoch_seconds, tz=timezone.utc).replace(tzinfo=None)
        return F.expr(f"TIMESTAMP_NTZ '{wall.isoformat(sep=' ')}'")
    return F.timestamp_seconds(F.lit(epoch_seconds))
