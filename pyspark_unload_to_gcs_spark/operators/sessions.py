"""Gap-based sessionization over an event stream (batch form).

Standard construction: a session starts where the gap to the previous
event of the same user exceeds the timeout; session id = running count
of session starts (lag + conditional cumsum over a per-user window).
One shuffle on user_id; both windows share the same partitioning so
Catalyst plans a single Exchange.

The streaming twin (applyInPandasWithState) lives in
streaming/sessionize.py; this batch version is the oracle-checkable
reference semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_unload_to_gcs_spark.functions.timestamps import epoch_ms


def sessionize(
    df: DataFrame,
    *,
    user_column: str = "user_id",
    time_column: str = "ts",
    gap_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """Append ``session_seq`` (1-based per-user session index)."""
    ts_ms = epoch_ms(df, time_column)
    w = Window.partitionBy(user_column).orderBy(ts_ms.asc())
    prev = F.lag(ts_ms).over(w)
    is_start = F.when(prev.isNull() | ((ts_ms - prev) > gap_ms), F.lit(1)).otherwise(F.lit(0))
    session_seq = F.sum(is_start).over(
        Window.partitionBy(user_column).orderBy(ts_ms.asc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    return df.withColumn("__ts_ms", ts_ms).withColumn("session_seq", session_seq)


def session_stats(
    df: DataFrame,
    *,
    user_column: str = "user_id",
    time_column: str = "ts",
    gap_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """One row per (user, session): event count, start/end epoch-ms,
    duration."""
    s = sessionize(df, user_column=user_column, time_column=time_column, gap_ms=gap_ms)
    return (
        s.groupBy(F.col(user_column), F.col("session_seq"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("__ts_ms").alias("start_ms"),
            F.max("__ts_ms").alias("end_ms"),
        )
        .withColumn("duration_ms", F.col("end_ms") - F.col("start_ms"))
    )
