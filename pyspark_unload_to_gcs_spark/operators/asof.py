"""As-of (point-in-time) and range joins — operators Spark lacks as
builtins, composed from existing DataFrame ops (no UDFs).

The reference has no joins at all (SURVEY.md §2d); these are extension
operators for the analytics/training-pipeline surface (event
attribution, point-in-time feature lookup).

``asof_join`` uses the union-marker construction instead of a join:

    1. tag left rows side=1, right rows side=0, union on (key, ts)
    2. one window per key ordered by (ts, side): carry the last
       non-null right payload forward (``F.last(ignorenulls=True)``)
    3. keep left rows; the carried payload is the as-of match

Cost: ONE shuffle on the key (the window partition), linear scan per
partition, zero row amplification — this is the 100 TB formulation. A
join-based alternative (equality on key + ts range) explodes candidate
pairs per key before picking the latest; the window form never
materializes pairs. Skewed keys are handled by AQE the same way any
window would be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    right_payload: tuple[str, ...],
    tolerance_ms: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_time`` <= ``left_time`` for the same ``on`` key (ties at
    equal timestamps match, like DuckDB/pandas ASOF).

    ``right_payload`` columns are appended with ``suffix`` appended to
    any name colliding with a left column. ``tolerance_ms`` bounds the
    lookback window (matches older than left_time - tolerance become
    NULL).
    """
    lcols = left.columns
    payload_struct = F.struct(
        F.col(right_time).cast("timestamp").alias("__rt"),
        *[F.col(c) for c in right_payload],
    )
    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_time).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__side"),
        payload_struct.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l = left.select(  # noqa: E741
        F.col(on).alias("__key"),
        F.col(left_time).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *lcols,
    )
    unioned = r.unionByName(l)
    # right rows sort before left at the same timestamp -> inclusive
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__payload", ignorenulls=True).over(w)
    out = unioned.withColumn("__match", carried).filter(F.col("__side") == 1)
    if tolerance_ms is not None:
        in_range = F.unix_millis(F.col("__match.__rt")) >= (
            F.unix_millis(F.col("__ts")) - F.lit(tolerance_ms)
        )
        out = out.withColumn("__match", F.when(in_range, F.col("__match")))

    rename = {c: (c + suffix if c in lcols else c) for c in right_payload}
    return out.select(
        *lcols,
        F.col("__match.__rt").alias(f"{right_time}{suffix}" if right_time in lcols or right_time == left_time else right_time),
        *[F.col(f"__match.{c}").alias(rename[c]) for c in right_payload],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    min_delta_ms: int = 0,
    max_delta_ms: int = 0,
) -> DataFrame:
    """All (left, right) pairs with the same key where
    ``right_time - left_time`` falls in [min_delta_ms, max_delta_ms].

    Plan: equality shuffle join on the key, range predicate applied
    inside the join — candidate pairs exist only within a key, so there
    is no cross-join blow-up; for very hot keys AQE skew-join splits
    the partition. (A band-bucketing scheme on time — join on
    (key, time_bucket) — is the further refinement when single keys
    span huge time ranges; unnecessary while keys are user-scale.)
    """
    lt = F.col(f"l.{left_time}")
    rt = F.col(f"r.{right_time}")
    delta = F.unix_millis(rt) - F.unix_millis(lt)
    return (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col(f"l.{on}") == F.col(f"r.{on}"))
            & (delta >= min_delta_ms)
            & (delta <= max_delta_ms),
        )
        .withColumn("delta_ms", delta)
    )
