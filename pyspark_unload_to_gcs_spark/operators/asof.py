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
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach one right row for the same ``on`` key
    (pandas ``merge_asof`` direction semantics, exact matches allowed):

    - ``"backward"`` (default): greatest ``right_time <= left_time``;
    - ``"forward"``: smallest ``right_time >= left_time``;
    - ``"nearest"``: whichever of the two is closer in time, ties going
      BACKWARD (documented, deterministic).

    ``right_payload`` columns are appended with ``suffix`` appended to
    any name colliding with a left column. ``tolerance_ms`` bounds the
    match window on each side (a match farther than the tolerance
    becomes NULL; under ``nearest`` the other side can still match).

    Plan shape: the union-marker construction — right rows and left
    rows union on (key, time, side), ONE shuffle on the key, and the
    match is a running ``last(payload, ignorenulls)`` window fill
    (forward = the same fill over the reversed ordering; nearest = both
    fills over one Exchange — two sorts, zero joins, zero pair
    amplification).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"asof_join: unknown direction {direction!r} "
            "(expected 'backward', 'forward' or 'nearest')"
        )
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
    # right rows sort before left at the same timestamp -> exact
    # matches are inclusive in BOTH directions
    w_back = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts").desc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def in_tolerance(match, sign: int):
        if tolerance_ms is None:
            return match
        delta = sign * (
            F.unix_millis(match["__rt"]) - F.unix_millis(F.col("__ts"))
        )
        return F.when(delta <= F.lit(int(tolerance_ms)), match)

    out = unioned
    if direction in ("backward", "nearest"):
        out = out.withColumn(
            "__mb", in_tolerance(F.last("__payload", ignorenulls=True).over(w_back), -1)
        )
    if direction in ("forward", "nearest"):
        out = out.withColumn(
            "__mf", in_tolerance(F.last("__payload", ignorenulls=True).over(w_fwd), 1)
        )
    out = out.filter(F.col("__side") == 1)
    if direction == "backward":
        out = out.withColumn("__match", F.col("__mb"))
    elif direction == "forward":
        out = out.withColumn("__match", F.col("__mf"))
    else:
        lt = F.unix_millis(F.col("__ts"))
        back_delta = lt - F.unix_millis(F.col("__mb.__rt"))
        fwd_delta = F.unix_millis(F.col("__mf.__rt")) - lt
        out = out.withColumn(
            "__match",
            F.when(F.col("__mb").isNull(), F.col("__mf"))
            .when(F.col("__mf").isNull(), F.col("__mb"))
            # tie -> backward (<=), the documented deterministic rule
            .when(back_delta <= fwd_delta, F.col("__mb"))
            .otherwise(F.col("__mf")),
        )

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
