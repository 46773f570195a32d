"""Skew-mitigation utilities for hot keys at scale.

AQE's skew-join splitting (on in ``session.py``) handles most cases at
runtime; these are the explicit tools for the two shapes AQE can't fix:

- ``salted_aggregate``: two-phase aggregation for skewed GROUP BY keys.
  Phase 1 aggregates on (key, salt) — the hot key's rows spread over
  ``salt_buckets`` reducers; phase 2 merges the per-salt partials. Works
  for any algebraic aggregate (sum/count/min/max); the classic
  map-side-combine-insufficient case is billions of rows on one key.

- ``salted_broadcast_left``: replicate-and-salt join for a skewed LEFT
  side against a right side too big to broadcast whole but small enough
  to broadcast ``salt_buckets`` times is NOT provided — at that size,
  prefer AQE. What is provided is explicit key-splitting guidance via
  ``skewed_keys`` (frequency probe) so callers can isolate hot keys
  (union of broadcast-joined hot subset + shuffle-joined remainder).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    group_columns: list[str],
    aggs: dict[str, tuple[str, Column]],
    *,
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name -> (merge_fn_name, phase1_column), where
    merge_fn_name in {"sum", "min", "max"} re-aggregates the partials:
    count merges with sum, sum with sum, min/max with themselves.

    Example::

        salted_aggregate(df, ["k"], {
            "n":     ("sum", F.count(F.lit(1))),
            "total": ("sum", F.sum("v")),
            "mx":    ("max", F.max("v")),
        })
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*group_columns, "__salt")
        .agg(*[col.alias(f"__p_{name}") for name, (_, col) in aggs.items()])
    )
    merge = {
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
    }
    return phase1.groupBy(*group_columns).agg(
        *[merge[fn](f"__p_{name}").alias(name) for name, (fn, _) in aggs.items()]
    )


def skewed_keys(
    df: DataFrame, key_column: str, *, min_fraction: float = 0.01, top: int = 20
) -> DataFrame:
    """Frequency probe: keys holding more than ``min_fraction`` of all
    rows (the candidates to isolate into a broadcast-joined hot path).
    One aggregation over the key only; the key itself tie-breaks the
    top-k so the cut is deterministic across engines and retries."""
    total = df.count()
    return (
        df.groupBy(key_column)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("fraction", F.col("n_rows") / F.lit(float(total)))
        .filter(F.col("fraction") >= min_fraction)
        .orderBy(F.col("n_rows").desc(), F.col(key_column).asc())
        .limit(top)
    )
