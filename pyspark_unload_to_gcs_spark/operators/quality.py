"""Data-quality constraint checking (deequ-style, single pass).

Pipelines feeding training runs gate every ingested batch on cheap
invariants — null rates, key uniqueness, value ranges — and the whole
profile must come from ONE aggregation pass over the data (a rule-per-
scan checker re-reads 100 TB once per rule). ``constraint_profile``
computes every requested metric in a single ``agg``; ``check`` compares
the profile against declarative rules driver-side (the profile is one
row — no second job).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rules:
    """Declarative batch-gate rules. Empty collections = not checked."""

    not_null: tuple[str, ...] = ()          # columns that must have 0 nulls
    unique: tuple[str, ...] = ()            # columns whose values must be distinct
    min_rows: int = 0
    ranges: dict[str, tuple[float, float]] = field(default_factory=dict)  # col -> [lo, hi]


class ConstraintViolation(ValueError):
    """One or more batch-gate rules failed; message lists all of them."""


def constraint_profile(df: DataFrame, rules: Rules) -> DataFrame:
    """One-row profile frame with every metric the rules need — a
    single aggregation (one scan, partial+final combine; count and
    count-distinct per flagged column, min/max per ranged column).
    Column naming: ``<metric>__<column>``."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in rules.not_null:
        aggs.append((F.count(F.lit(1)) - F.count(F.col(c))).alias(f"nulls__{c}"))
    for c in rules.unique:
        aggs.append(F.countDistinct(F.col(c)).alias(f"distinct__{c}"))
        # distinct vs non-null count: uniqueness over present values
        aggs.append(F.count(F.col(c)).alias(f"present__{c}"))
    for c in rules.ranges:
        aggs.append(F.min(F.col(c)).cast("double").alias(f"min__{c}"))
        aggs.append(F.max(F.col(c)).cast("double").alias(f"max__{c}"))
    return df.agg(*aggs)


def check(profile_row: Row, rules: Rules) -> None:
    """Evaluate rules against a collected profile row; raises
    ``ConstraintViolation`` listing EVERY failure (a gate that stops at
    the first violation hides the batch's true damage)."""
    d = profile_row.asDict()
    failures: list[str] = []
    if d["n_rows"] < rules.min_rows:
        failures.append(f"min_rows: {d['n_rows']} < {rules.min_rows}")
    for c in rules.not_null:
        if d[f"nulls__{c}"] != 0:
            failures.append(f"not_null[{c}]: {d[f'nulls__{c}']} nulls")
    for c in rules.unique:
        if d[f"distinct__{c}"] != d[f"present__{c}"]:
            failures.append(
                f"unique[{c}]: {d[f'present__{c}'] - d[f'distinct__{c}']} duplicate values"
            )
    for c, (lo, hi) in rules.ranges.items():
        mn, mx = d[f"min__{c}"], d[f"max__{c}"]
        if mn is not None and mn < lo:
            failures.append(f"range[{c}]: min {mn} < {lo}")
        if mx is not None and mx > hi:
            failures.append(f"range[{c}]: max {mx} > {hi}")
    if failures:
        raise ConstraintViolation("; ".join(failures))


def validate_batch(df: DataFrame, rules: Rules) -> Row:
    """Profile + gate in one action; returns the profile row on success
    so callers can log/persist the metrics they already paid for."""
    row = constraint_profile(df, rules).first()
    check(row, rules)
    return row
