"""Dataset-curation sampling operators for training pipelines.

Both are DETERMINISTIC — reproducible across runs, engines and cluster
sizes, which is the property that matters for train/test hygiene (a
``randomSplit`` re-rolls on every retry and can leak rows across the
boundary when lineage is recomputed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_DIGITS = 4


def split_threshold_hex(fraction: float, hex_digits: int = _HEX_DIGITS) -> str:
    """Threshold for a hash-prefix split: rows whose md5-prefix sorts
    strictly below it fall in the selected fraction. Lowercase-hex
    string order is isomorphic to numeric order, so a plain string
    comparison works in ANY engine (no hex->int builtin needed).
    Effective fraction quantizes to 1/16^hex_digits (~6e-5 at 4).

    fraction >= 1 returns ``"g"`` — a single char sorting above every
    hex digit, so ``prefix < "g"`` keeps all rows (the naive
    ``"10000"`` would compare char-by-char against 4-char prefixes and
    wrongly DROP anything starting with '2'-'f')."""
    n = int(fraction * 16**hex_digits)
    if n >= 16**hex_digits:
        return "g"
    return format(n, f"0{hex_digits}x")


def deterministic_split(
    df: DataFrame,
    id_column: str,
    *,
    train_fraction: float = 0.8,
    split_column: str = "split",
) -> DataFrame:
    """Append 'train'/'test' assignment derived purely from the row id
    (md5-prefix threshold). Narrow map, no shuffle, stable under
    retries, engine swaps and cluster resizes."""
    prefix = F.substring(F.md5(F.col(id_column).cast("string")), 1, _HEX_DIGITS)
    thresh = split_threshold_hex(train_fraction)
    return df.withColumn(
        split_column, F.when(prefix < thresh, F.lit("train")).otherwise(F.lit("test"))
    )


def take_per_stratum(
    df: DataFrame,
    strata_columns: list[str],
    n: int,
    *,
    order_column: str,
) -> DataFrame:
    """Balanced deterministic sample: the first ``n`` rows per stratum
    by ``order_column`` (one shuffle on the strata key — the top-k-per-
    group shape). For an unbiased-but-deterministic pick, order by the
    md5 of the id instead of a natural column."""
    w = Window.partitionBy(*strata_columns).orderBy(F.col(order_column).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def weighted_mix(
    df: DataFrame,
    stratum_column: str,
    rates: dict[str, float],
    id_column: str,
    *,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic source mixing: keep each row of stratum ``s`` with
    probability ``rates[s]`` (strata absent from ``rates`` get
    ``default_rate``) — the data-mixing primitive for assembling a
    training corpus from per-source target weights.

    Selection hashes (id, stratum) through md5 and string-compares the
    prefix against the stratum's threshold, so membership is a pure
    per-row function: reproducible across runs, engines, cluster sizes
    and retries, and rows keep/drop CONSISTENTLY as rates move (raising
    a rate only ever adds rows — hash prefixes sort below the higher
    threshold too — so mixture sweeps are nested, not re-rolled).
    Narrow map + filter; no shuffle, no RNG state.
    """
    prefix = F.substring(
        F.md5(F.concat_ws(":", F.col(id_column).cast("string"), F.col(stratum_column))),
        1,
        _HEX_DIGITS,
    )
    thresh = F.lit(split_threshold_hex(default_rate))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(stratum_column) == value, F.lit(split_threshold_hex(rate))
        ).otherwise(thresh)
    return df.filter(prefix < thresh)
