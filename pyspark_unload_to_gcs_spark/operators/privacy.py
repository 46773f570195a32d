"""Privacy / re-identification-risk operators for training-data
compliance (SURVEY.md §2l extension surface): k-anonymity and
l-diversity (Sweeney 2002; Machanavajjhala et al. 2007 — public).

A released training corpus (or an analytics export, the reference's
job) leaks identity when a combination of quasi-identifier columns is
rare: a (lang, source) combo carried by one document pins that
document. These operators profile and enforce the two classic gates:

- k-anonymity: every quasi-identifier combination must cover >= k rows;
- l-diversity: within each combination, a sensitive column must take
  >= l distinct values (a k-anonymous group is still leaky when
  everyone in it shares the sensitive value).

Scale shape: everything is one hash aggregation on the quasi key —
map-side partial aggregation shrinks the shuffle to |distinct combos|
rows, which is the profile's size regardless of corpus size.
Enforcement re-joins the (tiny) violating-combo list back to the
corpus as a BROADCAST anti-join — no second shuffle of the big side.
PII redaction (operators/text.py::redact_pii) is the complementary
value-level scrubber; these are the row-level release gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_profile(df: DataFrame, quasi_columns: list[str], *, k: int) -> DataFrame:
    """Per-quasi-identifier-combination audit table: group size ``n``
    and ``at_risk = n < k``. One hash agg; |combos| output rows."""
    if not quasi_columns:
        raise ValueError("k_anonymity_profile needs at least one quasi-identifier column")
    return (
        df.groupBy(*quasi_columns)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("at_risk", F.col("n") < F.lit(int(k)))
    )


def k_anonymity_suppress(df: DataFrame, quasi_columns: list[str], *, k: int) -> DataFrame:
    """Suppression-based k-anonymization: drop every row whose
    quasi-identifier combination covers fewer than ``k`` rows — the
    simplest (and lossless-per-surviving-row) way to reach k-anonymity.
    The violating-combo list is at most |combos| rows and is broadcast
    to an anti-join, so the corpus is scanned once and never
    re-shuffled on the quasi key."""
    bad = (
        k_anonymity_profile(df, quasi_columns, k=k)
        .filter(F.col("at_risk"))
        .select(*quasi_columns)
    )
    return df.join(F.broadcast(bad), on=quasi_columns, how="left_anti")


def l_diversity_profile(
    df: DataFrame,
    quasi_columns: list[str],
    sensitive_column: str,
    *,
    l: int,  # noqa: E741 — the literature's name for the parameter
) -> DataFrame:
    """Per-combination sensitive-value diversity: group size ``n``,
    ``n_distinct_sensitive`` (exact COUNT DISTINCT — one extra
    partial-aggregation pass; swap in approx_count_distinct when the
    profile itself is huge), and ``at_risk = n_distinct < l``."""
    if not quasi_columns:
        raise ValueError("l_diversity_profile needs at least one quasi-identifier column")
    return (
        df.groupBy(*quasi_columns)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct(F.col(sensitive_column)).cast("long").alias("n_distinct_sensitive"),
        )
        .withColumn("at_risk", F.col("n_distinct_sensitive") < F.lit(int(l)))
    )
