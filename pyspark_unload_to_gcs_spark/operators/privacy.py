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


# ---------------------------------------------------------------------------
# memorization canaries (Carlini et al. 2019 "secret sharer" — public)
# ---------------------------------------------------------------------------

_CANARY_PREFIX = "zqcanary"
_CANARY_HEX = 12
_CANARY_RE = f"{_CANARY_PREFIX}[0-9a-f]{{{_CANARY_HEX}}}"


def _canary_token(id_col, secret: str):
    """The per-document canary token: a fixed lowercase prefix (never
    produced by natural tokenization of the fixtures or any English
    text) + the md5 of (id, secret). Deterministic in (id, secret) —
    retries, engines, and the survival join all regenerate it."""
    return F.concat(
        F.lit(_CANARY_PREFIX),
        F.substring(
            F.md5(F.concat(id_col.cast("string"), F.lit(":"), F.lit(secret))),
            1,
            _CANARY_HEX,
        ),
    )


def plant_canaries(
    df: DataFrame,
    id_column: str,
    text_column: str,
    *,
    rate_ppm: int,
    secret: str,
) -> DataFrame:
    """Append a unique canary token to a deterministic ``rate_ppm``
    slice of documents — the secret-sharer memorization probe (Carlini
    et al. 2019) and, just as usefully, a PIPELINE-SURVIVAL tracer:
    plant before cleaning/dedup/sampling, run ``canary_survival``
    after, and every stage that should (or should not) drop planted
    documents is measured instead of assumed.

    Selection is the md5-prefix string threshold of
    ``deterministic_split`` (6 hex digits — ppm-granular), so planting
    is a narrow map — no shuffle, stable under retries; the canary
    manifest is re-derivable from (corpus, secret) alone via
    ``canary_manifest``, never stored state. Documents keep their id;
    only the text mutates. NULL-text documents are never selected
    (``concat`` would swallow the token and the manifest would claim a
    canary that was never planted — review r12), which is why the
    selector takes the text column too."""
    sel = _canary_selector(
        F.col(id_column), F.col(text_column), rate_ppm, secret
    )
    token = _canary_token(F.col(id_column), secret)
    return df.withColumn(
        text_column,
        F.when(
            sel, F.concat(F.col(text_column), F.lit(" "), token)
        ).otherwise(F.col(text_column)),
    )


def _canary_selector(id_col, text_col, rate_ppm: int, secret: str):
    """Deterministic ppm-rate selection shared by planting and the
    manifest: the first 6 hex digits of md5(id|select|secret) against
    the ``split_threshold_hex`` string threshold (the
    ``deterministic_split`` mechanism — lowercase-hex string order is
    numeric order, no integer arithmetic at all; 1/16^6 granularity
    covers 1 ppm). NULL text is never selected (see
    ``plant_canaries``). Validation lives here so every consumer of
    the shared path gets it."""
    from pyspark_unload_to_gcs_spark.operators.sampling import (
        split_threshold_hex,
    )

    if not isinstance(rate_ppm, int) or not (0 < rate_ppm <= 1_000_000):
        raise ValueError(
            f"canary selection: rate_ppm={rate_ppm!r} must be an int in "
            "(0, 1e6]"
        )
    prefix = F.substring(
        F.md5(
            F.concat(id_col.cast("string"), F.lit("|select|"), F.lit(secret))
        ),
        1,
        6,
    )
    thresh = split_threshold_hex(rate_ppm / 1_000_000, 6)
    return (prefix < thresh) & text_col.isNotNull()


def canary_manifest(
    df: DataFrame,
    id_column: str,
    text_column: str,
    *,
    rate_ppm: int,
    secret: str,
) -> DataFrame:
    """The (id, canary) rows ``plant_canaries`` would inject for this
    corpus — same selector (including the NULL-text exclusion and
    rate validation), same token arithmetic (one shared code path), so
    the manifest can be regenerated at audit time from the ORIGINAL
    corpus and the secret without ever persisting it."""
    sel = _canary_selector(
        F.col(id_column), F.col(text_column), rate_ppm, secret
    )
    return df.filter(sel).select(
        F.col(id_column),
        _canary_token(F.col(id_column), secret).alias("canary"),
    )


def detect_canaries(
    df: DataFrame, id_column: str, text_column: str
) -> DataFrame:
    """Every canary token found anywhere in ``text_column`` (one row
    per (document, distinct canary)) — documents may carry FOREIGN
    canaries after concatenation/packing stages, which is exactly the
    leakage the probe exists to see."""
    return (
        df.select(
            F.col(id_column),
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all(
                        F.col(text_column), F.lit(_CANARY_RE), 0
                    )
                )
            ).alias("canary"),
        )
    )


def canary_survival(
    processed: DataFrame,
    manifest: DataFrame,
    id_column: str,
    text_column: str,
) -> DataFrame:
    """Per planted canary: did it survive the pipeline, and in WHICH
    document does it now live (NULL survivor id = scrubbed). The
    DETECTIONS side broadcasts — it holds only canary-bearing rows
    (≈ rate_ppm of the corpus, manifest-sized plus any leaks), and a
    left-outer join can only build its right side (a broadcast hint on
    the preserved manifest is silently ignored — review r12, verified
    against the executed plan)."""
    planted_cols = [c for c in manifest.columns if c != "canary"]
    if len(planted_cols) != 1:
        raise ValueError(
            "canary_survival: manifest must have exactly (id, canary) "
            f"columns, got {manifest.columns!r}"
        )
    # survival flags on a literal marker, NOT found_in's nullness: a
    # canary detected in a NULL-id row (a repacking stage that emits
    # id-less rows) is still PRESENT in the processed text — reporting
    # it scrubbed is a false verdict (review r12)
    found = detect_canaries(processed, id_column, text_column).select(
        F.col(id_column).alias("found_in"), "canary", F.lit(True).alias("__hit")
    )
    return manifest.join(F.broadcast(found), "canary", "left").select(
        "canary",
        F.col(planted_cols[0]).alias("planted_in"),
        "found_in",
        F.coalesce(F.col("__hit"), F.lit(False)).alias("survived"),
    )
