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


def temperature_weights(
    df: DataFrame,
    stratum_column: str,
    *,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-source sampling weights with temperature smoothing:
    ``weight_s = n_s^alpha / sum_t n_t^alpha`` — the standard
    multi-source/multilingual corpus reweighting (alpha=1 keeps natural
    proportions, alpha=0 is uniform, 0<alpha<1 upweights small sources).

    Returns one row per stratum: (stratum, n_docs, weight).

    Cross-engine float discipline (NOTES lore): ``pow`` can differ by an
    ulp between engines, so the powered count is rounded to 6 places and
    accumulated as exact DECIMAL; the single normalizing division is
    rounded to 9 before the one cast to DOUBLE. The unpartitioned window
    SUM runs over the per-stratum aggregate — strata counts are small by
    construction (sources, not rows), so the single-partition window is
    a few-row driver-sized frame, not a data-scale sort."""
    powed = F.round(F.pow(F.count(F.lit(1)).cast("double"), F.lit(alpha)), 6).cast(
        "decimal(28,12)"
    )
    per = df.groupBy(F.col(stratum_column)).agg(
        F.count(F.lit(1)).alias("n_docs"), powed.alias("__p")
    )
    total = Window.partitionBy()
    return per.select(
        F.col(stratum_column),
        "n_docs",
        F.round(F.col("__p") / F.sum("__p").over(total), 9).cast("double").alias("weight"),
    )


def temperature_mix(
    df: DataFrame,
    stratum_column: str,
    id_column: str,
    *,
    alpha: float = 0.5,
    target_rows: int,
) -> DataFrame:
    """Apply temperature-smoothed mixing: compute per-source weights
    (``temperature_weights``), convert to per-source keep-rates for a
    ``target_rows`` budget (``rate_s = min(1, weight_s * target /
    n_s)``), and select rows with the deterministic hash-prefix filter
    (``weighted_mix``) — reproducible across runs/engines/retries.

    The weights collect is one row per SOURCE (an index-build-sized
    parameter, like IVF centroids), not a data collect."""
    stats = temperature_weights(df, stratum_column, alpha=alpha).collect()
    rates = {
        row[stratum_column]: min(1.0, row["weight"] * target_rows / row["n_docs"])
        for row in stats
    }
    return weighted_mix(df, stratum_column, rates, id_column)


def token_budget_select(
    df: DataFrame,
    *,
    budget: int,
    quality_column: str = "quality",
    token_column: str = "n_tokens",
    id_column: str = "doc_id",
    bucket_decimals: int = 6,
) -> DataFrame:
    """Fill a token budget with the best documents: order by quality
    (descending, ties by id), keep documents while the running token
    total stays within ``budget``. The standard "select the top-quality
    slice worth N tokens" curation step in a training-data pipeline.

    Semantically this is ``SUM(tokens) OVER (ORDER BY quality DESC,
    id) <= budget`` — but a global ORDER BY window in Spark collapses
    to a SINGLE partition (Window.orderBy without partitionBy), which
    is exactly the plan that dies at 100 TB. Instead, two phases:

    1. Round quality to ``bucket_decimals`` and aggregate per-bucket
       token totals — a tiny frame (bounded by distinct rounded
       scores, <= 10^bucket_decimals+1, independent of corpus size).
       The running total over THAT frame finds each bucket's
       token-count offset; buckets whose offset already exceeds the
       budget are dropped before any row-level work.
    2. Broadcast the surviving bucket offsets back and compute the
       row-level running total with a window PARTITIONED BY bucket
       (parallel, state bounded by one bucket's rows) ordered by id.
       ``cum_tokens = bucket_offset + within-bucket running total``
       equals the global running total exactly (integer arithmetic).

    Zero-token rows must be filtered upstream (asserted nowhere — the
    caller owns tokenization): they would sit exactly ON a budget
    boundary and make "bucket fully excluded" diverge from the
    row-level rule. Worst case is every document sharing one rounded
    score (phase 2 degenerates to the single-partition window); with a
    real-valued quality signal buckets stay small — raise
    ``bucket_decimals`` if a discrete score concentrates mass.

    Output: the input rows plus ``cum_tokens`` (BIGINT running total in
    selection order)."""
    q = F.round(F.col(quality_column), bucket_decimals)
    scored = df.withColumn("__q", q)
    buckets = (
        scored.groupBy("__q")
        .agg(F.sum(token_column).cast("long").alias("__btoks"))
        .withColumn(
            "__offset",
            F.sum("__btoks").over(Window.orderBy(F.col("__q").desc())).cast("long")
            - F.col("__btoks"),
        )
    )
    keep = buckets.filter(F.col("__offset") < budget).select("__q", "__offset")
    wb = Window.partitionBy("__q").orderBy(F.col(id_column).asc())
    return (
        scored.join(F.broadcast(keep), "__q")
        .withColumn(
            "cum_tokens",
            (F.col("__offset") + F.sum(token_column).over(wb)).cast("long"),
        )
        .filter(F.col("cum_tokens") <= F.lit(budget))
        .drop("__q", "__offset")
    )


def quota_temperature_mix(
    df: DataFrame,
    stratum_column: str,
    id_column: str,
    *,
    budget: int | None = None,
    tau: float = 0.5,
) -> DataFrame:
    """EXACT-QUOTA temperature mixing — the deterministic-count
    companion to rate-based ``temperature_mix`` above: where that one
    converts weights to per-row keep-RATES (hash-prefix membership —
    counts land within hash-quantization noise of the target, rows
    keep/drop independently), this one hands each stratum s a hard
    quota floor(B * n_s^tau / Σ_t n_t^tau) and takes EXACTLY that many
    rows (or all of a smaller stratum) by md5(id) rank — the shape a
    fixed-size training-mix manifest needs (quota_s rows, not
    "≈quota_s whp").

    ``budget`` B defaults to half the input rows (computed in-plan, so
    the operator is scale-invariant). tau=0.5 is the cross-engine-
    exact configuration — IEEE sqrt is correctly rounded, and the
    weight sum folds LEFT-TO-RIGHT over strata in ascending order, so
    quotas replay bit-for-bit in a SQL oracle; other tau values run
    through pow(), whose last ulp is libm-dependent (fine in
    production, not oracle-pinned — quota boundaries could flip).

    Plan shape: one bounded groupBy(stratum) count, a one-row stats
    frame broadcast onto the quota table (|strata| rows, broadcast),
    and one rank-within-stratum window over the data — the same single
    data shuffle a plain stratified sample costs."""
    from pyspark.sql import Window

    wfn = (
        (lambda c: F.sqrt(c))
        if tau == 0.5
        else (lambda c: F.pow(c, F.lit(float(tau))))
    )
    counts = df.groupBy(stratum_column).agg(F.count(F.lit(1)).alias("__n"))
    stats = counts.agg(
        F.sum("__n").cast("long").alias("__total"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(stratum_column, "__n"))),
            F.lit(0.0),
            lambda acc, s: acc + wfn(s["__n"].cast("double")),
        ).alias("__W"),
    )
    budget_col = (
        F.lit(int(budget)).cast("long")
        if budget is not None
        else F.expr("__total div 2")
    )
    quotas = (
        counts.join(F.broadcast(stats))
        .select(
            stratum_column,
            F.floor(
                budget_col.cast("double")
                * wfn(F.col("__n").cast("double"))
                / F.col("__W")
            )
            .cast("long")
            .alias("__quota"),
        )
    )
    w = Window.partitionBy(stratum_column).orderBy(
        F.md5(F.col(id_column).cast("string")).asc(), F.col(id_column).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(quotas), stratum_column)
        .filter(F.col("__rn") <= F.col("__quota"))
        .drop("__rn", "__quota")
    )


def domain_reweight(
    df: DataFrame,
    domain_column: str,
    score_column: str,
    *,
    eta: float = 1.0,
    baseline: str = "counts",
) -> DataFrame:
    """DoReMi-flavored domain reweighting (Xie et al. 2023, public —
    one exponentiated-gradient step): per-domain sampling weights
    boosted by how much WORSE the domain scores than the corpus under
    a reference quality signal (mean LM logprob from
    ``unigram_logprob``/``bigram_logprob``, a classifier margin, any
    higher-is-better score). DoReMi's insight is that excess loss —
    not raw size — should set mixture weights; the full algorithm
    iterates against a retraining proxy model, which is a training
    loop, not a data operator. The data-side step IS this one
    multiplicative update, applied to whatever score column the
    caller's current proxy produced:

        excess_d = corpus_mean - domain_mean        (worse => positive)
        boost_d  = exp(eta * excess_d)
        weight_d = base_d * boost_d / sum(base * boost)

    ``baseline="counts"`` starts from natural proportions (base_d =
    n_d, the DoReMi initialization); ``"uniform"`` starts flat
    (base_d = 1).

    Returns one row per domain: (domain, n_docs, mean_score, excess,
    weight).

    Cross-engine float discipline (the ``temperature_weights``
    pattern): per-row scores round to 6 and accumulate as exact
    DECIMAL (double summation is order-dependent — a shuffle would
    change the hash); means/excess stay DECIMAL; the one exp() output
    rounds to 6 back into DECIMAL; the single normalizing division
    rounds to 9 before the one DOUBLE cast. The unpartitioned window
    runs over the per-DOMAIN aggregate — a few-row frame (domains,
    not rows), never a data-scale sort; the only data-scale operation
    is one map-side-combined groupBy."""
    if baseline not in ("counts", "uniform"):
        raise ValueError(
            f"domain_reweight: baseline={baseline!r} must be 'counts' "
            "or 'uniform'"
        )
    s6 = F.round(F.col(score_column).cast("double"), 6).cast("decimal(28,12)")
    per = df.groupBy(F.col(domain_column)).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(s6).alias("__s"),
    )
    w = Window.partitionBy()
    per = per.select(
        F.col(domain_column),
        "n_docs",
        F.round(F.col("__s") / F.col("n_docs"), 9).alias("__m"),
        F.round(
            F.sum("__s").over(w) / F.sum("n_docs").over(w), 9
        ).alias("__ref"),
    )
    # DECIMAL(18,6) operands, not (28,12): the (28,12)x(28,12) product
    # needs precision 57, so Spark clips the result to scale 6 and the
    # later normalizing division bottoms out at 6 places — the quotient
    # would round-trip as a 6-digit weight. (18,6)x(18,6) -> (37,12)
    # stays exact (both factors have <= 6 decimals) and the division
    # keeps scale 13, comfortably past the round-9 contract.
    boost = F.round(
        F.exp(
            F.lit(float(eta))
            * (F.col("__ref") - F.col("__m")).cast("double")
        ),
        6,
    ).cast("decimal(18,6)")
    base = (
        F.col("n_docs").cast("decimal(18,6)")
        if baseline == "counts"
        else F.lit(1).cast("decimal(18,6)")
    )
    per = per.withColumn("__u", base * boost)
    # the normalizing division runs in DOUBLE: Spark's decimal division
    # clamps this quotient's scale to 6 ((37,12)/(38,12) -> (38,6)),
    # which would truncate the round-9 contract; both operands are
    # exact decimals, so the one IEEE division is deterministic in any
    # engine (the temperature_weights single-division discipline)
    return per.select(
        F.col(domain_column),
        "n_docs",
        F.col("__m").cast("double").alias("mean_score"),
        (F.col("__ref") - F.col("__m")).cast("double").alias("excess"),
        F.round(
            F.col("__u").cast("double")
            / F.sum("__u").over(w).cast("double"),
            9,
        ).alias("weight"),
    )
