"""Mergeable-summary operators on the Apache DataSketches builtins
(Spark 4 ``kll_sketch_*`` / ``theta_sketch_*`` / ``hll_*`` SQL
functions; DataSketches library, Apache — public).

THE 100 TB pattern these exist for: aggregate once into per-partition
(per-day, per-source) SKETCH rows — kilobytes each — then answer
corpus-wide questions by MERGING sketches, never rereading data. A
year of daily quantile/distinct summaries collapses to 365 binary
cells; any date-range query is a fold over the slice. HLL variants of
this pattern already power ``rolling_active_users_approx`` and the
streaming actives state (``streaming/actives.py``); this module adds
the quantile (KLL) and set-operation-capable distinct (theta) halves.

Exactness contract (the oracle lever, same family as NOTES lore #22):
a DataSketches sketch is EXACT below its retained-item capacity — KLL
retains all items while n <= k, theta stores every distinct hash under
its nominal entry count. Size the parameter above fixture cardinality
and the "approximate" rollup carries a full value oracle at driver
scale (verified: KLL-below-capacity == DuckDB ``quantile_disc``,
merged and per-group); above capacity (the bench/audit scales and
production) the same plan degrades gracefully to the sketch's
published error bounds. Docstrings on the registered queries state
which regime each scale runs in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kll_quantile_rollup(
    df: DataFrame,
    value_column: str,
    group_column,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.9),
    k: int = 16384,
    total_sentinel: int = -1,
) -> DataFrame:
    """Per-group KLL value-quantile summaries plus the MERGED overall
    row (group = ``total_sentinel``): one aggregation builds the
    per-group sketches; the overall quantiles come from folding the
    group sketches — the corpus is read once. Quantile columns are
    ``q_25``-style (rank x100)."""
    per = (
        df.select(group_column.alias("grp"), F.col(value_column).alias("v"))
        .groupBy("grp")
        .agg(F.kll_sketch_agg_double("v", F.lit(k)).alias("sk"))
    )
    # an EMPTY merged sketch (zero input rows) is a valid buffer with
    # n=0 that get_quantile rejects — guard so an empty frame yields
    # NULL quantiles instead of KLL_INVALID_INPUT (review follow-up)
    qcols = lambda sk: [  # noqa: E731
        F.when(
            F.kll_sketch_get_n_double(sk) > 0,
            F.kll_sketch_get_quantile_double(sk, F.lit(q)),
        ).alias(f"q_{int(round(q * 100))}")
        for q in quantiles
    ]
    per_rows = per.select(F.col("grp").cast("long").alias("grp"), *qcols(F.col("sk")))
    # kll_merge_agg_double is the aggregate union (a collect_list +
    # binary-merge fold would crash on an EMPTY group frame: slice with
    # negative length under ANSI; review finding)
    merged = per.agg(F.kll_merge_agg_double("sk", F.lit(k)).alias("m")).select(
        F.lit(int(total_sentinel)).cast("long").alias("grp"), *qcols(F.col("m"))
    )
    return per_rows.unionByName(merged)


def theta_distinct_rollup(
    df: DataFrame,
    key_column: str,
    group_column,
    lg_nom_entries: int = 12,
    total_sentinel: int = -1,
) -> DataFrame:
    """Per-group theta distinct-count summaries plus the UNION overall
    row: theta (unlike HLL) also supports intersection/difference
    downstream, which is why dedup/overlap tooling stores theta state.
    ``theta_union_agg`` folds the group sketches."""
    per = (
        df.select(group_column.alias("grp"), F.col(key_column).alias("k"))
        .groupBy("grp")
        .agg(F.theta_sketch_agg("k", F.lit(lg_nom_entries)).alias("sk"))
    )
    per_rows = per.select(
        F.col("grp").cast("long").alias("grp"),
        F.theta_sketch_estimate("sk").cast("long").alias("n_distinct"),
    )
    union_row = per.agg(
        F.theta_sketch_estimate(F.theta_union_agg("sk", F.lit(lg_nom_entries)))
        .cast("long")
        .alias("n_distinct")
    ).select(F.lit(int(total_sentinel)).cast("long").alias("grp"), "n_distinct")
    return per_rows.unionByName(union_row)


def theta_overlap_rollup(
    df: DataFrame,
    key_column: str,
    group_column,
    lg_nom_entries: int | None = None,
) -> DataFrame:
    """Consecutive-group audience flow from theta SET OPERATIONS — the
    capability HLL sketches fundamentally lack: per group pair
    (prev -> cur), ``n_returning`` (intersection), ``n_churned``
    (prev difference cur), ``n_new`` (cur difference prev). The
    per-group sketch frame is tiny (one row per group), so the lag
    window and estimates are free; the corpus was read once to build
    the sketches. Exact below nominal-entry capacity, published-RSE
    estimates above it. ``lg_nom_entries`` sizes the per-group sketch
    (builtin default 2^12 when None); the estimating-regime accuracy
    pin passes a deliberately tiny capacity to force estimates at
    driver scale."""
    from pyspark.sql import Window

    agg = (
        F.theta_sketch_agg("k")
        if lg_nom_entries is None
        else F.theta_sketch_agg("k", F.lit(lg_nom_entries))
    )
    per = (
        df.select(group_column.alias("grp"), F.col(key_column).alias("k"))
        .groupBy("grp")
        .agg(agg.alias("sk"))
    )
    w = Window.orderBy("grp")
    paired = per.select(
        F.col("grp").cast("long").alias("grp"),
        F.col("sk"),
        F.lag("sk").over(w).alias("prev_sk"),
    ).filter(F.col("prev_sk").isNotNull())
    return paired.select(
        "grp",
        F.theta_sketch_estimate(F.expr("theta_intersection(prev_sk, sk)"))
        .cast("long")
        .alias("n_returning"),
        F.theta_sketch_estimate(F.expr("theta_difference(prev_sk, sk)"))
        .cast("long")
        .alias("n_churned"),
        F.theta_sketch_estimate(F.expr("theta_difference(sk, prev_sk)"))
        .cast("long")
        .alias("n_new"),
    )


def approx_topk_rollup(
    df: DataFrame,
    item_column: str,
    group_column,
    k: int = 3,
    max_items_tracked: int = 4096,
    total_sentinel: int = -1,
) -> DataFrame:
    """Per-group heavy hitters plus the MERGED overall row via the
    Spark 4.1 ``approx_top_k_*`` mergeable frequent-items sketch
    family — the same one-scan-then-merge shape as the KLL/theta
    rollups: the corpus is read once into per-group sketch states;
    any cross-group answer folds states with
    ``approx_top_k_combine``, never rereads data.

    Output is (grp, rank, item, cnt) with rank 1..k by count DESC.
    Exactness contract (lore #22, as for KLL/theta): the sketch is
    EXACT while the number of distinct items stays at or below
    ``max_items_tracked`` — size it above the slice cardinality and
    the rollup carries a full value oracle on (rank, cnt) at driver
    scale (item identity at tied counts is selection-arbitrary in ANY
    engine, so oracles should compare rank+count, not item). Above
    capacity the estimates degrade to the DataSketches frequent-items
    error bound (|estimate - true| <= stream_n / max_items_tracked;
    the sketch reports within that envelope, not one-sided)."""
    per = (
        df.select(group_column.alias("grp"), F.col(item_column).alias("it"))
        .groupBy("grp")
        .agg(
            F.expr(f"approx_top_k_accumulate(it, {int(max_items_tracked)})").alias(
                "st"
            )
        )
    )
    def explode_topk(frame: DataFrame) -> DataFrame:
        est = F.expr(f"approx_top_k_estimate(st, {int(k)})")
        return frame.select(
            F.col("grp").cast("long").alias("grp"),
            F.posexplode(est).alias("pos", "e"),
        ).select(
            "grp",
            (F.col("pos") + 1).cast("long").alias("rank"),
            F.col("e.item").cast("string").alias("item"),
            F.col("e.count").cast("long").alias("cnt"),
        )

    merged = per.agg(
        F.expr(f"approx_top_k_combine(st, {int(max_items_tracked)})").alias("st")
    ).select(F.lit(int(total_sentinel)).alias("grp"), "st")
    return explode_topk(per).unionByName(explode_topk(merged))
