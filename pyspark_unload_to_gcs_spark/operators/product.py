"""Product-analytics operators over event streams: funnels, retention
cohorts, rolling active users.

These are the workloads the reference's upstream product (event
analytics; see SURVEY.md §1 — the reference exports event tables for
exactly this kind of downstream analysis) runs constantly; here they
are first-class distributed operators instead of export-then-analyze.

Scale posture (100 TB of events):
- Funnel: ONE shuffle (groupBy user) + a per-user fold over the sorted
  event array (builtin ``F.aggregate``; state is a tiny struct, the
  lambda touches only attributes — cheap interpreted ops, no UDF).
  Event arrays per user are bounded by per-user activity, not corpus
  size; skewed power users can be pre-capped upstream if needed.
- Retention: two aggregations over (user, period) pairs — the first
  collapses raw events to distinct user-periods (map-side partial
  dedup), everything after is |users|-scale, not |events|-scale.
- Rolling actives: each distinct (user, day) explodes into the
  ``window`` trailing windows it serves — a narrow fan-out, no join,
  one scan; the HLL variant collapses to one mergeable sketch per day
  so even the user-day frame is touched exactly once.

Time is handled as epoch-ms BIGINT from ``functions.timestamps``
(session-tz independent), with integer day/7-day-bucket arithmetic so
any SQL engine reproduces the boundaries exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_unload_to_gcs_spark.functions.timestamps import epoch_ms

MS_PER_DAY = 86_400_000


def day_number(ts_ms: Column) -> Column:
    """Integral day index since the epoch (ms // 86_400_000). Floor
    division keeps bucket boundaries bit-identical across engines and
    correct for pre-epoch timestamps (double division then cast would
    truncate toward zero)."""
    return F.floor(ts_ms / F.lit(MS_PER_DAY)).cast("bigint")


def funnel(
    events: DataFrame,
    steps: list[str],
    *,
    user_column: str = "user_id",
    time_column: str = "ts",
    type_column: str = "event_type",
    extra_group_columns: tuple[str, ...] = (),
) -> DataFrame:
    """Strict ordered funnel: per user, ``step_i`` completes at the
    FIRST occurrence of ``steps[i]`` strictly after the completion of
    ``step_{i-1}`` (first-touch semantics — the canonical product-
    analytics funnel).

    Returns one row per user who completed step 1, with nullable
    ``step{i}_ms`` epoch-ms columns. Conversion counts are a trivial
    aggregation over this frame.

    Implementation: one groupBy(user) collecting (ts, type) structs,
    ``sort_array`` (chronological; struct compare breaks ties by type),
    then a single ``F.aggregate`` fold carrying the step-timestamp
    struct. The fold sees each event once, so the whole funnel is one
    shuffle + O(events-per-user) work — no per-step joins, no windows,
    no Python. The events scan is pre-filtered to the step types, so
    irrelevant events never shuffle.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    ev = events.select(
        F.col(user_column).alias("user_id"),
        *extra_group_columns,
        epoch_ms(events, time_column).alias("__ts_ms"),
        F.col(type_column).alias("__etype"),
    ).filter(F.col("__etype").isin(list(steps)))

    per_user = ev.groupBy("user_id", *extra_group_columns).agg(
        F.sort_array(F.collect_list(F.struct("__ts_ms", "__etype"))).alias("__seq")
    )

    n = len(steps)
    zero = F.struct(
        *[F.lit(None).cast("bigint").alias(f"s{i}") for i in range(n)]
    )

    def fold(acc: Column, e: Column) -> Column:
        fields = []
        for i, step in enumerate(steps):
            if i == 0:
                # first step has no time gate (an epoch-0 literal would
                # wrongly exclude pre-1970 events)
                ordered = F.lit(True)
            else:
                prev = acc[f"s{i - 1}"]
                ordered = prev.isNotNull() & (e["__ts_ms"] > F.coalesce(prev, F.lit(0)))
            hit = acc[f"s{i}"].isNull() & ordered & (e["__etype"] == step)
            fields.append(
                F.coalesce(acc[f"s{i}"], F.when(hit, e["__ts_ms"])).alias(f"s{i}")
            )
        return F.struct(*fields)

    folded = per_user.select(
        "user_id", *extra_group_columns, F.aggregate("__seq", zero, fold).alias("__f")
    )
    out = folded.select(
        "user_id",
        *extra_group_columns,
        *[F.col(f"__f.s{i}").alias(f"step{i + 1}_ms") for i in range(n)],
    )
    return out.filter(F.col("step1_ms").isNotNull())


def retention_cohorts(
    events: DataFrame,
    *,
    user_column: str = "user_id",
    time_column: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users bucketed by their first-activity
    period (``period_days``-day buckets anchored at the epoch), counted
    in every later period they return. Returns
    (cohort_period, period_offset, n_users).

    Three shuffles, one scan: raw events collapse to DISTINCT
    (user, period) pairs (the |events| -> |user-periods| reduction
    happens map-side in the distinct's partial aggregation), a
    whole-partition window min derives each user's cohort WITHOUT
    re-scanning events or joining back, and the final rollup uses a
    plain count — (user, period_offset) is already unique per row
    (period = cohort + offset and cohort is constant per user), so a
    count-distinct's extra dedup exchange would be pure waste.
    """
    per = user_periods(
        events, user_column=user_column, time_column=time_column, period_days=period_days
    )
    return retention_matrix_from_periods(per)


def user_periods(
    events: DataFrame,
    *,
    user_column: str = "user_id",
    time_column: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Distinct (user_id, period) activity pairs — the shared
    user-scale substrate of retention/growth analytics, and the
    mergeable STATE of their streaming twins (set union = distinct, so
    folding a batch in is idempotent under retries)."""
    pd_ms = period_days * MS_PER_DAY
    return (
        events.select(
            F.col(user_column).alias("user_id"),
            (epoch_ms(events, time_column) / F.lit(pd_ms)).cast("bigint").alias("period"),
        )
        .distinct()
    )


def retention_matrix_from_periods(per: DataFrame) -> DataFrame:
    """Cohort matrix from a distinct (user_id, period) frame (see
    retention_cohorts for the full semantics)."""
    from pyspark.sql import Window

    cohort = F.min("period").over(Window.partitionBy("user_id"))
    return (
        per.withColumn("cohort_period", cohort)
        .groupBy(
            "cohort_period",
            (F.col("period") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def rolling_active_users(
    events: DataFrame,
    *,
    user_column: str = "user_id",
    time_column: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Per observed day: exact distinct actives that day (DAU) and over
    the trailing ``window_days`` (e.g. WAU/MAU). Returns
    (day_num, dau, wau).

    Exact rolling distinct cannot use a window frame (distinct doesn't
    decompose), so: collapse to distinct (user, day), then EXPLODE each
    user-day into the ``window_days`` trailing windows it serves (a
    narrow ×window_days fan-out — no day-dimension join, no second
    scan) and aggregate per window-end day. Observed days are recovered
    by ``dau > 0`` (a window-end with no same-day activity is not an
    observed day), and dau itself is a plain conditional count because
    (user, day) rows are already distinct. One scan, one distinct
    shuffle, one distinct-aggregate chain.
    """
    user_days = (
        events.select(
            F.col(user_column).alias("user_id"),
            day_number(epoch_ms(events, time_column)).alias("day_num"),
        )
        .distinct()
    )
    slots = user_days.select(
        "user_id",
        "day_num",
        F.explode(
            F.sequence(F.col("day_num"), F.col("day_num") + (window_days - 1))
        ).alias("d"),
    )
    return (
        slots.groupBy(F.col("d").alias("day_num"))
        .agg(
            F.count(F.when(F.col("day_num") == F.col("d"), 1)).alias("dau"),
            F.countDistinct("user_id").alias("wau"),
        )
        .filter(F.col("dau") > 0)
    )


def rolling_active_users_approx(
    events: DataFrame,
    *,
    user_column: str = "user_id",
    time_column: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Sketch-based rolling actives — the 100 TB path where even the
    distinct (user, day) frame is too heavy to fan out: ONE pass builds
    a mergeable HLL sketch per day (|days| rows of ~KB sketches), and
    the trailing window is a union of sketches over that tiny per-day
    table — window cost is days x window_days sketch merges,
    independent of user cardinality. Returns (day_num, dau_approx,
    wau_approx); ±~2-3% standard HLL error (lgConfigK default 12).
    """
    per_day = (
        events.select(
            F.col(user_column).alias("user_id"),
            day_number(epoch_ms(events, time_column)).alias("day_num"),
        )
        .groupBy("day_num")
        .agg(F.hll_sketch_agg("user_id").alias("sketch"))
    )
    slots = per_day.select(
        "day_num",
        "sketch",
        F.explode(
            F.sequence(F.col("day_num"), F.col("day_num") + (window_days - 1))
        ).alias("d"),
    )
    merged = (
        slots.groupBy(F.col("d"))
        .agg(
            F.max(F.when(F.col("day_num") == F.col("d"), 1)).alias("__observed"),
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("wau_approx"),
        )
        .filter(F.col("__observed") == 1)
    )
    day_est = per_day.select(
        "day_num", F.hll_sketch_estimate("sketch").alias("dau_approx")
    )
    return merged.select(F.col("d").alias("day_num"), "wau_approx").join(
        day_est, "day_num"
    ).select("day_num", "dau_approx", "wau_approx")


def growth_accounting(
    events: DataFrame,
    *,
    user_column: str = "user_id",
    time_column: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Growth accounting: per period, users who are NEW (first-ever
    activity), RETAINED (also active the previous period), RESURRECTED
    (active before, but not the previous period), and CHURNED (active
    the previous period, absent this one). Active = new + retained +
    resurrected; net growth = new + resurrected - churned.

    One scan, user-scale after the first distinct: per-user period
    ordering comes from lag/lead windows over the distinct
    (user, period) frame; churn is attributed to the period AFTER the
    user's last consecutive activity (emitted via a shifted
    contribution union, so churn rows exist even for periods where no
    other activity happened — then inner-restricted to observed
    periods, matching the convention that the report covers periods
    with any activity).
    """
    from pyspark.sql import Window

    per = user_periods(
        events, user_column=user_column, time_column=time_column, period_days=period_days
    )
    return growth_accounting_from_periods(per)


def growth_accounting_from_periods(per: DataFrame) -> DataFrame:
    """Growth accounting from a distinct (user_id, period) frame — the
    same substrate (and streaming state) retention reads; one folded
    state serves both views."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("period")
    marked = per.select(
        "user_id",
        "period",
        F.lag("period").over(w).alias("prev_p"),
        F.lead("period").over(w).alias("next_p"),
        F.min("period").over(Window.partitionBy("user_id")).alias("first_p"),
    )
    activity = marked.select(
        "period",
        F.when(F.col("period") == F.col("first_p"), 1).otherwise(0).alias("is_new"),
        F.when(F.col("prev_p") == F.col("period") - 1, 1).otherwise(0).alias("is_retained"),
        F.when(
            (F.col("period") != F.col("first_p"))
            & (F.coalesce(F.col("prev_p"), F.lit(-(1 << 62))) < F.col("period") - 1),
            1,
        )
        .otherwise(0)
        .alias("is_resurrected"),
        F.lit(0).alias("is_churned"),
    )
    churn = marked.filter(
        F.col("next_p").isNull() | (F.col("next_p") > F.col("period") + 1)
    ).select(
        (F.col("period") + 1).alias("period"),
        F.lit(0).alias("is_new"),
        F.lit(0).alias("is_retained"),
        F.lit(0).alias("is_resurrected"),
        F.lit(1).alias("is_churned"),
    )
    observed = per.select("period").distinct()
    return (
        activity.unionByName(churn)
        .join(observed, "period", "left_semi")
        .groupBy("period")
        .agg(
            F.sum("is_new").alias("n_new"),
            F.sum("is_retained").alias("n_retained"),
            F.sum("is_resurrected").alias("n_resurrected"),
            F.sum("is_churned").alias("n_churned"),
        )
    )


def gap_fill_daily(
    df: DataFrame,
    *,
    user_column: str = "user_id",
    ts_column: str = "ts",
) -> DataFrame:
    """Date-spine gap fill: per user, one row for EVERY day in that
    user's [first-active, last-active] span — observed days carry
    their event count, missing days materialize with ``n_events = 0``
    and ``is_gap = true``. The time-series resample/fill every
    downstream rolling computation wants (a window over gap-filled
    rows needs no range-frame gymnastics), expressed as plain
    relational algebra:

        per_day  = groupBy(user, day) count            -- 1 shuffle
        spans    = groupBy(user) min/max day           -- re-agg of per_day
        spine    = explode(sequence(d0, d1)) per user  -- no shuffle
        filled   = spine LEFT JOIN per_day ON (user, day)

    Days are integral epoch-day indices (``day_number`` — floor ms
    division, bit-identical across engines). Spine cardinality is
    sum-of-spans, bounded by users x horizon days — at 100 TB the
    explode happens after the aggregation, so it scales with USERS,
    never with events; skewed long-lived users inflate their own
    partition by at most the horizon length. ``sequence(d0, d1)`` is
    safe unguarded: d0 <= d1 by construction (min <= max within a
    group)."""
    per_day = (
        df.select(
            F.col(user_column),
            day_number(epoch_ms(df, ts_column)).alias("day"),
        )
        .groupBy(user_column, "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    spine = (
        per_day.groupBy(user_column)
        .agg(F.min("day").alias("__d0"), F.max("day").alias("__d1"))
        .select(
            user_column,
            F.explode(F.sequence("__d0", "__d1")).alias("day"),
        )
    )
    return spine.join(per_day, [user_column, "day"], "left").select(
        F.col(user_column),
        F.col("day").cast("long").alias("day"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.col("n_events").isNull().alias("is_gap"),
    )
