"""Incremental sessionization via ``foreachBatch`` folds with versioned
parquet state — the sessions member of the versioned-state streaming
family (rollup, MERGE snapshot, token budget).

The ``applyInPandasWithState`` sessionizer (streaming/sessionize.py)
holds its state inside the streaming engine; this fold holds it in a
versioned parquet directory instead, so the same gap semantics run as a
plain ``foreachBatch`` loop (no TWS runtime dependency), are
exactly-once across retries, and are REPLAYABLE as deterministic batch
folds — which is what gives the operator a driver-checkable oracle.

State ``v=<batch_id>``: ONE open-session row per user
``(user_id, session_seq, n_events, start_ms, last_ms)`` — O(users),
never O(events), the same cardinality class as the groupBy itself.
Closed sessions append to ``closed/v=<batch_id>`` (overwritten on
retry, so a replayed batch rewrites the identical rows).

PRECONDITION (the availableNow/file-stream contract): batches must be
event-time ordered PER USER across batches — every event in batch b+1
is >= that user's last event in batches <= b. Within a batch, order is
free (the fold sorts). Late cross-batch data needs the watermarked TWS
sessionizer instead.

Batch-equality: given the ordering precondition, folding batches
b0..bn then ``finalize`` yields EXACTLY the batch
``operators/sessions.session_stats`` output — the gap rule
``new session iff ts - prev_ts > gap`` is evaluated pairwise on
adjacent events per user, and the fold sees exactly the same adjacent
pairs (the open-state row stands in for the previous batch's last
event, carrying the accumulated (seq, n_events, start)). Pinned by
tests/test_streaming.py and the staged ``sessionize_stream_replay``
oracle.

Exactly-once protocol (same as streaming/rollup.py): state ``v=b`` is
derived ONLY from the latest version ``< b`` plus the batch rows, and
both writes are overwrite-by-version — a retried batch rewrites
identical output instead of double-counting.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_unload_to_gcs_spark.functions.timestamps import epoch_ms
from pyspark_unload_to_gcs_spark.streaming.rollup import _versions, read_state

STATE_COLUMNS = ("user_id", "session_seq", "n_events", "start_ms", "last_ms")
CLOSED_COLUMNS = (
    "user_id",
    "session_seq",
    "n_events",
    "start_ms",
    "end_ms",
    "duration_ms",
)


def fold_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    state_path: str,
    user_column: str = "user_id",
    time_column: str = "ts",
    gap_ms: int = 30 * 60 * 1000,
) -> None:
    """Fold one micro-batch of events into the versioned session state.

    One shuffle on ``user_column`` (state rows union event rows, two
    windows over the same partitioning -> a single Exchange), then one
    narrow aggregation per (user, segment). Deterministic in
    (state@<batch_id, batch rows): safe on foreachBatch retry.
    """
    spark = batch_df.sparkSession
    ts_ms = epoch_ms(batch_df, time_column)
    events = batch_df.select(
        F.col(user_column).alias("user_id"),
        ts_ms.alias("__ts"),
        F.lit(0).alias("__is_state"),
        F.lit(None).cast("long").alias("__st_seq"),
        F.lit(None).cast("long").alias("__st_nev"),
        F.lit(None).cast("long").alias("__st_start"),
    )
    prev = read_state(spark, state_path, before=batch_id)
    if prev is not None:
        state_rows = prev.select(
            "user_id",
            F.col("last_ms").alias("__ts"),
            F.lit(1).alias("__is_state"),
            F.col("session_seq").alias("__st_seq"),
            F.col("n_events").alias("__st_nev"),
            F.col("start_ms").alias("__st_start"),
        )
        uni = events.unionByName(state_rows)
    else:
        uni = events

    # The open-state row sorts FIRST for its user (its last_ms <= every
    # batch ts under the ordering precondition; ties break state-first
    # so an equal-ts event continues the open session, gap 0).
    w = Window.partitionBy("user_id").orderBy(
        F.col("__ts").asc(), F.col("__is_state").desc()
    )
    prev_ts = F.lag("__ts").over(w)
    is_start = F.when(
        prev_ts.isNull() | ((F.col("__ts") - prev_ts) > gap_ms), F.lit(1)
    ).otherwise(F.lit(0))
    seg = F.sum(is_start).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = uni.withColumn("__seg", seg)

    grouped = marked.groupBy("user_id", "__seg").agg(
        F.max("__st_seq").alias("__st_seq"),
        F.max("__st_nev").alias("__st_nev"),
        F.max("__st_start").alias("__st_start"),
        F.max(F.when(F.col("__is_state") == 1, F.col("__ts"))).alias("__st_last"),
        F.count(F.when(F.col("__is_state") == 0, 1)).alias("__ev_count"),
        F.min(F.when(F.col("__is_state") == 0, F.col("__ts"))).alias("__ev_min"),
        F.max(F.when(F.col("__is_state") == 0, F.col("__ts"))).alias("__ev_max"),
    )
    uw = Window.partitionBy("user_id")
    # the state row (if any) is always in segment 1, so the user's base
    # seq and the continuing session's carry-over are window maxes
    sessions = grouped.select(
        "user_id",
        "__seg",
        F.max("__st_seq").over(uw).alias("__base_seq"),
        F.max("__seg").over(uw).alias("__max_seg"),
        "__st_seq",
        "__st_nev",
        "__st_start",
        "__st_last",
        "__ev_count",
        "__ev_min",
        "__ev_max",
    ).select(
        "user_id",
        F.when(
            F.col("__base_seq").isNotNull(), F.col("__base_seq") + F.col("__seg") - 1
        )
        .otherwise(F.col("__seg"))
        .cast("long")
        .alias("session_seq"),
        (F.coalesce(F.col("__st_nev"), F.lit(0)) + F.col("__ev_count"))
        .cast("long")
        .alias("n_events"),
        F.coalesce(F.col("__st_start"), F.col("__ev_min")).cast("long").alias("start_ms"),
        F.coalesce(F.col("__ev_max"), F.col("__st_last")).cast("long").alias("end_ms"),
        (F.col("__seg") == F.col("__max_seg")).alias("__open"),
    )
    # two writes consume the same frame; materialize so the window/agg
    # pipeline runs once. localCheckpoint, not persist (opt r16): a
    # CACHED plan's output partitioning is pinned to the static shuffle
    # partition count (AQE leaves cached plans alone —
    # canChangeCachedPlanOutputPartitioning default), so both writes
    # emitted one tiny part-file per static partition (measured: 32
    # files x ~2.5 KB per state version at sf0.1) and every read-back
    # re-paid the listing + footer count (guide §6). The checkpoint
    # materializes the AQE-FINAL plan — partitions coalesced by size —
    # so file count tracks state bytes at every scale. Blocks are
    # reference-managed (no unpersist bookkeeping; a foreachBatch epoch
    # cannot leak a cached frame — the align.py localCheckpoint lore).
    # An executor loss while the two writes run fails the batch instead
    # of recomputing; the retry refolds from committed state, which the
    # overwrite-by-version protocol is built for.
    sessions = sessions.localCheckpoint()
    closed = sessions.filter(~F.col("__open")).select(
        "user_id",
        "session_seq",
        "n_events",
        "start_ms",
        "end_ms",
        (F.col("end_ms") - F.col("start_ms")).alias("duration_ms"),
    )
    closed.write.mode("overwrite").parquet(
        os.path.join(state_path, "closed", f"v={batch_id}")
    )
    state = sessions.filter(F.col("__open")).select(
        "user_id",
        "session_seq",
        "n_events",
        "start_ms",
        F.col("end_ms").alias("last_ms"),
    )
    state.write.mode("overwrite").parquet(os.path.join(state_path, f"v={batch_id}"))


def read_sessions(
    spark: SparkSession, state_path: str, *, finalize: bool = True, user_id_type: str = "long"
) -> DataFrame:
    """All CLOSED sessions so far; with ``finalize=True`` the open
    state is closed as-of its last event (the availableNow end-of-input
    flush), making the result equal to batch ``session_stats`` over
    everything folded.

    Consistency under a mid-fold crash: the state write is the COMMIT
    POINT of a batch (fold_batch writes closed/v=b first, state v=b
    second), so closed logs are read only up to the latest committed
    state version — a closed/v=b left behind by a crash between the
    two writes is ignored until the retry commits v=b, preventing the
    same session appearing both closed (from the orphaned log) and
    finalized-open (from state v=b-1).

    ``user_id_type``: only used for the empty frame returned before any
    state exists — pass the actual id type when the user column is not
    a long (fold_batch itself is type-generic)."""
    import glob as _g
    import re as _re

    committed = _versions(state_path)
    latest = committed[-1] if committed else None
    closed_root = os.path.join(state_path, "closed")
    parts = []
    if latest is not None and os.path.isdir(closed_root):
        dirs = [
            d
            for d in _g.glob(os.path.join(closed_root, "v=*"))
            if (m := _re.search(r"v=(\d+)$", d))
            and int(m.group(1)) <= latest
            and os.path.exists(os.path.join(d, "_SUCCESS"))
        ]
        if dirs:
            parts.append(spark.read.parquet(*dirs).select(*CLOSED_COLUMNS))
    if finalize:
        state = read_state(spark, state_path)
        if state is not None:
            parts.append(
                state.select(
                    "user_id",
                    "session_seq",
                    "n_events",
                    "start_ms",
                    F.col("last_ms").alias("end_ms"),
                    (F.col("last_ms") - F.col("start_ms")).alias("duration_ms"),
                )
            )
    if not parts:
        return spark.createDataFrame(
            [],
            schema=", ".join(
                f"{c} {user_id_type if c == 'user_id' else 'long'}"
                for c in CLOSED_COLUMNS
            ),
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def start_incremental_sessionize(
    stream_df: DataFrame,
    *,
    state_path: str,
    checkpoint_dir: str,
    user_column: str = "user_id",
    time_column: str = "ts",
    gap_ms: int = 30 * 60 * 1000,
    trigger_available_now: bool = True,
):
    """Maintain the session state continuously; returns the
    StreamingQuery. ``read_sessions`` serves the closed-session log (+
    finalized opens) at any time without replaying event history."""
    writer = stream_df.writeStream.foreachBatch(
        lambda bdf, bid: fold_batch(
            bdf,
            bid,
            state_path=state_path,
            user_column=user_column,
            time_column=time_column,
            gap_ms=gap_ms,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
