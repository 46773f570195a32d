"""Streaming ingestion dedup for at-least-once upstream sources
(Kafka replays, file redeliveries, CDC retries) — two complementary
contracts:

1. ``stream_exact_dedup`` — Spark's native
   ``dropDuplicatesWithinWatermark`` (3.5+): state is keyed by the
   dedup columns and EXPIRES once the event-time watermark passes a
   key's first-seen time + delay, so state is bounded by the
   duplicate-arrival window instead of growing with the whole stream —
   the property that matters at 100 TB/day. Plain ``dropDuplicates``
   on a stream keeps every key forever; use it only when the key space
   is small and closed.

2. ``dedup_batch`` / ``start_streaming_dedup`` — UNBOUNDED
   first-write-wins with explicit versioned state, for the contract
   watermark expiry cannot give: a row may arrive again arbitrarily
   late, possibly with a MUTATED payload from a retried upstream job,
   and the FIRST accepted version must survive. Per micro-batch:
   - within the batch: collapse to the lowest ``sequence_column`` row
     per key (one hash shuffle on the key);
   - across batches: anti-join the collapsed batch against the
     accumulated state's keys (same shuffle key — exchange reuse);
   - exactly-once across RETRIES (same protocol as streaming/merge.py
     / rollup.py): state version ``v=<batch_id>`` derives only from
     the latest version ``< batch_id`` plus the batch rows, written
     with overwrite, so a retried batch rewrites the identical state
     instead of re-admitting rows.

   State is the accumulated deduped output itself (simple, and what
   the replay oracle reads back). At 100 TB the versioned rewrite is
   the documented swap point: keep only the KEY INDEX as versioned
   state and append accepted rows to an insert-only table/Delta sink —
   the collapse/anti-join algebra is unchanged.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_unload_to_gcs_spark.streaming.rollup import read_state


def stream_exact_dedup(
    events: DataFrame,
    key_columns: Sequence[str],
    *,
    time_column: str = "ts",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Drop re-deliveries of the same ``key_columns`` arriving within
    ``watermark_delay`` of the first copy (event time). Emits the FIRST
    arrival of each key; state for a key is dropped once the watermark
    passes, so a duplicate arriving later than the delay would pass
    through — choose the delay from the source's redelivery bound."""
    return events.withWatermark(time_column, watermark_delay).dropDuplicatesWithinWatermark(
        list(key_columns)
    )


def _orderable(dt) -> bool:
    """Whether a Spark type supports ORDER BY: maps are not orderable,
    and arrays/structs inherit unorderability from their element/field
    types (Catalyst RowOrdering.isOrderable semantics)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def read_deduped(
    spark: SparkSession, state_path: str, *, before: int | None = None
) -> DataFrame | None:
    """Latest committed deduped output (same layout as rollup state)."""
    return read_state(spark, state_path, before=before)


def dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    key_columns: Sequence[str],
    sequence_column: str,
    state_path: str,
) -> None:
    """Fold one micro-batch: admit only first-seen keys (module
    docstring, contract 2). Deterministic in (state@<batch_id, batch
    rows)."""
    import functools

    from pyspark.sql import Window

    spark = batch_df.sparkSession
    # deterministic within-batch collapse (review finding): sequence
    # alone leaves equal-(key, seq) rows to shuffle order, so a
    # foreachBatch RETRY could rewrite v=batch_id with a DIFFERENT
    # winner — order by every remaining column after the sequence
    # (NULL seqs last: an untagged row must not beat seq 0).
    # Map-typed payloads are not orderable (AnalysisException at plan
    # time, r08 review finding): those columns tiebreak on
    # xxhash64(to_json(col)) instead — still deterministic per row
    # content, while orderable columns keep the min-row contract.
    tiebreak = [
        F.col(f.name)
        if _orderable(f.dataType)
        else F.xxhash64(F.to_json(F.col(f.name)))
        for f in batch_df.schema.fields
        if f.name not in key_columns and f.name != sequence_column
    ]
    w = Window.partitionBy(*key_columns).orderBy(
        F.col(sequence_column).asc_nulls_last(), *tiebreak
    )
    collapsed = (
        batch_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", sequence_column)
    )
    prev = read_deduped(spark, state_path, before=batch_id)
    if prev is None:
        nxt = collapsed
    else:
        # NULL-SAFE anti-join (review finding): a plain equality anti-
        # join lets NULL-key rows through in EVERY batch (NULL = NULL
        # is NULL), re-admitting them forever while the window collapse
        # above groups NULLs — eqNullSafe makes NULL a first-class key.
        prev_keys = prev.select(
            *[F.col(k).alias(f"__pk_{k}") for k in key_columns]
        )
        cond = functools.reduce(
            lambda a, b: a & b,
            [
                collapsed[k].eqNullSafe(prev_keys[f"__pk_{k}"])
                for k in key_columns
            ],
        )
        nxt = prev.unionByName(collapsed.join(prev_keys, cond, "left_anti"))
    nxt.write.mode("overwrite").parquet(os.path.join(state_path, f"v={batch_id}"))


def start_streaming_dedup(
    stream_df: DataFrame,
    *,
    key_columns: Sequence[str],
    sequence_column: str,
    state_path: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Continuously admit first-seen rows from a stream; returns the
    StreamingQuery. ``read_deduped`` serves the accepted set."""
    writer = stream_df.writeStream.foreachBatch(
        lambda bdf, bid: dedup_batch(
            bdf,
            bid,
            key_columns=key_columns,
            sequence_column=sequence_column,
            state_path=state_path,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
