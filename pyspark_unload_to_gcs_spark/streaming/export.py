"""Streaming export sink: ``foreachBatch`` + the batch writers.

Each micro-batch is exported exactly like one orchestrated incremental
run of the reference job (gzip JSON/CSV partition under the output URI),
with Spark's checkpointing replacing the reference's
orchestrator-persisted ``time_cutoff_ms`` watermark
(export.py:131-158, 333-337): on restart the source resumes from the
checkpoint, so each row is exported once per batch epoch.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from pyspark_unload_to_gcs_spark.config import SyncConfig
from pyspark_unload_to_gcs_spark.operators.hashing import content_hash
from pyspark_unload_to_gcs_spark.sinks.writers import write_export


@dataclass
class StreamExportStats:
    """Driver-side per-batch log (observable progress; tiny)."""

    batches: list[tuple[int, int]] = field(default_factory=list)  # (batch_id, rows)

    @property
    def total_rows(self) -> int:
        return sum(r for _, r in self.batches)


def start_stream_export(
    df: DataFrame,
    config: SyncConfig,
    *,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    count_rows: bool = False,
):
    """Start a streaming export; returns (StreamingQuery, stats).

    ``trigger_available_now=True`` drains everything currently available
    then stops — the direct replacement for one orchestrated incremental
    run. ``count_rows`` adds a per-batch count action (observability at
    small scale; leave off at 100 TB where the write itself reports row
    counts via task metrics).
    """
    stats = StreamExportStats()

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        hashed = content_hash(
            batch_df, config.computed_hash_column, config.computed_hash_ignore_columns
        )
        batch_config = SyncConfig(
            table=config.table,
            export_format=config.export_format,
            output_uri=f"{config.output_uri.rstrip('/')}/batch={batch_id}",
            compression=config.compression,
            max_records_per_file=config.max_records_per_file,
            single_file=config.single_file,
        )
        write_export(hashed, batch_config)
        stats.batches.append((batch_id, batch_df.count() if count_rows else -1))

    writer = df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), stats
