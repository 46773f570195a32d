"""Custom stateful streaming sessionization via
``applyInPandasWithState`` — the escape hatch for stateful semantics the
builtin windows can't express (here: per-user 1-based ``session_seq``
numbering that matches the batch operator in ``operators/sessions.py``
exactly, which ``F.session_window`` does not emit).

State per user = (last event ms, session seq, open-session aggregates,
open flag). A session closes when the event-time watermark passes
last_ts + gap (EventTimeTimeout). After a close, the (last_ms, seq)
pair is retained so later sessions keep the batch-exact numbering —
state is O(distinct users), never O(events); at 100 TB that's the same
cardinality class as the groupBy itself.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_seq", LongType()),
        StructField("n_events", LongType()),
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

# state: last_ms, session_seq, n_events, start_ms, open (0/1)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("last_ms", LongType()),
        StructField("session_seq", LongType()),
        StructField("n_events", LongType()),
        StructField("start_ms", LongType()),
        StructField("open", LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    *,
    user_column: str = "user_id",
    time_column: str = "ts",
    gap_ms: int = 30 * 60 * 1000,
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Emit one row per CLOSED session (watermark-finalized), matching
    the batch ``operators.sessions.session_stats`` schema plus exact
    ``session_seq`` parity."""

    def fn(
        key: tuple, batches: Iterator["pd.DataFrame"], state: GroupState  # noqa: F821
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        user = key[0]
        closed: list[dict] = []

        def close(last_ms: int, seq: int, n: int, start: int) -> None:
            closed.append(
                {
                    "user_id": user,
                    "session_seq": seq,
                    "n_events": n,
                    "start_ms": start,
                    "end_ms": last_ms,
                    "duration_ms": last_ms - start,
                }
            )

        if state.exists:
            last_ms, seq, n, start, open_ = state.get
        else:
            last_ms, seq, n, start, open_ = 0, 0, 0, 0, 0

        if state.hasTimedOut:
            if open_:
                close(last_ms, seq, n, start)
                state.update((last_ms, seq, 0, 0, 0))  # keep seq numbering
            yield pd.DataFrame(closed, columns=[f.name for f in SESSION_OUT_SCHEMA.fields])
            return

        ts_all: list[int] = []
        for pdf in batches:
            ts_all.extend(int(v) for v in pdf["__ts_ms"].tolist())
        ts_all.sort()

        for t in ts_all:
            if not open_ or t - last_ms > gap_ms:
                if open_:
                    close(last_ms, seq, n, start)
                seq += 1
                n = 0
                start = t
                open_ = 1
            n += 1
            last_ms = t

        # If the watermark has already passed last + gap (this user went
        # quiet while other partitions advanced event time), close now —
        # setTimeoutTimestamp rejects timestamps at/below the watermark.
        wm = state.getCurrentWatermarkMs()
        if open_ and last_ms + gap_ms <= wm:
            close(last_ms, seq, n, start)
            n, start, open_ = 0, 0, 0

        state.update((last_ms, seq, n, start, open_))
        if open_:
            state.setTimeoutTimestamp(last_ms + gap_ms)
        yield pd.DataFrame(closed, columns=[f.name for f in SESSION_OUT_SCHEMA.fields])

    from pyspark.sql import functions as F

    from pyspark_unload_to_gcs_spark.functions.timestamps import epoch_ms

    prepared = (
        events.withColumn("__ts_ms", epoch_ms(events, time_column))
        .withWatermark(time_column, watermark_delay)
        .groupBy(F.col(user_column))
    )
    return prepared.applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
