"""Streaming twin of the batch funnel (operators/product.py::funnel):
per-user strict-ordered first-touch step timestamps, maintained
incrementally over micro-batches via ``applyInPandasWithState`` and
emitted in update mode (each batch re-emits the current funnel row for
every user with new events; the LAST row per user equals the batch
answer).

Out-of-order correctness. A late-arriving early event can lower a step
answer and cascade (a new earliest 'view' re-gates which 'click'
qualifies), so per-batch folding alone is wrong under reordering. The
state instead buffers, per step, a small sorted list of candidate
timestamps and re-derives the answers on every batch:

    s_0 = min(buf_0);  s_i = min(t in buf_i where t > s_{i-1})

Buffers stay bounded by a pruning invariant: answers only DECREASE as
data arrives, so a candidate larger than the current answer for its
step can never win and is dropped; the first step keeps exactly one
value. ``max_buffer`` caps each list at its K smallest (exactness then
requires at most K step-i candidates to precede the eventual gate —
the documented memory/exactness trade at extreme reorder depths).

State is O(steps × min(K, candidates)) per user — the same cardinality
class as the batch groupBy. No timeout: a funnel has no natural close;
downstream TTL/compaction policies decide retention.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import ArrayType, LongType, StructField, StructType


def _out_schema(n_steps: int) -> StructType:
    return StructType(
        [StructField("user_id", LongType())]
        + [StructField(f"step{i + 1}_ms", LongType()) for i in range(n_steps)]
    )


def _state_schema(n_steps: int) -> StructType:
    return StructType(
        [StructField(f"buf_{i}", ArrayType(LongType())) for i in range(n_steps)]
    )


def _derive(bufs: list[list[int]]) -> list[int | None]:
    answers: list[int | None] = []
    gate: int | None = None  # first step is ungated (pre-1970 ts valid)
    for i, buf in enumerate(bufs):
        ans = None
        if i == 0:
            ans = buf[0] if buf else None
        elif gate is not None:
            for t in buf:  # sorted ascending; first t past the gate wins
                if t > gate:
                    ans = t
                    break
        answers.append(ans)
        gate = ans
    return answers


def _prune(bufs: list[list[int]], answers: list[int | None], max_buffer: int) -> list[list[int]]:
    out = []
    for i, buf in enumerate(bufs):
        if i == 0:
            keep = buf[:1]  # only the global min can ever matter
        elif answers[i] is not None:
            keep = [t for t in buf if t <= answers[i]]
        else:
            keep = buf
        out.append(keep[:max_buffer])
    return out


def funnel_stream(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_column: str = "user_id",
    time_column: str = "ts",
    type_column: str = "event_type",
    max_buffer: int = 64,
) -> DataFrame:
    """Update-mode stream of per-user funnel rows (schema matches the
    batch operator: user_id, step{i}_ms nullable). Events outside the
    step set are filtered before the stateful exchange."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    steps = list(steps)
    n = len(steps)
    out_schema, state_schema = _out_schema(n), _state_schema(n)

    def fn(
        key: tuple, batches: Iterator["pd.DataFrame"], state: GroupState  # noqa: F821
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        bufs: list[list[int]] = (
            [list(b) if b is not None else [] for b in state.get] if state.exists else [[] for _ in range(n)]
        )
        step_index = {s: i for i, s in enumerate(steps)}
        for pdf in batches:
            for t, e in zip(pdf["__ts_ms"].tolist(), pdf["__etype"].tolist()):
                bufs[step_index[e]].append(int(t))
        for buf in bufs:
            buf.sort()
        answers = _derive(bufs)
        state.update(tuple(_prune(bufs, answers, max_buffer)))
        row = {"user_id": key[0]}
        for i, a in enumerate(answers):
            row[f"step{i + 1}_ms"] = a
        yield pd.DataFrame([row], columns=[f.name for f in out_schema.fields]).astype("object")

    from pyspark.sql import functions as F

    from pyspark_unload_to_gcs_spark.functions.timestamps import epoch_ms

    prepared = (
        events.withColumn("__ts_ms", epoch_ms(events, time_column))
        .withColumn("__etype", F.col(type_column))
        .filter(F.col("__etype").isin(steps))
        .groupBy(F.col(user_column))
    )
    return prepared.applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
