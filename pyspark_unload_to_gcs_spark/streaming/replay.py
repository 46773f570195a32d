"""Deterministic foreachBatch replay scaffold for driver-facing pins.

The streaming twins' fold functions (token-budget admission, MERGE
snapshot maintenance, incremental rollup) are exercised by registered
queries that replay a fixed batch sequence against versioned parquet
state in a temp dir. The scaffold is shared here (r05 review: three
near-identical copies): memoize per (session, sf_dir) because the folds
are EAGER side effects — plan-only probes (test_plan_lint, the plan
digest) must replay once and reread the same state, not re-fold and
leak a fresh temp dir per invocation. The temp dir intentionally lives
for the session: the memoized DataFrame reads it lazily.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame


def replay_batches(
    memo: dict,
    key: tuple,
    batches: Sequence[DataFrame],
    fold_one: Callable[[DataFrame, int, str], None],
    read_state: Callable[[str], DataFrame],
    *,
    prefix: str,
) -> DataFrame:
    """Fold ``batches`` in order into fresh versioned state via
    ``fold_one(frame, batch_id, state_path)``, memoize
    ``read_state(state_path)`` under ``memo[key]``, and return it."""
    if key not in memo:
        state = tempfile.mkdtemp(prefix=prefix)
        for b, frame in enumerate(batches):
            fold_one(frame, b, state)
        memo[key] = read_state(state)
    return memo[key]
