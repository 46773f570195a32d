"""Audit the DISTRIBUTED BPE trainer arm at scale (VERDICT r06 #5).

The ×10 scale audit exercises ``bpe_train`` through its size gate, and
at every tested corpus size the vocabulary fits the 2M driver gate — so
the audited path is the driver trainer. But at 100 TB the vocabulary
will NOT fit, and the arm that actually runs is
``bpe_train_distributed`` (operators/bpe.py): per merge, one
vocab-sized pair explode + map-side partial agg + TakeOrderedAndProject
top-1 + one guarded literal replace. This tool forces that arm (by
setting ``driver_vocab_limit=0``) on the real sf0.1 corpus AND the ×10
replica, then:

1. records both arms' wall times at both scales (the distributed arm's
   cost is per-iteration vocabulary-sized, so its ×10 curve should be
   ~linear in vocab growth);
2. asserts the distributed merges EQUAL the driver merges at audit
   scale — the pinned-equivalence claim (tests/test_bpe.py proves it on
   fixtures; this proves it on the ×10 corpus with its 10× disjoint
   replica vocabulary).

Usage:
    python tools/bpe_distributed_audit.py [--base /root/testdata/sf0.1]
                                          [--scaled /tmp/scale_sf1]
                                          [--merges 8]

Prints one JSON line with the four timings + the equality verdict;
paste the row into SCALE_AUDIT.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_unload_to_gcs_spark.operators.bpe import (  # noqa: E402
    bpe_train,
    word_counts,
)
from pyspark_unload_to_gcs_spark.session import get_spark  # noqa: E402
from pyspark_unload_to_gcs_spark.sources.catalog import load_parquet  # noqa: E402


def _time_arm(docs, merges: int, *, force_distributed: bool):
    t0 = time.perf_counter()
    result = bpe_train(
        docs,
        "text",
        num_merges=merges,
        driver_vocab_limit=0 if force_distributed else 2_000_000,
    )
    return result, round(time.perf_counter() - t0, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--scaled", default="/tmp/scale_sf1")
    ap.add_argument("--merges", type=int, default=8)
    args = ap.parse_args()

    spark = get_spark(
        app_name="bpe-distributed-audit",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"merges": args.merges}
    for label, path in (("base", args.base), ("x10", args.scaled)):
        docs = load_parquet(spark, os.path.join(path, "documents.parquet")).select(
            "doc_id", "text"
        )
        vocab_size = word_counts(docs, "text").count()
        drv, t_drv = _time_arm(docs, args.merges, force_distributed=False)
        dist, t_dist = _time_arm(docs, args.merges, force_distributed=True)
        out[label] = {
            "vocab": vocab_size,
            "driver_sec": t_drv,
            "distributed_sec": t_dist,
            "merges_equal": drv == dist,
        }
        if drv != dist:
            out[label]["driver_merges"] = drv
            out[label]["distributed_merges"] = dist
    out["curve"] = {
        "vocab_ratio": round(out["x10"]["vocab"] / max(out["base"]["vocab"], 1), 2),
        "distributed_sec_ratio": round(
            out["x10"]["distributed_sec"] / max(out["base"]["distributed_sec"], 0.01),
            2,
        ),
    }
    print(json.dumps(out))
    if not (out["base"]["merges_equal"] and out["x10"]["merges_equal"]):
        sys.exit(1)


if __name__ == "__main__":
    main()
