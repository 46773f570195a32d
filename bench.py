"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a noop-format write (full execution, no
driver collect overhead, no disk write skew). A tiny warmup action runs
first so JVM/codegen startup isn't billed to the first query.

Driver-parse contract (the round driver JSON-parses bench stdout):
- The JSON line is the LAST, LONE line on stdout; all Spark logging and
  progress output goes to stderr (console progress is disabled).
- A query that raises is recorded in "errors" and skipped — one bad
  query must not zero out the whole round's bench signal (round 2's
  bench exited non-zero on the first failing query and the driver
  recorded no number at all).
- The same JSON is mirrored to BENCH_LOCAL.json so the measurement
  survives any stdout-parsing failure.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_unload_to_gcs_spark import registry  # noqa: E402
from pyspark_unload_to_gcs_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(
        app_name="pyspark-unload-to-gcs-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM, parquet reader, codegen, shuffle, broadcast and noop-
    # sink paths — so the first measured query isn't billed JIT costs
    from pyspark.sql import functions as F

    from pyspark_unload_to_gcs_spark.sources.catalog import load_parquet

    nation = load_parquet(spark, os.path.join(sf_dir, "nation.parquet"))
    region = load_parquet(spark, os.path.join(sf_dir, "region.parquet"))
    warm = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("n_name") != "")
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    materialize(warm)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for i, (name, q) in enumerate(registry.queries().items()):
        # Spark's ContextCleaner frees shuffle files / broadcast blocks
        # only when JVM GC collects the dereferenced dependency objects.
        # A 100+-query loop on one local JVM accumulates all of them
        # (observed: late queries degrade 3-10x — q21 1.8 s warm vs
        # 26 s at position ~100). A periodic explicit GC keeps the
        # cleaner draining; the pause itself is untimed (between
        # queries).
        if i % 20 == 0 and i > 0:
            spark.sparkContext._jvm.System.gc()
        start = time.perf_counter()
        try:
            materialize(q(spark, sf_dir))
            timings[name] = round(time.perf_counter() - start, 3)
        except Exception as exc:  # noqa: BLE001 — record and keep benching
            errors[name] = f"{type(exc).__name__}: {exc}"
            traceback.print_exc(file=sys.stderr)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "total_wall_sec_all_registered_queries",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        result["errors"] = errors
    line = json.dumps(result)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"), "w") as f:
            f.write(line + "\n")
    except OSError:
        pass
    sys.stderr.flush()
    print(line, flush=True)


if __name__ == "__main__":
    main()
