"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``pyspark_unload_to_gcs_spark`` (registry.py
plus extension registries); this file is the thin driver-facing shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_unload_to_gcs_spark import registry  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's scd-latest export pipeline end-to-end on
    sf0.001 — non-null filter -> latest order per customer -> content
    hash column (scan → filter → window → project)."""
    from pyspark_unload_to_gcs_spark.functions.timestamps import epoch_ms
    from pyspark_unload_to_gcs_spark.operators.filters import non_null_filter
    from pyspark_unload_to_gcs_spark.operators.hashing import content_hash
    from pyspark_unload_to_gcs_spark.operators.scd import latest_per_group
    from pyspark_unload_to_gcs_spark.sources.catalog import load_parquet

    orders = load_parquet(spark, os.path.join(SF0001, "orders.parquet"))
    df = non_null_filter(orders, ["o_orderstatus"])
    df = latest_per_group(df, "o_custkey", "o_orderdate", tiebreak_columns=["o_orderkey"])
    df = df.withColumn("o_orderdate_ms", epoch_ms(df, "o_orderdate")).drop("o_orderdate")
    df = content_hash(df, "row_hash")
    return df


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
