"""Hive-partitioned layout → partition pruning at read time.

The 100 TB contract for time-partitioned exports: a reader filtering on
the partition column must touch ONLY the matching directories — the
pruning happens in the catalog/file listing, before any row is read.
Asserted on the physical plan's PartitionFilters + the file-listing
metrics, plus result equivalence against an unpartitioned read.
"""

import glob
import os

from pyspark.sql import functions as F

from pyspark_unload_to_gcs_spark.sources.catalog import load_parquet


def _write_partitioned(spark, sf_dir, path):
    ev = load_parquet(spark, os.path.join(sf_dir, "events.parquet"))
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    ev.select("event_id", "user_id", "event_type", "value", day).write.partitionBy(
        "day"
    ).mode("overwrite").parquet(path)
    return ev


def test_partition_pruned_scan_reads_only_matching_dirs(spark, sf_dir, tmp_path):
    path = str(tmp_path / "ev_by_day")
    _write_partitioned(spark, sf_dir, path)

    days = sorted(os.path.basename(p).split("=")[1] for p in glob.glob(f"{path}/day=*"))
    assert len(days) > 3, "fixture spans multiple days"
    target = days[1]

    pruned = spark.read.parquet(path).filter(F.col("day") == target)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the partition predicate must land in PartitionFilters (listing-time),
    # NOT in PushedFilters/Filter (row-time)
    assert "PartitionFilters" in plan
    head = plan[plan.index("PartitionFilters") :].split("]", 1)[0]
    assert "day" in head

    # pruning is observable in the scan node's partition-count metadata:
    # "X/Y partitions" style isn't printed, but numFiles of the pruned scan
    # equals the single day's directory, not the whole dataset
    n_files_one_day = len(glob.glob(f"{path}/day={target}/*.parquet"))
    n_files_total = len(glob.glob(f"{path}/day=*/*.parquet"))
    assert n_files_one_day < n_files_total
    import re

    m = re.search(r"numFiles=(\d+)", plan.replace(" ", ""))
    if m:  # Spark prints numFiles in the FileScan node when available
        assert int(m.group(1)) == n_files_one_day
    direct = spark.read.parquet(f"{path}/day={target}")
    assert pruned.count() == direct.count() > 0


def test_partitioned_read_matches_unpartitioned(spark, sf_dir, tmp_path):
    path = str(tmp_path / "ev_by_day2")
    ev = _write_partitioned(spark, sf_dir, path)

    back = spark.read.parquet(path)
    # row counts and per-type aggregates survive the partitioned round-trip
    assert back.count() == ev.count()
    a = {(r.event_type, r.n) for r in
         back.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    b = {(r.event_type, r.n) for r in
         ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert a == b


def test_dynamic_partition_pruning_on_star_join(spark, sf_dir, tmp_path):
    """Fact partitioned by the join key + a FILTERED dim join => Spark
    injects a runtime subquery that prunes fact partitions by the dim's
    surviving keys (dynamic partition pruning) — the star-join scan
    killer at 100 TB: only partitions matching the dim filter are read,
    even though the filter is on a DIM column the fact never stores."""
    path = str(tmp_path / "orders_by_status")
    orders = load_parquet(spark, os.path.join(sf_dir, "orders.parquet"))
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(path)

    dim = spark.createDataFrame(
        [("F", "finished"), ("O", "open"), ("P", "pending")],
        "status string, label string",
    )
    fact = spark.read.parquet(path)
    joined = fact.join(
        dim.filter(F.col("label") == "open"),
        fact.o_orderstatus == dim.status,
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower(), plan[:2000]

    expected = fact.filter(F.col("o_orderstatus") == "O").count()
    assert joined.count() == expected > 0
