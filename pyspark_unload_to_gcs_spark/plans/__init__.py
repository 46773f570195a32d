from pyspark_unload_to_gcs_spark.plans.sync import plan_sync, run_sync

__all__ = ["plan_sync", "run_sync"]
