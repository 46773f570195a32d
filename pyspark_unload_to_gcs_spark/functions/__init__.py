from pyspark_unload_to_gcs_spark.functions.timestamps import epoch_ms, ts_bound_literal

__all__ = ["epoch_ms", "ts_bound_literal"]
