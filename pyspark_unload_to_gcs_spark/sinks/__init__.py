from pyspark_unload_to_gcs_spark.sinks.writers import write_export, configure_gcs_auth

__all__ = ["write_export", "configure_gcs_auth"]
