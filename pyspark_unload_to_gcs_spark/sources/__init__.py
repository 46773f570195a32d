from pyspark_unload_to_gcs_spark.sources.catalog import load_table, load_sf_dir, custom_sql_source

__all__ = ["load_table", "load_sf_dir", "custom_sql_source"]
