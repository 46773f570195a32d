"""Core DataFrame operators (SURVEY.md §2): pure ``DataFrame -> DataFrame``
functions, every one Catalyst-optimizable (no Python UDFs in this package
except where explicitly noted in extension modules)."""

from pyspark_unload_to_gcs_spark.operators.filters import (
    non_null_filter,
    time_window_filter,
)
from pyspark_unload_to_gcs_spark.operators.scd import latest_per_group
from pyspark_unload_to_gcs_spark.operators.hashing import content_hash
from pyspark_unload_to_gcs_spark.operators.cdc import change_type_mapping
from pyspark_unload_to_gcs_spark.operators.guards import row_count_guard

__all__ = [
    "non_null_filter",
    "time_window_filter",
    "latest_per_group",
    "content_hash",
    "change_type_mapping",
    "row_count_guard",
]
