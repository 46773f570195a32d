"""PySpark-native analytics/export engine.

A from-scratch, Spark-first rebuild of the capability surface of
``mixpanel/pyspark-unload-to-gcs`` (incremental table export: full /
time-based / scd-latest / cdc sync planning, content hashing, gzip
JSON/CSV sinks), extended with large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Design stance (SURVEY.md §7): composable ``DataFrame -> DataFrame``
planner functions instead of SQL-string concatenation; sargable
predicates so Catalyst pushdown / Delta data-skipping apply; sinks are
URI-agnostic (``file:`` / ``gs://``); no driver-side collects in any
operator hot path.
"""

from pyspark_unload_to_gcs_spark.config import SyncConfig, SyncType
from pyspark_unload_to_gcs_spark.session import get_spark
from pyspark_unload_to_gcs_spark.timeutil import datetime_to_ms, ms_to_datetime

__all__ = [
    "SyncConfig",
    "SyncType",
    "get_spark",
    "datetime_to_ms",
    "ms_to_datetime",
]

__version__ = "0.1.0"
