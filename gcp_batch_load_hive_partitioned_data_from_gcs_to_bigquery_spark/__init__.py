"""PySpark-native batch-ingestion + partition-maintenance engine.

A from-scratch re-expression of the capabilities of the reference repo
``gcp-batch-load-hive-partitioned-data-from-gcs-to-bigquery`` (see SURVEY.md):
Hive-partition discovery and pruned scanning, tab-delimited headerless CSV
ingestion into a fixed schema, idempotent hourly partition-overwrite writes,
partition probing, the ingest-job state machine, and the downstream query /
monitoring surface — plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis) the engine is designed to run at
100 TB scale.

Everything is DataFrame-first: logical plans are declared via the PySpark
DataFrame/SQL API and Catalyst/Tungsten pick the physical strategy.
"""

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
