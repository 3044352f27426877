"""Named query catalog — the driver-contract surface."""

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.queries.catalog import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
