"""Operators: sinks, filters/projections, and the analytics surface."""

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.sink import (
    TableNotFoundError,
    create_partitioned_table,
    write_partition_overwrite,
)

__all__ = [
    "TableNotFoundError",
    "create_partitioned_table",
    "write_partition_overwrite",
]
