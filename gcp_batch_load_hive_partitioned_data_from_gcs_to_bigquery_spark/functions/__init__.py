"""Scalar-function kit: partition string/path arithmetic and column twins."""

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.functions.partition import (
    BQ_PARTITION_BY_HOUR_FORMAT,
    HIVE_PARTITION_BY_HOUR_FORMAT,
    bq_partition_from_datetime,
    datetime_from_bq_partition,
    glob_path_all,
    hive_path_from_bq_partition,
    hive_path_from_datetime,
    last_hour_partition,
    partition_decorator,
    trunc_hour,
)

__all__ = [
    "BQ_PARTITION_BY_HOUR_FORMAT",
    "HIVE_PARTITION_BY_HOUR_FORMAT",
    "bq_partition_from_datetime",
    "datetime_from_bq_partition",
    "glob_path_all",
    "hive_path_from_bq_partition",
    "hive_path_from_datetime",
    "last_hour_partition",
    "partition_decorator",
    "trunc_hour",
]
