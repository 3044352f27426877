"""Sources: Hive-partitioned scans, tab-CSV ingestion reader, probes."""

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.sources.hive_csv import (
    TAB_CSV_OPTIONS,
    read_generic,
    read_hive_partition,
    read_hive_partitioned,
    read_tab_csv,
)
from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.sources.probe import (
    partition_exists,
    partition_file_count,
)

__all__ = [
    "TAB_CSV_OPTIONS",
    "read_generic",
    "read_hive_partition",
    "read_hive_partitioned",
    "read_tab_csv",
    "partition_exists",
    "partition_file_count",
]
