"""Plans: ingest-job descriptors, state machine, registry, and the
plan-level partition-filter guard."""

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.plans.guard import (
    PartitionFilterRequiredError,
    assert_partition_filtered,
    register_landing_root,
    unregister_landing_root,
)
from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.plans.jobs import (
    IngestPlan,
    JobNotFoundError,
    JobRegistry,
    JobState,
    LoadJobMetadata,
)

__all__ = [
    "IngestPlan",
    "JobNotFoundError",
    "JobRegistry",
    "JobState",
    "LoadJobMetadata",
    "PartitionFilterRequiredError",
    "assert_partition_filtered",
    "register_landing_root",
    "unregister_landing_root",
]
