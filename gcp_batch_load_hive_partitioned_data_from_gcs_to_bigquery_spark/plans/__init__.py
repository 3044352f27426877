"""Plans: ingest-job descriptors, state machine, and registry."""

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
]
