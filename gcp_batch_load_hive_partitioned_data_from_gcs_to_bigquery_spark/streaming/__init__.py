"""Streaming semantics: tumbling hourly windows, late data, backfill."""

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.streaming.hourly import (
    backfill_partitions,
    hourly_counts,
    stream_hourly_ingest,
)

__all__ = ["backfill_partitions", "hourly_counts", "stream_hourly_ingest"]
