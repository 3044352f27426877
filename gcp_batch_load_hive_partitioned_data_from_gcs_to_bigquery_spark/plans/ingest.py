"""End-to-end partition ingest: plan → execute → state.

The Spark re-expression of ``create_and_run_load_job_for_partition``
(ingestion/tasks.py:13-44): compute destination + source glob + fresh
job id (the plan), then run read-CSV → partition-overwrite-write (the
execution BigQuery's load service performed for the reference). Gate on
the existence probe first, exactly like the workflow's
``check_partition_exists_in_bucket`` → ``ingest_or_not`` switch
(workflow.yaml:14-35): missing partition → NOT_CREATED, no job launched.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.functions.partition import (
    glob_path_all,
    hive_path_from_bq_partition,
    new_job_id,
)
from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.sink import write_partition_overwrite
from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.plans.jobs import (
    IngestPlan,
    JobRegistry,
    JobState,
    LoadJobMetadata,
)
from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.sources.hive_csv import read_hive_partition
from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.sources.probe import partition_exists


def plan_partition_ingest(
    source_root: str,
    table_root: str,
    partition: str,
    job_config: dict | None = None,
) -> IngestPlan:
    """Plan stage (ingestion/tasks.py:24-41): destination, source glob,
    fresh UUID job id."""
    return IngestPlan(
        job_id=new_job_id(),
        partition=partition,
        source_root=source_root,
        source_glob=glob_path_all(source_root, hive_path_from_bq_partition(partition)),
        table_root=table_root,
        job_config=dict(job_config or {}),
    )


def run_partition_ingest(
    spark: SparkSession,
    plan: IngestPlan,
    schema: T.StructType,
    registry: JobRegistry | None = None,
    cluster_by: list[str] | None = None,
) -> LoadJobMetadata:
    """Execute an ingest plan. With a ``registry`` the write runs async
    (submit-then-poll, §3.3 of SURVEY.md); without one it runs inline and
    returns the terminal state.
    """
    meta = LoadJobMetadata(
        job_id=plan.job_id,
        table_root=plan.table_root,
        source_glob=plan.source_glob,
        partition=plan.partition,
        job_config=plan.job_config,
    )

    # Probe gate (workflow.yaml:14-35): skip the whole job if no files.
    if not partition_exists(spark, plan.source_root, plan.partition):
        return meta.with_status(JobState.NOT_CREATED)

    fmt = plan.job_config.get("format", "csv")
    options = {k: v for k, v in plan.job_config.items() if k != "format"}

    def _action() -> JobState:
        df = read_hive_partition(
            spark, plan.source_root, plan.partition, schema=schema, fmt=fmt, options=options
        ).drop("year", "month", "day", "hour")
        # Destination partition is the plan's (decorator semantic,
        # ingestion/tasks.py:24-25) — never re-derived from row contents,
        # so schemas without a timestamp column ingest fine.
        return write_partition_overwrite(
            df, plan.table_root, cluster_by=cluster_by, partition=plan.partition
        )

    if registry is not None:
        return registry.submit(meta, _action)

    try:
        return meta.with_status(_action())
    except Exception as exc:  # fold to FAILURE like the poll fold (:103-121)
        return meta.with_status(JobState.FAILURE, error_msg=str(exc))


def backfill_partition_range(
    spark: SparkSession,
    source_root: str,
    table_root: str,
    start_partition: str,
    end_partition: str,
    schema: T.StructType,
    job_config: dict | None = None,
    cluster_by: list[str] | None = None,
) -> list[LoadJobMetadata]:
    """Reprocess every hourly partition in ``[start, end)`` — the manual
    backfill loop (``workflow:run:partition``, commands.sh:56-64;
    README.md:49-60), partition by partition so each hour stays an
    independent idempotent overwrite (a failed hour re-runs alone).

    Missing hours come back NOT_CREATED, matching the workflow's
    skip-if-empty gate; execution is sequential like the reference's
    scheduler but each job is internally parallel across the cluster.
    """
    import datetime as _dt

    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.functions.partition import (
        bq_partition_from_datetime,
        datetime_from_bq_partition,
    )

    cur = datetime_from_bq_partition(start_partition)
    end = datetime_from_bq_partition(end_partition)
    results: list[LoadJobMetadata] = []
    while cur < end:
        part = bq_partition_from_datetime(cur)
        plan = plan_partition_ingest(source_root, table_root, part, job_config)
        results.append(
            run_partition_ingest(spark, plan, schema, cluster_by=cluster_by)
        )
        cur += _dt.timedelta(hours=1)
    return results
