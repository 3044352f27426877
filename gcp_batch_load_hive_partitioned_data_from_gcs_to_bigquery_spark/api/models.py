"""Pydantic request/response models — shape parity with the reference's
API models (ingestion/app.py:29-44).
"""

from __future__ import annotations

from pydantic import BaseModel

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.plans.jobs import JobState, LoadJobMetadata


class NewLoadJob(BaseModel):
    """Ingest request body (ingestion/app.py:29-33). ``bucket_name`` is
    the source root (any URI the Hadoop FS layer understands);
    ``dataset_id``/``table_id`` address the landing table under the
    service's warehouse root; ``job_configuration`` passes reader options
    through verbatim (ingestion/bigquery_interaction.py:43)."""

    bucket_name: str
    dataset_id: str
    table_id: str
    job_configuration: dict[str, str] | None = None


class JobStatus(BaseModel):
    """ingestion/app.py:36-39."""

    name: str
    code: int
    error_msg: str | None = None


class LoadJob(BaseModel):
    """ingestion/app.py:42-44."""

    job_id: str
    status: JobStatus


def load_job_from_metadata(meta: LoadJobMetadata) -> LoadJob:
    """Fold engine job metadata into the API response shape
    (ingestion/app.py:107-124)."""
    state = JobState(meta.status)
    return LoadJob(
        job_id=meta.job_id,
        status=JobStatus(name=state.name, code=int(state), error_msg=meta.error_msg),
    )
