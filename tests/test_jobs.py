"""Job state-machine tests (FIXTURES.md F4): all four JobStates, status
precedence, idempotent double-submit, unknown-job 404 analogue."""

import threading
import time

import pytest

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.plans.jobs import (
    JobNotFoundError,
    JobRegistry,
    JobState,
    LoadJobMetadata,
)


def _meta(job_id="j1"):
    return LoadJobMetadata(
        job_id=job_id,
        table_root="/tmp/t",
        source_glob="/tmp/s/*",
        partition="2024010100",
    )


def test_states_match_reference_codes():
    # ingestion/types.py:5-10
    assert JobState.NOT_CREATED == 0
    assert JobState.RUNNING == 1
    assert JobState.SUCCESS == 2
    assert JobState.FAILURE == 3


def test_unknown_job_raises():
    reg = JobRegistry()
    with pytest.raises(JobNotFoundError):
        reg.status("nope")


def test_success_lifecycle():
    reg = JobRegistry()
    gate = threading.Event()

    def action():
        gate.wait(5)
        return JobState.SUCCESS

    out = reg.submit(_meta(), action)
    assert out.status == JobState.RUNNING
    gate.set()
    final = reg.wait("j1")
    assert final.status == JobState.SUCCESS
    assert final.error_msg is None


def test_failure_lifecycle_captures_error():
    reg = JobRegistry()

    def action():
        raise RuntimeError("boom")

    reg.submit(_meta("jf"), action)
    final = reg.wait("jf")
    assert final.status == JobState.FAILURE
    assert "boom" in final.error_msg


def test_not_created_passthrough():
    reg = JobRegistry()
    reg.submit(_meta("jn"), lambda: JobState.NOT_CREATED)
    assert reg.wait("jn").status == JobState.NOT_CREATED


def test_idempotent_double_submit():
    # ingestion/bigquery_interaction.py:59-75: re-begin reports live state,
    # never double-runs.
    reg = JobRegistry()
    runs = []
    gate = threading.Event()

    def action():
        runs.append(1)
        gate.wait(5)
        return JobState.SUCCESS

    first = reg.submit(_meta("jd"), action)
    second = reg.submit(_meta("jd"), action)
    assert second.status == JobState.RUNNING
    gate.set()
    reg.wait("jd")
    time.sleep(0.05)
    assert len(runs) == 1
    assert reg.status("jd").status == JobState.SUCCESS
