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


def test_retry_succeeds_after_failures():
    """submit_with_retry mirrors the scheduler's --max-retry-attempts 3
    (commands.sh:76-77): FAILURE attempts are retried under fresh
    attempt-scoped ids until SUCCESS."""
    reg = JobRegistry()
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError(f"transient #{calls['n']}")
        return JobState.SUCCESS

    final = reg.submit_with_retry(_meta("jr1"), flaky, attempts=3, deadline_s=30)
    assert final.status == JobState.SUCCESS
    assert final.job_id == "jr1"
    assert calls["n"] == 3
    # canonical record reflects the outcome; per-attempt records inspectable
    assert reg.status("jr1").status == JobState.SUCCESS
    assert reg.status("jr1#a1").status == JobState.FAILURE
    assert "transient #1" in reg.status("jr1#a1").error_msg
    assert reg.status("jr1#a2").status == JobState.FAILURE
    assert reg.status("jr1#a3").status == JobState.SUCCESS


def test_retry_exhausts_attempts():
    reg = JobRegistry()

    def always_fails():
        raise RuntimeError("permanent")

    final = reg.submit_with_retry(_meta("jr2"), always_fails, attempts=3, deadline_s=30)
    assert final.status == JobState.FAILURE
    assert "permanent" in final.error_msg
    assert reg.status("jr2").status == JobState.FAILURE
    for i in (1, 2, 3):
        assert reg.status(f"jr2#a{i}").status == JobState.FAILURE


def test_retry_deadline_exceeded_is_failure():
    """An attempt still RUNNING at --attempt-deadline counts as FAILURE;
    the stuck attempt's thread can never clobber the canonical record."""
    reg = JobRegistry()
    release = threading.Event()

    def stuck():
        release.wait(10)
        return JobState.SUCCESS

    final = reg.submit_with_retry(_meta("jr3"), stuck, attempts=2, deadline_s=0.2)
    assert final.status == JobState.FAILURE
    assert "exceeded deadline" in final.error_msg
    assert reg.status("jr3").status == JobState.FAILURE
    # let the zombie threads finish: the canonical record must not flip
    release.set()
    time.sleep(0.3)
    assert reg.status("jr3").status == JobState.FAILURE
