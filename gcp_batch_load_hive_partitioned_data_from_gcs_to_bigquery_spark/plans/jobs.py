"""Ingest-job descriptor, state machine, and async registry.

Parity targets:

* ``JobState`` — the reference's four-state machine
  (NOT_CREATED=0, RUNNING=1, SUCCESS=2, FAILURE=3; ingestion/types.py:5-10)
  that drives the workflow poll loop (workflow.yaml:73-84).
* ``LoadJobMetadata`` — the reference's only IR (ingestion/types.py:19-27):
  an immutable job descriptor; status transitions produce new values
  (``_replace``, ingestion/tasks.py:44).
* ``JobRegistry`` — Spark actions are synchronous, but the reference's API
  is submit-then-poll (ingestion/bigquery_interaction.py:53 ``_begin()`` is
  an async submit). We run each write on a named thread with
  ``setJobGroup(job_id)`` and poll an in-memory registry; the status fold
  replicates the precedence order of
  ingestion/bigquery_interaction.py:103-121 (not-found → error; running →
  RUNNING; error → FAILURE; done → SUCCESS) and idempotent re-begin
  (:59-75 — double-submit of a job_id reports the live state instead of
  failing).
"""

from __future__ import annotations

import threading
import traceback
from dataclasses import dataclass, field, replace
from enum import IntEnum
from typing import Any, Callable


class JobState(IntEnum):
    """ingestion/types.py:5-10."""

    NOT_CREATED = 0
    RUNNING = 1
    SUCCESS = 2
    FAILURE = 3


class JobNotFoundError(KeyError):
    """Unknown job_id → the reference's BigQueryJobNotFound → HTTP 404
    (ingestion/bigquery_interaction.py:103-106, ingestion/app.py:92-93)."""


@dataclass(frozen=True)
class LoadJobMetadata:
    """Job descriptor (parity: ingestion/types.py:19-27). Immutable;
    use :func:`dataclasses.replace` for state transitions."""

    job_id: str
    table_root: str
    source_glob: str
    partition: str
    status: JobState = JobState.NOT_CREATED
    files: tuple[str, ...] = ()
    job_config: dict[str, Any] = field(default_factory=dict)
    error_msg: str | None = None

    def with_status(self, status: JobState, error_msg: str | None = None) -> "LoadJobMetadata":
        return replace(self, status=status, error_msg=error_msg)


@dataclass(frozen=True)
class IngestPlan:
    """Driver-side 'logical plan' of one partition ingest — the product of
    the reference's plan stage (ingestion/tasks.py:24-41): destination,
    source glob, fresh job id. Execution = read → write via Catalyst."""

    job_id: str
    partition: str
    source_root: str
    source_glob: str
    table_root: str
    job_config: dict[str, Any] = field(default_factory=dict)


class JobRegistry:
    """In-memory async job registry: submit runs the action on a daemon
    thread tagged with ``setJobGroup(job_id)``; ``status`` polls. Designed
    so an external REST layer can expose the reference's endpoints
    (ingestion/app.py:86-93) unchanged.
    """

    def __init__(self, spark=None):
        self._spark = spark
        self._lock = threading.Lock()
        self._jobs: dict[str, LoadJobMetadata] = {}
        self._threads: dict[str, threading.Thread] = {}

    def submit(
        self,
        meta: LoadJobMetadata,
        action: Callable[[], JobState],
    ) -> LoadJobMetadata:
        """Start ``action`` under ``meta.job_id``. Idempotent re-begin
        (ingestion/bigquery_interaction.py:59-75): resubmitting a known
        job_id returns its current state instead of failing or double-
        running."""
        with self._lock:
            if meta.job_id in self._jobs:
                return self._jobs[meta.job_id]
            running = meta.with_status(JobState.RUNNING)
            self._jobs[meta.job_id] = running

        def _run() -> None:
            try:
                if self._spark is not None:
                    self._spark.sparkContext.setJobGroup(meta.job_id, f"ingest {meta.partition}")
                final = action()
                with self._lock:
                    self._jobs[meta.job_id] = self._jobs[meta.job_id].with_status(final)
            except Exception:
                msg = traceback.format_exc(limit=5)
                with self._lock:
                    self._jobs[meta.job_id] = self._jobs[meta.job_id].with_status(
                        JobState.FAILURE, error_msg=msg
                    )

        thread = threading.Thread(target=_run, name=f"ingest-{meta.job_id}", daemon=True)
        with self._lock:
            self._threads[meta.job_id] = thread
        thread.start()
        return self._jobs[meta.job_id]

    def status(self, job_id: str) -> LoadJobMetadata:
        """Status fold in the reference's precedence order
        (ingestion/bigquery_interaction.py:103-121)."""
        with self._lock:
            if job_id not in self._jobs:
                raise JobNotFoundError(job_id)
            return self._jobs[job_id]

    def wait(self, job_id: str, timeout: float | None = None) -> LoadJobMetadata:
        """Synchronous convenience for tests/batch drivers — the workflow's
        30 s poll loop (workflow.yaml:73-84) collapsed to a join."""
        thread = self._threads.get(job_id)
        if thread is not None:
            thread.join(timeout)
        return self.status(job_id)

    def submit_with_retry(
        self,
        meta: LoadJobMetadata,
        action: Callable[[], JobState],
        attempts: int = 3,
        deadline_s: float = 540.0,
    ) -> LoadJobMetadata:
        """Bounded retry + per-attempt deadline around :meth:`submit` —
        the reference's scheduler/workflow retry policy
        (``--max-retry-attempts 3 --attempt-deadline 540s``,
        commands.sh:76-77; idempotent ``http.default_retry`` on the
        ingest call, workflow.yaml:49-52). Retrying a partition ingest is
        safe for the same reason the reference cites: the write is
        partition-OVERWRITE, so a re-run replaces, never duplicates.

        Each attempt runs under an attempt-scoped job id
        (``{job_id}#a{N}``) so the per-attempt records stay inspectable
        and a timed-out attempt's zombie thread can never clobber the
        canonical record. An attempt still RUNNING at its deadline has
        its Spark job group cancelled and counts as FAILURE. The
        canonical ``meta.job_id`` record tracks the loop: RUNNING while
        attempts proceed, then the final attempt's terminal state.
        Synchronous by design — the retry loop IS the workflow's poll
        loop, not a background job.
        """
        with self._lock:
            self._jobs[meta.job_id] = meta.with_status(JobState.RUNNING)
        last = meta.with_status(
            JobState.FAILURE, error_msg="no attempts made (attempts < 1)"
        )
        for i in range(1, attempts + 1):
            att = replace(meta, job_id=f"{meta.job_id}#a{i}")
            self.submit(att, action)
            got = self.wait(att.job_id, timeout=deadline_s)
            if got.status == JobState.RUNNING:
                # attempt deadline exceeded: cancel the runaway Spark jobs
                # and record the attempt as failed (its thread only ever
                # writes the attempt-scoped record, not the canonical one)
                if self._spark is not None:
                    self._spark.sparkContext.cancelJobGroup(att.job_id)
                got = got.with_status(
                    JobState.FAILURE,
                    error_msg=f"attempt {i}/{attempts} exceeded deadline of {deadline_s}s",
                )
                with self._lock:
                    self._jobs[att.job_id] = got
            last = got
            if got.status == JobState.SUCCESS:
                break
        final = replace(last, job_id=meta.job_id)
        with self._lock:
            self._jobs[meta.job_id] = final
        return final
