"""Flask adapter exposing the reference's routes (ingestion/app.py:47-93;
route table in SURVEY.md §2.9) over :class:`IngestService`.

Flask is the HTTP framework available here (the reference used FastAPI);
paths, methods, payloads, and status codes match the reference:

* ``GET  /``                                               → health
* ``GET  /partition/last_hour/exists/in-bucket``           → ``1``/``0``
* ``PUT  /partition/last_hour/ingest``                     → LoadJob JSON
* ``GET  /partition/<partition>/exists/in-bucket``         → ``1``/``0``
* ``PUT  /partition/<partition>/ingest``                   → LoadJob, 201
* ``GET  /load_job/<job_id>/status``                       → LoadJob; 404
"""

from __future__ import annotations

from pydantic import ValidationError

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.api.models import NewLoadJob
from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.api.service import (
    IngestService,
    InvalidPartitionError,
    TableNotRegisteredError,
)
from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.plans.jobs import JobNotFoundError


def create_app(service: IngestService):
    """Build the Flask app; import is deferred so the engine works in
    environments without Flask."""
    try:
        from flask import Flask, jsonify, request
    except ImportError as exc:  # pragma: no cover - flask present in CI env
        raise RuntimeError("flask is required for the HTTP layer") from exc

    app = Flask("gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark")

    @app.errorhandler(InvalidPartitionError)
    def _bad_partition(exc):
        return jsonify({"detail": str(exc)}), 422

    @app.errorhandler(TableNotRegisteredError)
    def _no_table(exc):
        return jsonify({"detail": str(exc)}), 409

    @app.errorhandler(JobNotFoundError)
    def _no_job(exc):
        # ingestion/app.py:92-93: unknown job → 404
        return jsonify({"detail": f"load job not found: {exc}"}), 404

    @app.errorhandler(ValidationError)
    def _bad_body(exc):
        return jsonify({"detail": exc.errors()}), 422

    @app.get("/")
    def root():
        return jsonify({"status": "ok"})

    @app.get("/partition/last_hour/exists/in-bucket")
    def last_hour_exists():
        return jsonify(service.last_hour_exists_in_bucket(request.args["bucket_name"]))

    @app.put("/partition/last_hour/ingest")
    def ingest_last_hour():
        body = NewLoadJob.model_validate(request.get_json(force=True))
        return jsonify(service.ingest_last_hour(body).model_dump()), 201

    @app.get("/partition/<partition>/exists/in-bucket")
    def partition_exists(partition: str):
        return jsonify(
            service.partition_exists_in_bucket(request.args["bucket_name"], partition)
        )

    @app.put("/partition/<partition>/ingest")
    def ingest_partition(partition: str):
        body = NewLoadJob.model_validate(request.get_json(force=True))
        return jsonify(service.ingest_partition(partition, body).model_dump()), 201

    @app.get("/load_job/<job_id>/status")
    def job_status(job_id: str):
        return jsonify(service.job_status(job_id).model_dump())

    return app
