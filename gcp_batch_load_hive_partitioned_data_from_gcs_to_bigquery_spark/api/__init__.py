"""REST-facing API layer: the reference's service surface
(ingestion/app.py, §2.9 of SURVEY.md) re-expressed over the Spark engine.

``models`` holds the pydantic request/response shapes, ``service`` the
framework-agnostic engine facade, ``app`` a Flask adapter (Flask is the
HTTP framework available in this environment; the reference used
FastAPI — route shapes and payloads are identical).
"""

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.api.models import JobStatus, LoadJob, NewLoadJob
from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.api.service import IngestService

__all__ = ["IngestService", "JobStatus", "LoadJob", "NewLoadJob"]
