"""Server bootstrap (parity: reference main.py:7-20): start the ingest
service over a warehouse root, port from $PORT.

Usage: python scripts/serve.py [warehouse_root]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark import get_spark  # noqa: E402
from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.api.app import create_app  # noqa: E402
from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.api.service import IngestService  # noqa: E402


def main() -> None:
    warehouse = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"
    )
    os.makedirs(warehouse, exist_ok=True)
    service = IngestService(get_spark(app_name="ingest-service"), warehouse)
    app = create_app(service)
    app.run(host="0.0.0.0", port=int(os.environ.get("PORT", "8080")))


if __name__ == "__main__":
    main()
