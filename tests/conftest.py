"""Shared fixtures: one local SparkSession, a Hive-layout tab-CSV fixture
derived from the driver's events table (FIXTURES.md F1 raw-CSV variant)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# Microsecond-preserving timestamp round-trip through CSV.
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _drop_test_stores(session) -> None:
    """Sweep every store the test suite creates (all named ``t_*`` /
    ``test_*``) out of the metastore AND the warehouse dir — including
    orphan dirs a crashed previous session left behind (r11 verdict
    task 7: a stale same-named store in a long-lived driver session is
    the one state-leak vector the versioned-store design has). Catalog
    fixture stores (``corpus_*``, ``stream_sem_*``) are NOT touched:
    they are process-cached by design and re-persisted per process."""
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators._tables import drop_managed_table

    prefixes = ("t_", "test_")
    for t in session.catalog.listTables():
        if t.name.startswith(prefixes) and (t.tableType or "").upper() == "VIEW":
            session.sql(f"DROP VIEW IF EXISTS {t.name}")
    names = {t.name for t in session.catalog.listTables() if t.name.startswith(prefixes)}
    warehouse = session.conf.get("spark.sql.warehouse.dir")
    warehouse = warehouse.removeprefix("file:").rstrip("/")
    if os.path.isdir(warehouse):
        names |= {d for d in os.listdir(warehouse) if d.startswith(prefixes)}
    for n in sorted(names):
        drop_managed_table(session, n)


@pytest.fixture(scope="session")
def spark():
    session = get_spark(app_name="tests", shuffle_partitions=8)
    # sweep BEFORE the session's tests too: orphan t_*/test_* stores a
    # crashed previous session left behind would otherwise skew
    # version-number/store-content assertions before the teardown sweep
    _drop_test_stores(session)
    yield session
    _drop_test_stores(session)


@pytest.fixture(scope="session")
def events(spark):
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.sources.tables import load_table

    return load_table(spark, SF_DIR, "events")


@pytest.fixture(scope="session")
def hive_csv_root(spark, events, tmp_path_factory):
    """Events re-laid-out as the reference's source format: headerless
    tab-delimited unquoted UTF-8 CSV under year=/month=/day=/hour=.
    (ingestion/partition.py:3, ingestion/bigquery_interaction.py:17-26)."""
    root = str(tmp_path_factory.mktemp("hive_csv_src"))
    shutil.rmtree(root, ignore_errors=True)
    out = events
    out = (
        out.withColumn("year", F.date_format("ts", "yyyy"))
        .withColumn("month", F.date_format("ts", "MM"))
        .withColumn("day", F.date_format("ts", "dd"))
        .withColumn("hour", F.date_format("ts", "HH"))
    )
    (
        out.repartition(1)
        .write.partitionBy("year", "month", "day", "hour")
        .options(sep="\t", header=False, quote="", emptyValue="", timestampFormat=TS_FMT)
        .csv(root)
    )
    return root
