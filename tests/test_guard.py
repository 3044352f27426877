"""Plan-level require_partition_filter enforcement (the reference's
bq_create_table_ddl.sql:12 as a pre-execution plan check, not just an
API-route guard)."""

import pytest
from pyspark.sql import functions as F

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.sink import (
    create_partitioned_table,
    read_landing_table,
    write_partition_overwrite,
)
from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.plans.guard import (
    PartitionFilterRequiredError,
    assert_partition_filtered,
    guarded_roots,
    unregister_landing_root,
)


@pytest.fixture()
def landing(spark, events, tmp_path):
    """A guarded landing table holding one day of events."""
    root = str(tmp_path / "guarded_tbl")
    create_partitioned_table(spark, root)  # registers the root
    day1 = events.filter(F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp"))
    write_partition_overwrite(day1, root)
    yield root
    unregister_landing_root(root)


def test_create_registers_root(landing):
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.plans.guard import _normalize

    assert _normalize(landing) in guarded_roots()


def test_direct_unfiltered_read_rejected(spark, landing):
    """The bypass route the API guard can't see: spark.read.parquet(root)
    with no partition predicate must be rejected at plan level."""
    df = spark.read.parquet(landing)
    with pytest.raises(PartitionFilterRequiredError):
        assert_partition_filtered(df)


def test_unfiltered_aggregate_rejected(spark, landing):
    """The scan hides under an aggregate — the plan walk still finds it."""
    df = spark.read.parquet(landing).groupBy("event_type").count()
    with pytest.raises(PartitionFilterRequiredError):
        assert_partition_filtered(df)


def test_partition_filtered_read_passes(spark, landing):
    df = spark.read.parquet(landing).filter(
        (F.col("year") == 2024) & (F.col("month") == 1)
        & (F.col("day") == 1) & (F.col("hour") == 0)
    )
    out = assert_partition_filtered(df)
    assert out.count() > 0


def test_filter_written_above_join_still_passes(spark, landing):
    """Catalyst pushes the predicate down to the scan; the guard checks
    the scan, so WHERE placement in the query doesn't matter."""
    dim = spark.createDataFrame([("click",), ("view",)], ["event_type"])
    df = (
        spark.read.parquet(landing)
        .join(F.broadcast(dim), "event_type")
        .filter(F.col("hour") == 0)
    )
    assert_partition_filtered(df)


def test_non_guarded_root_unaffected(spark, events, tmp_path):
    plain = str(tmp_path / "plain_parquet")
    events.limit(100).write.parquet(plain)
    df = spark.read.parquet(plain)  # never registered → no enforcement
    assert assert_partition_filtered(df).count() == 100


def test_read_landing_table_route_still_green(spark, landing):
    assert read_landing_table(spark, landing, "2024010100").count() > 0
