"""Partition maintenance: enumeration and retention vacuum."""

from pyspark.sql import functions as F

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.sink import (
    create_partitioned_table,
    list_table_partitions,
    vacuum_partitions,
    write_partition_overwrite,
)
from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_vacuum_drops_only_expired_partitions(spark, tmp_path):
    root = str(tmp_path / "tbl")
    create_partitioned_table(spark, root)
    ev = load_table(spark, SF_DIR, "events").filter(
        (F.col("ts") < F.lit("2024-01-01 03:00:00").cast("timestamp"))
    )
    write_partition_overwrite(ev, root)
    assert list_table_partitions(spark, root) == [
        "2024010100",
        "2024010101",
        "2024010102",
    ]

    dropped, kept = vacuum_partitions(spark, root, retain_from="2024010101")
    assert dropped == ["2024010100"]
    assert kept == ["2024010101", "2024010102"]
    assert list_table_partitions(spark, root) == ["2024010101", "2024010102"]

    # surviving data still reads back partition-pruned and complete
    back = spark.read.option("basePath", root).parquet(root)
    expected = ev.filter(F.hour("ts") >= 1).count()
    assert back.count() == expected

    # idempotent: vacuuming again drops nothing
    dropped2, kept2 = vacuum_partitions(spark, root, retain_from="2024010101")
    assert dropped2 == [] and kept2 == ["2024010101", "2024010102"]
