"""Streaming semantics tests (§2.7): foreachBatch ingest lands the same
rows as batch ingest, and a second catch-up run is a no-op (idempotent
reprocessing, workflow.yaml:49-52 / README.md:34-39).
"""

from pyspark.sql import functions as F

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.streaming.hourly import (
    hourly_counts,
    stream_hourly_ingest,
)

from .conftest import EVENTS_SCHEMA


def test_stream_ingest_matches_batch_and_is_idempotent(spark, events, tmp_path):
    day1 = events.filter(F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp"))
    src = str(tmp_path / "stream_src")
    day1.write.mode("overwrite").parquet(src)
    table_root = str(tmp_path / "stream_table")

    q = stream_hourly_ingest(
        spark, src, table_root, EVENTS_SCHEMA,
        checkpoint=str(tmp_path / "ckpt"), trigger_available_now=True,
    )
    q.awaitTermination(300)
    n_hours = day1.select(F.date_trunc("hour", "ts")).distinct().count()
    back = spark.read.option("basePath", table_root).parquet(table_root)
    assert back.count() == day1.count()
    # one landed partition per populated source hour
    assert back.select("hour").distinct().count() == n_hours

    # catch-up rerun with the same checkpoint: no new data, no duplicates
    q2 = stream_hourly_ingest(
        spark, src, table_root, EVENTS_SCHEMA,
        checkpoint=str(tmp_path / "ckpt"), trigger_available_now=True,
    )
    q2.awaitTermination(300)
    assert spark.read.option("basePath", table_root).parquet(table_root).count() == day1.count()


def test_hourly_counts_batch_window(spark, events):
    day1 = events.filter(F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp"))
    out = hourly_counts(day1)
    rows = {r["window_start"]: r["n_rows"] for r in out.collect()}
    assert len(rows) == day1.select(F.date_trunc("hour", "ts")).distinct().count()
    assert sum(rows.values()) == day1.count()
