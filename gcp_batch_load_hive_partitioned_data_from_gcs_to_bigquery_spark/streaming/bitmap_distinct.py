"""Streaming incremental EXACT distinct-count maintenance.

The streaming payoff of the mergeable-bitmap rollup
(queries/analytics_extra.py agg_bitmap_distinct): per-day distinct-user
counts stay exact and continuously fresh WITHOUT ever rescanning
history. Each micro-batch collapses to its (day, chunk) bitmaps
map-side, merges with the store's bitmaps for ONLY the touched days
(partition-pruned read), and dynamic-partition-overwrites those days —
per-batch cost is O(batch + touched days' chunks), never O(history).
countApproxDistinct/HLL gives this approximately; for dense integer key
spaces the bitmap keeps it exact.

The store is a plain parquet table partitioned by day (chunk rows are
user_space/32-sized per day — metadata-scale). Reading a day's distinct
is a popcount sum over its chunk rows; any date range composes with one
more bit_or, reading only the store.

Semantics note (same contract as the other foreachBatch sinks): the
merge is idempotent per batch CONTENT — re-processing the same rows
bit_ors the same bits, so retries cannot inflate counts (bitmap union
is idempotent, unlike additive counters) — which is exactly why the
bitmap, not a count, is the stored state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["stream_bitmap_distinct", "read_distinct_counts"]


def _batch_chunks(batch_df: DataFrame) -> DataFrame:
    return (
        batch_df.select(
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
            (F.col("user_id") / 32).cast("long").alias("chunk"),
            F.expr("shiftleft(1L, cast(user_id % 32 as int))").alias("bit"),
        )
        .groupBy("day", "chunk")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )


def stream_bitmap_distinct(
    spark: SparkSession,
    source_root: str,
    store_root: str,
    schema: T.StructType,
    checkpoint: str,
    max_files_per_trigger: int = 2,
):
    """File-source stream → per-batch (day, chunk) bitmaps → merge into
    the partitioned store for the touched days only. Trigger.AvailableNow
    drains the backlog; returns the started StreamingQuery."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_root)
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        fresh = _batch_chunks(batch_df).persist()
        try:
            days = [r.day for r in fresh.select("day").distinct().collect()]
            if not days:
                return
            # Existence = at least one day= partition dir, NOT a bare
            # (possibly pre-created, empty) root — an empty dir would
            # fail schema inference on read.
            jglob = sess._jvm.org.apache.hadoop.fs.Path(
                store_root.rstrip("/") + "/day=*"
            )
            fs = jglob.getFileSystem(sess._jsc.hadoopConfiguration())
            matches = fs.globStatus(jglob)
            if matches is not None and len(matches) > 0:
                old = sess.read.parquet(store_root).filter(
                    F.col("day").isin(days)  # partition-pruned
                )
                merged = (
                    fresh.unionByName(old.select("day", "chunk", "bits"))
                    .groupBy("day", "chunk")
                    .agg(F.expr("bit_or(bits)").alias("bits"))
                )
            else:
                merged = fresh
            (
                merged.repartition(1, "day")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("day")
                .parquet(store_root)
            )
        finally:
            fresh.unpersist()

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_distinct_counts(spark: SparkSession, store_root: str) -> DataFrame:
    """Per-day exact distinct counts from the store alone (popcount sum
    per day — no raw-event access), plus the 'ALL' row composed with one
    more bit_or across days."""
    store = spark.read.parquet(store_root)
    per_day = store.groupBy(F.col("day").cast("string").alias("day")).agg(
        F.sum(F.bit_count("bits")).alias("n_bitmap")
    )
    overall = (
        store.groupBy("chunk")
        .agg(F.expr("bit_or(bits)").alias("bits"))
        .agg(F.sum(F.bit_count("bits")).alias("n_bitmap"))
        .select(F.lit("ALL").alias("day"), "n_bitmap")
    )
    return per_day.unionByName(overall)
