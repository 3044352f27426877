"""Streaming quality gate with a dead-letter quarantine sink.

The continuous form of ``operators/expectations.py``: every micro-batch
is screened against the expectation rules IN the ingest path; clean
rows append to the landing table, violating rows land in a quarantine
table tagged with the comma-joined names of every rule they broke —
the dead-letter-queue pattern that keeps a 100 TB landing table
load-gate-clean without ever dropping data on the floor (quarantined
rows stay replayable after the rule or the producer is fixed).

The rule tag is computed as a narrow map on the micro-batch (the same
single-pass compilation as the batch suite — rule count never adds
scans), so the gate adds zero shuffles to the ingest path.

Semantics note (mirrors ``dedup_stream``): the two appends are
effectively-once — a batch retried after writing one sink but not the
other can double-append; strict exactly-once keeps both writes inside
an idempotent partition-overwrite sink keyed on the batch's hour
(``stream_hourly_ingest``). The checkpoint makes *source* progress
exactly-once; the sink contract is the caller's choice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["stream_quarantine_ingest"]


def violation_tag(rules: list[tuple[str, Column]]) -> Column:
    """Comma-joined names of every violated rule ('' = clean) — rule
    order is the declaration order, so the tag is deterministic. A rule
    predicate that evaluates to NULL counts as violated (same
    ``null_violates`` coercion as the batch suite): a NULL-bearing row
    is exactly the malformed input the gate exists to quarantine, and
    three-valued logic would otherwise append it to the landing table."""
    from ..operators.expectations import null_violates

    return F.concat_ws(
        ",",
        F.array_compact(
            F.array(
                *[F.when(null_violates(pred), F.lit(name)) for name, pred in rules]
            )
        ),
    )


def stream_quarantine_ingest(
    spark: SparkSession,
    source_root: str,
    landing_root: str,
    quarantine_root: str,
    schema: T.StructType,
    rules: list[tuple[str, Column]],
    checkpoint: str,
    max_files_per_trigger: int = 2,
):
    """File-source stream → per-batch rule screen → clean rows append
    to ``landing_root``, violations (with their ``violations`` tag) to
    ``quarantine_root``. Trigger.AvailableNow drains the backlog and
    terminates; returns the started StreamingQuery."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_root)
    )
    tag = violation_tag(rules)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        tagged = batch_df.withColumn("violations", tag).persist()
        try:
            (
                tagged.filter(F.col("violations") == "")
                .drop("violations")
                .write.mode("append")
                .parquet(landing_root)
            )
            (
                tagged.filter(F.col("violations") != "")
                .write.mode("append")
                .parquet(quarantine_root)
            )
        finally:
            tagged.unpersist()

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
