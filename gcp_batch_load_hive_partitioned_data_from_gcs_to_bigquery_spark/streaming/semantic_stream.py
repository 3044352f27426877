"""Streaming semantic deduplication — the continuous form of
``operators/similarity.semdedup_incremental``, completing the
incremental-dedup triple (exact sha / MinHash bands / embedding cosine)
for a continuously-ingesting corpus.

Each micro-batch of embedding rows is semantically screened against the
ACCUMULATED corpus: corpus seeds the coarse-quantizer centroids (the
persisted-k-means slot in production), the batch assigns cells with the
BLAS argmin kernel, and only same-cell batch×corpus pairs are compared
— never corpus×corpus — so the steady-state per-batch cost is
O(batch·cell). Survivors append to the corpus store; dropped vectors
land in an audit table with their cell. The first batch into an EMPTY
corpus has no centroids to screen against and survives wholesale (the
same degrade-to-accept stance as ``dedup_stream``'s cold corpus).

Effectively-once semantics note (mirrors ``dedup_stream``): a retried
batch re-screens against a corpus that already contains its survivors —
re-appended vectors are cosine-1 duplicates of themselves and get
dropped, so the corpus stays clean; strict exactly-once keeps the
append inside an idempotent partition-overwrite sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["stream_semantic_dedup"]


def stream_semantic_dedup(
    spark: SparkSession,
    source_root: str,
    corpus_root: str,
    audit_root: str,
    schema: T.StructType,
    nlist: int = 8,
    min_cosine: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint: str | None = None,
    max_files_per_trigger: int = 1,
):
    """File-source stream → per-micro-batch incremental semantic dedup →
    survivors appended to ``corpus_root``, dropped vectors (vec_id,
    cell, batch_id) to ``audit_root``. Trigger.AvailableNow drains the
    backlog file-by-file; returns the started StreamingQuery."""
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.similarity import semdedup_incremental

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_root)
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        jpath = sess._jvm.org.apache.hadoop.fs.Path(corpus_root)
        fs = jpath.getFileSystem(sess._jsc.hadoopConfiguration())
        has_corpus = False
        if fs.exists(jpath):
            corpus = sess.read.schema(schema).parquet(corpus_root)
            has_corpus = len(corpus.take(1)) > 0
        if not has_corpus:
            batch_df.write.mode("append").parquet(corpus_root)
            return
        flags = semdedup_incremental(
            corpus, batch_df, nlist=nlist, min_cosine=min_cosine,
            id_col=id_col, vec_col=vec_col,
        # materialize BEFORE the corpus append: the flags' lineage reads
        # corpus_root, which the survivor write is about to extend
        ).localCheckpoint(eager=True)
        survivors = batch_df.join(
            flags.filter(F.col("keep")).select(F.col("vec_id").alias(id_col)),
            id_col,
            "left_semi",
        )
        dropped = (
            flags.filter(~F.col("keep"))
            .select("vec_id", "cell", F.lit(batch_id).alias("batch_id"))
        )
        survivors.write.mode("append").parquet(corpus_root)
        dropped.write.mode("append").parquet(audit_root)

    writer = stream.writeStream.foreachBatch(_sink).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
