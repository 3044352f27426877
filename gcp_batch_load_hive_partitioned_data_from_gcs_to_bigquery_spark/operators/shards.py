"""Training-shard writer: the terminal sink of a curation pipeline.

After curate/dedup/mix, a training run consumes the corpus as N
equal-ish shards, globally shuffled per epoch, each shard internally
ordered and individually resumable. This operator materializes exactly
that layout from a DataFrame:

* shard assignment is the reproducible Knuth id-hash
  (operators/packing.shard_for — same constant as the sampling kit), so
  re-runs and backfills land every document in the same shard;
* within-shard order is ``md5(epoch || doc_id)`` — a deterministic
  per-epoch permutation (operators/sampling.epoch_shuffle's key), so
  epoch k is reproducible without storing a permutation anywhere;
* one parquet file per shard via a single hash-repartition on the
  shard id + ``partitionBy(shard=...)`` — the write IS the shuffle, no
  extra pass; ``maxRecordsPerFile`` bounds file size for hot shards;
* a manifest (one row per shard: docs, tokens, an order-sensitive
  checksum) is written LAST under ``_shard_manifest`` — the same
  manifest-written-last atomic-visibility contract as the snapshot
  store — so a reader never observes a half-written shard set.

At 100 TB the shard count is the resume/parallelism granule (pick
n_shards ≈ corpus/target-shard-bytes); everything here is one shuffle
wide, no driver state, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.packing import shard_for

__all__ = ["write_training_shards", "read_training_shards", "shard_manifest"]

_MANIFEST = "_shard_manifest"


def _order_key(id_col: str, epoch: int):
    return F.md5(F.concat_ws("_", F.lit(epoch), F.col(id_col).cast("string")))


def write_training_shards(
    df: DataFrame,
    out_root: str,
    id_col: str,
    token_count_col: str,
    n_shards: int,
    epoch: int = 0,
    max_records_per_file: int = 1_000_000,
) -> None:
    """Write ``df`` as ``out_root/shard=K/`` parquet, one file per shard
    (up to ``max_records_per_file``), each shard sorted by the epoch
    permutation key; then write the manifest. Columns are passed
    through; ``__order`` is materialized so readers can verify order.
    """
    tagged = df.withColumn(
        "shard", shard_for(F.col(id_col), n_shards, salt=epoch)
    ).withColumn("__order", _order_key(id_col, epoch))
    (
        tagged.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "__order")
        .write.option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .mode("overwrite")
        .parquet(out_root)
    )
    # manifest last: readers key off its presence (atomic visibility)
    spark = df.sparkSession
    manifest = _compute_manifest(
        spark.read.parquet(out_root), id_col, token_count_col
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        f"{out_root}/{_MANIFEST}"
    )


def _compute_manifest(
    shards: DataFrame, id_col: str, token_count_col: str
) -> DataFrame:
    """Per-shard audit row. The checksum is order-SENSITIVE (sum of
    rank·doc_id, plain 64-bit arithmetic reproducible in any engine),
    and the rank is the PHYSICAL row position — `_metadata.file_path`
    (part files sort lexically in generation order) then
    `_metadata.row_index` — not the logical ``__order`` key, so a shard
    whose file bytes were rewritten in a different order fails
    verification even though membership and keys are intact. ``shards``
    must therefore be a direct file-source read (both call sites are).
    For an undisturbed write, physical rank ≡ rank by ``__order``,
    which is what the SQL oracle recomputes from the source table."""
    from pyspark.sql import Window as W

    w = W.partitionBy("shard").orderBy(
        F.col("_metadata.file_path"), F.col("_metadata.row_index")
    )
    ranked = shards.withColumn("__rk", F.row_number().over(w))
    return (
        ranked.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count_col).alias("n_tokens"),
            F.sum(F.col("__rk").cast("long") * F.col(id_col)).alias(
                "order_checksum"
            ),
        )
    )


def shard_manifest(spark: SparkSession, out_root: str) -> DataFrame:
    return spark.read.parquet(f"{out_root}/{_MANIFEST}")


def read_training_shards(
    spark: SparkSession,
    out_root: str,
    verify: bool = True,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
) -> DataFrame:
    """Read the shard set back. With ``verify=True``, recompute the
    manifest from the data and raise if any shard's (n_docs, n_tokens,
    order_checksum) row diverges — the pre-training-launch integrity
    gate. Verification is one aggregation over the shard set joined
    against the shard-count-sized manifest."""
    data = spark.read.parquet(out_root)
    if verify:
        fresh = _compute_manifest(data, id_col, token_count_col)
        stored = shard_manifest(spark, out_root)
        diverged = (
            fresh.alias("f")
            .join(stored.alias("s"), "shard", "full_outer")
            .where(
                (F.col("f.n_docs") != F.col("s.n_docs"))
                | (F.col("f.n_tokens") != F.col("s.n_tokens"))
                | (F.col("f.order_checksum") != F.col("s.order_checksum"))
                | F.col("f.n_docs").isNull()
                | F.col("s.n_docs").isNull()
            )
            .count()
        )
        if diverged:
            raise ValueError(
                f"shard set at {out_root} fails manifest verification "
                f"({diverged} shard(s) diverged)"
            )
    return data
