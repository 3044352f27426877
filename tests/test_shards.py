"""Training-shard sink pins: layout, reproducibility, epoch
permutation, and the manifest integrity gate."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.shards import (
    read_training_shards,
    shard_manifest,
    write_training_shards,
)


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="shards_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _docs(spark, n=60):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
        (F.col("id") % 7 + 1).alias("n_tokens"),
    )


def test_roundtrip_one_file_per_shard(spark, root):
    write_training_shards(_docs(spark), root, "doc_id", "n_tokens", n_shards=5)
    back = read_training_shards(spark, root, verify=True)
    assert back.count() == 60
    for k in range(5):
        files = glob.glob(os.path.join(root, f"shard={k}", "*.parquet"))
        assert len(files) == 1, (k, files)
    man = shard_manifest(spark, root)
    assert man.agg(F.sum("n_docs")).collect()[0][0] == 60


def test_rewrite_is_identical(spark, root):
    write_training_shards(_docs(spark), root, "doc_id", "n_tokens", n_shards=5)
    first = sorted(map(tuple, shard_manifest(spark, root).collect()))
    write_training_shards(_docs(spark), root, "doc_id", "n_tokens", n_shards=5)
    assert sorted(map(tuple, shard_manifest(spark, root).collect())) == first


def test_epochs_permute_but_preserve_membership_totals(spark, root):
    other = tempfile.mkdtemp(prefix="shards_e1_")
    try:
        write_training_shards(
            _docs(spark), root, "doc_id", "n_tokens", n_shards=5, epoch=0
        )
        write_training_shards(
            _docs(spark), other, "doc_id", "n_tokens", n_shards=5, epoch=1
        )
        m0 = sorted(map(tuple, shard_manifest(spark, root).collect()))
        m1 = sorted(map(tuple, shard_manifest(spark, other).collect()))
        assert m0 != m1  # different epoch -> different permutation
        tot = lambda m: (sum(r[1] for r in m), sum(r[2] for r in m))
        assert tot(m0) == tot(m1)  # same corpus either way
    finally:
        shutil.rmtree(other, ignore_errors=True)


def test_within_shard_order_matches_permutation_key(spark, root):
    write_training_shards(_docs(spark), root, "doc_id", "n_tokens", n_shards=3)
    one = (
        spark.read.parquet(os.path.join(root, "shard=0"))
        .select("__order")
        .collect()
    )
    keys = [r["__order"] for r in one]
    assert keys == sorted(keys)


def test_verify_catches_disturbed_order(spark, root):
    write_training_shards(_docs(spark), root, "doc_id", "n_tokens", n_shards=3)
    # rewrite shard 1's file in doc_id-descending order, manifest untouched
    sub = os.path.join(root, "shard=1")
    rows = spark.read.parquet(sub)
    tmp = tempfile.mkdtemp(prefix="shards_corrupt_")
    rows.orderBy(F.desc("doc_id")).coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(sub)
    shutil.move(tmp, sub)
    with pytest.raises(ValueError, match="manifest verification"):
        read_training_shards(spark, root, verify=True)
    # unverified read still works (escape hatch)
    assert read_training_shards(spark, root, verify=False).count() == 60
