"""Partition-existence probe.

Parity with ``_partition_exists_in_bucket`` (ingestion/app.py:96-104): a
cheap metadata-only check — "does this partition prefix contain at least
one object?" — returning 1/0. The reference uses ``list_blobs(prefix,
max_results=1)`` and short-circuits on the first item; we use the Hadoop
FileSystem ``globStatus`` on the partition directory, which is a pure
namenode/object-store LIST with no Spark job launched. At 100 TB this stays
O(one directory listing) because the Hive layout puts each hour in its own
prefix.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.functions.partition import (
    glob_path_all,
    hive_path_from_bq_partition,
)


def _glob_status(spark: SparkSession, pattern: str) -> list:
    """Hadoop globStatus via py4j — metadata-only, no job. The pattern
    IS interpreted as a glob (``* ? [ ] { }`` are metacharacters) —
    that is the point for the hourly-partition probes whose paths this
    module builds itself. For probing a path that may contain such
    characters literally (user-supplied index roots), use
    :func:`_path_exists`, which never glob-expands."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(pattern)
    fs = path.getFileSystem(conf)
    statuses = fs.globStatus(path)
    return list(statuses) if statuses is not None else []


def _path_exists(spark: SparkSession, path: str) -> bool:
    """Exact-path existence probe (``fs.exists``) — metadata-only, no
    job, and NO glob interpretation: a path containing ``[``/``{``/
    ``*``/``?`` literally is checked as-is, where ``_glob_status``
    would silently match nothing and read as "missing"."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(conf)
    return bool(fs.exists(jpath))


def partition_file_count(spark: SparkSession, root: str, partition: str) -> int:
    """Number of files under one hourly partition (0 if missing)."""
    pattern = glob_path_all(root, hive_path_from_bq_partition(partition))
    return len(_glob_status(spark, pattern))


def partition_exists(spark: SparkSession, root: str, partition: str) -> int:
    """1 if the hourly partition has ≥1 file, else 0 — same 1/0 contract as
    the reference endpoint (ingestion/app.py:52-55, 70-72)."""
    return 1 if partition_file_count(spark, root, partition) > 0 else 0
