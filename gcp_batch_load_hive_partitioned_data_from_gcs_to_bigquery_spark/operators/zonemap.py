"""Zone maps: file/partition min-max stats and data-skipping scans.

The reference leans on two storage-side pruning layers it never has to
implement itself: BigQuery partition pruning (mandatory via
``require_partition_filter``, ``bq_create_table_ddl.sql:12``) and
cluster-key block pruning (``bq_create_table_ddl.sql:8-9``). The Spark
engine gets partition pruning natively from the Hive layout; this
module adds the second layer explicitly — a ZONE MAP (one row of
``min/max/count`` per file per column, the Delta-Lake
``add.stats`` / ORC stripe-stats design) and a scan operator that
consults it to read only the files a predicate can possibly touch.

Spark-first design:

* stats come from the hidden ``_metadata.file_path`` column — ONE
  parquet pass, a single groupBy (shuffle keyed on file path, ~one row
  per file out);
* the candidate-file list is driver-side METADATA, not data: one row
  per file, exactly like Delta's transaction-log file listing — at
  100 TB with 128 MiB files that is ~800 k rows, small enough to
  collect, and the zone map itself can be persisted as a table and
  incrementally maintained per partition write;
* the pruned scan is a plain ``spark.read.parquet(*files)`` — Catalyst
  still applies partition pruning, predicate pushdown, and row-group
  skipping INSIDE the surviving files; the zone map only shrinks the
  file list up front (cheaper listing + task scheduling, the win
  Parquet footers alone cannot give because footer reads still open
  every file).

Combined with :mod:`.zorder`, skipping works on every clustered
dimension: z-ordered files have tight min/max on each interleaved
column, so a range predicate on ANY of them eliminates most files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_zone_map(spark: SparkSession, table_root: str, cols: list[str]) -> DataFrame:
    """Per-FILE min/max/count stats for ``cols`` under ``table_root``.

    One scan, one groupBy on ``_metadata.file_path``. Output rows ≈
    file count — metadata-sized regardless of table volume.
    """
    df = spark.read.parquet(table_root)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        df.select(F.col("_metadata.file_path").alias("file_path"), *cols)
        .groupBy("file_path")
        .agg(*aggs)
    )


def partition_zone_map(
    spark: SparkSession, table_root: str, cols: list[str]
) -> DataFrame:
    """Per-PARTITION min/max/count stats (hour granularity).

    The layout-independent rollup of :func:`file_zone_map` — what an
    engine catalog would persist next to the table. Grouping on the
    Hive partition columns is a near-free aggregation: partition values
    are scan metadata, so the groupBy's map-side combine collapses each
    file to one row before the (tiny) shuffle.
    """
    df = spark.read.parquet(table_root)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    part = F.concat_ws(
        "",
        F.col("year"),
        F.lpad(F.col("month").cast("string"), 2, "0"),
        F.lpad(F.col("day").cast("string"), 2, "0"),
        F.lpad(F.col("hour").cast("string"), 2, "0"),
    ).alias("hour_partition")
    return df.groupBy(part).agg(*aggs)


def skipping_scan(
    spark: SparkSession,
    table_root: str,
    col: str,
    lo,
    hi,
) -> tuple[DataFrame, int, int]:
    """Scan ``table_root`` for rows with ``col BETWEEN lo AND hi``,
    reading only files whose zone-map interval intersects ``[lo, hi]``.

    Returns ``(df, files_read, files_total)`` so callers can assert the
    skip ratio. The file list is collected driver-side — one row per
    file, metadata scale (see module docstring); the data itself never
    moves to the driver. NULL-only files have NULL min/max and are
    skipped, which is correct for a range predicate.
    """
    zm = file_zone_map(spark, table_root, [col]).select(
        "file_path", f"min_{col}", f"max_{col}"
    )
    rows = zm.collect()
    files_total = len(rows)
    keep = [
        r["file_path"]
        for r in rows
        if r[f"min_{col}"] is not None
        and r[f"max_{col}"] is not None
        and r[f"max_{col}"] >= lo
        and r[f"min_{col}"] <= hi
    ]
    if not keep:
        empty = spark.read.parquet(table_root).filter(F.lit(False))
        return empty, 0, files_total
    # basePath keeps Hive partition-column discovery intact even though
    # we hand the reader leaf files instead of the table root.
    df = (
        spark.read.option("basePath", table_root)
        .parquet(*keep)
        .filter(F.col(col).between(lo, hi))
    )
    return df, len(keep), files_total
