"""Test-table catalog: load the driver's parquet tables by name.

The driver's synthetic tables (TESTDATA.md) are TPC-H-ish parquet files.
One wrinkle: some were written with nanosecond-precision timestamps
(``timestamp[ns]``), which Spark's vectorized parquet reader rejects
(PARQUET_TYPE_ILLEGAL). We read those columns as raw int64 nanos
(``spark.sql.legacy.parquet.nanosAsLong``) and convert with integer
division to microseconds — identical truncation to what DuckDB does when
it surfaces the same column as a microsecond TIMESTAMP, so oracle
comparisons agree exactly. Detection is driver-side parquet-footer
metadata (pyarrow), never a data scan.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@lru_cache(maxsize=128)
def _nanos_columns(path: str) -> tuple[str, ...]:
    """Column names stored as timestamp[ns] in the parquet footer."""
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    return tuple(f.name for f in schema if str(f.type) == "timestamp[ns]")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table, normalizing nanosecond timestamps to Spark's
    native microsecond TimestampType."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos = _nanos_columns(path)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for col in nanos:
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register every test table as a temp view for spark.sql queries."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
