"""Small-input parallelism guard for CPU-bound narrow operators.

A tiny table (sf0.1 documents is ONE parquet file) yields one input
split, so a compute-heavy per-row operator runs on a single core no
matter how many the session has. One cheap shuffle fixes that; at real
scale the input has at least as many splits as cores and this is a
no-op — the gate keeps the extra exchange out of 100 TB plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_min_parallelism"]


def ensure_min_parallelism(df: DataFrame) -> DataFrame:
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        return df.repartition(parallelism)
    return df
