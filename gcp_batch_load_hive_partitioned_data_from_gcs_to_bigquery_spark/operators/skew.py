"""Skew-aware join: salting for hot keys.

At 100 TB a shuffle join on a skewed key (a handful of values carrying
most rows) funnels those rows into a few reducer tasks; AQE's skew-join
splitting handles sort-merge cases, but explicit salting is the general
tool and works for any join the optimizer can't split. The pattern:

* fact side: add ``salt = hash(row) mod factor`` — spreads each hot key
  over ``factor`` reducer partitions;
* dim side: replicate each row ``factor`` times (explode over the salt
  range) so every (key, salt) combination finds its match;
* join on (key, salt); drop the salt.

Cost: dim side inflates by ``factor`` (fine — it is the small side);
fact side shuffles once, now evenly. Deterministic: the salt derives
from xxhash64 of chosen columns, not rand().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_factor: int = 8,
    how: str = "inner",
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Join ``fact`` ⋈ ``dim`` on column ``on`` with key salting.

    ``salt_source`` names the fact columns hashed into the salt (defaults
    to all fact columns — deterministic per row, uniform across rows).
    The dim side must be the small side: it is replicated ``salt_factor``
    times before the join.
    """
    src = salt_source or fact.columns
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in src]), F.lit(salt_factor))
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)).cast("array<bigint>"))
    )
    joined = salted_fact.join(salted_dim, [on, "__salt"], how)
    return joined.drop("__salt")


def key_skew_profile(df: DataFrame, key: str | Column, top_k: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts and share of total for the hottest
    keys — the input to choosing a salt factor. The top-k is an
    orderBy+limit (TakeOrderedAndProject — per-partition heaps, never a
    global sort materialization), deterministic under count ties via the
    key-ascending tie-break."""
    key_col = F.col(key) if isinstance(key, str) else key
    counts = df.groupBy(key_col.alias("__key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = counts.agg(F.sum("n_rows").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("n_rows") / F.col("total"), 4))
        .drop("total")
        .orderBy(F.desc("n_rows"), F.asc("__key"))
        .limit(top_k)
    )


def auto_salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    salt_source: list[str] | None = None,
    max_factor: int = 16,
    mg_capacity: int = 64,
) -> tuple[DataFrame, int]:
    """Sketch-driven salting: measure the join key's hottest share with
    the Misra-Gries heavy-hitter pass (operators/sketches.py — bounded
    to mg_capacity rows per partition, never a full-domain aggregation)
    and derive the salt factor from it before planning the join — the
    user-space analogue of AQE's runtime skew split, available to joins
    AQE cannot rewrite.

    factor = clamp(ceil(top_share * max_factor), 1, max_factor): a key
    carrying 100% of rows spreads over max_factor reducers; a uniform
    key degenerates to factor 1 (= the plain join, no dim inflation).
    The formula uses the CONFIRMED exact share (the sketch only prunes
    candidates), so the chosen factor is deterministic and an external
    oracle can recompute it from exact counts. Returns (joined, factor).

    The sketch pass is one extra scan of the fact side's key column at
    plan time. At 100 TB you run it once per key per ingest window and
    cache the profile, not per query.
    """
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.sketches import heavy_hitters

    import math

    top = heavy_hitters(fact.select(on), on, k=1, capacity=mg_capacity).collect()
    total = fact.count()
    share = (top[0]["n"] / total) if (top and total) else 0.0
    factor = max(1, min(max_factor, math.ceil(share * max_factor)))
    joined = salted_join(
        fact, dim, on=on, salt_factor=factor, how=how, salt_source=salt_source
    )
    return joined, factor
