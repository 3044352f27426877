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
    keys — the input to choosing a salt factor."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("n_rows") / F.col("total"), 4))
        .drop("total")
        .orderBy(F.desc("n_rows"))
        .limit(top_k)
    )
