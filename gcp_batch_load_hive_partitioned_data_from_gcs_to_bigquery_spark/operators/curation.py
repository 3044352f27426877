"""End-to-end corpus-curation funnel: language ID → quality filter →
exact dedup → train/val/test split, as ONE Spark job.

This is the composition a real LLM training-data pipeline runs over the
whole corpus before expensive near-dup/contamination passes (the
reference delegates all processing to its warehouse — README.md:77,92
describe only downstream monitoring queries — so this composite is part
of the beyond-reference LLM-pipeline surface).

Designed for 100 TB, the key observation is that every per-document
verdict here (language, Gopher quality) is a pure function of the text
itself, so the whole funnel needs exactly ONE wide shuffle:

1. A narrow map computes (lang_ok, quality_ok) per row — all Catalyst
   array/string expressions from operators/text.py, zero UDFs, inside
   whole-stage codegen.
2. ONE groupBy(text) both deduplicates (min doc_id = keeper) and
   carries the flags (constant within a group, bool_or is exact) and
   copy counts. At scale, group on sha2(text,256) so shuffle rows carry
   32 bytes, not documents (exact_dedup_keepers documents the same
   trade).
3. Funnel totals and split counts aggregate the grouped (distinct-text)
   table — metadata-sized relative to the corpus.

No join-backs, no second corpus scan, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.sampling import hash_split
from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.text import (
    gopher_keep_col,
    lang_pred_col,
)


def _grouped_flags(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The shared front half of the curation pipelines: per-document
    (lang_ok, quality_ok) as narrow map expressions, then ONE
    groupBy(text) that deduplicates (min id = keeper) and carries the
    flags and copy counts — the funnel's single wide shuffle.

    The flag expressions are the CPU-heavy part (per-row array/string
    work inside codegen), so single-split inputs are parallelized first
    (sf0.1 documents is one parquet file → one core of 32; measured
    6× cold-pass win) — a no-op at real scale where scans have at
    least as many splits as cores."""
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators._parallel import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    flagged = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
        (lang_pred_col(F.col(text_col)) != "und").alias("lang_ok"),
        gopher_keep_col(F.col(text_col)).alias("quality_ok"),
    )
    return flagged.groupBy("text").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keeper_id"),
        F.bool_or("lang_ok").alias("lang_ok"),
        F.bool_or("quality_ok").alias("quality_ok"),
    )


def curation_funnel(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split_weights: dict[str, float] | None = None,
    salt: int = 0,
) -> DataFrame:
    """Run the full curation funnel and return its audit table:

    ``(stage, n_docs)`` rows for ``1_input`` (corpus size), ``2_lang``
    (docs whose predicted language is determined), ``3_quality`` (of
    those, docs passing the Gopher repetition/quality rules),
    ``4_dedup`` (distinct surviving texts = kept documents), and one
    ``5_split_<name>`` row per split of the keepers.

    Dedup keeps min(id) per distinct text. Flags are functions of the
    text alone, so every copy of a text shares its verdict and the
    keeper's flags equal the group's (bool_or is exact, not a guess).
    """
    weights = split_weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    grouped = _grouped_flags(df, id_col, text_col)
    survivor = F.col("lang_ok") & F.col("quality_ok")
    # Roll EVERYTHING up under the split key in one pass so the audit
    # table's two faces (funnel totals, per-split counts) both read the
    # same |splits|-row aggregate. Deriving them as separate branches of
    # a union would make Spark re-derive the whole lineage per branch —
    # two corpus scans and two wide shuffles instead of one of each
    # (caught by a plan audit; the persist below pins a 3-row frame, so
    # its cost is nil while making the corpus-side lineage single-run).
    per_split = (
        hash_split(grouped, "keeper_id", weights, salt=salt)
        .groupBy("split")
        .agg(
            F.sum("n_copies").alias("n_input"),
            F.sum(F.when(F.col("lang_ok"), F.col("n_copies")).otherwise(0)).alias(
                "n_lang"
            ),
            F.sum(F.when(survivor, F.col("n_copies")).otherwise(0)).alias(
                "n_quality"
            ),
            F.count(F.when(survivor, F.lit(1))).alias("n_dedup"),
        )
    )
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators._cache import scoped_persist

    per_split = scoped_persist(per_split, "curation.per_split")
    funnel_rows = per_split.agg(
        F.sum("n_input").alias("n_input"),
        F.sum("n_lang").alias("n_lang"),
        F.sum("n_quality").alias("n_quality"),
        F.sum("n_dedup").alias("n_dedup"),
    ).select(
        F.expr(
            "stack(4, '1_input', n_input, '2_lang', n_lang,"
            " '3_quality', n_quality, '4_dedup', n_dedup) AS (stage, n_docs)"
        )
    )
    split_rows = per_split.filter(F.col("n_dedup") > 0).select(
        F.concat(F.lit("5_split_"), F.col("split")).alias("stage"),
        F.col("n_dedup").alias("n_docs"),
    )
    return funnel_rows.unionByName(split_rows).orderBy("stage")


def corpus_release_manifest(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_shards: int = 8,
    split_weights: dict[str, float] | None = None,
    salt: int = 0,
) -> DataFrame:
    """The END of the pipeline: turn the curation survivors into a
    training-data RELEASE manifest — per (split, shard): document
    count, total whitespace tokens, and an id-sum integrity figure. The
    table a training job validates against before reading a release,
    and the composition story of the whole engine: curate → split →
    shard → manifest in one job.

    Plan shape: the same single content-keyed shuffle as
    :func:`curation_funnel` (via the shared grouped front half), then
    one keepers-sized groupBy on (split, shard) — metadata relative to
    the corpus. Split membership and shard assignment are the
    deterministic hash family (sampling.hash_split / packing.shard_for),
    so the whole manifest is a pure function of the corpus content and
    reproducible in any engine.
    """
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.packing import shard_for
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.text import token_count

    weights = split_weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    grouped = _grouped_flags(df, id_col, text_col)
    keepers = grouped.filter(F.col("lang_ok") & F.col("quality_ok"))
    staged = hash_split(keepers, "keeper_id", weights, salt=salt).select(
        "split",
        shard_for(F.col("keeper_id"), n_shards, salt).alias("shard"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        "keeper_id",
    )
    return (
        staged.groupBy("split", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("keeper_id").alias("id_sum"),
        )
        .orderBy("split", "shard")
    )
