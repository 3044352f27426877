"""Sequence-packing invariants: exact fill, token conservation,
determinism, and the one-shuffle plan shape."""

from pyspark.sql import functions as F

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)
from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.text import token_count

BUDGET = 128


def _docs(spark):
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.sources.tables import load_table

    return (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", token_count(F.col("text")).alias("n_tokens"))
    )


def test_every_pack_full_except_shard_last(spark):
    packed = pack_sequences(_docs(spark), budget=BUDGET, n_shards=4).persist()
    per_pack = (
        packed.groupBy("shard", "pack_id")
        .agg(F.sum("seg_tokens").alias("tok"))
        .collect()
    )
    last = {}
    for r in per_pack:
        last[r.shard] = max(last.get(r.shard, -1), r.pack_id)
    for r in per_pack:
        if r.pack_id < last[r.shard]:
            assert r.tok == BUDGET, f"non-final pack {r.shard}/{r.pack_id} not full"
        else:
            assert 0 < r.tok <= BUDGET
    packed.unpersist()


def test_token_conservation_per_doc(spark):
    docs = _docs(spark).filter(F.col("n_tokens") > 0)
    packed = pack_sequences(docs, budget=BUDGET, n_shards=4)
    per_doc = packed.groupBy("doc_id").agg(F.sum("seg_tokens").alias("tok"))
    joined = docs.join(per_doc, "doc_id", "left")
    assert joined.filter(
        (F.col("tok").isNull()) | (F.col("tok") != F.col("n_tokens"))
    ).count() == 0


def test_segments_are_contiguous_within_doc(spark):
    """A straddling doc's segments tile it: doc_start values are the
    running sum of earlier segment lengths."""
    packed = pack_sequences(_docs(spark), budget=BUDGET, n_shards=4)
    multi = packed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum("seg_tokens").alias("total"),
        F.max(F.col("doc_start") + F.col("seg_tokens")).alias("covered_end"),
        F.min("doc_start").alias("first_start"),
    ).filter(F.col("n_segs") > 1)
    bad = multi.filter(
        (F.col("first_start") != 0) | (F.col("covered_end") != F.col("total"))
    )
    assert multi.count() > 0  # fixture actually exercises straddling
    assert bad.count() == 0


def test_deterministic_across_runs(spark):
    a = pack_sequences(_docs(spark), budget=BUDGET, n_shards=4)
    b = pack_sequences(_docs(spark), budget=BUDGET, n_shards=4)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_single_shuffle_plan(spark):
    """Packing is one window shuffle + narrow explode/arithmetic — no
    second Exchange may appear."""
    packed = pack_sequences(_docs(spark), budget=BUDGET, n_shards=4)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange")
    assert n_exchanges == 1, f"expected exactly one shuffle, plan had {n_exchanges}"


def test_stats_fill_ratio(spark):
    packed = pack_sequences(_docs(spark), budget=BUDGET, n_shards=4)
    stats = {r.shard: r for r in packing_stats(packed, BUDGET).collect()}
    assert set(stats) == {0, 1, 2, 3}
    for r in stats.values():
        assert 0 < r.fill_ratio <= 1.0
        # all packs full except possibly the last one of the shard
        assert r.total_tokens > (r.n_packs - 1) * BUDGET


def test_first_fit_nosplit_respects_budget_and_is_exact(spark):
    """No pack over budget, no document split or lost, oversized docs
    audited as overflow, deterministic across runs."""
    from pyspark.sql import functions as F

    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.packing import pack_first_fit_nosplit

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        # lengths 1..120 with one oversized outlier
        F.when(F.col("id") == 7, 10_000).otherwise(F.col("id") % 120 + 1).alias("n_tokens"),
    )
    out = pack_first_fit_nosplit(docs, budget=128, n_shards=4).cache()
    # every doc exactly once
    assert out.count() == 200
    assert out.select("doc_id").distinct().count() == 200
    # overflow audited, never packed
    overflow = out.filter(F.col("pack_id") == -1).collect()
    assert [r.doc_id for r in overflow] == [7]
    # no (shard, pack) exceeds the budget
    over = (
        out.filter(F.col("pack_id") >= 0)
        .groupBy("shard", "pack_id")
        .agg(F.sum("n_tokens").alias("fill"))
        .filter(F.col("fill") > 128)
        .count()
    )
    assert over == 0
    # deterministic
    again = pack_first_fit_nosplit(docs, budget=128, n_shards=4)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
