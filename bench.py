"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full execution with the noop writer (no driver
materialization cost, no skipped compute).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # ingestion path (reference parity)
    "scan_csv_tab_delimited",
    "sink_partition_overwrite",
    # analytics
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q9_product_type_profit",
    "q13_customer_distribution",
    "q18_large_orders",
    "q21_waiting_suppliers",
    "window_running_total",
    "window_sessionize",
    "join_asof",
    "agg_stats",
    # training-data pipeline
    "sample_hash_split",
    "text_chunk_windows",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "text_quality",
    "multimodal_image_meta",
]

# Added round 4 — NOT part of the 22-query baseline set BENCH_r01/BASELINE.md
# totals were recorded over, so they are benched and reported per-query but
# kept out of the baseline-comparable total (value). The scan pair shares one
# fixture and one oracle: the delta between them is the zone-map
# file-skipping payoff (skip must beat full). The dedup pair are the round-4
# corpus operators (C4 cross-corpus line dedup, SemDeDup).
EXTRA_QUERIES_R4 = [
    "scan_file_skipping",
    "scan_zonemap_full",
    "dedup_lines",
    "dedup_semantic",
]

# Added round 5 — also outside the baseline-comparable total: the
# end-to-end curation funnel, the Misra-Gries heavy-hitter top-k, the
# ExactSubstr-style span audit, JL-prefiltered ANN, and the ISO-BMFF
# video metadata decode.
EXTRA_QUERIES_R5 = [
    "corpus_curation_pipeline",
    "text_heavy_hitters",
    "dedup_spans",
    "ann_jl_rerank",
    "multimodal_video_meta",
    # behavioral analytics + sketch/curriculum additions (also outside
    # the baseline-comparable total)
    "funnel_conversion",
    "dim_scd2",
    "window_concurrency",
    "approx_cms_counts",
    "dedup_normalized",
    "text_bm25_topk",
    "agg_mode",
    # second-half-of-round-5 additions (still outside the baseline
    # total): Gopher repetition signals, the in-plan Naive Bayes
    # classifier, the training-shard sink (full write→verify path),
    # cluster-aware leakage-safe splits, top-k path mining, and the
    # single-scan expectation suite.
    "text_repetition_filter",
    "classify_naive_bayes",
    "sink_training_shards",
    "sample_split_leakage_safe",
    "path_topk",
    "quality_expectations",
]

# Added round 6 — outside the baseline-comparable total: the newly
# oracle-checked BPE train/encode pipeline and no-split FFD packing,
# plus the segmented-fold ts_ewma rewrite (regression watch on the
# bounded per-day shape) and the REST-surface lifecycle query.
EXTRA_QUERIES_R6 = [
    "text_bpe_merges",
    "text_bpe_encode",
    "pack_first_fit",
    "ts_ewma",
    "api_ingest_lifecycle",
    # second wave: the semantic-incremental family + sketch/monitor keys
    "dedup_semantic_incremental",
    "dedup_semantic_bucketed",
    "stream_semantic_dedup",
    "approx_quantile_hashmin",
    "monitor_freshness",
    "text_bpe_coverage",
]

EXTRA_QUERIES_R8 = [
    "ann_int8_rescore",
    "window_sliding_distinct",
    "window_sliding_quantile",
    "approx_kmv_distinct",
    # round-6 keys the r7 promotion missed
    # (stream_sliding_distinct is deliberately unbenched: a full
    # streaming replay per pass would add ~80s of fixture time for a
    # number that measures the harness, not the operator)
    "join_interval_overlap",
    "corpus_release_manifest",
]

# Added round 12 — outside the baseline-comparable total: the
# amortized-trigger twin of stream_semantic_dedup (pre-seeded store,
# 16 batch drops drained at maxFilesPerTrigger=16). The mft=1 key keeps
# measuring the per-trigger scheduler floor; this one measures the data
# work — the pair quantifies the amortization lever BASELINE.md's
# round-11 probe table documents. Since round 13 the O(corpus) store
# seed (drop + persist_corpus_cells) runs OUTSIDE the timed region via
# seed_amortized_store, so the timed figure is the one screen+append
# trigger, not seed-plus-trigger.
EXTRA_QUERIES_R12 = [
    "stream_semantic_dedup_amortized",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark import get_spark
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.queries.catalog import QUERIES

    spark = get_spark(app_name="bench")
    # warm the JVM + parquet footers so per-query timings measure the query
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # warm one Python worker per core (mapInPandas queries otherwise pay
    # interpreter + Arrow startup inside their first measured stage)
    import pandas as _pd
    from pyspark.sql import types as _T

    def _ident(it):
        yield from it

    n = spark.sparkContext.defaultParallelism
    spark.range(0, n * 10, 1, n).mapInPandas(
        _ident, _T.StructType([_T.StructField("id", _T.LongType())])
    ).write.format("noop").mode("overwrite").save()

    # Four passes, report the min: the host shows intermittent hypervisor
    # CPU-steal waves (observed 3-15x inflation for whole passes); the min
    # measures the query, not the noise.
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators._cache import release_all_scopes
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.queries.catalog import seed_amortized_store

    timings: dict[str, float] = {}
    for _pass in range(4):
        for name in BENCH_QUERIES + EXTRA_QUERIES_R4 + EXTRA_QUERIES_R5 + EXTRA_QUERIES_R6 + EXTRA_QUERIES_R8 + EXTRA_QUERIES_R12:
            kwargs = {}
            if name == "stream_semantic_dedup_amortized":
                # pay the O(corpus) store seed outside the timer — the
                # timed figure isolates the per-trigger screen+append
                seed_amortized_store(spark, sf_dir)
                kwargs = {"pre_seeded": True}
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir, **kwargs)
            df.write.format("noop").mode("overwrite").save()
            t = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, t), t)
        # r19 measurement fix (r18 verdict task 1): release every scoped
        # cache AND the session cache between passes, so passes 2-4
        # measure COLD-plan execution like pass 1 — previously the
        # scoped_persist plan-identity fast path served pass 2-4 the
        # prior pass's already-filled cache and the min excluded every
        # persist-using key's cache-fill cost. Same queries, same SF,
        # same noop-sink timing; only the between-pass state changed.
        release_all_scopes()
        spark.catalog.clearCache()

    # value = the 22-query set BASELINE.md totals compare against;
    # grand_total additionally includes the post-baseline additions.
    total = round(sum(timings[q] for q in BENCH_QUERIES), 3)
    # Self-describing host context (r14 verdict task 7): the host drifts
    # between a fast and a ~1.7x slow era on multi-hour timescales
    # (BASELINE.md, rounds 10-14), so a single JSON artifact must carry
    # its own load snapshot and the comparison rule instead of relying
    # on prose in another file.
    try:
        load_avg = [round(x, 2) for x in os.getloadavg()]
    except OSError:  # platform without getloadavg
        load_avg = None
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "baseline_comparable_queries": len(BENCH_QUERIES),
                "grand_total": round(sum(timings.values()), 3),
                "load_avg_1_5_15": load_avg,
                # r19: caches released between passes — min-of-4 is cold-plan
                "cold_per_pass": True,
                # notes shortened r19: the ~3.5 KB line outgrew the driver's
                # r17 tail-capture window and vaporized a round-over-round
                # table (VERDICT r18); full prose lives in BASELINE.md.
                "era_note": "host has ~1.7x fast/slow eras; quote quietest of >=3 runs (BASELINE.md)",
                "twin_note": "stream_semantic_dedup = frozen baseline twin; scale path is _amortized",
            }
        )
    )


if __name__ == "__main__":
    main()
