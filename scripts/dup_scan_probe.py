"""A/B probe (r18 verdict task 3): do `line_dedup` / `span_dedup_stats`
win from persisting their exploded frame, at 1x and at a 10x derived
corpus?

Both operators consume their exploded (doc_id, pos, line|gram) frame
twice (winners groupBy + survivors/dups join-back) and the base frame
once more (per-doc counts) — replan_audit: documents x3. Persisting the
exploded frame trades one corpus re-scan for a corpus-sized cache fill
(guide §2.4 vs §5). r18's `window_sliding_distinct` attempt proved the
trade can LOSE when the duplicated branch is cheap, so this is decided
by measurement at BOTH scales, not by plan aesthetics.

Methodology: full corpus (no doc_id prune — the catalog key's fixed
doc_id<300 prune would de-scale the 10x point), noop sink, min-of-2,
release_all_scopes + clearCache between variants so every timing is
cold-plan. Uses scale_probe.build_derived for the 1x/10x corpora
(identical 32-file Spark-written layout at both scales).

Usage: python scripts/dup_scan_probe.py [K]   (default 10)
Prints one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pyspark.sql import functions as F

    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark import get_spark
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators import dedup as D
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators._cache import (
        release_all_scopes,
    )
    from scale_probe import build_derived

    spark = get_spark(app_name="dup_scan_probe")
    base = build_derived(spark, 1)
    derived = build_derived(spark, k)

    def docs_of(root):
        return spark.read.parquet(os.path.join(root, "documents.parquet"))

    def lined(docs):
        words = F.split(F.col("text"), " ")
        n_lines = F.ceil(F.size(words) / F.lit(8)).cast("int")
        lines = F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.array_join(F.slice(words, i * 8 + 1, 8), " "),
        )
        return docs.select("doc_id", lines.alias("lines"))

    def timed(make_df, runs: int = 2) -> float:
        best = None
        for _ in range(runs):
            release_all_scopes()
            spark.catalog.clearCache()
            t0 = time.time()
            make_df().write.format("noop").mode("overwrite").save()
            t = time.time() - t0
            best = t if best is None else min(best, t)
        release_all_scopes()
        spark.catalog.clearCache()
        return round(best, 3)

    # untimed warm-up (JVM + python workers + parquet footers)
    docs_of(base).agg(F.count(F.lit(1))).write.format("noop").mode(
        "overwrite"
    ).save()

    results = {}
    for opname, runner in (
        (
            "dedup_lines",
            lambda root, p: D.line_dedup(
                lined(docs_of(root)), "doc_id", "lines", persist_exploded=p
            ),
        ),
        (
            "dedup_spans",
            lambda root, p: D.span_dedup_stats(
                docs_of(root), "doc_id", "text", width=8, persist_exploded=p
            ),
        ),
    ):
        row = {}
        for label, root in (("1x", base), (f"{k}x", derived)):
            for p in (False, True):
                key = f"t_{label}_{'persist' if p else 'replan'}"
                spark.sparkContext.setJobDescription(f"{opname} {key}")
                row[key] = timed(lambda r=root, pp=p: runner(r, pp))
        for variant in ("replan", "persist"):
            t1, tk = row[f"t_1x_{variant}"], row[f"t_{k}x_{variant}"]
            row[f"exponent_{variant}"] = round(math.log(tk / t1) / math.log(k), 3)
        results[opname] = row
    print(json.dumps({"metric": "dup_scan_probe", "k": k, "operators": results}))


if __name__ == "__main__":
    main()
