"""Dump `.explain("formatted")` for every benched query to plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt where <suffix> defaults to the
tag's before/after convention: pass e.g. `r18_before` to get
plans/r18/<query>_before.txt. The plan is captured from the DataFrame the
catalog returns, pre-execution (AdaptiveSparkPlan isFinalPlan=false) —
the shape evidence the optimization judge checks claims against.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    tag = sys.argv[1]  # e.g. "r18_before"
    only = set(sys.argv[2:])
    round_dir, _, suffix = tag.partition("_")
    if not suffix:  # bare tag like "r18": default instead of writing "<query>_.txt"
        suffix = "plan"
    out_dir = os.path.join(_REPO, "plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark import get_spark
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.queries.catalog import (
        QUERIES,
        seed_amortized_store,
    )

    names = (
        bench.BENCH_QUERIES
        + bench.EXTRA_QUERIES_R4
        + bench.EXTRA_QUERIES_R5
        + bench.EXTRA_QUERIES_R6
        + bench.EXTRA_QUERIES_R8
        + bench.EXTRA_QUERIES_R12
    )
    if only:
        names = [n for n in names if n in only] + sorted(only - set(names))

    spark = get_spark(app_name="capture_plans")
    for name in names:
        kwargs = {}
        if name == "stream_semantic_dedup_amortized":
            seed_amortized_store(spark, sf_dir)
            kwargs = {"pre_seeded": True}
        try:
            df = QUERIES[name](spark, sf_dir, **kwargs)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # capture the failure instead of dying
            text = f"PLAN CAPTURE FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"{name}: {len(text)} bytes -> {path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
