"""One-off staged probe for the SemDeDup family (r11, verdict task 4):
time the operator's three stages SEPARATELY at 1x and Kx so the scaling
exponent can be attributed to a stage instead of guessed at:

  seed   — _seed_centroid_rows: global sort-limit + nlist-row collect
  assign — _assign_cells_blas GEMM + norm (N x nlist x d work)
  full   — the whole semdedup pipeline (assign + cell-pair screen + verdict)

nlist scales with K (the corpus-proportional rule the operator
documents), so `assign` FLOPs grow K^2 by construction — this probe
exists to show whether that term dominates the wall clock yet, and to
size the two-level assignment work. Reuses scale_probe's derived-corpus
builder (1x is also Spark-written, so layouts match).

Usage: python scripts/semantic_stage_probe.py [K]   (default 10)
Writes one JSON line; copy the numbers into BASELINE.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

# repo root (package import) AND scripts dir (sibling scale_probe) must
# both be on the path BEFORE the sibling import, or `python -m` / other
# cwds break — only direct invocation puts scripts/ on sys.path[0]
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_probe import build_derived, timed  # noqa: E402


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pyspark.sql import functions as F

    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark import get_spark
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators import similarity as SIM

    spark = get_spark(app_name="semantic_stage_probe")
    base = build_derived(spark, 1)
    derived = build_derived(spark, k)

    def run(sf_dir: str, nlist: int) -> dict:
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        c = SIM.with_double_embedding(emb, "embedding").select(
            F.col("vec_id"), F.col("embedding").alias("c_vec")
        )
        c.count()  # warm the scan/JVM so the first timed stage isn't startup
        out = {}
        # min-of-2 like timed(): the seed stage is a driver-side collect,
        # so it can't go through the noop-write harness
        best = None
        for _ in range(2):
            t0 = time.time()
            centroid_rows = SIM._seed_centroid_rows(c, nlist)
            t = time.time() - t0
            best = t if best is None else min(best, t)
        out["seed"] = round(best, 3)
        assigned = SIM._assign_cells_blas(c, centroid_rows).withColumn(
            "c_norm", SIM._norm(F.col("c_vec"))
        )
        out["assign"] = timed(assigned, runs=2)
        out["full"] = timed(
            SIM.semdedup(emb, nlist=nlist, min_cosine=0.3).select(
                "vec_id", "cell", "keep"
            ),
            runs=2,
        )
        return out

    r1 = run(base, 64)
    rk = run(derived, 64 * k)
    exps = {
        s: round(math.log(max(rk[s], 1e-3) / max(r1[s], 1e-3)) / math.log(k), 3)
        for s in ("seed", "assign", "full")
    }
    print(json.dumps({"k": k, "sf1x": r1, f"sf{k}x": rk, "exponents": exps}))


if __name__ == "__main__":
    main()
