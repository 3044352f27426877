"""Count-Min sketch semantic pins (operators/sketches.py): estimates
never undercount, unseen keys read zero, and the sketch frame is
depth × width bounded regardless of key cardinality."""

from pyspark.sql import functions as F

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.sketches import (
    countmin_query,
    countmin_sketch,
)


def _stream(spark, pairs):
    rows = [(k,) for k, n in pairs for _ in range(n)]
    return spark.createDataFrame(rows, ["key"])


def test_cms_never_undercounts(spark):
    truth = [("alpha", 50), ("beta", 20), ("gamma", 7), ("delta", 1)]
    df = _stream(spark, truth)
    sketch = countmin_sketch(df, "key", depth=4, width=64)
    cands = spark.createDataFrame([(k,) for k, _ in truth], ["key"])
    est = {
        r["key"]: r["cms_estimate"]
        for r in countmin_query(sketch, cands, "key", depth=4, width=64).collect()
    }
    for k, n in truth:
        assert est[k] >= n, (k, est[k], n)


def test_cms_unseen_key_reads_zero_with_wide_sketch(spark):
    # width >> inserted keys: the unseen key's cells are almost surely
    # untouched; the LEFT-join + coalesce(0) path must report 0, not
    # drop the key or inflate it from partial cell matches.
    df = _stream(spark, [("only", 5)])
    sketch = countmin_sketch(df, "key", depth=4, width=4096)
    cands = spark.createDataFrame([("never",)], ["key"])
    out = countmin_query(sketch, cands, "key", depth=4, width=4096).collect()
    assert len(out) == 1
    assert out[0]["cms_estimate"] == 0


def test_cms_sketch_is_depth_width_bounded(spark):
    df = _stream(spark, [(f"k{i}", 1) for i in range(500)])
    sketch = countmin_sketch(df, "key", depth=4, width=32)
    assert sketch.count() <= 4 * 32
    # total mass is conserved: every insert lands once per depth row
    total = sketch.agg(F.sum("n")).collect()[0][0]
    assert total == 4 * 500


def test_hashmin_quantiles_accurate_and_no_global_sort(spark):
    """The hash-min sample quantile estimator must (a) compile to
    TakeOrderedAndProject (per-partition k-heaps, never a global sort),
    and (b) land within the q±0.08 exact-quantile band on uniform data
    (k=400 → sampling error ~1/sqrt(k)≈0.05)."""
    import numpy as np
    from pyspark.sql import functions as F

    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.sketches import hashmin_sample_quantiles

    vals = [(i, float((i * 2654435761) % 100_000) / 1000.0) for i in range(20_000)]
    df = spark.createDataFrame(vals, "k long, v double")
    out = hashmin_sample_quantiles(df, "k", "v", k=400)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.replace("sort_array", "")
    arr = np.array([v for _, v in vals])
    for r in out.collect():
        lo, hi = np.quantile(arr, max(r.q - 0.08, 0.0)), np.quantile(
            arr, min(r.q + 0.08, 1.0)
        )
        assert lo <= r.est <= hi, (r.q, r.est, lo, hi)
        assert r.n_sample == 400
