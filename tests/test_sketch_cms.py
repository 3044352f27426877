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
