"""Hand-computed pins for the monitoring/experimentation additions:
seasonal anomaly baselines, path mining, the A/B z-test, and the
expectation suite."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.behavior import (
    abtest_ztest,
    path_topk,
    seasonal_anomaly,
)
from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.expectations import (
    check_expectations,
    referential_violations,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_seasonal_anomaly_flags_only_off_baseline_hours(spark):
    # hour 03:00 has 10 errors every day except day 3 (100). A single
    # outlier's population z-score is bounded by sqrt(n_days - 1), so
    # with 10 days the spike's z = 3 clears k=2 while inflating sigma.
    # hour 07:00 constant at 5 -> sigma 0, never flags.
    rows = []
    eid = 0
    for day in range(1, 11):
        n3 = 100 if day == 3 else 10
        for i in range(n3):
            rows.append((eid, dt.datetime(2024, 1, day, 3, i % 60), 1, "error", 1.0))
            eid += 1
        for i in range(5):
            rows.append((eid, dt.datetime(2024, 1, day, 7, i), 1, "error", 1.0))
            eid += 1
    out = seasonal_anomaly(_ev(spark, rows)).collect()
    flagged = {r.hour for r in out if r.anomaly == 1}
    assert flagged == {"2024-01-03 03"}
    seven = [r for r in out if r.hour.endswith(" 07")]
    assert all(r.sigma == 0.0 and r.anomaly == 0 for r in seven)


def test_path_topk_orders_and_truncates(spark):
    rows = []
    eid = 0
    # 3 users do signup>view>click; 1 user does view>click; one user
    # has 10 events (truncated to 8)
    for u in (1, 2, 3):
        for i, e in enumerate(["signup", "view", "click"]):
            rows.append((eid, dt.datetime(2024, 1, 1, 0, i), u, e, 0.0))
            eid += 1
    for i, e in enumerate(["view", "click"]):
        rows.append((eid, dt.datetime(2024, 1, 1, 0, i), 4, e, 0.0))
        eid += 1
    for i in range(10):
        rows.append((eid, dt.datetime(2024, 1, 1, 0, i), 5, "view", 0.0))
        eid += 1
    got = path_topk(_ev(spark, rows), k=3).collect()
    assert (got[0].path, got[0].n_entities) == ("signup>view>click", 3)
    paths = {r.path for r in got}
    assert "view>click" in paths
    assert ">".join(["view"] * 8) in paths  # truncated at 8 steps


def test_path_tiebreak_within_same_timestamp(spark):
    t = dt.datetime(2024, 1, 1, 12, 0)
    rows = [(2, t, 1, "b", 0.0), (1, t, 1, "a", 0.0)]  # same ts; event_id orders
    got = path_topk(_ev(spark, rows), k=1).collect()
    assert got[0].path == "a>b"


def test_abtest_ztest_null_effect_and_signal(spark):
    # identical constant metric in both arms -> var 0 -> z NaN/None or 0?
    # use a tiny deterministic difference instead: arm B gets +10.
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.sampling import _BUCKETS, _KNUTH

    rows = []
    for u in range(200):
        b = ((u * _KNUTH) % _BUCKETS) >= 5000
        base = float(u % 7)
        rows.append((u, dt.datetime(2024, 1, 1), u, "view", base + (10.0 if b else 0.0)))
    r = abtest_ztest(_ev(spark, rows)).collect()[0]
    assert r.n_a + r.n_b == 200
    assert r.mean_b - r.mean_a == pytest.approx(10.0, abs=1.0)
    assert r.significant == 1 and r.z_stat > 1.96


def test_check_expectations_single_pass_counts(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 60.0), (3, None)], "k long, v double"
    )
    out = check_expectations(
        df,
        [
            ("v_le_50", F.col("v") > 50),
            ("v_not_null", F.col("v").isNull()),
        ],
    ).collect()
    got = {r.rule: r.n_violations for r in out}
    # NULL predicate = violation (null_violates): row 3's v is NULL, so
    # `v > 50` can't prove it clean — it counts for v_le_50 too. A gate
    # that waves NULL rows through is the defect, not the contract.
    assert got == {"v_le_50": 2, "v_not_null": 1}
    # exactly one scan: a single aggregate, no join/union in the plan
    plan = check_expectations(df, [("x", F.col("v") > 0)])._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan


def test_referential_violations_counts_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = referential_violations(child, parent, "fk", "pk").collect()[0]
    assert r.rule == "fk_fk_in_pk" and r.n_violations == 1


def test_check_expectations_rejects_empty(spark):
    with pytest.raises(ValueError):
        check_expectations(spark.range(1), [])


def test_violation_tag_orders_and_joins_rules(spark):
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.streaming.quarantine import violation_tag

    df = spark.createDataFrame(
        [(1, "error", 500.0), (2, "view", 10.0), (3, "error", 10.0)],
        "id long, et string, v double",
    )
    rules = [("r_no_error", F.col("et") == "error"), ("r_v_le_200", F.col("v") > 200)]
    got = {r.id: r.tag for r in df.select("id", violation_tag(rules).alias("tag")).collect()}
    assert got == {1: "r_no_error,r_v_le_200", 2: "", 3: "r_no_error"}


def test_quarantine_stream_splits_and_preserves_rows(spark, tmp_path):
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.streaming.quarantine import stream_quarantine_ingest
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, float(i)) for i in range(40)], schema
    ).repartition(4).write.parquet(src)
    landing, quar, ckpt = (str(tmp_path / d) for d in ("land", "quar", "ckpt"))
    q = stream_quarantine_ingest(
        spark, src, landing, quar, schema,
        [("v_lt_30", F.col("v") >= 30)], checkpoint=ckpt,
        max_files_per_trigger=1,  # 4 micro-batches
    )
    q.awaitTermination(120)
    clean = spark.read.parquet(landing)
    bad = spark.read.parquet(quar)
    assert clean.count() == 30 and bad.count() == 10
    assert set(clean.columns) == {"id", "v"}  # tag stripped from landing
    assert {r.violations for r in bad.select("violations").distinct().collect()} == {"v_lt_30"}
    # nothing dropped: union restores the full id set
    ids = {r.id for r in clean.select("id").collect()} | {r.id for r in bad.select("id").collect()}
    assert ids == set(range(40))


def test_observed_expectations_ride_the_action(spark, tmp_path):
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.expectations import check_expectations_observed

    df = spark.createDataFrame([(i, float(i)) for i in range(20)], "k long, v double")
    observed, obs = check_expectations_observed(
        df, [("v_lt_15", F.col("v") >= 15)]
    )
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got["v_lt_15"] == 5 and got["__n_rows"] == 20
    # the written data is untouched by the observation
    assert spark.read.parquet(str(tmp_path / "out")).count() == 20


def test_observed_expectations_reject_empty(spark):
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.expectations import check_expectations_observed

    with pytest.raises(ValueError):
        check_expectations_observed(spark.range(1), [])


def test_bitmap_store_merge_is_retry_idempotent(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import types as T
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.streaming.bitmap_distinct import (
        read_distinct_counts,
        stream_bitmap_distinct,
    )

    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("user_id", T.LongType())]
    )
    rows = [
        (dt.datetime(2024, 1, d, 10), u)
        for d in (1, 2)
        for u in range(40)
        if (u + d) % 3 != 0
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).repartition(4).write.parquet(src)
    store = str(tmp_path / "store")
    q = stream_bitmap_distinct(
        spark, src, store, schema, checkpoint=str(tmp_path / "ck1"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    first = sorted(map(tuple, read_distinct_counts(spark, store).collect()))
    # retry: replay the SAME source into the SAME store (fresh checkpoint
    # = every batch reprocessed) — bitmap union is idempotent, counts
    # cannot inflate
    q2 = stream_bitmap_distinct(
        spark, src, store, schema, checkpoint=str(tmp_path / "ck2"),
        max_files_per_trigger=1,
    )
    q2.awaitTermination(120)
    assert sorted(map(tuple, read_distinct_counts(spark, store).collect())) == first
    got = dict(first)
    want_d1 = len({u for u in range(40) if (u + 1) % 3 != 0})
    assert got["2024-01-01"] == want_d1
    assert got["ALL"] == 40  # every user appears on some day


def test_ewma_matches_python_recursion(spark):
    import datetime as dt

    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.queries.analytics_extra import q_ts_ewma  # noqa: F401
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.queries.catalog import QUERIES

    # brute force on a tiny frame through the same catalog query shape
    from pyspark.sql import functions as F
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.sources.tables import load_table  # noqa: F401

    vals = [5.0, 1.0, 9.0, 3.0]
    rows = [
        (i, dt.datetime(2024, 1, 1, 0, i), 7, "view", v)
        for i, v in enumerate(vals)
    ]
    df = _ev(spark, rows)
    arr = F.transform(
        F.sort_array(F.collect_list(F.struct(F.col("ts").alias("t"), F.col("event_id").alias("tb"), F.col("value").alias("v")))),
        lambda x: x["v"],
    )
    per = df.groupBy("user_id").agg(arr.alias("vals"))
    ewma_col = F.aggregate(
        F.slice(F.col("vals"), 2, F.greatest(F.size("vals") - 1, F.lit(0))),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: F.lit(0.2) * x + F.lit(0.8) * acc,
    )
    got = per.select(F.round(ewma_col, 9).alias("e")).collect()[0].e
    want = vals[0]
    for v in vals[1:]:
        want = 0.2 * v + 0.8 * want
    assert got == round(want, 9)


def test_violation_tag_null_predicate_quarantines(spark):
    """A NULL rule predicate (NULL value under `v > 200`) must TAG the
    row, not wave it into the landing table — the malformed-row case
    the gate exists for (null_violates coercion, shared with the batch
    suite)."""
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.streaming.quarantine import violation_tag

    df = spark.createDataFrame(
        [(1, "view", None), (2, None, 10.0), (3, "view", 10.0)],
        "id long, et string, v double",
    )
    rules = [
        ("r_no_error", F.col("et") == "error"),
        ("r_v_le_200", F.col("v") > 200),
    ]
    got = {
        r.id: r.tag
        for r in df.select("id", violation_tag(rules).alias("tag")).collect()
    }
    assert got == {1: "r_v_le_200", 2: "r_no_error", 3: ""}
