"""Streaming semantics tests (§2.7): foreachBatch ingest lands the same
rows as batch ingest, and a second catch-up run is a no-op (idempotent
reprocessing, workflow.yaml:49-52 / README.md:34-39).
"""

from pyspark.sql import functions as F

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.streaming.hourly import (
    hourly_counts,
    stream_hourly_ingest,
)

from .conftest import EVENTS_SCHEMA


def test_stream_ingest_matches_batch_and_is_idempotent(spark, events, tmp_path):
    day1 = events.filter(F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp"))
    src = str(tmp_path / "stream_src")
    day1.write.mode("overwrite").parquet(src)
    table_root = str(tmp_path / "stream_table")

    q = stream_hourly_ingest(
        spark, src, table_root, EVENTS_SCHEMA,
        checkpoint=str(tmp_path / "ckpt"), trigger_available_now=True,
    )
    q.awaitTermination(300)
    n_hours = day1.select(F.date_trunc("hour", "ts")).distinct().count()
    back = spark.read.option("basePath", table_root).parquet(table_root)
    assert back.count() == day1.count()
    # one landed partition per populated source hour
    assert back.select("hour").distinct().count() == n_hours

    # catch-up rerun with the same checkpoint: no new data, no duplicates
    q2 = stream_hourly_ingest(
        spark, src, table_root, EVENTS_SCHEMA,
        checkpoint=str(tmp_path / "ckpt"), trigger_available_now=True,
    )
    q2.awaitTermination(300)
    assert spark.read.option("basePath", table_root).parquet(table_root).count() == day1.count()


def test_stream_ingest_survives_static_session_conf(spark, events, tmp_path):
    """Micro-batches land in different hours; under a vanilla (static
    overwrite) session each foreachBatch write must still replace only
    its own partitions — the sink pins dynamic mode per-write, so a
    later micro-batch cannot wipe an earlier one's hour."""
    hour_a = events.filter(F.date_format("ts", "yyyyMMddHH") == "2024010100")
    hour_b = events.filter(F.date_format("ts", "yyyyMMddHH") == "2024010101")
    src = str(tmp_path / "static_src")
    # one file per hour + maxFilesPerTrigger=1 → one micro-batch per hour
    hour_a.coalesce(1).write.parquet(src + "/a")
    hour_b.coalesce(1).write.parquet(src + "/b")
    table_root = str(tmp_path / "static_table")

    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key)
    spark.conf.set(key, "static")
    try:
        q = stream_hourly_ingest(
            spark, src + "/*", table_root, EVENTS_SCHEMA,
            checkpoint=str(tmp_path / "static_ckpt"), trigger_available_now=True,
            options={"maxFilesPerTrigger": "1"},
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set(key, prev)

    back = spark.read.option("basePath", table_root).parquet(table_root)
    assert back.filter(F.col("hour") == 0).count() == hour_a.count()
    assert back.filter(F.col("hour") == 1).count() == hour_b.count()


def test_hourly_counts_batch_window(spark, events):
    day1 = events.filter(F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp"))
    out = hourly_counts(day1)
    rows = {r["window_start"]: r["n_rows"] for r in out.collect()}
    assert len(rows) == day1.select(F.date_trunc("hour", "ts")).distinct().count()
    assert sum(rows.values()) == day1.count()


def test_stateful_running_totals_accumulate_across_batches(spark, events, tmp_path):
    """applyInPandasWithState keeps per-key state across micro-batches:
    final per-user totals over a 4-batch stream equal the batch groupBy."""
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.streaming.stateful import (
        run_stateful_totals_over_files,
    )

    day1 = events.filter(F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp"))
    src = str(tmp_path / "stateful_src")
    day1.repartition(8).write.mode("overwrite").parquet(src)

    out = run_stateful_totals_over_files(
        spark, src, EVENTS_SCHEMA, query_name="sst_test", max_files_per_trigger=2
    )
    got = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in out.collect()}

    expected_df = day1.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s")
    )
    expected = {r["user_id"]: (r["n"], r["s"]) for r in expected_df.collect()}
    assert set(got) == set(expected)
    for uid, (n, s) in expected.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - s) < 0.05  # float accumulation order


def test_transform_with_state_gated_or_works(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 arbitrary-state API): runs to
    the same totals as the batch aggregate where python protobuf exists;
    raises the documented NotImplementedError gate where it doesn't."""
    import pytest
    from pyspark.sql import functions as F

    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.sources.tables import load_table
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.streaming.stateful import (
        HAS_TRANSFORM_WITH_STATE,
        run_tws_totals_over_files,
    )

    from .conftest import SF_DIR

    assert HAS_TRANSFORM_WITH_STATE  # Spark 4: the processor class exists
    ev = load_table(spark, SF_DIR, "events").filter("ts < timestamp'2024-01-02'")
    root = str(tmp_path / "tws_src")
    ev.repartition(8).write.mode("overwrite").parquet(root)
    try:
        out = run_tws_totals_over_files(spark, root, ev.schema, "tws_test")
    except NotImplementedError:
        pytest.skip("python protobuf absent: transformWithState gated off")
    exact = {
        r.user_id: (r.n, r.s)
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    }
    got = {r.user_id: (r.n_events, r.sum_value) for r in out.collect()}
    assert got == exact


def test_read_sliding_distinct_window_boundary(spark, tmp_path):
    """Hour-grain bitmap store → trailing-24h readout: a user active at
    hour 0 counts for anchors 0..23 but NOT hour 24, and anchors exist
    only at observed hours."""
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.streaming.bitmap_distinct import (
        _batch_chunks,
        read_sliding_distinct,
    )

    rows = [
        (1, "2024-01-01 00:10:00", 100),
        (2, "2024-01-01 23:10:00", 200),
        (3, "2024-01-02 00:20:00", 200),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long"
    ).select("event_id", F.to_timestamp("ts").alias("ts"), "user_id")
    store = str(tmp_path / "store")
    _batch_chunks(ev, "hour").write.partitionBy("hr").parquet(store)
    out = {r.hour: r.n_active for r in read_sliding_distinct(spark, store).collect()}
    assert out == {
        "2024-01-01 00": 1,
        "2024-01-01 23": 2,
        "2024-01-02 00": 1,  # user 100 aged out of the 24h window
    }


def test_stream_incremental_dedup_grows_corpus_and_audits_dups(spark, tmp_path):
    """Two micro-batches replayed file-by-file: batch 0 seeds the corpus,
    batch 1 carries an exact copy, a near-copy, and a novel doc. The
    stream must append only the novel doc and audit the two duplicates
    with the same flags batch-mode incremental_dedup_batch assigns."""
    import os

    from pyspark.sql import types as T

    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.dedup import (
        incremental_dedup_batch,
    )
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.streaming.dedup_stream import (
        stream_incremental_dedup,
    )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    t_a = "the quick brown fox jumps over the lazy dog again and again today"
    t_b = "completely different corpus content about distributed query engines"
    batch0 = [(1, t_a), (2, t_b)]
    batch1 = [
        (10, t_a),  # exact dup of 1
        (11, "completely different corpus content about distributed query planners"),  # near 2
        (12, "zebra xylophone quartz vortex jigsaw plumb krypton onyx umbra fjord"),  # novel
    ]

    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate((batch0, batch1)):
        sub = str(tmp_path / f"stage{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(sub)
        part = next(f for f in os.listdir(sub) if f.endswith(".parquet"))
        dst = os.path.join(src, f"{i:04d}.parquet")
        os.rename(os.path.join(sub, part), dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))  # arrival order

    corpus_root = str(tmp_path / "corpus")
    audit_root = str(tmp_path / "audit")
    # md5_family=False EXPLICITLY: this test is the pin for the
    # xxhash64 path the catalog docstring claims (the md5 twin is what
    # the oracle-checked catalog key exercises) — plus a signature
    # check that xxhash64 IS still the library default, so a silent
    # default flip fails here instead of passing unnoticed.
    import inspect

    assert (
        inspect.signature(stream_incremental_dedup).parameters["md5_family"].default
        is False
    )
    q = stream_incremental_dedup(
        spark, src, corpus_root, audit_root, schema,
        checkpoint=str(tmp_path / "ckpt"), md5_family=False,
    )
    q.awaitTermination()

    corpus_ids = sorted(r.doc_id for r in spark.read.parquet(corpus_root).collect())
    assert corpus_ids == [1, 2, 12]
    audit = {r.doc_id: r.dup_kind for r in spark.read.parquet(audit_root).collect()}

    # equivalence with sequential batch-mode application
    b0 = spark.createDataFrame(batch0, schema)
    b1 = spark.createDataFrame(batch1, schema)
    expected = {
        r.doc_id: r.dup_kind
        for r in incremental_dedup_batch(
            b0, b1, "doc_id", "text", num_bands=8, num_hashes=32, threshold=0.3
        ).collect()
        if r.dup_kind is not None
    }
    assert audit == expected == {10: "exact", 11: "near"}


def test_checkpoint_resume_is_exactly_once(spark, events, tmp_path):
    """Checkpoint recovery: a second query over the SAME checkpoint
    must pick up exactly the files added after the first run — no
    reprocessing, no loss. Deterministic split: run availableNow over
    2 source files, add 4 more, resume. The final sink equals one
    batch read of the full source, with zero duplicate event_ids."""
    import shutil

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    first = events.filter(F.hour("ts") == 0).coalesce(2)
    first.write.mode("overwrite").parquet(src)

    schema = events.schema

    def run_once():
        def _apply(batch, _bid):
            batch.write.mode("append").parquet(sink)

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(_apply)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()
    n_first = spark.read.parquet(sink).count()
    assert n_first == first.count()

    # land 4 more files into the same source dir, resume from checkpoint
    second = events.filter(F.hour("ts").isin(1, 2)).coalesce(4)
    second.write.mode("append").parquet(src)
    run_once()

    got = spark.read.parquet(sink)
    want = events.filter(F.hour("ts") < 3)
    assert got.count() == want.count()
    # exactly-once: no event ingested twice across the resume
    assert got.groupBy("event_id").count().filter("count > 1").count() == 0

    # a FRESH checkpoint would reprocess everything — prove the
    # checkpoint is what prevented it
    shutil.rmtree(ckpt)
    run_once()
    assert spark.read.parquet(sink).count() == 2 * want.count()
