"""Tests for deterministic sampling/splitting/mixing and the
near-duplicate connected-components resolver: reproducibility (the
property that motivates hash-derived sampling), partition invariance,
and graph-clustering correctness on a hand-built graph.
"""

import pytest
from pyspark.sql import functions as F

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators import dedup as D
from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators import sampling as S
from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators import text as TX
from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").cache()


def test_hash_split_is_deterministic_and_total(spark, docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = S.hash_split(docs, "doc_id", w).select("doc_id", "split").collect()
    b = S.hash_split(docs.repartition(7), "doc_id", w).select("doc_id", "split").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # partitioning-invariant
    assert len(a) == docs.count()  # total: every row assigned
    splits = {s for _, s in a}
    assert splits <= {"train", "val", "test"}


def test_hash_split_rejects_bad_weights(docs):
    with pytest.raises(ValueError):
        S.hash_split(docs, "doc_id", {"train": 0.5, "val": 0.1})


def test_hash_split_fractions_approximate_weights(spark, docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    counts = dict(
        S.hash_split(docs, "doc_id", w)
        .groupBy("split")
        .count()
        .rdd.map(tuple)
        .collect()
    )
    n = docs.count()
    assert counts.get("train", 0) / n == pytest.approx(0.8, abs=0.15)


def test_stratified_sample_subsets_each_stratum(spark, docs):
    frac = {"en": 0.5, "de": 1.0}
    kept = S.stratified_sample(docs, "lang", frac, "doc_id", salt=3)
    assert set(r[0] for r in kept.select("lang").distinct().collect()) <= {"en", "de"}
    de_all = docs.filter(F.col("lang") == "de").count()
    de_kept = kept.filter(F.col("lang") == "de").count()
    assert de_kept == de_all  # fraction 1.0 keeps everything
    # determinism under re-run
    again = S.stratified_sample(docs, "lang", frac, "doc_id", salt=3)
    assert sorted(r[0] for r in kept.select("doc_id").collect()) == sorted(
        r[0] for r in again.select("doc_id").collect()
    )


def test_salt_changes_membership(spark, docs):
    frac = {"en": 0.5}
    a = {r[0] for r in S.stratified_sample(docs, "lang", frac, "doc_id", 1).select("doc_id").collect()}
    b = {r[0] for r in S.stratified_sample(docs, "lang", frac, "doc_id", 2).select("doc_id").collect()}
    assert a != b  # different salt, different (but each deterministic) sample


def test_connected_components_hand_graph(spark):
    # two components {1,2,3,4} (a path) and {10,11}; 20-20 self-free
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["doc_a", "doc_b"]
    )
    cc = D.connected_components(edges).collect()
    got = {r["node"]: r["component"] for r in cc}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_path_converges(spark):
    """A 41-node path (diameter 40 > max_iter) must still collapse to one
    component: pointer jumping gives O(log diameter) convergence, so 25
    rounds cover chains min-label propagation alone could not."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 140)], ["doc_a", "doc_b"]
    )
    cc = D.connected_components(edges).collect()
    assert {r["component"] for r in cc} == {100}
    assert len(cc) == 41


def test_chunk_windows_cover_text_exactly(spark):
    df = spark.createDataFrame([(1, "a" * 450), (2, "xy")], ["doc_id", "text"])
    chunks = TX.chunk_windows(df, "doc_id", "text", size=200, overlap=50).collect()
    d1 = sorted((r["chunk_start"], len(r["chunk"])) for r in chunks if r["doc_id"] == 1)
    assert d1 == [(1, 200), (151, 200), (301, 150)]  # stride 150, tail truncated
    d2 = [(r["chunk_start"], r["chunk"]) for r in chunks if r["doc_id"] == 2]
    assert d2 == [(1, "xy")]  # short doc → one chunk, no empties


def test_chunk_windows_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        TX.chunk_windows(df, "doc_id", "text", size=100, overlap=100)


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d+x@e.org call 555-123-4567"),
            (2, "no pii here"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in TX.pii_scrub(df, "doc_id", "text").collect()}
    assert out[1]["n_emails"] == 2 and out[1]["n_phones"] == 1
    assert "<EMAIL>" in out[1]["text_redacted"] and "<PHONE>" in out[1]["text_redacted"]
    assert "@" not in out[1]["text_redacted"]
    assert out[2]["n_emails"] == 0 and out[2]["text_redacted"] == "no pii here"


def test_chunk_windows_reconstruct_original(spark):
    """Dropping each chunk's overlap prefix (after the first) and
    concatenating must reconstruct the original text exactly — the
    coverage/no-gap/no-dup property, checked across boundary lengths."""
    size, overlap = 100, 30
    step = size - overlap
    texts = [
        (1, "x"),
        (2, "a" * step),          # exactly one stride
        (3, "b" * size),          # exactly one full chunk
        (4, "c" * (size + 1)),    # one char past a chunk
        (5, "d" * (3 * step)),    # multiple strides, no tail
        (6, "é" * 150 + "ü" * 77),  # non-ascii chars count as chars
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.text import chunk_windows

    rows = chunk_windows(df, "doc_id", "text", size=size, overlap=overlap).collect()
    by_doc = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_start"])):
        cur = by_doc.setdefault(r["doc_id"], "")
        chunk = r["chunk"]
        by_doc[r["doc_id"]] = cur + (chunk[overlap:] if cur else chunk)
    expected = dict(texts)
    assert by_doc == expected


def test_pii_scrub_idempotent(spark):
    """Scrubbing already-scrubbed text changes nothing (placeholders
    contain no scrubbable patterns)."""
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [(1, "reach me: a.b@c.io / 555-123-4567 twice a.b@c.io")], ["doc_id", "text"]
    )
    once = pii_scrub(df, "doc_id", "text").select(
        F.col("doc_id"), F.col("text_redacted").alias("text")
    )
    twice = pii_scrub(once, "doc_id", "text").collect()[0]
    assert twice["n_emails"] == 0 and twice["n_phones"] == 0
    assert twice["text_redacted"] == "reach me: <EMAIL> / <PHONE> twice <EMAIL>"


def test_c4_line_filter_rules(spark):
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.text import c4_line_filter

    docs = spark.createDataFrame(
        [
            # 3 lines: keep, drop (no terminal punct), drop (too short)
            (1, ["the quick brown fox.", "no punctuation here", "hi there."]),
            # javascript boilerplate dropped despite punct + length
            (2, ["enable JavaScript to continue.", "a clean closing line."]),
            (3, []),
        ],
        "doc_id long, lines array<string>",
    )
    out = {r.doc_id: r for r in c4_line_filter(docs, "doc_id", "lines").collect()}
    assert out[1].n_lines == 3 and out[1].n_lines_kept == 1
    assert out[1].clean_text == "the quick brown fox."
    assert not out[1].keep  # only 1/3 lines survived
    assert out[2].n_lines_kept == 1 and out[2].keep
    assert out[3].n_lines_kept == 0 and not out[3].keep
    # narrow map: no exchange in the plan
    plan = (
        c4_line_filter(docs, "doc_id", "lines")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_temperature_mix_upweights_small_domains(spark):
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.sampling import (
        temperature_mix,
        temperature_weights,
    )

    rows = [(i, "big" if i < 900 else "small", 100) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    w = {r.source: r for r in temperature_weights(df, "source", "n_chars").collect()}
    # sqrt tempering: big is 9x larger but gets only 3x the weight
    assert w["big"].wgt == 3 * w["small"].wgt
    # per-domain keep RATE = target share / domain rows: the small
    # domain's threshold (rate) is 3x the big one's
    assert abs(w["small"].threshold - 3 * w["big"].threshold) <= 3  # floor slack
    mixed = temperature_mix(df, "source", "n_chars", "doc_id")
    first = sorted(r.doc_id for r in mixed.collect())
    again = sorted(r.doc_id for r in mixed.collect())
    assert first == again and len(first) > 0  # deterministic membership
    kept = mixed.groupBy("source").count().collect()
    rates = {r["source"]: r["count"] for r in kept}
    # small domain keeps a ~3x higher FRACTION than big (tempered mixture)
    assert rates.get("small", 0) / 100 > rates.get("big", 0) / 900


def test_quantile_bins_assignment_and_no_global_sort(spark):
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.sampling import quantile_bins

    df = spark.createDataFrame([(i, float(i)) for i in range(100)], ["id", "score"])
    out = quantile_bins(df, "score", n_bins=4)
    bins = {r["id"]: r["bin"] for r in out.collect()}
    # quartile thresholds of 0..99 are 24.75/49.5/74.25: bin boundaries
    assert bins[0] == 0 and bins[24] == 0
    assert bins[25] == 1 and bins[49] == 1
    assert bins[50] == 2 and bins[74] == 2
    assert bins[75] == 3 and bins[99] == 3
    # every bin holds exactly 25 of the 100 uniform scores
    from collections import Counter

    assert Counter(bins.values()) == {0: 25, 1: 25, 2: 25, 3: 25}
    # the corpus is never globally sorted: no Sort/Window over the data
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_hash_bucket_large_keys_never_negative(spark):
    """Snowflake-scale ids (>= ~3.46e9) used to wrap negative in signed
    64-bit (always landing in the first split); the 31-bit pre-multiply
    mask keeps the product under 2^62 for ANY key, and DuckDB's
    overflow-checking BIGINT arithmetic reproduces the same buckets."""
    import duckdb

    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.sampling import hash_bucket

    keys = [0, 1, 2**31 - 1, 2**31, 5_000_000_000,
            1234567890123456789, 2**63 - 1]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r.k: r.b
        for r in df.select("k", hash_bucket(F.col("k"), salt=7).alias("b")).collect()
    }
    assert all(0 <= b < 10_000 for b in got.values()), got
    want = {
        k: duckdb.sql(
            f"SELECT ((((CAST({k} AS BIGINT) & 2147483647) + 7)"
            " & 2147483647) * 2654435761) % 10000"
        ).fetchone()[0]
        for k in keys
    }
    assert got == want
