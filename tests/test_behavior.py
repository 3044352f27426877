"""Edge-semantics pins for operators/behavior.py: strict funnel
ordering, SCD2 run collapsing with tie-breaks, forward-fill gap
behavior, sweep-line endpoint semantics across a day boundary."""

from datetime import datetime

from pyspark.sql import functions as F

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators import behavior as B


def _ts(s):
    return datetime.fromisoformat(s)


def test_funnel_strict_ordering(spark):
    rows = [
        # user 1: full ordered journey
        (1, "signup", _ts("2024-01-01 00:00:00")),
        (1, "view", _ts("2024-01-01 01:00:00")),
        (1, "purchase", _ts("2024-01-01 02:00:00")),
        # user 2: purchase BEFORE view — must not count at step 3
        (2, "signup", _ts("2024-01-01 00:00:00")),
        (2, "purchase", _ts("2024-01-01 00:30:00")),
        (2, "view", _ts("2024-01-01 01:00:00")),
        # user 3: never signed up — counts nowhere
        (3, "view", _ts("2024-01-01 00:00:00")),
        (3, "purchase", _ts("2024-01-01 01:00:00")),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = B.funnel_conversion(
        df, "user_id", "event_type", "ts", ["signup", "view", "purchase"]
    )
    got = {r["step"]: r["n_users"] for r in out.collect()}
    assert got == {"signup": 2, "view": 2, "purchase": 1}


def test_funnel_equal_timestamp_is_not_after(spark):
    # step 2 at the SAME instant as step 1 does not satisfy "strictly after"
    rows = [
        (1, "signup", _ts("2024-01-01 00:00:00")),
        (1, "view", _ts("2024-01-01 00:00:00")),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = B.funnel_conversion(
        df, "user_id", "event_type", "ts", ["signup", "view"]
    )
    got = {r["step"]: r["n_users"] for r in out.collect()}
    assert got == {"signup": 1, "view": 0}


def test_cohort_day_zero_is_cohort_size(spark):
    rows = [
        (1, _ts("2024-01-01 10:00:00")),
        (1, _ts("2024-01-03 10:00:00")),
        (2, _ts("2024-01-01 23:00:00")),
        (3, _ts("2024-01-02 00:00:00")),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = B.cohort_retention(df, "user_id", "ts")
    cells = {
        (str(r["cohort_day"]), r["day_offset"]): r["n_users"]
        for r in out.collect()
    }
    assert cells[("2024-01-01", 0)] == 2
    assert cells[("2024-01-01", 2)] == 1
    assert cells[("2024-01-02", 0)] == 1


def test_scd2_collapses_runs_and_breaks_ties(spark):
    rows = [
        # same timestamp twice: event_id orders them (A id=1, B id=2)
        (1, "A", _ts("2024-01-01 00:00:00"), 1),
        (1, "B", _ts("2024-01-01 00:00:00"), 2),
        (1, "B", _ts("2024-01-01 01:00:00"), 3),
        (1, "A", _ts("2024-01-01 02:00:00"), 4),
    ]
    df = spark.createDataFrame(rows, ["k", "v", "ts", "eid"])
    out = B.scd2_history(df, "k", "v", "ts", "eid").orderBy("valid_from")
    got = [(r["v"], r["n_events"], r["valid_to"] is None) for r in out.collect()]
    # A (1 row) -> B (2 rows collapsed) -> A (current, open-ended)
    assert got == [("A", 1, False), ("B", 2, False), ("A", 1, True)]


def test_resample_ffill_gap_and_leading_null(spark):
    rows = [
        (1, _ts("2024-01-01 00:10:00"), 2.0),
        (1, _ts("2024-01-01 03:20:00"), 5.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "value"])
    out = B.resample_ffill(df, "k", "ts", "value").orderBy("bucket_ts")
    got = [(r["n_obs"], r["value_ffill"]) for r in out.collect()]
    # hours 00..03: obs, gap carries 2.0, gap carries 2.0, obs 5.0
    assert got == [(1, 2.0), (0, 2.0), (0, 2.0), (1, 5.0)]


def test_resample_interpolate_straight_line(spark):
    rows = [
        (1, _ts("2024-01-01 00:10:00"), 1.0),
        (1, _ts("2024-01-01 03:20:00"), 4.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "value"])
    out = B.resample_interpolate(df, "k", "ts", "value").orderBy("bucket_ts")
    got = [(r["n_obs"], r["value_interp"]) for r in out.collect()]
    # hours 00..03: obs 1.0, then the straight line to 4.0
    assert got == [(1, 1.0), (0, 2.0), (0, 3.0), (1, 4.0)]


def test_resample_interpolate_midpoint_floors_at_cents(spark):
    # midpoint between 1.00 and 1.01 is 1.005 — the exact half-cent
    # case engines round differently; the cents-floor contract pins it
    # to 1.00 deterministically.
    rows = [
        (1, _ts("2024-01-01 00:00:00"), 1.00),
        (1, _ts("2024-01-01 02:00:00"), 1.01),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "value"])
    out = B.resample_interpolate(df, "k", "ts", "value").orderBy("bucket_ts")
    got = [r["value_interp"] for r in out.collect()]
    assert got == [1.00, 1.00, 1.01]


def test_resample_interpolate_observed_buckets_pass_through(spark):
    rows = [
        (1, _ts("2024-01-01 00:00:00"), 2.25),
        (1, _ts("2024-01-01 00:30:00"), 2.25),
        (1, _ts("2024-01-01 01:00:00"), 7.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "value"])
    out = B.resample_interpolate(df, "k", "ts", "value").orderBy("bucket_ts")
    got = [(r["n_obs"], r["value_interp"]) for r in out.collect()]
    # hour 0 observed twice (sum 4.5) — emitted exactly, never re-derived
    assert got == [(2, 4.5), (1, 7.0)]


def test_concurrency_touching_intervals_do_not_overlap(spark):
    rows = [
        (_ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00")),
        (_ts("2024-01-01 01:00:00"), _ts("2024-01-01 02:00:00")),
    ]
    df = spark.createDataFrame(rows, ["s", "e"])
    out = B.concurrency_sweep(df, "s", "e")
    got = {str(r["hour_ts"]): r["max_concurrency"] for r in out.collect()}
    # the end at 01:00 frees before the start at 01:00: never 2 open
    assert set(got.values()) == {1}


def test_concurrency_offset_carries_across_days(spark):
    # three intervals open across midnight; a fourth starts next day
    rows = [
        (_ts("2024-01-01 23:00:00"), _ts("2024-01-02 01:30:00")),
        (_ts("2024-01-01 23:10:00"), _ts("2024-01-02 01:30:00")),
        (_ts("2024-01-01 23:20:00"), _ts("2024-01-02 01:30:00")),
        (_ts("2024-01-02 00:30:00"), _ts("2024-01-02 00:40:00")),
    ]
    df = spark.createDataFrame(rows, ["s", "e"])
    out = B.concurrency_sweep(df, "s", "e")
    got = {str(r["hour_ts"]): r["max_concurrency"] for r in out.collect()}
    # day-2 00:30 start sees the three day-1 intervals still open: 4
    assert got["2024-01-02 00:00:00"] == 4
