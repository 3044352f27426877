"""Behavioral-analytics query surface: ordered funnels, cohort
retention, SCD2 history, gap-filled resampling, and interval-overlap
concurrency — the downstream consumption questions asked of the landing
table the reference loads (reference `ingestion/app.py:14-33` loads
exactly this events shape; these queries are why the load exists).

Every query here is a thin parameterization of `operators/behavior.py`
with a DuckDB oracle twin; all five are single-entity-shuffle plans
(see the operator docstrings for the 100-TB argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import behavior as B
from ..sources.tables import load_table

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"

FUNNEL_STEPS = ["signup", "view", "click", "purchase"]


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered 4-step funnel (operators/behavior.py
    funnel_conversion): signup -> view -> click -> purchase with
    earliest-completion chaining — a step counts only strictly after
    the user's completion of the previous step. One user-keyed shuffle;
    the chain resolves in per-user array expressions."""
    ev = load_table(spark, sf_dir, "events")
    return B.funnel_conversion(ev, "user_id", "event_type", "ts", FUNNEL_STEPS)


ORACLE_FUNNEL = """
WITH u0 AS (
  SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'signup' GROUP BY 1
),
u1 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN u0 USING (user_id)
  WHERE e.event_type = 'view' AND e.ts > u0.t GROUP BY 1
),
u2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN u1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > u1.t GROUP BY 1
),
u3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN u2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > u2.t GROUP BY 1
)
SELECT 0 AS step_idx, 'signup' AS step, (SELECT CAST(count(*) AS BIGINT) FROM u0) AS n_users
UNION ALL SELECT 1, 'view', (SELECT CAST(count(*) AS BIGINT) FROM u1)
UNION ALL SELECT 2, 'click', (SELECT CAST(count(*) AS BIGINT) FROM u2)
UNION ALL SELECT 3, 'purchase', (SELECT CAST(count(*) AS BIGINT) FROM u3)
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-retention triangle (operators/behavior.py
    cohort_retention): first-seen-day cohorts x day offset, distinct
    active users per cell. Both aggregates key on user_id — one shuffle
    key end-to-end; the output is days² rows."""
    ev = load_table(spark, sf_dir, "events")
    out = B.cohort_retention(ev, "user_id", "ts", max_offset_days=30)
    return out.select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "day_offset",
        "n_users",
    )


ORACLE_COHORT = """
WITH fs AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY 1
),
act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
SELECT strftime(fs.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', fs.cohort_day, act.day) AS INT) AS day_offset,
       CAST(count(DISTINCT act.user_id) AS BIGINT) AS n_users
FROM act JOIN fs USING (user_id)
WHERE date_diff('day', fs.cohort_day, act.day) BETWEEN 0 AND 30
GROUP BY 1, 2
"""


def q_dim_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history (operators/behavior.py scd2_history): collapse
    each user's consecutive run of an unchanged event_type into one
    validity interval — the gaps-and-islands build on ONE shuffle
    (all windows + the island aggregate share the user partition key).
    event_id breaks equal-timestamp ties deterministically."""
    ev = load_table(spark, sf_dir, "events")
    hist = B.scd2_history(ev, "user_id", "event_type", "ts", "event_id")
    return hist.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", _TS_FMT).alias("valid_from"),
        F.date_format("valid_to", _TS_FMT).alias("valid_to"),
        "n_events",
    )


ORACLE_SCD2 = f"""
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS NOT DISTINCT FROM event_type
              THEN 0 ELSE 1 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
i AS (
  SELECT user_id, event_type, ts, chg,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM o
),
r AS (
  SELECT user_id, island, min(event_type) AS event_type,
         min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
  FROM i GROUP BY 1, 2
)
SELECT user_id, event_type,
       strftime(valid_from, '{_TS_FMT_DUCK}') AS valid_from,
       strftime(lead(valid_from) OVER (PARTITION BY user_id ORDER BY island),
                '{_TS_FMT_DUCK}') AS valid_to,
       n_events
FROM r
"""


def q_ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample + forward fill (operators/behavior.py
    resample_ffill) for a bounded user set: per user, the dense hourly
    spine from first to last event (sequence+explode — per-key bounded),
    hourly sums joined on, gaps carried forward with ignoreNulls last().
    Spine, join, and fill all key on user_id: one shuffle."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    out = B.resample_ffill(ev, "user_id", "ts", "value", step="1 hour")
    return out.select(
        "user_id",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "n_obs",
        "value_ffill",
    )


ORACLE_RESAMPLE = """
WITH e AS (SELECT * FROM events WHERE user_id < 30),
spans AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS lo,
         date_trunc('hour', max(ts)) AS hi
  FROM e GROUP BY 1
),
spine AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
  FROM spans
),
actual AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
         CAST(count(*) AS BIGINT) AS n_obs, round(sum(value), 2) AS sv
  FROM e GROUP BY 1, 2
)
SELECT s.user_id,
       strftime(s.bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
       coalesce(a.n_obs, 0) AS n_obs,
       last_value(a.sv IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.bucket_ts
         ROWS UNBOUNDED PRECEDING) AS value_ffill
FROM spine s LEFT JOIN actual a USING (user_id, bucket_ts)
"""


def q_window_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max interval overlap per hour (operators/behavior.py
    concurrency_sweep): each view event opens a 30-minute interval; the
    sweep reports the peak number simultaneously open per hour. The
    running sum is day-partitioned local prefixes + a metadata-sized
    per-day offset frame — no global single-partition window."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "view"
    )
    iv = ev.select(
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    out = B.concurrency_sweep(iv, "s", "e")
    return out.select(
        F.date_format("hour_ts", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
        "max_concurrency",
    )


ORACLE_CONCURRENCY = """
WITH iv AS (
  SELECT ts AS s, ts + INTERVAL 30 MINUTE AS e FROM events
  WHERE event_type = 'view'
),
d AS (
  SELECT s AS t, 1 AS delta FROM iv
  UNION ALL
  SELECT e AS t, -1 AS delta FROM iv
),
r AS (
  SELECT t, delta,
         CAST(sum(delta) OVER (ORDER BY t, delta ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS run
  FROM d
)
SELECT strftime(date_trunc('hour', t), '%Y-%m-%d %H:%M:%S') AS hour_ts,
       max(run) AS max_concurrency
FROM r WHERE delta = 1
GROUP BY 1
"""


def q_monitor_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day-baselined anomaly flags over the hourly error
    rollup (operators/behavior.py seasonal_anomaly): each wall-clock
    hour is compared against ITS OWN seasonal mean/stddev, so nightly
    batch spikes stop paging. One corpus scan; everything downstream
    is calendar-bounded."""
    ev = load_table(spark, sf_dir, "events")
    return B.seasonal_anomaly(ev)


ORACLE_SEASONAL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour_ts,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events WHERE event_type = 'error' GROUP BY 1
),
base AS (
  SELECT extract(hour FROM hour_ts) AS hod, avg(n_events) AS mu,
         stddev_pop(n_events) AS sigma
  FROM hourly GROUP BY 1
)
SELECT strftime(h.hour_ts, '%Y-%m-%d %H') AS hour, h.n_events,
       round(b.mu, 6) AS mu, round(b.sigma, 6) AS sigma,
       CASE WHEN abs(h.n_events - b.mu) > 2.0 * b.sigma
            THEN 1 ELSE 0 END AS anomaly
FROM hourly h JOIN base b ON extract(hour FROM h.hour_ts) = b.hod
"""


def q_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 behavioral paths (operators/behavior.py path_topk): each
    user's chronological event-type sequence, first 8 steps joined with
    '>', ranked by user count — sequence mining with one user-keyed
    shuffle (order resolved by in-row sort_array, no window) and a
    metadata-sized path count."""
    ev = load_table(spark, sf_dir, "events")
    return B.path_topk(ev)


ORACLE_PATH_TOPK = """
WITH seq AS (
  SELECT user_id, list(event_type ORDER BY ts, event_id) AS es
  FROM events GROUP BY user_id
),
paths AS (
  SELECT array_to_string(list_slice(es, 1, 8), '>') AS path FROM seq
),
counted AS (
  SELECT path, CAST(count(*) AS BIGINT) AS n_entities
  FROM paths GROUP BY path
)
SELECT path, n_entities FROM counted
ORDER BY n_entities DESC, path ASC LIMIT 20
"""


def q_abtest_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B assignment (Knuth hash bucket of user_id,
    50/50) + Welch two-sample z on event values in ONE conditional
    aggregation (operators/behavior.py abtest_ztest) — single scan,
    single output row, reproducible groups in any engine."""
    ev = load_table(spark, sf_dir, "events")
    return B.abtest_ztest(ev)


ORACLE_ABTEST = """
WITH tagged AS (
  SELECT value,
         CASE WHEN ((user_id & 2147483647) * 2654435761) % 10000 >= 5000
              THEN 1 ELSE 0 END AS b
  FROM events
),
agg AS (
  SELECT CAST(sum(1 - b) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b,
         avg(CASE WHEN b = 0 THEN value END) AS mean_a,
         avg(CASE WHEN b = 1 THEN value END) AS mean_b,
         var_samp(CASE WHEN b = 0 THEN value END) AS var_a,
         var_samp(CASE WHEN b = 1 THEN value END) AS var_b
  FROM tagged
)
SELECT n_a, n_b, round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
       round((mean_b - mean_a) / sqrt(var_a / n_a + var_b / n_b), 4)
         AS z_stat,
       CASE WHEN abs((mean_b - mean_a) / sqrt(var_a / n_a + var_b / n_b))
                 > 1.96 THEN 1 ELSE 0 END AS significant
FROM agg
"""


def q_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite (operators/expectations.py): four
    row-level rules over lineitem compiled into ONE conditional
    aggregation (one scan regardless of rule count) plus the
    lineitem→orders FK as an anti-join rule. Output is the per-rule
    violation table a load gate compares against zero."""
    from ..operators.expectations import (
        check_expectations,
        referential_violations,
    )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rules = [
        ("quantity_le_25", F.col("l_quantity") > 25),
        ("discount_le_5pct", F.col("l_discount") > 0.05),
        ("shipdate_not_null", F.col("l_shipdate").isNull()),
        ("returnflag_domain", ~F.col("l_returnflag").isin("A", "N", "R")),
    ]
    row_level = check_expectations(li, rules)
    fk = referential_violations(li, orders, "l_orderkey", "o_orderkey")
    return row_level.unionByName(fk)


ORACLE_EXPECTATIONS = """
SELECT 'quantity_le_25' AS rule,
       CAST(sum(CASE WHEN coalesce(l_quantity > 25, TRUE) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations FROM lineitem
UNION ALL
SELECT 'discount_le_5pct',
       CAST(sum(CASE WHEN coalesce(l_discount > 0.05, TRUE) THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
UNION ALL
SELECT 'shipdate_not_null',
       CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
UNION ALL
SELECT 'returnflag_domain',
       CAST(sum(CASE WHEN coalesce(l_returnflag NOT IN ('A', 'N', 'R'), TRUE)
                THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
UNION ALL
SELECT 'fk_l_orderkey_in_o_orderkey', CAST(count(*) AS BIGINT)
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
 WHERE o.o_orderkey IS NULL
"""


def q_path_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequential pattern detection — the SQL
    feature Spark lacks, emulated scalably: each user's chronological
    event sequence collapses to a compact symbol string IN the row
    (one char per event type, built by the same single entity-keyed
    shuffle as path mining), then the patterns are plain JVM regexes
    over that string — per-user cost linear in their event count, no
    joins, no state machine UDF. Counts users matching each funnel
    pattern: signup-then-purchase (with anything between), click
    immediately followed by purchase, and an error-free session."""
    ev = load_table(spark, sf_dir, "events")
    sym = F.expr(
        "CASE event_type WHEN 'signup' THEN 's' WHEN 'view' THEN 'v' "
        "WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p' ELSE 'e' END"
    )
    seqs = (
        ev.select("user_id", "ts", "event_id", sym.alias("sym"))
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col("ts").alias("t"),
                                F.col("event_id").alias("tb"),
                                F.col("sym").alias("s"),
                            )
                        )
                    ),
                    lambda x: x["s"],
                ),
            ).alias("seq")
        )
    )
    return seqs.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("seq").rlike("s.*p").cast("long")).alias(
            "signup_then_purchase"
        ),
        F.sum(F.col("seq").rlike("cp").cast("long")).alias(
            "click_immediately_purchase"
        ),
        F.sum((~F.col("seq").rlike("e")).cast("long")).alias("error_free"),
    )


ORACLE_PATTERN_MATCH = """
WITH seqs AS (
  SELECT user_id,
         string_agg(CASE event_type WHEN 'signup' THEN 's'
                         WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                         WHEN 'purchase' THEN 'p' ELSE 'e' END, ''
                    ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN regexp_matches(seq, 's.*p') THEN 1 ELSE 0 END)
            AS BIGINT) AS signup_then_purchase,
       CAST(sum(CASE WHEN regexp_matches(seq, 'cp') THEN 1 ELSE 0 END)
            AS BIGINT) AS click_immediately_purchase,
       CAST(sum(CASE WHEN NOT regexp_matches(seq, 'e') THEN 1 ELSE 0 END)
            AS BIGINT) AS error_free
FROM seqs
"""


def q_ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample + LINEAR interpolation (operators/behavior.py
    resample_interpolate) for the same bounded user set as the ffill
    twin: gap buckets get the straight line between the bracketing
    observed hourly sums — the drift-aware fill, where ffill is the
    hold-last fill. Every exchange hashes the entity key family
    (user_id for spans/spine/windows, user_id+bucket for the hourly
    pre-aggregate — the map-side combine that keeps the shuffle small);
    no UDFs anywhere."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    out = B.resample_interpolate(ev, "user_id", "ts", "value", step="1 hour")
    return out.select(
        "user_id",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "n_obs",
        "value_interp",
    )


ORACLE_INTERPOLATE = """
WITH e AS (SELECT * FROM events WHERE user_id < 30),
spans AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS lo,
         date_trunc('hour', max(ts)) AS hi
  FROM e GROUP BY 1
),
spine AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
  FROM spans
),
actual AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
         CAST(count(*) AS BIGINT) AS n_obs, round(sum(value), 2) AS sv
  FROM e GROUP BY 1, 2
),
g AS (
  SELECT s.user_id, s.bucket_ts, coalesce(a.n_obs, 0) AS n_obs, a.sv,
    last_value(CAST(round(a.sv * 100, 0) AS BIGINT) IGNORE NULLS) OVER (
      PARTITION BY s.user_id ORDER BY s.bucket_ts
      ROWS UNBOUNDED PRECEDING) AS pc,
    last_value(CASE WHEN a.sv IS NOT NULL THEN s.bucket_ts END IGNORE NULLS)
      OVER (PARTITION BY s.user_id ORDER BY s.bucket_ts
            ROWS UNBOUNDED PRECEDING) AS pt,
    first_value(CAST(round(a.sv * 100, 0) AS BIGINT) IGNORE NULLS) OVER (
      PARTITION BY s.user_id ORDER BY s.bucket_ts
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc,
    first_value(CASE WHEN a.sv IS NOT NULL THEN s.bucket_ts END IGNORE NULLS)
      OVER (PARTITION BY s.user_id ORDER BY s.bucket_ts
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM spine s LEFT JOIN actual a USING (user_id, bucket_ts)
)
SELECT user_id, strftime(bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket_ts, n_obs,
  CASE WHEN sv IS NOT NULL THEN sv
       ELSE (pc + floor((nc - pc) * (epoch(bucket_ts) - epoch(pt))
                        / (epoch(nt) - epoch(pt)))) / 100.0
  END AS value_interp
FROM g
"""


BEHAVIOR_QUERIES: dict[str, callable] = {
    "funnel_conversion": q_funnel_conversion,
    "cohort_retention": q_cohort_retention,
    "dim_scd2": q_dim_scd2,
    "ts_resample_ffill": q_ts_resample_ffill,
    "ts_interpolate_linear": q_ts_interpolate_linear,
    "window_concurrency": q_window_concurrency,
    "monitor_seasonal_anomaly": q_monitor_seasonal_anomaly,
    "path_topk": q_path_topk,
    "abtest_ztest": q_abtest_ztest,
    "quality_expectations": q_quality_expectations,
    "path_pattern_match": q_path_pattern_match,
}

BEHAVIOR_ORACLES: dict[str, str] = {
    "funnel_conversion": ORACLE_FUNNEL,
    "cohort_retention": ORACLE_COHORT,
    "dim_scd2": ORACLE_SCD2,
    "ts_resample_ffill": ORACLE_RESAMPLE,
    "ts_interpolate_linear": ORACLE_INTERPOLATE,
    "window_concurrency": ORACLE_CONCURRENCY,
    "monitor_seasonal_anomaly": ORACLE_SEASONAL,
    "path_topk": ORACLE_PATH_TOPK,
    "abtest_ztest": ORACLE_ABTEST,
    "quality_expectations": ORACLE_EXPECTATIONS,
    "path_pattern_match": ORACLE_PATTERN_MATCH,
}
