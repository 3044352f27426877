"""Behavioral / event-sequence analytics: ordered funnels, cohort
retention, SCD2 run-length history, time-series gap filling, and
interval-overlap concurrency.

These are the event-stream questions a product team asks of the landing
table the reference loads (its `events`-shaped hourly partitions,
reference `ingestion/app.py:14-33` — the reference only LOADS the data;
these operators are the downstream consumption the load exists for).
All five are pure DataFrame compositions — no UDFs — so the plans stay
inside whole-stage codegen, and every per-entity computation keys its
shuffle on the entity column so one repartition serves the whole chain.

Scale notes (100 TB):
* funnel / cohort / scd2 / resample all shuffle ONCE on the entity key
  (user_id); per-entity state is bounded by that entity's event count,
  never by table size.
* `concurrency_sweep` needs a global running sum, which naively means a
  single-partition window. It instead computes per-day local prefix
  sums (window keyed on the day — bounded rows per partition) and adds
  a cross-day offset derived from a per-day aggregate that is only as
  large as the number of distinct days — metadata-sized, the same
  bounded-small-frame pattern as `operators/zonemap.py` stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "funnel_conversion",
    "cohort_retention",
    "scd2_history",
    "resample_ffill",
    "concurrency_sweep",
    "seasonal_anomaly",
    "path_topk",
    "abtest_ztest",
]


def funnel_conversion(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
) -> DataFrame:
    """Strictly-ordered multi-step funnel: for each user, step k counts
    only if it happens strictly AFTER that user's completion of step
    k-1 (earliest-completion semantics). Returns one row per step with
    the number of users whose ordered journey reaches it.

    One groupBy on the user key collects each step's timestamps into
    per-user sorted arrays; the chain t1 < t2 < ... is then resolved
    with array expressions (array_min over a filtered array) — per-user
    local work bounded by that user's event count, zero additional
    shuffles, no window over a global ordering. The final per-step
    count is a metadata-sized aggregate.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    u, ty, ts = F.col(user_col), F.col(type_col), F.col(ts_col)
    per_user = (
        df.filter(ty.isin(list(steps)))
        .groupBy(u.alias("__user"))
        .agg(
            *[
                F.collect_list(F.when(ty == s, ts)).alias(f"__ts_{i}")
                for i, s in enumerate(steps)
            ]
        )
    )
    # chain: reached[0] = min(ts_0); reached[k] = min(ts_k > reached[k-1])
    per_user = per_user.withColumn("__r_0", F.array_min(F.col("__ts_0")))
    for k in range(1, len(steps)):
        prev = F.col(f"__r_{k - 1}")
        nxt = F.array_min(
            F.filter(F.col(f"__ts_{k}"), lambda x: x > prev)
        ).alias(f"__r_{k}")
        per_user = per_user.withColumn(f"__r_{k}", nxt)
    reached = per_user.select(
        "__user", *[F.col(f"__r_{k}") for k in range(len(steps))]
    )
    counts = reached.agg(
        *[
            F.count(F.col(f"__r_{k}")).alias(f"__n_{k}")
            for k in range(len(steps))
        ]
    )
    # unpivot the single aggregate row into (step_idx, step, n_users)
    stack_args = ", ".join(
        f"{k}, '{steps[k]}', __n_{k}" for k in range(len(steps))
    )
    return counts.selectExpr(
        f"stack({len(steps)}, {stack_args}) AS (step_idx, step, n_users)"
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    max_offset_days: int = 30,
) -> DataFrame:
    """Cohort-retention triangle: users grouped by first-seen day, and
    for each (cohort_day, day_offset) the distinct users active that
    many days after their first day. The day-0 cell is the cohort size.

    ONE user-keyed aggregate collects each user's first day AND their
    distinct active-day set together (collect_set — bounded by the
    calendar, dates are 4 bytes), then an explode + the days²-sized
    final aggregate. Two exchanges, one corpus scan. The obvious
    formulation — distinct(user, day) then join to a first-seen
    aggregate — shuffles the corpus twice on different keys and scans
    it twice; this one-groupBy shape was adopted after a plan audit
    showed exactly that.
    """
    u, ts = F.col(user_col), F.col(ts_col)
    day = F.to_date(ts)
    per_user = df.groupBy(u.alias("__user")).agg(
        F.min(day).alias("cohort_day"),
        F.collect_set(day).alias("__days"),
    )
    # each (user, day) is unique after collect_set: count(1) IS the
    # distinct-user count per cell
    exploded = per_user.select(
        "cohort_day", F.explode("__days").alias("__day")
    ).withColumn(
        "day_offset", F.datediff(F.col("__day"), F.col("cohort_day"))
    )
    return (
        exploded.filter(F.col("day_offset").between(0, max_offset_days))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an event stream:
    collapse each key's consecutive run of an unchanged value into one
    row with ``valid_from`` / ``valid_to`` (null = current). The
    gaps-and-islands build: a lag() change flag, a running island id,
    then one groupBy per island — all three windows and the final
    aggregate share the same partition key, so the whole history builds
    on a single shuffle of the input.

    ``tiebreak_col`` breaks equal-timestamp ordering deterministically
    (append logs routinely carry same-microsecond rows).
    """
    k = F.col(key_col)
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(k).orderBy(*order)
    flagged = df.select(
        k.alias("__key"),
        F.col(value_col).alias("__val"),
        F.col(ts_col).alias("__ts"),
        F.col(tiebreak_col).alias("__tb"),
    ).withColumn(
        "__chg",
        F.when(
            F.lag("__val").over(
                Window.partitionBy("__key").orderBy(
                    F.col("__ts").asc(), F.col("__tb").asc()
                )
            ).eqNullSafe(F.col("__val")),
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    islands = flagged.withColumn(
        "__island",
        F.sum("__chg").over(
            Window.partitionBy("__key")
            .orderBy(F.col("__ts").asc(), F.col("__tb").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = islands.groupBy("__key", "__island").agg(
        F.first("__val").alias("__value"),
        F.min("__ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_runs = Window.partitionBy("__key").orderBy(F.col("__island").asc())
    return runs.select(
        F.col("__key").alias(key_col),
        F.col("__value").alias(value_col),
        "valid_from",
        F.lead("valid_from").over(w_runs).alias("valid_to"),
        "n_events",
    )


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Regular-grid resample with forward fill: per key, generate the
    dense timestamp spine from that key's first to last event at
    ``step`` granularity, aggregate actual values onto the grid, and
    forward-fill gaps with the most recent observed aggregate.

    The spine is built per key with sequence()+explode — each key's row
    count is bounded by its own time span, not the table's — and the
    spans aggregate, hourly aggregate, grid join, and ignoreNulls
    last() window all key on the entity column (or entity+bucket), so
    every exchange hashes the same key family and state stays
    per-entity bounded. Emits (key, bucket_ts, n_obs, value_ffill).
    """
    k, ts = F.col(key_col), F.col(ts_col)
    bucket = F.date_trunc("hour", ts) if step == "1 hour" else F.date_trunc(
        "day", ts
    )
    actual = df.groupBy(k.alias("__key"), bucket.alias("bucket_ts")).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.round(F.sum(value_col), 2).alias("__sum_val"),
    )
    spans = df.groupBy(k.alias("__key")).agg(
        F.date_trunc(
            "hour" if step == "1 hour" else "day", F.min(ts)
        ).alias("__lo"),
        F.date_trunc(
            "hour" if step == "1 hour" else "day", F.max(ts)
        ).alias("__hi"),
    )
    spine = spans.select(
        "__key",
        F.explode(
            F.sequence(
                F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {step}")
            )
        ).alias("bucket_ts"),
    )
    grid = spine.join(actual, ["__key", "bucket_ts"], "left")
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("bucket_ts").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.select(
        F.col("__key").alias(key_col),
        "bucket_ts",
        F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        F.last("__sum_val", ignorenulls=True).over(w).alias("value_ffill"),
    )


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Regular-grid resample with LINEAR interpolation: like
    :func:`resample_ffill` but gap buckets get the straight line between
    the bracketing observed aggregates instead of a step function — the
    fill a metrics backfill or training-curve resampler wants when the
    quantity drifts rather than holds.

    Same single-shuffle shape as the ffill twin (spine, hourly
    aggregate, grid join, and both bracketing windows all key on the
    entity column). The bracketing observations come from two
    ignoreNulls windows (last-preceding / first-following); the spine
    spans each key's first..last OBSERVED bucket, so both brackets
    always exist and no edge extrapolation is needed. Emits
    (key, bucket_ts, n_obs, value_interp) with observed buckets passed
    through exactly.

    Interpolated values are computed in integer CENTS with a floor at
    the end — prev_c + floor((next_c - prev_c) * dt / span) — not in
    rounded floating point: linear interpolation lands on exact decimal
    midpoints constantly (the halfway bucket between two 2-decimal
    aggregates IS a x.xx5), and half-way rounding of doubles is where
    engines disagree (round-the-shortest-decimal vs round-the-binary-
    value). Integer floor is deterministic and identical everywhere;
    all products stay far below 2^53 so the arithmetic is exact.
    """
    grain = "hour" if step == "1 hour" else "day"
    k, ts = F.col(key_col), F.col(ts_col)
    bucket = F.date_trunc(grain, ts)
    actual = df.groupBy(k.alias("__key"), bucket.alias("bucket_ts")).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.round(F.sum(value_col), 2).alias("__sum_val"),
    )
    spans = df.groupBy(k.alias("__key")).agg(
        F.date_trunc(grain, F.min(ts)).alias("__lo"),
        F.date_trunc(grain, F.max(ts)).alias("__hi"),
    )
    spine = spans.select(
        "__key",
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {step}"))
        ).alias("bucket_ts"),
    )
    grid = spine.join(actual, ["__key", "bucket_ts"], "left")
    w_prev = (
        Window.partitionBy("__key")
        .orderBy(F.col("bucket_ts").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("__key")
        .orderBy(F.col("bucket_ts").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    grid = grid.withColumn(
        "__sum_c", F.round(F.col("__sum_val") * 100, 0).cast("long")
    )
    obs_ts = F.when(F.col("__sum_val").isNotNull(), F.col("bucket_ts"))
    prev_c = F.last("__sum_c", ignorenulls=True).over(w_prev)
    prev_t = F.last(obs_ts, ignorenulls=True).over(w_prev)
    next_c = F.first("__sum_c", ignorenulls=True).over(w_next)
    next_t = F.first(obs_ts, ignorenulls=True).over(w_next)
    span_s = F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)
    dt_s = F.unix_timestamp("bucket_ts") - F.unix_timestamp(prev_t)
    interp_c = prev_c + F.floor(
        ((next_c - prev_c) * dt_s).cast("double") / span_s
    )
    interp = interp_c.cast("double") / 100.0
    return grid.select(
        F.col("__key").alias(key_col),
        "bucket_ts",
        F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        F.when(F.col("__sum_val").isNotNull(), F.col("__sum_val"))
        .otherwise(interp)
        .alias("value_interp"),
    )


def concurrency_sweep(
    df: DataFrame,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Maximum interval overlap (sweep line): how many intervals are
    simultaneously open, reported as the max concurrency per hour. At
    equal timestamps an END is processed before a START (touching
    intervals do not overlap).

    The classic sweep needs a running sum over ONE global ordering —
    a single-partition window at scale. Instead: deltas are keyed by
    day, the running sum is computed within each day (partition-bounded
    window), and a per-day offset — the cumulative sum of whole-day
    totals over PRECEDING days — is added. The offset frame has one row
    per distinct day (metadata-sized, like the zone-map stats frame),
    so its unpartitioned window is bounded and documented rather than a
    scale hazard. The per-day totals aggregate re-reads the delta
    lineage — two passes over the source, both narrow.
    """
    # explode, not union: a union's two branches would re-derive the
    # source scan twice per consumer (the verify-skill union-lineage
    # trap); the explode emits both deltas from ONE scan
    deltas = df.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(start_col).alias("__t"), F.lit(1).alias("__d")
                ),
                F.struct(
                    F.col(end_col).alias("__t"), F.lit(-1).alias("__d")
                ),
            )
        ).alias("__x")
    ).select(
        F.col("__x.__t").alias("__t"), F.col("__x.__d").alias("__d")
    ).withColumn("__day", F.to_date("__t"))
    w_day = (
        Window.partitionBy("__day")
        # __d ascending puts -1 (end) before +1 (start) at equal ts
        .orderBy(F.col("__t").asc(), F.col("__d").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = deltas.withColumn("__run_local", F.sum("__d").over(w_day))
    day_totals = deltas.groupBy("__day").agg(
        F.sum("__d").alias("__day_total")
    )
    # one row per distinct day: bounded frame, unpartitioned by design
    w_days = (
        Window.orderBy(F.col("__day").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = day_totals.withColumn(
        "__offset", F.coalesce(F.sum("__day_total").over(w_days), F.lit(0))
    ).select("__day", "__offset")
    swept = local.join(F.broadcast(offsets), "__day").withColumn(
        "__run", F.col("__run_local") + F.col("__offset")
    )
    return (
        swept.filter(F.col("__d") == 1)  # concurrency AT each interval start
        .groupBy(F.date_trunc("hour", "__t").alias("hour_ts"))
        .agg(F.max("__run").alias("max_concurrency"))
    )


def seasonal_anomaly(
    events: DataFrame,
    ts_col: str = "ts",
    filter_type: str = "error",
    type_col: str = "event_type",
    k_sigma: float = 2.0,
) -> DataFrame:
    """Seasonality-aware anomaly flags over the hourly error rollup:
    the naive fixed-threshold monitor (monitor_alert_threshold) pages
    on every nightly batch spike; this one baselines each HOUR-OF-DAY
    separately (mean/stddev of that wall-clock hour's counts across
    all days) and flags hours deviating more than ``k_sigma`` from
    their own seasonal baseline.

    Plan shape: one map-side-combined groupBy to the hourly rollup
    (720 rows/month — metadata-sized from there on), a 24-row baseline
    aggregate broadcast back, and a narrow flag map. The corpus is
    scanned once; everything after the first shuffle is bounded by the
    calendar, not the data.
    """
    hourly = (
        events.filter(F.col(type_col) == filter_type)
        .groupBy(F.date_trunc("hour", F.col(ts_col)).alias("hour_ts"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    baseline = hourly.groupBy(
        F.hour("hour_ts").alias("hod")
    ).agg(
        F.avg("n_events").alias("mu"),
        F.stddev_pop("n_events").alias("sigma"),
    )
    return (
        hourly.withColumn("hod", F.hour("hour_ts"))
        .join(F.broadcast(baseline), "hod")
        .select(
            F.date_format("hour_ts", "yyyy-MM-dd HH").alias("hour"),
            "n_events",
            F.round("mu", 6).alias("mu"),
            F.round("sigma", 6).alias("sigma"),
            (
                F.abs(F.col("n_events") - F.col("mu"))
                > F.lit(k_sigma) * F.col("sigma")
            )
            .cast("int")
            .alias("anomaly"),
        )
    )


def path_topk(
    events: DataFrame,
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    max_steps: int = 8,
    k: int = 20,
) -> DataFrame:
    """Top-k behavioral paths: each entity's chronologically ordered
    event-type sequence (first ``max_steps`` steps, '>'-joined), ranked
    by how many entities share it — the "what do users actually do"
    mining query behind every product-analytics funnel hypothesis.

    One entity-keyed shuffle builds the per-entity path (sort_array of
    (ts, tiebreak, type) structs resolves order inside the row — no
    window), then a path-keyed metadata-sized count. Path cardinality
    is bounded by |event types|^max_steps in the worst case but is
    Zipf-concentrated in practice; the final top-k is orderBy+limit on
    the path counts (per-partition heaps, no global sort materialized).
    """
    paths = (
        events.groupBy(entity_col)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("t"),
                        F.col(order_tiebreak).alias("tb"),
                        F.col(type_col).alias("e"),
                    )
                )
            ).alias("seq")
        )
        .select(
            F.concat_ws(
                ">",
                F.slice(F.transform(F.col("seq"), lambda s: s["e"]), 1, max_steps),
            ).alias("path")
        )
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_entities"))
    return (
        counted.orderBy(F.desc("n_entities"), F.asc("path"))
        .limit(k)
        .select("path", "n_entities")
    )


def abtest_ztest(
    events: DataFrame,
    entity_col: str = "user_id",
    metric_col: str = "value",
    salt: int = 0,
) -> DataFrame:
    """Two-sample z-test over a deterministic 50/50 hash assignment of
    entities to variants (same Knuth bucket arithmetic as the sampling
    kit — assignment is reproducible, no RNG, and any engine derives
    the identical groups). Welch z on per-EVENT metric values:

        z = (mean_b − mean_a) / sqrt(s²_a/n_a + s²_b/n_b)

    One conditional aggregation — single corpus scan collapsing
    map-side to one row; nothing else moves. Output: group sizes,
    means, the z statistic, and the |z| > 1.96 verdict.
    """
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.sampling import hash_bucket

    is_b = (hash_bucket(F.col(entity_col), salt) >= 5000).cast("int")
    tagged = events.withColumn("__b", is_b)
    m = F.col(metric_col)
    agg = tagged.agg(
        F.sum(1 - F.col("__b")).alias("n_a"),
        F.sum("__b").alias("n_b"),
        F.avg(F.when(F.col("__b") == 0, m)).alias("mean_a"),
        F.avg(F.when(F.col("__b") == 1, m)).alias("mean_b"),
        F.var_samp(F.when(F.col("__b") == 0, m)).alias("var_a"),
        F.var_samp(F.when(F.col("__b") == 1, m)).alias("var_b"),
    )
    z = (F.col("mean_b") - F.col("mean_a")) / F.sqrt(
        F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(z) > 1.96).cast("int").alias("significant"),
    )
