"""Temporal joins Spark lacks as primitives: as-of join and point-in-
interval range join, both built from shuffle-friendly compositions (no
BroadcastNestedLoopJoin, no per-row Python).

* ``asof_join`` — for each left row, attach the latest right row with
  ``right.ts <= left.ts`` per key. Implemented as union → single window
  pass: tag the two sides, sort within each key by (ts, side) and carry
  the last non-null right payload forward (``last(..., ignorenulls)``
  over rows UNBOUNDED PRECEDING..CURRENT). ONE shuffle on the key — the
  naive inequality join is a per-key cross product; the sort-based form
  is O(n log n) per key and AQE-splittable.
* ``range_join_buckets`` — join points to intervals by exploding each
  interval into the fixed-width buckets it covers and equi-joining on the
  bucket, then verifying exact containment. Turns an inequality join
  (nested-loop at any scale) into a shuffle join whose fan-out is
  ``interval_len / bucket_len`` per interval — the standard trick behind
  Databricks' range-join optimization and interval libraries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: every left row gains the most recent right-side
    ``value_cols`` at or before its timestamp (per ``key``); nulls where
    no prior right row exists.

    Ties (equal timestamps) resolve to the right row — matching DuckDB
    ``ASOF JOIN ... ON l.ts >= r.ts`` inclusive semantics — via the side
    tag ordering (right=0 sorts before left=1 at equal ts).
    """
    value_cols = value_cols or [c for c in right.columns if c not in (key, right_ts)]
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema) + ">"
        ).alias("_left"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        W.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "_side",
        "_left",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}") for c in value_cols],
    )
    out = carried.filter(F.col("_side") == 1).select(
        "_left.*", *[F.col(f"_r_{c}").alias(c) for c in value_cols]
    )
    return out


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Inner join of points to [start, end) intervals via bucketed
    equi-join + exact containment filter. ``bucket`` should be >= the
    typical interval length; fan-out per interval is its covered bucket
    count."""
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col(start_col)),
                F.date_trunc("hour", F.col(end_col)),
                F.expr(f"INTERVAL {bucket}"),
            )
        ),
    )
    pt = points.withColumn("_bucket", F.date_trunc("hour", F.col(point_ts)))
    return (
        pt.join(iv, "_bucket")
        .filter((F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col)))
        .drop("_bucket")
    )


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    key: str,
    tolerance_s: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """As-of join with a staleness bound: every left row gains the most
    recent right row at-or-before its timestamp (per ``key``) ONLY if
    that row is at most ``tolerance_s`` seconds old — the feature-
    engineering contract ("last click within 30 min", "sensor reading
    no older than its validity window") where an unbounded as-of match
    silently joins stale state. Beyond tolerance the value columns are
    null and ``asof_age_s`` is null.

    Same single-shuffle union+carry shape as :func:`asof_join` (no
    range join, no per-row probe): the right values travel as ONE
    struct column carrying their own timestamp, and the tolerance check
    is a narrow post-filter on the carried age.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    rv_fields = [f"_rts:{right.schema[right_ts].dataType.simpleString()}"] + [
        f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
    ]
    rv_type = "struct<" + ",".join(rv_fields) + ">"
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_left"),
        F.lit(None).cast(rv_type).alias("_rv"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<"
            + ",".join(
                f"{f.name}:{f.dataType.simpleString()}" for f in left.schema
            )
            + ">"
        ).alias("_left"),
        F.struct(
            F.col(right_ts).alias("_rts"),
            *[F.col(c) for c in value_cols],
        ).alias("_rv"),
    )
    w = (
        W.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = (
        l_tag.unionByName(r_tag)
        .select(
            "_side",
            "_left",
            F.col("_ts").alias("_lts"),
            F.last("_rv", ignorenulls=True).over(w).alias("_rv"),
        )
        .filter(F.col("_side") == 1)
    )
    age = F.col("_lts").cast("double") - F.col("_rv._rts").cast("double")
    fresh = F.col("_rv").isNotNull() & (age <= tolerance_s)
    return carried.select(
        "_left.*",
        *[F.when(fresh, F.col(f"_rv.{c}")).alias(c) for c in value_cols],
        F.when(fresh, age).alias("asof_age_s"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str = "s",
    left_end: str = "e",
    right_start: str = "s",
    right_end: str = "e",
    bucket_secs: int = 600,
) -> DataFrame:
    """Interval×interval OVERLAP join — the two-sided upgrade of
    :func:`range_join_buckets` (which joins points into intervals):
    every pair of left/right intervals with ``l.s <= r.e AND r.s <=
    l.e`` (closed-interval overlap), found WITHOUT a cross join.

    Both sides explode to the integer time buckets they cover
    (``floor(s / W) .. floor(e / W)`` — true floor division, so the
    recipe reproduces in any engine for negative values too);
    candidate pairs meet on the bucket key, the exact overlap predicate
    filters them, and each surviving pair is emitted in exactly ONE
    canonical bucket — the bucket of the LATER start, which both sides
    of an overlapping pair provably cover (the other side's end is ≥
    the later start). That single-bucket emission replaces a full-width
    ``distinct`` over the join output: no second wide shuffle, and
    duplicate input rows keep plain multiset join semantics instead of
    being collapsed. Shuffle volume is Σ interval_length / W per side —
    size ``bucket_secs`` near the typical interval length. Start/end
    are epoch-second longs.

    Returns the joined pairs with the left columns plus the right
    columns prefixed ``r_``.
    """
    def bucket(col: str):
        return F.floor(F.col(col) / F.lit(bucket_secs)).cast("long")

    lb = left.withColumn(
        "_b", F.explode(F.sequence(bucket(left_start), bucket(left_end)))
    )
    rb = right.withColumn(
        "_b", F.explode(F.sequence(bucket(right_start), bucket(right_end)))
    )
    r2 = rb.select(
        F.col("_b"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
    )
    canonical = F.greatest(
        F.floor(F.col(left_start) / F.lit(bucket_secs)).cast("long"),
        F.floor(F.col(f"r_{right_start}") / F.lit(bucket_secs)).cast("long"),
    )
    return (
        lb.join(r2, "_b")
        .filter(
            (F.col(left_start) <= F.col(f"r_{right_end}"))
            & (F.col(f"r_{right_start}") <= F.col(left_end))
            & (F.col("_b") == canonical)
        )
        .drop("_b")
    )
