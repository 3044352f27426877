"""Mergeable frequency sketches: distributed heavy hitters.

``heavy_hitters`` finds the top-k most frequent values of a column
without a full-domain aggregation. The naive top-k — groupBy(key).count
over every distinct value — shuffles the whole domain; for token/n-gram
domains that is billions of keys, most of which are singletons that
exist only to be discarded. The sketch path bounds the shuffle to
``capacity`` rows per partition regardless of domain size:

1. Per-partition Misra-Gries summary (``mapInPandas``): each partition
   compresses its stream to at most ``capacity`` (key, lower_bound)
   pairs. Batch-merge rule (Agarwal et al. 2012, "Mergeable Summaries"):
   add a batch's exact value_counts, and if more than ``capacity`` keys
   remain, subtract the (capacity+1)-th largest count from all and drop
   the non-positive — the classic MG decrement, vectorized in pandas.
2. The union of summaries (≤ capacity × partitions rows — metadata, not
   data) de-duplicates into a candidate set. MG guarantees every key
   with true frequency > N_p/capacity survives partition p's summary,
   so any key with GLOBAL frequency > N/capacity is in the candidate
   set of at least one partition (it exceeds the local threshold
   somewhere by pigeonhole).
3. An exact confirm pass counts ONLY the candidates (broadcast
   semi-join prunes map-side; the groupBy touches ≤ |candidates| keys)
   and ranks top-k under (count DESC, key ASC).

Provided the true k-th frequency exceeds N/capacity (a size-able
condition: capacity = partitions × k × headroom), the result is EXACT —
identical to the full aggregation — which is why the SQL oracle can
value-check it. Same sketch-prune + exact-confirm shape as
``text.contamination_screen_bloom``.

This is also the hot-key detector for the skew tooling
(operators/skew.py): run it on a join key before choosing a salt
factor, at a fraction of the full-aggregation cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _mg_merge(counts: dict, batch_counts, capacity: int) -> dict:
    """Merge exact batch counts into an MG summary of ≤ capacity keys."""
    for key, n in batch_counts.items():
        counts[key] = counts.get(key, 0) + int(n)
    if len(counts) > capacity:
        # subtract the (capacity+1)-th largest count from everything
        dec = sorted(counts.values(), reverse=True)[capacity]
        counts = {k: v - dec for k, v in counts.items() if v - dec > 0}
    return counts


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    capacity: int = 400,
) -> DataFrame:
    """Exact top-k frequent values via MG-sketch candidate pruning +
    exact confirm pass. Returns (key, n, rank); exact when the k-th true
    frequency exceeds N/capacity (see module docstring)."""
    import pandas as pd
    from pyspark.sql import types as T

    keys = df.select(F.col(key_col).cast("string").alias("key"))

    summary_schema = T.StructType(
        [T.StructField("key", T.StringType()), T.StructField("lb", T.LongType())]
    )

    def _mg_kernel(batches):
        counts: dict = {}
        for pdf in batches:
            vc = pdf["key"].value_counts()
            counts = _mg_merge(counts, vc.to_dict(), capacity)
        if counts:
            yield pd.DataFrame({"key": list(counts), "lb": list(counts.values())})

    candidates = (
        keys.mapInPandas(_mg_kernel, summary_schema).select("key").distinct()
    )

    confirmed = (
        keys.join(F.broadcast(candidates), "key")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.orderBy(F.desc("n"), F.asc("key"))
    # Intentional unpartitioned window: the frame is the candidate set
    # (≤ capacity × partitions rows), never the input.
    return (
        confirmed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("key", "n", "rank")
    )


def countmin_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Build a Count-Min sketch (Cormode & Muthukrishnan 2005) of a
    column's frequency distribution: ``depth`` independent hash rows of
    ``width`` counters. Each input key increments one counter per row;
    a key's estimate is the MIN of its ``depth`` counters —
    over-estimates only (collisions add, never subtract), within
    eps·N = (e/width)·N with probability 1 - exp(-depth).

    The whole sketch is depth × width rows — a metadata-sized aggregate
    regardless of key cardinality, built with ONE map-side-combined
    groupBy (the explode multiplies rows by ``depth``, but partial
    aggregation collapses them to ≤ depth·width per task before the
    shuffle). That bounded size is the 100-TB story: frequency state
    for a billion-key domain in ~memory-page space, mergeable across
    corpora by cell-wise addition.

    Hashing: xxhash64(key, seed=row) pmod width — deterministic across
    executors and sessions, so estimates are reproducible.
    """
    key = F.col(key_col).cast("string")
    cells = df.select(
        F.posexplode(
            F.array(
                *[
                    F.pmod(F.xxhash64(key, F.lit(d)), F.lit(width))
                    for d in range(depth)
                ]
            )
        ).alias("d", "bucket")
    )
    return cells.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("n"))


def countmin_query(
    sketch: DataFrame,
    candidates: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Point-query a Count-Min sketch for each candidate key: recompute
    the candidate's ``depth`` cell coordinates, join to the sketch, and
    take min(n). The sketch side is depth × width rows — broadcast —
    so probing any number of candidates is one map-side join plus a
    candidate-keyed min aggregate. Returns (key, cms_estimate).

    ``carry_cols`` names additional candidate columns to ride through
    the probe unchanged (grouped with the key, so they must be
    functionally determined by it — true for any aggregate the caller
    computed per key). A caller that needs the estimate NEXT TO its own
    per-key columns carries them instead of re-joining the candidate
    frame afterwards, which would re-derive the whole candidate lineage
    a second time (the candidate set is usually the expensive side —
    e.g. a Misra-Gries pass over the corpus).
    """
    # a carried column named like an output column would produce a
    # duplicate/ambiguous output schema after the rename-back (ADVICE r18)
    bad = {"key", "cms_estimate"}.intersection(carry_cols)
    if bad:
        raise ValueError(
            f"carry_cols collide with countmin_query output columns: {sorted(bad)}"
        )
    key = F.col(key_col).cast("string")
    # carried columns ride under reserved names so they can never
    # collide with the sketch's own (d, bucket, n) columns in the join
    probes = candidates.select(
        key.alias("key"),
        *[F.col(c).alias(f"__carry_{c}") for c in carry_cols],
        F.posexplode(
            F.array(
                *[
                    F.pmod(F.xxhash64(key, F.lit(d)), F.lit(width))
                    for d in range(depth)
                ]
            )
        ).alias("d", "bucket"),
    )
    # LEFT join + coalesce(0): a never-inserted key may miss some cells
    # entirely; true CMS semantics take min over ALL depth rows, so an
    # absent cell reads 0 (estimate 0 for unseen keys, never inflated).
    out = (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("key", *[F.col(f"__carry_{c}") for c in carry_cols])
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cms_estimate"))
    )
    for c in carry_cols:
        out = out.withColumnRenamed(f"__carry_{c}", c)
    return out


def hashmin_sample_quantiles(
    df,
    key_col: str,
    value_col: str,
    k: int = 400,
    probs: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
):
    """Quantile estimation from a deterministic hash-min sample — the
    mergeable-sketch shape for percentiles at 100 TB, with ZERO RNG
    state: the sample is the k rows with the globally smallest
    ``md5(key)``, a pure function of the key set, so re-runs, retries,
    and any other engine select the identical rows (same reproducibility
    stance as the sampling kit; a uniform random sample in distribution,
    since md5 order is independent of the value).

    Scale shape: ``orderBy(h).limit(k)`` compiles to
    TakeOrderedAndProject — a per-partition k-heap plus a driver merge
    of P·k tiny (hash, value) rows, never a global sort — and the
    estimate folds in one k-bounded collect_list row. Estimator is the
    DISC form: sorted sample value at rank max(1, ceil(q·k)) — pure
    integer indexing, bit-identical in any engine (no interpolation
    arithmetic to diverge on).

    Returns one row per prob: (q, n_sample, est).
    """
    from pyspark.sql import functions as F

    h = F.md5(F.col(key_col).cast("string"))
    # NULL keys/values are excluded up front: the two engines disagree
    # on NULL ordering (Spark sorts NULLs first, DuckDB last) and on
    # NULL aggregation (collect_list drops them, DuckDB's list keeps
    # them), so admitting them would silently diverge from the oracle
    samp = (
        df.filter(F.col(key_col).isNotNull() & F.col(value_col).isNotNull())
        .select(h.alias("h"), F.col(value_col).alias("v"))
        .orderBy("h")
        .limit(k)
    )
    arr = samp.agg(F.sort_array(F.collect_list("v")).alias("vs"))
    qcol = F.explode(
        F.array(*[F.lit(float(q)) for q in probs])
    ).alias("q")
    n = F.size("vs")
    idx = F.greatest(F.ceil(F.col("q") * n).cast("int"), F.lit(1))
    # empty sample → NULL estimate (the element_at would trap under
    # ANSI); DuckDB's out-of-bounds list index is already NULL, so the
    # oracle agrees without a mirror change
    est = F.when(n > 0, F.element_at("vs", idx))
    return (
        arr.select("vs", qcol)
        .select(
            F.col("q"),
            n.alias("n_sample"),
            est.alias("est"),
        )
    )
