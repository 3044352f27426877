"""Sequence packing: documents → fixed token-budget training sequences.

The step between a curated corpus and a training run: concatenate
documents (in a deterministic order) into contiguous token streams and
cut them every ``budget`` tokens, letting documents straddle sequence
boundaries — "concat-and-split" packing, the standard high-utilization
layout for LLM pretraining batches (every sequence is exactly full;
nothing is padded away). The alternative greedy first-fit family needs
sequential state; concat-and-split has a CLOSED FORM over a running
token offset, which makes it expressible as pure Catalyst window + array
expressions — no UDF, no iteration, no driver loop.

Spark-first layout:

* documents are sharded by an arithmetic id-hash (same reproducible
  ``(key*K)%M`` family as :mod:`.sampling` — no ``rand()``, identical
  across retries and engines);
* ONE shuffle: ``Window.partitionBy(shard).orderBy(...)`` computes each
  doc's exclusive running token offset inside its shard;
* each doc spans packs ``floor(start/budget) .. floor((end-1)/budget)``
  — emitted with ``explode(sequence(...))``, a narrow rowwise op;
* per-(doc, pack) segment token counts are closed-form min/max
  arithmetic.

At 100 TB the shard count is the parallelism knob: packing is
embarrassingly parallel across shards (one window partition each), and
shard assignment is a narrow map. No global ordering is ever needed —
determinism comes from the (shard, doc order) pair, not a total sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

# Knuth multiplicative hash — matches operators/sampling.py so shard
# assignment is reproducible in any engine (DuckDB oracle included).
_HASH_K = 2654435761


def shard_for(key: Column, n_shards: int, salt: int = 0) -> Column:
    """Deterministic shard id in ``[0, n_shards)`` from an integer key.

    Masks the key to 31 bits before the salt add AND before the
    multiply (same discipline as :func:`..operators.sampling.
    hash_bucket`) so neither the add nor the product can trap or wrap
    in signed-64 ANSI arithmetic for any 64-bit key — no negative
    shards, and the DuckDB oracle form ``((((key & 2147483647) + salt)
    & 2147483647) * 2654435761) % n`` reproduces it exactly. Identity
    for keys < 2^31 with small salts.
    """
    masked = (
        key.cast("long").bitwiseAND(F.lit(0x7FFFFFFF)) + F.lit(salt)
    ).bitwiseAND(F.lit(0x7FFFFFFF))
    return (masked * F.lit(_HASH_K)) % F.lit(n_shards)


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    n_shards: int = 8,
    salt: int = 0,
) -> DataFrame:
    """Assign every document its (shard, pack, offset) coordinates in the
    packed token stream.

    Input needs an integer id and a per-doc token count (compute it with
    :func:`..operators.text.token_count` upstream so the tokenizer choice
    stays a separate concern). Output: one row per (document, pack)
    SEGMENT — a doc longer than the remaining space in its pack
    contributes rows to consecutive packs:

    ``shard, pack_id, doc_id, start_in_pack, seg_tokens, doc_start``

    Invariants (tested): per-(shard, pack) sum(seg_tokens) == budget for
    every pack except the last of each shard; segment counts sum back to
    each doc's token count; coordinates are a pure function of
    (ids, token counts, budget, n_shards, salt).
    """
    w = W.partitionBy("_shard").orderBy(F.col(id_col).asc())
    tok = F.col(tokens_col).cast("long")

    sharded = docs.select(
        F.col(id_col),
        tok.alias("_tok"),
        shard_for(F.col(id_col).cast("long"), n_shards, salt).alias("_shard"),
    ).filter(F.col("_tok") > 0)

    # Exclusive running offset: where this doc's tokens begin in the
    # shard's concatenated stream. ONE shuffle (the window), then narrow.
    offs = sharded.withColumn(
        "_start", F.coalesce(F.sum("_tok").over(w) - F.col("_tok"), F.lit(0))
    ).withColumn("_end", F.col("_start") + F.col("_tok"))

    first_pack = (F.col("_start") / budget).cast("long")
    last_pack = ((F.col("_end") - 1) / budget).cast("long")

    segs = offs.select(
        F.col("_shard").alias("shard"),
        F.col(id_col),
        F.col("_start"),
        F.col("_end"),
        F.explode(F.sequence(first_pack, last_pack)).alias("pack_id"),
    )
    pack_lo = F.col("pack_id") * budget
    pack_hi = pack_lo + budget
    seg_start = F.greatest(F.col("_start"), pack_lo)
    seg_end = F.least(F.col("_end"), pack_hi)
    return segs.select(
        "shard",
        "pack_id",
        id_col,
        (seg_start - pack_lo).cast("int").alias("start_in_pack"),
        (seg_end - seg_start).cast("int").alias("seg_tokens"),
        (seg_start - F.col("_start")).cast("long").alias("doc_start"),
    )


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-shard packing audit: pack count, token totals, fill ratio.
    Fill is 1.0 for all but the final partial pack of each shard, so
    utilization → 1 as shards grow — the whole point of packing."""
    per_pack = packed.groupBy("shard", "pack_id").agg(
        F.sum("seg_tokens").alias("pack_tokens"),
        F.count(F.lit(1)).alias("n_segments"),
    )
    return (
        per_pack.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_packs"),
            F.sum("pack_tokens").alias("total_tokens"),
            F.sum("n_segments").alias("n_segments"),
            F.round(F.sum("pack_tokens") / (F.count(F.lit(1)) * budget), 4).alias(
                "fill_ratio"
            ),
        )
        .orderBy("shard")
    )


def pack_first_fit_nosplit(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    n_shards: int = 8,
    salt: int = 0,
) -> DataFrame:
    """First-fit-decreasing packing that NEVER splits a document — the
    other production packing mode (finetuning / eval batches, where a
    truncated document is a corrupted example; contrast with
    :func:`pack_sequences`' concat-and-split for pretraining).

    FFD is inherently sequential, so the sequential state is confined to
    one SHARD: documents hash-shard deterministically (same
    ``(key*K)%M`` family as everywhere else), and each shard's bin walk
    runs in one Arrow-batched ``applyInPandas`` group — embarrassingly
    parallel across shards, no global ordering, byte-stable across
    re-runs. Documents longer than ``budget`` get ``pack_id = -1``
    (overflow audit rows) instead of silently truncating.

    Returns (shard, pack_id, doc_id, n_tokens). Within a shard, FFD
    order is (n_tokens desc, doc_id asc) — the classic ~11/9·OPT bound
    with a deterministic tie-break.
    """
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("shard", T.LongType()),
            T.StructField("pack_id", T.LongType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
        ]
    )

    def _ffd(key, pdf: pd.DataFrame) -> pd.DataFrame:
        (shard,) = key
        pdf = pdf.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
        bins: list[int] = []  # remaining capacity per pack
        assigned = []
        for _, row in pdf.iterrows():
            n = int(row["n_tokens"])
            if n > budget:
                assigned.append(-1)
                continue
            for b, rem in enumerate(bins):
                if rem >= n:
                    bins[b] = rem - n
                    assigned.append(b)
                    break
            else:
                bins.append(budget - n)
                assigned.append(len(bins) - 1)
        return pd.DataFrame(
            {
                "shard": int(shard),
                "pack_id": assigned,
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_tokens": pdf["n_tokens"].to_numpy(),
            }
        )

    staged = docs.select(
        shard_for(F.col(id_col), n_shards, salt).alias("shard"),
        F.col(id_col).alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )
    return staged.groupBy("shard").applyInPandas(_ffd, out_schema)


def length_buckets(
    df: DataFrame,
    id_col: str,
    length_col: str,
    max_bucket: int = 4096,
) -> DataFrame:
    """Assign each sequence to the smallest power-of-two length bucket
    that holds it (the inference/serving batching strategy: batch
    same-bucket sequences together and pad only to the bucket size, not
    the global max). Adds ``bucket``; rows longer than ``max_bucket``
    are clamped into the top bucket (they'd be truncated downstream).

    The bucket is exact integer arithmetic — ``n`` itself when ``n`` is
    a power of two (``n & (n-1) == 0``), else ``1 << bit_length(n)`` —
    so a SQL oracle reproduces it bit-for-bit (no float log2 edge
    cases). Narrow map, zero shuffles.
    """
    n = F.col(length_col).cast("long")
    is_pow2 = (n.bitwiseAND(n - 1) == 0) & (n > 0)
    # shiftleft() in the Python API only takes a literal bit count, so
    # the column-valued shift goes through the SQL form.
    pow2ceil = F.when(is_pow2, n).otherwise(
        F.expr(
            f"cast(shiftleft(1L, length(bin(cast({length_col} as bigint))))"
            " as bigint)"
        )
    )
    bucket = F.least(pow2ceil, F.lit(max_bucket))
    return df.select(
        F.col(id_col), n.alias("seq_len"), bucket.alias("bucket")
    )


def bucket_padding_stats(buckets: DataFrame) -> DataFrame:
    """Per-bucket padding accounting over :func:`length_buckets` output:
    documents, real tokens, padded slots (n_docs · bucket), and the
    waste fraction — plus what the SAME rows would waste if padded to
    the global maximum bucket instead (the no-bucketing baseline a
    serving stack pays). One metadata-sized aggregation; the global max
    is a broadcast one-row cross join, not a second pass."""
    from pyspark.sql import Window as W

    per = buckets.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("seq_len").alias("real_tokens"),
    )
    # Global max over `per`, NOT a separate agg branch: a second branch
    # would re-derive per's whole lineage and scan the corpus twice.
    # The partitionless window is bounded — `per` has at most
    # log2(max_bucket)+1 rows — so the single-partition WindowExec is
    # metadata-sized and the "No Partition Defined" warning is accepted.
    return (
        per.withColumn("__gmax", F.max("bucket").over(W.partitionBy()))
        .select(
            "bucket",
            "n_docs",
            "real_tokens",
            (F.col("n_docs") * F.col("bucket")).alias("padded_tokens"),
            F.round(
                F.lit(1.0)
                - F.col("real_tokens")
                / (F.col("n_docs") * F.col("bucket")).cast("double"),
                6,
            ).alias("waste_frac"),
            F.round(
                F.lit(1.0)
                - F.col("real_tokens")
                / (F.col("n_docs") * F.col("__gmax")).cast("double"),
                6,
            ).alias("waste_frac_unbucketed"),
        )
    )


def batch_schedule(
    buckets: DataFrame,
    id_col: str,
    batch_size: int,
) -> DataFrame:
    """Turn :func:`length_buckets` output into a concrete serving
    schedule: within each bucket, documents are md5-ordered
    (deterministic, RNG-free) and chopped into fixed-size batches.
    Adds ``batch_id`` (0-based within bucket) and ``slot`` (position
    in batch). One bucket-keyed window — same single-shuffle shape as
    any rank-per-group; batches inherit the bucket's padding bound by
    construction."""
    from pyspark.sql import Window as W

    order = F.md5(F.col(id_col).cast("string"))
    w = W.partitionBy("bucket").orderBy(order.asc(), F.col(id_col).asc())
    rank = F.row_number().over(w)
    return buckets.select(
        F.col(id_col),
        "seq_len",
        "bucket",
        ((rank - 1) / batch_size).cast("long").alias("batch_id"),
        ((rank - 1) % batch_size).cast("long").alias("slot"),
    )
