"""Text-analysis operators for training-data pipelines.

All pure Catalyst expressions (regexp/string/array functions) — no UDFs,
so the hot path stays inside whole-stage codegen at 100 TB:

* token counting — whitespace tokens + a BPE-ish subword regex count.
* quality scoring — length/punctuation/stopword/uniqueness ratios.
* language ID — stopword-hit n-gram heuristic over a small per-language
  marker list (deterministic, SQL-replicable).
* fingerprinting — normalized sorted-distinct-token SHA-256 (the
  OpenRefine "fingerprint" key) for fuzzy-exact dedup.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints must resolve
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.dedup import tokenize, word_shingles

# Tiny deterministic marker sets; heuristic quality is secondary to the
# operator shape (the oracle replicates the same rule).
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "es": ("el", "la", "los"),
    "fr": ("le", "et", "les"),
}

# BPE-ish token regex: runs of letters, runs of digits, or single
# non-space symbols — approximates subword pre-tokenization.
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens via regexp_count (JVM-side)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE))


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality features: char/token counts, mean token length,
    punctuation ratio, distinct-token ratio, and a composite score in
    [0,1] (each factor rounded so a SQL oracle reproduces it exactly)."""
    text = F.col(text_col)
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    n_tok = F.size(toks)
    n_chars = F.length(text)
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tok
    punct_ratio = punct_count(text) / n_chars
    mean_tok_len = (F.length(F.trim(text)) - (n_tok - 1)) / n_tok  # chars net of single spaces
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + distinct_ratio * F.lit(0.4)
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * F.lit(0.2)
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_computed"),
        n_tok.alias("n_tokens"),
        F.round(mean_tok_len, 4).alias("mean_token_len"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def lang_pred_col(text: Column) -> Column:
    """Column-level stopword-hit language heuristic: most marker hits
    wins; ties and zero hits → 'und' (undetermined). CJK check first
    (any Han char). Pure Catalyst expression so composite pipelines
    (operators/curation.py) can evaluate it inside one narrow map."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in _LANG_MARKERS.items()
    }
    # arg-max with deterministic tie-break by language code order
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang in sorted(_LANG_MARKERS):
        better = hits[lang] > best_hits
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(better, hits[lang]).otherwise(best_hits)
    has_cjk = text.rlike(r"[一-鿿]")
    return F.when(has_cjk, F.lit("zh")).otherwise(best_lang)


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-hit language heuristic: most marker hits wins; ties and
    zero hits → 'und' (undetermined). CJK check first (any Han char)."""
    return df.select(
        F.col(id_col), lang_pred_col(F.col(text_col)).alias("pred_lang")
    )


def ngram_freq(df: DataFrame, text_col: str, n: int = 2, top_k: int = 20) -> DataFrame:
    """Corpus-wide top-k word n-grams: explode → count → ordered limit.

    One shuffle on the n-gram key with map-side partial aggregation, then
    a TakeOrderedAndProject for the top-k — no full sort, no driver-side
    counting, so corpus size only affects the (parallel) count stage."""
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.dedup import tokenize, word_shingles

    grams = df.select(
        F.explode(word_shingles(tokenize(F.col(text_col)), n)).alias("ngram")
    )
    return (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("ngram"))
        .limit(top_k)
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalized-content fingerprint: lowercase → whitespace tokens →
    distinct → sort → join → sha256. Word-order- and duplication-
    insensitive exact-dup key."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    key = F.sha2(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))), 256)
    return df.select(F.col(id_col), key.alias("fingerprint"))


# PII patterns kept to syntax shared by Java regex and RE2 so the DuckDB
# oracle runs the identical expression.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Redact email addresses and phone numbers, reporting per-document
    match counts. Pure regexp_replace/regexp_count — JVM-side, no UDF;
    at 100 TB this is a narrow map over the corpus."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.regexp_count(text, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(text, F.lit(PHONE_RE)).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("text_redacted"),
    )


def chunk_windows(
    df: DataFrame, id_col: str, text_col: str, size: int = 200, overlap: int = 50
) -> DataFrame:
    """Split documents into fixed-size character windows with overlap —
    the chunking step ahead of embedding in a retrieval/training
    pipeline. sequence+explode keeps it a narrow JVM-side op (rows fan
    out in place, no shuffle); chunk ids stay deterministic
    (doc_id, start)."""
    if overlap >= size:
        raise ValueError(f"overlap {overlap} must be < size {size}")
    step = size - overlap
    text = F.col(text_col)
    starts = F.sequence(F.lit(1), F.greatest(F.length(text), F.lit(1)), F.lit(step))
    return df.select(
        F.col(id_col),
        F.explode(starts).alias("chunk_start"),
        text.substr(F.col("chunk_start"), F.lit(size)).alias("chunk"),
    )


def unigram_nll(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document unigram negative log-likelihood — the classic cheap
    "perplexity-proxy" quality score: tokens that are rare in the corpus
    make a document surprising. Two shuffles total: one groupBy(token)
    to build the corpus frequency table (small — the vocabulary), which
    is then broadcast back onto the exploded tokens, and one
    groupBy(doc) for the per-document mean. No Python in the loop."""
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators._parallel import ensure_min_parallelism

    df = ensure_min_parallelism(df)  # CPU-bound per-row stage: single-split inputs parallelize (no-op at scale)
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
    )
    # corpus total as a 1-row broadcast, NOT a driver-side count():
    # keeps the operator lazy and avoids an extra full pass over the corpus
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    total = freq.agg(F.sum("n_tok").cast("double").alias("total_tok"))
    return (
        toks.join(F.broadcast(freq), "tok")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("n_tok") / F.col("total_tok"))), 3).alias(
                "mean_nll"
            ),
        )
    )


def vocab_topk(df: DataFrame, text_col: str, k: int = 30) -> DataFrame:
    """Corpus vocabulary: top-k BPE-ish pre-tokens by frequency with a
    deterministic (count desc, token asc) rank — the vocabulary-build
    step of tokenizer training. regexp_extract_all + explode stays in
    codegen; one shuffle for the count, top-k via TakeOrdered (no global
    sort)."""
    toks = df.select(
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), F.lit(0))).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(k)
    )


def gopher_rules(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Repetition/quality rule filter in the Gopher/C4 family: per-doc
    word-level statistics plus a composite keep verdict. ALL features are
    array-expression Catalyst — a narrow map over the corpus, zero
    shuffle, zero UDF — which is what lets the filter run as a cheap
    pre-pass over 100 TB before any expensive dedup:

    * ``n_words`` — word count (min-length floor; fragments out)
    * ``mean_word_len`` — degenerate tokenization / binary junk out
    * ``distinct_word_frac`` — low distinct ratio = repetition loops
    * ``top_word_frac`` — single-token domination (boilerplate, spam)
    * ``dup_bigram_frac`` — repeated phrase fraction (template text)

    top_word_frac is computed WITHOUT a shuffle: count each distinct
    word's occurrences inside the row's own array (O(distinct·n) per
    row — bounded and local) rather than exploding to a global groupBy.
    """
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators._parallel import ensure_min_parallelism

    df = ensure_min_parallelism(df)  # CPU-bound per-row stage: single-split inputs parallelize (no-op at scale)
    feats = df.select(F.col(id_col), *_gopher_feature_cols(F.col(text_col)))
    keep = (
        (F.col("n_words") >= 20)
        & (F.col("mean_word_len") >= 2.0)
        & (F.col("mean_word_len") <= 12.0)
        & (F.col("distinct_word_frac") >= 0.4)
        & (F.col("top_word_frac") <= 0.15)
        & (F.col("dup_bigram_frac") <= 0.3)
    )
    return feats.withColumn("keep", keep)


def _gopher_feature_cols(text: Column) -> list[Column]:
    """The five Gopher feature expressions (aliased), shared between
    gopher_rules and gopher_keep_col so composite pipelines can't drift
    from the standalone filter."""
    words = tokenize(text)
    n_words = F.size(words)
    distinct_words = F.array_distinct(words)
    bigrams = word_shingles(words, 2)
    top_count = F.array_max(
        F.transform(
            distinct_words,
            lambda w: F.size(F.filter(words, lambda x: x == w)),
        )
    )
    return [
        n_words.alias("n_words"),
        F.round(
            F.aggregate(words, F.lit(0), lambda s, w: s + F.length(w))
            / n_words.cast("double"),
            4,
        ).alias("mean_word_len"),
        F.round(F.size(distinct_words) / n_words.cast("double"), 4).alias(
            "distinct_word_frac"
        ),
        F.round(top_count / n_words.cast("double"), 4).alias("top_word_frac"),
        F.round(
            (F.size(bigrams) - F.size(F.array_distinct(bigrams)))
            / F.greatest(F.size(bigrams), F.lit(1)).cast("double"),
            4,
        ).alias("dup_bigram_frac"),
    ]


def gopher_keep_col(text: Column) -> Column:
    """Column-level Gopher keep verdict: the same rounded feature
    expressions as :func:`gopher_rules` combined with the same
    thresholds, as one boolean Column — lets a curation pipeline apply
    the filter inside a single narrow select with no join back."""
    f_nw, f_mwl, f_dwf, f_twf, f_dbf = _gopher_feature_cols(text)
    return (
        (f_nw >= 20)
        & (f_mwl >= 2.0)
        & (f_mwl <= 12.0)
        & (f_dwf >= 0.4)
        & (f_twf <= 0.15)
        & (f_dbf <= 0.3)
    )


def contamination_screen(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word n-gram with a held-out benchmark set — the screening step that
    keeps eval data out of a pretraining corpus.

    Shape: benchmark n-grams are DISTINCT'd then broadcast (benchmarks
    are tiny next to the corpus); corpus docs explode to their n-grams
    and left-join the broadcast set, then re-aggregate per doc on the
    pre-explode partitioning. Per doc: total n-grams, contaminated
    n-gram count, fraction, and the flag. At 100 TB the corpus is
    touched once and never shuffled on n-gram keys."""
    bench_grams = (
        benchmark.select(
            F.explode(word_shingles(tokenize(F.col(text_col)), n)).alias("gram")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    doc_grams = docs.select(
        F.col(id_col),
        F.explode_outer(word_shingles(tokenize(F.col(text_col)), n)).alias("gram"),
    )
    joined = doc_grams.join(F.broadcast(bench_grams), "gram", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("gram").alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_contaminated"),
        )
        .withColumn(
            "contaminated_frac",
            F.round(
                F.col("n_contaminated")
                / F.greatest(F.col("n_grams"), F.lit(1)).cast("double"),
                4,
            ),
        )
        .withColumn("flagged", F.col("n_contaminated") > 0)
    )


def c4_line_filter(
    df: DataFrame, id_col: str, lines_col: str, min_words: int = 3
) -> DataFrame:
    """C4-style LINE-level cleanup (Raffel et al. 2020 §2.2): within each
    document, keep only lines that end in a terminal punctuation mark
    and contain at least ``min_words`` words; drop lines mentioning
    javascript (the boilerplate tell). Returns per-doc line counts, the
    cleaned text (kept lines re-joined with newlines), and a doc-level
    keep verdict (at least half the lines survive).

    ``lines_col`` is an ``array<string>`` of lines. The whole filter is
    higher-order array expressions — a narrow shuffle-free map, like
    :func:`gopher_rules` the cheap pre-pass that runs over 100 TB before
    any expensive dedup; the regex and word-count predicates evaluate
    per-line INSIDE the row, never exploding the corpus.
    """
    lines = F.col(lines_col)
    kept = F.filter(
        lines,
        lambda l: l.rlike(r'[.!?"]$')
        & (F.size(F.split(l, " ")) >= min_words)
        & ~F.lower(l).contains("javascript"),
    )
    out = df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_lines_kept"),
        F.array_join(kept, "\n").alias("clean_text"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_lines_kept") * 2 >= F.col("n_lines")) & (F.col("n_lines_kept") > 0),
    )


def bpe_train_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int = 50,
    vocab_limit: int = 10_000,
    pre_tokenized: DataFrame | None = None,
) -> DataFrame:
    """Learn BPE merge rules from the corpus — the tokenizer-TRAINING
    step (`vocab_topk` builds the pre-token vocabulary; this learns the
    subword merges).

    Scale shape (how real tokenizer trainers work): the corpus
    collapses ONCE into a (word, count) frequency table — a distributed
    lowercase/split/groupBy whose output is VOCAB-sized, not
    corpus-sized — then the iterative merge loop runs on the driver over
    the ``vocab_limit`` most frequent words. At 100 TB the corpus pass
    is the only distributed stage (one shuffle on the word key,
    map-side combined); the merge loop's input is bounded by
    ``vocab_limit`` regardless of corpus size, exactly like training a
    production tokenizer on a frequency dict.

    Deterministic end to end: words tie-break (count desc, word asc),
    merges tie-break (pair count desc, pair lexicographic asc) — no RNG,
    so re-runs and engine ports reproduce byte-identical merge tables.
    Iterative pair-merging is not expressible in one SQL query; the
    operator is verified against a pure-Python reference implementation
    in tests. Returns (merge_rank, left, right, merged, pair_count).

    ``pre_tokenized`` (optional) is an already-exploded token frame with
    a ``w`` column (one row per non-empty token occurrence, same
    trim/lower/``\\s+``-split normalization this function would apply);
    a caller that also runs :func:`bpe_encode` on the same corpus passes
    one persisted frame to both so the corpus is tokenized ONCE instead
    of once per stage — the frequency aggregation below is identical
    either way, so the learned merges cannot differ.
    """
    if pre_tokenized is not None and "w" not in pre_tokenized.columns:
        raise ValueError(
            "pre_tokenized frame must have a 'w' token column "
            f"(got {pre_tokenized.columns})"
        )
    toks = (
        pre_tokenized.select("w")
        if pre_tokenized is not None
        else df.select(
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("w")
        ).filter(F.col("w") != "")
    )
    word_rows = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(vocab_limit)
        .collect()
    )
    word_freq = {r["w"]: r["n"] for r in word_rows}
    merges = _bpe_merge_loop(word_freq, n_merges)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i + 1, a, b, a + b, c) for i, (a, b, c) in enumerate(merges)],
        "merge_rank int, left string, right string, merged string, pair_count bigint",
    )


def _bpe_merge_loop(
    word_freq: dict[str, int], n_merges: int
) -> list[tuple[str, str, int]]:
    """Classic BPE training loop over a word-frequency dict (pure
    Python, driver-side, bounded by the vocab size): repeatedly merge
    the most frequent adjacent symbol pair. Returns
    [(left, right, pair_count), ...] in merge order."""
    words: list[tuple[list[str], int]] = [
        (list(w), c) for w, c in word_freq.items() if len(w) >= 2
    ]
    out: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, c in words:
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((a, b, c))
        merged = a + b
        for i, (sym, cnt) in enumerate(words):
            j, new = 0, []
            while j < len(sym):
                if j + 1 < len(sym) and sym[j] == a and sym[j + 1] == b:
                    new.append(merged)
                    j += 2
                else:
                    new.append(sym[j])
                    j += 1
            words[i] = (new, cnt)
    return out


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    pre_tokenized: DataFrame | None = None,
) -> DataFrame:
    """Apply learned BPE merges (:func:`bpe_train_merges`) to the corpus
    — the tokenizer ENCODE side. Returns (id, tokens array<string>).

    Scale shape: the greedy merge walk runs once per DISTINCT word, not
    per occurrence — `distinct words` is vocab-sized while the corpus is
    not, so the Python kernel's work is bounded regardless of corpus
    volume. The (word → subtokens) dictionary then joins back to the
    position-exploded corpus — the join strategy is left to AQE, which
    broadcasts the dictionary when its runtime size is under the
    broadcast threshold and falls back to a shuffle on the word key for
    long-tail distinct-word sets (no forced hint: the distinct-word set
    of a large corpus is unbounded) — and documents reassemble with one
    groupBy on the id, the same join-back-a-dictionary shape as the zone
    map and corpus-bands stores.

    ``pre_tokenized`` (optional) is an already-exploded token frame with
    ``(doc_id, pos, w)`` columns — one row per non-empty token with its
    position from the SAME posexplode-of-split this function would run.
    The join probe side and the distinct-word vocabulary both derive
    from it, so a caller that persists one tokenized frame (and shares
    it with :func:`bpe_train_merges`) pays the corpus explode once
    instead of per consumer; plan semantics are otherwise unchanged.
    """
    import pandas as pd
    from pyspark.sql import types as T

    ranks = {pair: i for i, pair in enumerate(merges)}

    def _encode_word(w: str) -> list[str]:
        sym = list(w)
        while len(sym) >= 2:
            best, best_rank = None, None
            for i, pair in enumerate(zip(sym, sym[1:])):
                r = ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            sym[best : best + 2] = [sym[best] + sym[best + 1]]
        return sym

    enc_schema = T.StructType(
        [
            T.StructField("w", T.StringType()),
            T.StructField("subtokens", T.ArrayType(T.StringType())),
        ]
    )

    def _kernel(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"w": pdf["w"], "subtokens": [_encode_word(w) for w in pdf["w"]]}
            )

    if pre_tokenized is not None:
        missing = {"doc_id", "pos", "w"}.difference(pre_tokenized.columns)
        if missing:
            raise ValueError(
                "pre_tokenized frame must have (doc_id, pos, w) columns; "
                f"missing {sorted(missing)}"
            )
    words = (
        pre_tokenized
        if pre_tokenized is not None
        else df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("pos", "w"),
        ).filter(F.col("w") != "")
    )
    vocab = words.select("w").distinct().mapInPandas(_kernel, enc_schema)
    return (
        words.join(vocab, "w")
        .select("doc_id", "pos", "subtokens")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("subtokens")))
                    ),
                    lambda s: s["subtokens"],
                )
            ).alias("tokens")
        )
        .select(F.col("doc_id").alias(id_col), "tokens")
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Per-document top-k terms by TF-IDF — the classic keyword-extraction
    / topic-signal operator (score = tf · ln(N / df)).

    Shuffle story at 100 TB: term frequency is computed IN-ROW with
    higher-order array expressions (the :func:`gopher_rules` trick — no
    corpus explode for tf); the only corpus-wide aggregations are the
    document-frequency groupBy (map-side-combined, vocab-sized output)
    and the corpus count (single row, broadcast back); the scoring join
    is keyed on the term like the df groupBy before it, and the final
    top-k window partitions by document — per-doc state, never a global
    sort.
    """
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators._parallel import ensure_min_parallelism

    df = ensure_min_parallelism(df)  # CPU-bound per-row stage: single-split inputs parallelize (no-op at scale)
    words = tokenize(F.col(text_col))
    terms = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.transform(
                F.array_distinct(words),
                lambda w: F.struct(
                    w.alias("term"),
                    F.size(F.filter(words, lambda x: x == w)).alias("tf"),
                ),
            )
        ).alias("t"),
    ).select("doc_id", F.col("t.term").alias("term"), F.col("t.tf").alias("tf"))
    doc_freq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        terms.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select("doc_id", "term", "tf", "df", F.round("tfidf", 6).alias("tfidf"), "term_rank")
    )


def _bloom_build_hashed(h1_list, h2_list, n_bits: int, n_hashes: int):
    """Bloom bitmap over PRE-HASHED keys (two independent 64-bit hashes
    per key, e.g. ``xxhash64(gram, 1)`` / ``xxhash64(gram, 2)`` computed
    JVM-side): double hashing ``pos_i = (h1 + i·h2) mod n_bits``. The
    string→hash step stays inside whole-stage codegen, so neither build
    nor probe ever string-hashes in Python."""
    import numpy as np

    bitmap = np.zeros((n_bits + 63) // 64, dtype=np.uint64)
    if len(h1_list):
        h1 = np.asarray(h1_list, dtype=np.int64).astype(np.uint64)
        h2 = np.asarray(h2_list, dtype=np.int64).astype(np.uint64)
        for i in range(n_hashes):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
            np.bitwise_or.at(bitmap, pos >> np.uint64(6), np.uint64(1) << (pos & np.uint64(63)))
    return bitmap


def _bloom_probe_hashed(h1, h2, bitmap, n_bits: int, n_hashes: int):
    """Probe twin of :func:`_bloom_build_hashed` over two int64 numpy /
    pandas arrays. Returns a boolean mask."""
    import numpy as np

    if len(h1) == 0:
        return np.zeros(0, dtype=bool)
    a = np.asarray(h1, dtype=np.int64).astype(np.uint64)
    b = np.asarray(h2, dtype=np.int64).astype(np.uint64)
    hit = np.ones(len(a), dtype=bool)
    for i in range(n_hashes):
        pos = (a + np.uint64(i) * b) % np.uint64(n_bits)
        hit &= (bitmap[pos >> np.uint64(6)] >> (pos & np.uint64(63))) & np.uint64(1) != 0
    return hit


def contamination_screen_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    bits_per_key: int = 12,
    n_hashes: int = 6,
) -> DataFrame:
    """Bloom-prefiltered twin of :func:`contamination_screen` — same
    output, built for the benchmark-suite-is-big case.

    The exact variant broadcasts the benchmark's DISTINCT n-gram
    STRINGS and left-joins every corpus gram against them. At 100 TB
    with a real eval suite (tens of millions of grams) that broadcast
    is GBs of strings and every corpus gram pays a hash-table probe
    inside the join. Here the gram set is compiled ONCE into a Bloom
    BITMAP (``bits_per_key`` bits/gram ≈ 1.5 bytes — a ~30× smaller
    ship than the strings; 12 bits × 6 hashes ⇒ ~0.1% FP) carried in
    the probe closure like the query matrix in ``cosine_topk_blas``.
    Corpus grams drop non-members MAP-SIDE, so only candidates (true
    hits + ~0.1% FPs) reach the exact confirm semi-join that restores
    exactness — the join's probe side shrinks from
    every-gram-in-the-corpus to approximately-the-contaminated ones.

    The Python boundary carries two int64 hash columns per gram, never
    the gram strings (r19, guide §4): ``xxhash64(gram, 1|2)`` is
    computed inside whole-stage codegen on BOTH sides, the driver
    collects hash pairs (16 bytes/key) instead of key strings to build
    the bitmap, and the vectorized probe is a boolean pandas UDF over
    the two hash columns — ~16 bytes/row across Arrow instead of
    ~n-word strings, and zero Python string hashing. Per-doc totals are
    pure token-count arithmetic (``max(n_tokens − n + 1, 0)``) — no
    second gram-string construction pass. The benchmark gram frame is
    persisted (bounded by the eval suite) and feeds both the bitmap
    build and the confirm join, one derivation.

    False positives cannot leak into the result (confirm join is
    exact); false negatives are impossible by Bloom construction — so
    the output is bit-identical to :func:`contamination_screen`, and
    the same SQL oracle checks both.
    """
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators._cache import scoped_persist

    grams_expr = word_shingles(tokenize(F.col(text_col)), n)

    bench_grams = scoped_persist(
        benchmark.select(F.explode(grams_expr).alias("gram")).distinct(),
        "text.contamination_bloom.bench_grams",
    )
    hash_rows = bench_grams.select(
        F.xxhash64("gram", F.lit(1)).alias("h1"),
        F.xxhash64("gram", F.lit(2)).alias("h2"),
    ).collect()
    n_bits = max(64, bits_per_key * max(len(hash_rows), 1))
    bitmap = _bloom_build_hashed(
        [r["h1"] for r in hash_rows], [r["h2"] for r in hash_rows], n_bits, n_hashes
    )

    @F.pandas_udf("boolean")
    def _maybe_contaminated(h1: pd.Series, h2: pd.Series) -> pd.Series:
        return pd.Series(_bloom_probe_hashed(h1, h2, bitmap, n_bits, n_hashes))

    doc_grams = docs.select(F.col(id_col), F.explode(grams_expr).alias("gram"))
    candidates = doc_grams.filter(
        # nondeterministic mark (guide §4.4): keeps the optimizer from
        # cloning the probe above AND below a pushed-down filter — the
        # mask is pure, the mark only pins one evaluation per row
        _maybe_contaminated.asNondeterministic()(
            F.xxhash64("gram", F.lit(1)), F.xxhash64("gram", F.lit(2))
        )
    )
    # exact confirm: kill Bloom false positives; gram-level inner join,
    # then per-doc hit counts (candidate rows only — tiny at this point)
    hits = (
        candidates.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    # n_grams is arithmetic on the token count — identical to
    # size(word_shingles(...)) (size−n+1 when ≥n tokens, else 0) without
    # re-building every gram string just to count them
    n_tok = F.size(tokenize(F.col(text_col)))
    totals = docs.select(
        F.col(id_col),
        F.when(n_tok >= n, (n_tok - (n - 1)).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("n_grams"),
    )
    return (
        totals.join(hits, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long").alias("n_contaminated"),
        )
        .withColumn(
            "contaminated_frac",
            F.round(
                F.col("n_contaminated")
                / F.greatest(F.col("n_grams"), F.lit(1)).cast("double"),
                4,
            ),
        )
        .withColumn("flagged", F.col("n_contaminated") > 0)
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranked retrieval for a fixed query — the lexical-search
    scoring standard (Robertson-Spärck Jones / Okapi):

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
        idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))

    Shuffle story at 100 TB: nothing is exploded. Per-doc tf for each
    QUERY term is computed in-row with higher-order array filters
    (work bounded by |query|·doc_len, the :func:`tfidf_top_terms`
    trick), so the corpus is touched in two NARROW passes (the stats
    aggregate and the scorer — nothing exploded in either); the only
    aggregates are a single metadata-sized row carrying N, avgdl, and
    the per-query-term document frequencies (|query| columns),
    broadcast back for scoring. Top-k is orderBy+limit —
    per-partition heaps, no global sort materialization. Zero-score
    docs (no query term present) are dropped.
    """
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators._parallel import ensure_min_parallelism

    df = ensure_min_parallelism(df)  # CPU-bound per-row stage: single-split inputs parallelize (no-op at scale)
    words = tokenize(F.col(text_col))
    per_doc = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).alias("dl"),
        *[
            F.size(F.filter(words, lambda x: x == F.lit(t))).alias(f"__tf_{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(query_terms)):
        tf = F.col(f"__tf_{i}")
        dfc = F.col(f"__df_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n") - dfc + F.lit(0.5)) / (dfc + F.lit(0.5))
        )
        part = idf * tf * F.lit(k1 + 1) / (
            tf + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("__avgdl"))
        )
        score = part if score is None else score + part
    return (
        scored.withColumn("__score", score)
        .filter(F.col("__score") > 0)
        .orderBy(F.desc("__score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", F.round("__score", 6).alias("bm25"))
    )


def repetition_signals(
    df: DataFrame, id_col: str, text_col: str, carry_cols: list | None = None
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1 "repetition removal") — excessive self-repetition is the
    strongest single predictor of low-quality scraped text:

    * ``top_word_char_frac`` — fraction of word characters belonging to
      the most frequent word (ties resolved toward the larger character
      mass, so the value is order-independent).
    * ``dup_bigram_frac`` / ``dup_trigram_frac`` — fraction of n-gram
      slots that are repeats of an earlier-seen n-gram
      (``1 − distinct/total``).
    * ``repetition_keep`` — the filter verdict (thresholds from the
      Gopher paper scaled to short synthetic docs).

    ``carry_cols``: input columns (or pre-computed per-row expressions
    the caller attached with ``withColumn``) to ride through into the
    output — all signals are per-row expressions over one scan, so a
    caller that needs the verdict NEXT TO other per-doc columns gets
    them from the same scan instead of joining a second one back on
    the id. Names must not collide with the signal columns.

    Shuffle story at 100 TB: every signal is a per-row higher-order
    array expression (transform/filter/array_distinct) — zero shuffles,
    zero UDFs, whole-stage codegen end to end. The per-row work is
    O(distinct_words · doc_len) for the top-word scan, bounded by
    document length, and embarrassingly parallel.
    """
    words = tokenize(F.col(text_col))
    # Top word by (count, then char mass among tied counts) via a single
    # run-length scan over the SORTED word array — O(L log L) per doc,
    # not the O(distinct·L) a per-word filter scan costs (which turns
    # quadratic on real 10k-token web documents). Within a run of equal
    # words, (run, run·len) grows monotonically, so folding the max at
    # every element is exact.
    sorted_words = F.array_sort(words)
    top = F.aggregate(
        sorted_words,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("c"),
            F.lit(0).cast("long").alias("chars"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            *(
                lambda run: [
                    F.greatest(acc["c"], run).alias("c"),
                    F.when(
                        (run > acc["c"])
                        | ((run == acc["c"]) & (run * F.length(x) > acc["chars"])),
                        run * F.length(x),
                    )
                    .otherwise(acc["chars"])
                    .alias("chars"),
                ]
            )(
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1).cast("long")
                )
            ),
        ),
    )
    total_chars = F.aggregate(
        F.transform(words, F.length), F.lit(0), lambda acc, x: acc + x
    )

    def dup_frac(n: int) -> Column:
        # Total n-gram count is pure arithmetic (size − n + 1) — the gram
        # array is built ONCE, inside array_distinct, as STRUCTS of the
        # n words (no slice+concat string building; injective vs the
        # oracle's space-joined strings since words contain no spaces).
        # The when() guard keeps the branch unevaluated for short docs,
        # so sequence() never sees a stop < 1 (it would descend).
        total = F.size(words) - (n - 1)
        grams = F.transform(
            F.sequence(F.lit(1), total),
            lambda i: F.struct(
                *[F.element_at(words, i + j).alias(f"w{j}") for j in range(n)]
            ),
        )
        return F.when(
            total > 0,
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct(grams)) / total.cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0))

    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators._parallel import ensure_min_parallelism

    carry = list(carry_cols or [])
    reserved = {
        id_col, "n_words", "top_word_char_frac",
        "dup_bigram_frac", "dup_trigram_frac", "repetition_keep",
    }
    bad = reserved.intersection(carry)
    if bad:
        raise ValueError(f"carry_cols collide with output columns: {sorted(bad)}")
    df = ensure_min_parallelism(df)
    out = df.select(
        F.col(id_col),
        F.size(words).alias("n_words"),
        F.round(top["chars"] / total_chars.cast("double"), 6).alias(
            "top_word_char_frac"
        ),
        dup_frac(2).alias("dup_bigram_frac"),
        dup_frac(3).alias("dup_trigram_frac"),
        *carry,
    )
    return out.withColumn(
        "repetition_keep",
        (
            (F.col("top_word_char_frac") <= 0.2)
            & (F.col("dup_bigram_frac") <= 0.35)
            & (F.col("dup_trigram_frac") <= 0.2)
        ).cast("int"),
    )


def normalize_unicode(
    df: DataFrame, id_col: str, text_col: str, batch_hint: int = 10_000
) -> DataFrame:
    """Unicode canonicalization — NFC-normalize, strip C0/C1 control
    characters (keeping ``\\n``/``\\t`` as whitespace), and collapse
    whitespace runs to single spaces. Mixed NFC/NFD crawl text defeats
    exact and hash dedup (visually identical strings hash differently);
    this is the canonical first pass before any fingerprinting.

    Spark has no built-in NFC transform, so this is the documented
    Python-unavoidable path: an Arrow-batched ``mapInPandas`` kernel
    (``unicodedata.normalize`` is C-implemented; the batch loop is
    vectorized string ops otherwise). Narrow map — zero shuffles; the
    output ``changed`` flag lets a writer short-circuit rewriting
    already-canonical partitions.
    """
    import re as _re
    import unicodedata as _ud

    schema = f"{id_col} long, norm_text string, changed int"
    ctrl = _re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]")
    ws = _re.compile(r"\s+")

    src = df.select(F.col(id_col), F.col(text_col).alias("__t"))

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            t = pdf["__t"].astype("string").fillna("")
            normed = t.map(
                lambda s: ws.sub(" ", ctrl.sub(" ", _ud.normalize("NFC", s))).strip()
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "norm_text": normed,
                    "changed": (normed != t).astype("int32"),
                }
            )

    return src.mapInPandas(kernel, schema=schema)


def compression_quality(
    df: DataFrame, id_col: str, text_col: str, level: int = 6
) -> DataFrame:
    """Per-document zlib compression ratio — the CCNet/RedPajama-class
    quality heuristic the rule-based filters miss: machine-generated
    boilerplate and template spam compress far below natural text,
    random gibberish barely compresses at all. Emits
    ``compress_ratio = deflated_bytes / raw_bytes`` (lower = more
    redundant) plus the raw byte length.

    DEFLATE has no SQL twin, so this operator is pytest-pinned rather
    than DuckDB-oracled (the documented weaker gate). Arrow-batched
    mapInPandas — zlib is C-implemented; narrow map, zero shuffles,
    small-input parallelism guard applied like the other CPU-bound
    per-row kernels.
    """
    import zlib as _zlib

    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators._parallel import ensure_min_parallelism

    schema = f"{id_col} long, raw_bytes int, compress_ratio double"
    src = ensure_min_parallelism(df.select(F.col(id_col), F.col(text_col).alias("__t")))

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            raws = pdf["__t"].astype("string").fillna("").map(lambda s: s.encode("utf-8"))
            n = raws.map(len)
            ratio = [
                (len(_zlib.compress(b, level)) / ln) if ln else 1.0
                for b, ln in zip(raws, n)
            ]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "raw_bytes": n.astype("int32"), "compress_ratio": ratio}
            )

    return src.mapInPandas(kernel, schema=schema)


def bigram_nll(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document BIGRAM negative log-likelihood with add-one
    smoothing — the conditional upgrade of :func:`unigram_nll`: a
    document whose word PAIRS are improbable given the corpus (even
    when each word alone is common) is word salad, the exact failure
    unigram perplexity can't see.

        NLL(d) = mean over bigrams of  ln(c(w1)+V) − ln(c(w1,w2)+1)

    (the add-one model P(w2|w1) = (c12+1)/(c1+V), algebraically split
    so UNSEEN bigrams contribute ln(c1+V) with no dense model — the
    same sparse-join rearrangement as the Naive Bayes classifier).
    Plan: one bigram-keyed groupBy for the pair model, one word-keyed
    for contexts, both broadcast-gated joins back onto the exploded
    bigrams, one doc-keyed mean. Everything map-side-combinable."""
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators._parallel import ensure_min_parallelism

    df = ensure_min_parallelism(df)  # CPU-bound per-row stage: single-split inputs parallelize (no-op at scale)
    words = tokenize(F.col(text_col))
    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(words, 2)).alias("bg"),
    )
    pair = grams.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    # V (vocab size) is computed INSIDE the ctx aggregate with a global
    # window: ctx is already vocab-sized and broadcast right after, so
    # the single-partition window is cheap — and ctx's corpus-scan
    # lineage is derived exactly once, with no persist to leak across
    # repeated invocations in a long-lived session.
    ctx = (
        df.select(F.explode(words).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
        .withColumn(
            "v", F.count(F.lit(1)).over(W.partitionBy()).cast("double")
        )
    )
    w1 = F.split(F.col("bg"), " ").getItem(0)
    return (
        grams.withColumn("w", w1)
        .join(F.broadcast(pair), "bg")
        .join(F.broadcast(ctx), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(
                    F.log(F.col("c1") + F.col("v")) - F.log(F.col("c12") + 1)
                ),
                3,
            ).alias("mean_bigram_nll"),
        )
    )


def readability(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Flesch-style readability proxy: words per sentence and vowel-group
    "syllables" per word, combined with the classic Flesch reading-ease
    weights. On punctuation-free corpora the sentence count floors at 1
    (the formula degrades gracefully to a per-doc length/complexity
    blend). Pure regexp_count arithmetic — narrow map, zero shuffles."""
    text = F.col(text_col)
    n_words = token_count(text).cast("double")
    n_sent = F.greatest(
        F.regexp_count(text, F.lit(r"[.!?]+")), F.lit(1)
    ).cast("double")
    n_syll = F.greatest(
        F.regexp_count(F.lower(text), F.lit(r"[aeiouy]+")), F.lit(1)
    ).cast("double")
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words / n_sent)
        - F.lit(84.6) * (n_syll / n_words)
    )
    return df.select(
        F.col(id_col),
        n_words.cast("int").alias("n_words"),
        n_syll.cast("int").alias("n_syllable_groups"),
        F.round(score, 4).alias("flesch_score"),
    )
