"""Production-twin vs oracle-twin cross-checks.

Four catalog queries are rows-only by design: their production operators
use engine-side hashing (xxhash64 hyperplanes/hash families, k-means
centroids) that no portable SQL oracle can reproduce, so the DuckDB
value check runs against an md5/seeded twin instead. These tests close
the remaining gap — "does the fast twin actually compute the same
THING?" — by asserting behavioral agreement between each production
path and its value-checked twin on the same input:

* MinHash: with identical (num_hashes, bands, threshold) parameters the
  two hash families must produce near-identical candidate-pair sets,
  and both must recover every planted near-duplicate.
* SimHash: different 60/64-bit hash families legitimately disagree on
  borderline pairs (the fixture has no real near-dups, so its ≤12-bit
  candidates are threshold noise — set equality is NOT an invariant;
  even hamming-0 pairs are family-specific collisions). The invariant
  that must hold: both families recover planted one-token-edit
  near-duplicates, and their candidate volumes agree to a constant.
* LSH / IVF top-k: different hyperplanes/centroids bucket differently,
  so result overlap with each other is weak — the invariant is that
  every neighbor either twin returns is a genuinely near neighbor
  (inside the exact cosine top-50), with exactly k results per query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators import dedup as D
from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators import (
    similarity as SIM,
)
from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.sources.tables import (
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="module")
def planted(spark, docs):
    """50 base docs plus a one-token-edit near-duplicate of each
    (doc_id + 10000): ground-truth near-dup pairs for recall checks."""
    base = docs.filter(F.col("doc_id") < 50).cache()
    dups = base.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzextra")).alias("text"),
    )
    corpus = base.unionByName(dups).cache()
    pairs = {(r.doc_id, r.doc_id + 10000) for r in base.select("doc_id").collect()}
    return corpus, pairs


def test_minhash_twins_same_candidates_same_params(docs):
    """With the hash family as the ONLY difference, the xxhash64
    production path and the md5 oracle path must produce near-identical
    LSH candidate sets (empirically identical on the fixture; the bound
    leaves room for borderline est_jaccard flips)."""
    sp = D.minhash_signatures(docs, "doc_id", "text", num_hashes=32, shingle_size=3)
    prod = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_lsh_pairs(sp, num_bands=8, threshold=0.3, num_hashes=32).collect()
    }
    so = D.minhash_signatures_md5(docs, "doc_id", "text", num_hashes=32)
    orc = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_lsh_pairs(
            so, num_bands=8, threshold=0.3, num_hashes=32, hash_buckets=False
        ).collect()
    }
    assert prod and orc
    assert abs(len(prod) - len(orc)) <= 0.25 * max(len(prod), len(orc))
    jac = len(prod & orc) / len(prod | orc)
    assert jac >= 0.8, f"minhash twin candidate sets diverged: jaccard={jac:.2f}"


def test_minhash_twins_recover_planted_neardups(planted):
    corpus, want = planted
    sp = D.minhash_signatures(corpus, "doc_id", "text", num_hashes=32, shingle_size=3)
    prod = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_lsh_pairs(sp, num_bands=8, threshold=0.3, num_hashes=32).collect()
    }
    so = D.minhash_signatures_md5(corpus, "doc_id", "text", num_hashes=32)
    orc = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_lsh_pairs(
            so, num_bands=8, threshold=0.3, num_hashes=32, hash_buckets=False
        ).collect()
    }
    assert len(want & prod) >= 0.95 * len(want)
    assert len(want & orc) >= 0.95 * len(want)


def test_simhash_twins_recover_planted_neardups(planted):
    """Both the 64-bit xxhash64 production family and the 60-bit md5
    oracle family must flag a one-token-edit duplicate as near (≤ 12
    bits); short documents may flip enough weighted bits to escape, so
    the bound is 90% recall, and the candidate volumes must agree to a
    constant factor."""
    corpus, want = planted
    prod = {
        (r.doc_a, r.doc_b)
        for r in D.simhash_near_pairs(D.simhash(corpus, "doc_id", "text"), max_hamming=12).collect()
    }
    orc = {
        (r.doc_a, r.doc_b)
        for r in D.simhash_near_pairs_md5(
            D.simhash_md5(corpus, "doc_id", "text"), max_hamming=12
        ).collect()
    }
    assert len(want & prod) >= 0.9 * len(want), f"prod recall {len(want & prod)}/{len(want)}"
    assert len(want & orc) >= 0.9 * len(want), f"oracle recall {len(want & orc)}/{len(want)}"
    assert max(len(prod), len(orc)) <= 1.5 * min(len(prod), len(orc))


def test_lsh_topk_twins_return_true_neighbors(emb):
    """Different hyperplane families bucket differently, so the twins'
    result sets legitimately differ — but anything EITHER returns must
    be a real near neighbor (exact cosine top-50 of 500 vectors), with
    exactly k rows per query."""
    q = emb.filter(F.col("vec_id") < 5)
    exact50 = {(r.query_id, r.vec_id) for r in SIM.cosine_topk(emb, q, k=50).collect()}
    for fn in (SIM.lsh_bucket_topk, SIM.lsh_bucket_topk_md5):
        rows = fn(emb, q, k=3, num_planes=4, dim=64).collect()
        per_query: dict[int, int] = {}
        for r in rows:
            per_query[r.query_id] = per_query.get(r.query_id, 0) + 1
            assert (r.query_id, r.vec_id) in exact50, (
                f"{fn.__name__} returned a non-neighbor: {(r.query_id, r.vec_id)}"
            )
        assert set(per_query.values()) == {3}, per_query


def test_ivf_twins_agree_and_return_true_neighbors(emb):
    """k-means centroids (production) vs seed-vector centroids (oracle
    twin): cell boundaries differ, but ≥ 2/3 of the top-k results must
    coincide and every result from both must sit in the exact top-50."""
    q = emb.filter(F.col("vec_id") < 5)
    exact50 = {(r.query_id, r.vec_id) for r in SIM.cosine_topk(emb, q, k=50).collect()}
    kmeans = {
        (r.query_id, r.vec_id)
        for r in SIM.ivf_topk(emb, q, k=3, nlist=8, nprobe=3).collect()
    }
    fixed = {
        (r.query_id, r.vec_id)
        for r in SIM.ivf_topk_fixed(emb, q, k=3, nlist=8, nprobe=3).collect()
    }
    assert len(kmeans) == len(fixed) == 15
    assert kmeans <= exact50 and fixed <= exact50
    assert len(kmeans & fixed) >= 10, f"IVF twins agree on only {len(kmeans & fixed)}/15"
