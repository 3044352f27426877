"""Driver-contract invariants for __spark_entry__.py: every oracle key
has a query, every query is callable, and names stay collision-free.
Cheap guards against catalog wiring regressions."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod


def test_oracle_keys_subset_of_queries():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs), sorted(set(os_) - set(qs))


def test_all_queries_callable_and_named():
    qs = entry_mod.queries()
    assert len(qs) >= 70
    for name, fn in qs.items():
        assert callable(fn), name
        assert name == name.lower() and " " not in name


def test_rows_only_queries_are_the_documented_four():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    rows_only = sorted(set(qs) - set(os_))
    assert rows_only == [
        "ann_ivf_topk",
        "ann_lsh_topk",
        "dedup_minhash_lsh",
        "dedup_simhash",
    ]
