"""Mechanical enforcement of the oracle cast convention (r11 verdict
task 2): every ``oracle_sql()`` string must produce DuckDB result types
that canonicalize identically to the Spark twin's schema under the
driver's value-hash comparison.

The class of miss this pins: DuckDB widens bare integer aggregates —
``sum(BIGINT)`` returns HUGEINT, arithmetic on decimals returns DECIMAL
— while Spark returns LONG/DOUBLE. Values can be numerically identical
yet hash-mismatch in the driver (exactly the r11 ``ann_store_trained``
red row). The repo convention is explicit ``CAST(... AS BIGINT)`` /
``CAST(... AS DOUBLE)`` in the oracle string; this test runs EVERY
oracle through DuckDB at sf0.001 and fails at pytest time on any
engine-divergent column type, so a bare ``sum()`` can never reach the
driver window again.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)

# DuckDB type names that have no same-hash Spark twin: HUGEINT/UHUGEINT
# (int128 — Spark's widest integral is LONG) and DECIMAL (Spark queries
# in this catalog return LONG/DOUBLE, never DecimalType; a DECIMAL
# oracle column means un-cast decimal arithmetic leaked through).
_DIVERGENT = ("HUGEINT", "UHUGEINT", "DECIMAL", "INT128")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _divergent_columns(con, sql: str):
    rel = con.sql(sql)
    return [
        (col, str(typ).upper())
        for col, typ in zip(rel.columns, rel.types)
        if any(d in str(typ).upper() for d in _DIVERGENT)
    ]


def test_every_oracle_resolves_in_duckdb(con):
    """Every oracle must PLAN standalone on the ten pre-registered views
    (the driver gives it nothing else) — a typo'd table/column fails
    here instead of in the driver window."""
    errors = {}
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.sql(sql)
        except Exception as exc:  # noqa: BLE001 — collecting all failures
            errors[name] = str(exc)[:200]
    assert not errors, f"oracles that no longer resolve in DuckDB: {errors}"


def test_no_engine_divergent_oracle_types(con):
    """No oracle column may carry a DuckDB-only widened type."""
    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        try:
            bad = _divergent_columns(con, sql)
        except Exception:
            continue  # resolution failures are the other test's job
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle columns with engine-divergent types (add CAST(... AS "
        f"BIGINT/DOUBLE) per the repo convention): {offenders}"
    )


def test_detector_catches_seeded_bare_sum(con):
    """The detector itself must flag the exact r11 miss: a bare
    ``sum(BIGINT)`` (DuckDB HUGEINT) with no cast."""
    seeded = "SELECT sum(vec_id) AS id_sum FROM embeddings"
    assert _divergent_columns(con, seeded) == [("id_sum", "HUGEINT")]
    fixed = "SELECT CAST(sum(vec_id) AS BIGINT) AS id_sum FROM embeddings"
    assert _divergent_columns(con, fixed) == []
