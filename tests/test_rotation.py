"""Unit tests for the evidence-derived driver-window rotation — the
mechanism that decides which 50 catalog keys the external harness
verifies each round. Load-bearing and previously untested: a silent
mis-ordering costs a round of driver evidence."""

import json
import warnings

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.queries.rotation import (
    build_driver_window,
    last_green_round,
)


def _write_evidence(tmp_path, rnd, rows):
    (tmp_path / f"CORRECTNESS_r{rnd}.json").write_text(json.dumps(rows))


def _green():
    return {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}


def _red():
    return {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}


def test_last_green_round_takes_latest_fully_green_row(tmp_path):
    _write_evidence(tmp_path, 1, {"a": _green(), "b": _green()})
    _write_evidence(tmp_path, 2, {"a": _green(), "b": _red()})
    ev = last_green_round(repo_root=str(tmp_path))
    assert ev == {"a": 2, "b": 1}  # b's r2 row was not fully green


def test_window_orders_queue_then_oldest_evidence_first(tmp_path):
    _write_evidence(tmp_path, 1, {"old1": _green(), "old2": _green()})
    _write_evidence(tmp_path, 2, {"old2": _green(), "fresh": _green()})
    keys = ["fresh", "old1", "old2", "brandnew", "queued"]
    w = build_driver_window(
        keys, ["queued"], size=4, repo_root=str(tmp_path), queue_round=3
    )
    # queue first; then never-green (age 0) before r1 before the age-2
    # tie, which breaks by name ("fresh" < "old2")
    assert w == ["queued", "brandnew", "old1", "fresh"]


def test_queue_retires_once_declared_round_evidence_lands(tmp_path):
    _write_evidence(tmp_path, 8, {"q1": _green(), "other": _green()})
    keys = ["a", "other", "q1", "q2"]
    w = build_driver_window(
        keys, ["q1", "q2"], size=3, repo_root=str(tmp_path), queue_round=8
    )
    # q1 earned its round-8 row -> retired from the front; q2 still owes
    assert w[0] == "q2"
    assert w[1] == "a"  # never-green keys lead the stale pool
    assert "q1" not in w[:1]


def test_queue_survives_older_evidence(tmp_path):
    # a changed-implementation key with only OLD green rows stays queued
    _write_evidence(tmp_path, 7, {"changed": _green()})
    w = build_driver_window(
        ["changed", "x"], ["changed"], size=2, repo_root=str(tmp_path), queue_round=8
    )
    assert w == ["changed", "x"]


def test_missing_evidence_warns_and_degrades_to_queue_plus_name_order(tmp_path):
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        w = build_driver_window(
            ["b", "a", "q"], ["q"], size=3, repo_root=str(tmp_path), queue_round=1
        )
    assert w == ["q", "a", "b"]
    assert any("no CORRECTNESS" in str(c.message) for c in caught)
