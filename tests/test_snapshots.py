"""Snapshot-table invariants (operators/snapshots.py): manifest-last
visibility, time travel, append vs overwrite semantics, and the
manifest-pruned CDC fast path."""

import json
import os
import shutil

import pytest

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.snapshots import (
    read_snapshot,
    snapshot_diff,
    snapshot_versions,
    write_snapshot,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "snaps")


def _df(spark, rows):
    return spark.createDataFrame(rows, ["id", "v"]).coalesce(1)


def test_versions_and_time_travel(spark, root):
    assert snapshot_versions(spark, root) == []
    assert write_snapshot(spark, _df(spark, [(1, "a")]), root) == 1
    assert write_snapshot(spark, _df(spark, [(2, "b")]), root) == 2
    assert snapshot_versions(spark, root) == [1, 2]
    assert read_snapshot(spark, root, 1).count() == 1
    assert read_snapshot(spark, root, 2).count() == 2  # append accumulates
    assert read_snapshot(spark, root).count() == 2  # latest default


def test_uncommitted_data_dir_is_invisible(spark, root):
    write_snapshot(spark, _df(spark, [(1, "a")]), root)
    # simulate a crashed writer: data dir exists, manifest never landed
    _df(spark, [(99, "zz")]).write.parquet(f"{root}/data/v00000002")
    assert snapshot_versions(spark, root) == [1]
    assert read_snapshot(spark, root).count() == 1
    # the next commit skips over the orphan version number? No — it
    # reuses manifest numbering (single-writer), and the orphan dir
    # would collide. The writer must fail loudly, not silently merge.
    with pytest.raises(Exception):
        write_snapshot(spark, _df(spark, [(3, "c")]), root)


def test_overwrite_is_logical_truncate_with_history(spark, root):
    write_snapshot(spark, _df(spark, [(1, "a"), (2, "b")]), root)
    write_snapshot(spark, _df(spark, [(9, "z")]), root, mode="overwrite")
    assert read_snapshot(spark, root, 2).count() == 1  # truncated view
    assert read_snapshot(spark, root, 1).count() == 2  # history intact


def test_diff_fast_path_reads_only_delta_files(spark, root):
    write_snapshot(spark, _df(spark, [(1, "a"), (2, "b")]), root)
    write_snapshot(spark, _df(spark, [(3, "c")]), root)
    d = snapshot_diff(spark, root, 1, 2, ["id"])
    assert sorted((r["id"], r["change"]) for r in d.collect()) == [
        (3, "inserted")
    ]
    v1_files = set(read_snapshot(spark, root, 1).inputFiles())
    diff_files = set(d.inputFiles())
    # append-only history: the diff never touches version-1 files
    assert diff_files.isdisjoint(v1_files)
    assert len(diff_files) >= 1


def test_diff_slow_path_classifies_all_changes(spark, root):
    write_snapshot(spark, _df(spark, [(1, "a"), (2, "b"), (3, "c")]), root)
    write_snapshot(
        spark, _df(spark, [(1, "a"), (3, "CHANGED"), (4, "d")]), root,
        mode="overwrite",
    )
    d = snapshot_diff(spark, root, 1, 2, ["id"])
    got = sorted((r["id"], r["change"]) for r in d.collect())
    # id 1 unchanged (same digest) -> absent; 2 deleted; 3 updated; 4 inserted
    assert got == [(2, "deleted"), (3, "updated"), (4, "inserted")]


def test_manifest_carries_exact_file_list(spark, root):
    write_snapshot(spark, _df(spark, [(1, "a")]), root)
    manifest = json.loads(
        open(f"{root}/_manifest/v00000001.json").read()
    )
    assert manifest["version"] == 1
    assert manifest["n_files"] == len(manifest["files"]) == 1
    for f in manifest["files"]:
        assert os.path.exists(f.replace("file:", ""))


def test_vacuum_keeps_reachable_files_and_drops_history(spark, root):
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.snapshots import vacuum_snapshots

    write_snapshot(spark, _df(spark, [(1, "a")]), root)           # v1
    write_snapshot(spark, _df(spark, [(2, "b")]), root)           # v2 = v1+delta
    write_snapshot(spark, _df(spark, [(3, "c")]), root)           # v3 = v2+delta
    stats = vacuum_snapshots(spark, root, keep_last=2)
    assert stats["dropped_versions"] == 1
    # v1's file is still referenced by v2/v3 (append history): nothing
    # reachable may be deleted
    assert stats["deleted_files"] == 0
    assert snapshot_versions(spark, root) == [2, 3]
    assert read_snapshot(spark, root, 3).count() == 3  # intact
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, 1)  # time travel to v1 is gone


def test_vacuum_deletes_files_orphaned_by_overwrite(spark, root):
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.snapshots import vacuum_snapshots

    write_snapshot(spark, _df(spark, [(1, "a")]), root)           # v1
    write_snapshot(spark, _df(spark, [(9, "z")]), root, mode="overwrite")  # v2
    write_snapshot(spark, _df(spark, [(8, "y")]), root)           # v3 = v2+delta
    stats = vacuum_snapshots(spark, root, keep_last=2)
    # v1's file is unreachable from v2/v3 after the overwrite: deleted
    assert stats["dropped_versions"] == 1
    assert stats["deleted_files"] == 1
    assert read_snapshot(spark, root, 3).count() == 2
    assert read_snapshot(spark, root, 2).count() == 1


def test_vacuum_noop_when_history_short(spark, root):
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.snapshots import vacuum_snapshots

    write_snapshot(spark, _df(spark, [(1, "a")]), root)
    stats = vacuum_snapshots(spark, root, keep_last=2)
    assert stats == {"kept": 1, "dropped_versions": 0, "deleted_files": 0}
    assert snapshot_versions(spark, root) == [1]


def test_compact_preserves_content_and_vacuum_reclaims(spark, root):
    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.snapshots import (
        compact_snapshot,
        vacuum_snapshots,
    )

    for i in range(5):  # five tiny commits -> fragmented history
        write_snapshot(spark, _df(spark, [(i, f"v{i}")]), root)
    before = sorted(read_snapshot(spark, root).collect())
    v = compact_snapshot(spark, root, target_files=1)
    assert sorted(read_snapshot(spark, root, v).collect()) == before
    assert len(read_snapshot(spark, root, v).inputFiles()) == 1
    # prior fragmented versions still readable until vacuumed
    assert read_snapshot(spark, root, 5).count() == 5
    stats = vacuum_snapshots(spark, root, keep_last=1)
    assert stats["dropped_versions"] == 5
    assert stats["deleted_files"] == 5  # all fragments unreachable now
    assert sorted(read_snapshot(spark, root).collect()) == before


def test_diff_upsert_append_routes_through_digest_path(spark, root):
    """An append that RE-ADDS existing keys (upsert-style append) must
    not ride the append-only fast path: the fast path's key probe
    detects the overlap and the digest comparison labels re-added keys
    'updated' (value changed) or omits them (identical row) — never a
    duplicate-key 'inserted' row."""
    write_snapshot(spark, _df(spark, [(1, "a"), (2, "b")]), root)
    # append re-adds key 1 with a new value, key 2 unchanged, key 3 new
    write_snapshot(
        spark, _df(spark, [(1, "CHANGED"), (2, "b"), (3, "c")]), root
    )
    d = snapshot_diff(spark, root, 1, 2, ["id"])
    rows = sorted((r["id"], r["change"]) for r in d.collect())
    assert rows == [(1, "updated"), (3, "inserted")]


def test_merge_upsert_missing_table_root_raises(spark, tmp_path):
    """MERGE maintains an existing table; it must never create one
    (create-never contract) — merging into an absent table root raises
    instead of silently materializing a new table."""
    import pytest as _pytest

    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.sink import (
        TableNotFoundError,
        merge_upsert_partition,
    )

    updates = _df(spark, [(1, "a")])
    with _pytest.raises(TableNotFoundError):
        merge_upsert_partition(
            spark, str(tmp_path / "nope"), updates, "2024010100", ["id"]
        )
