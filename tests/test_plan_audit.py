"""Structural plan audit across the catalog: the two pathologies that
silently kill 100-TB scale — row-at-a-time Python evaluation
(BatchEvalPython; every Python kernel in this repo must ride Arrow) and
cartesian products — must not appear in any compute query's physical
plan. Fixture-backed keys (filesystem layouts, streaming, media stores)
are skipped: their plans depend on fixture state and their scale
properties are pinned by their own dedicated tests.
"""

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.queries.catalog import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# fixture-building / streaming / filesystem-dependent keys
_SKIP_PREFIXES = (
    "scan_",
    "sink_",
    "stream_",
    "source_",
    "probe_",
    "ddl_",
    "backfill",
    "rollup_",
    "cluster_",
    "stats_",
    "partition_",
    "job_",
    "multimodal_",
    "filter_require",
    "fn_uuid",
    "dedup_incremental",
    "ann_ivf_pq",
)


def test_no_row_udfs_or_cartesian_products_in_compute_plans(spark):
    issues = []
    checked = 0
    for name, fn in QUERIES.items():
        if any(name.startswith(p) for p in _SKIP_PREFIXES):
            continue
        checked += 1
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        if "BatchEvalPython" in plan:
            issues.append(f"{name}: row-at-a-time Python UDF (BatchEvalPython)")
        if "CartesianProduct" in plan:
            issues.append(f"{name}: CartesianProduct")
    assert checked > 100  # the audit must actually cover the catalog
    assert not issues, "\n".join(issues)
