"""Physical-plan regression guards: the scale properties that make these
queries viable at 100 TB — predicate pushdown into the parquet scan,
column pruning, broadcast joins for small dims, shuffle-free global
top-k — must stay visible in the executed plan.
"""

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.queries.catalog import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_q1_filter_pushdown(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_q3_pushdown_pruning_broadcast_topk(spark):
    plan = _plan(spark, "q3_shipping_priority")
    # selective predicates reach the scans
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThan(l_shipdate" in plan
    # column pruning: lineitem scan reads only the 4 needed columns
    assert (
        "struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double,"
        "l_shipdate:timestamp_ntz>" in plan
    )
    # small dim broadcast + shuffle-free top-10
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_q5_broadcast_dims(spark):
    assert "BroadcastHashJoin" in _plan(spark, "q5_local_supplier")


def test_semi_anti_join_strategies(spark):
    assert "LeftSemi" in _plan(spark, "join_semi")
    assert "LeftAnti" in _plan(spark, "join_anti")


def test_global_topk_no_full_sort(spark):
    plan = _plan(spark, "topk_orders")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # no shuffle for a global top-k


def test_q6_pushdown_and_pruning(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    # every range predicate reaches the parquet scan (row-group skipping)
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_discount,0.03)" in plan
    assert "LessThan(l_quantity,24.0)" in plan
    # projection pruned to the 4 referenced columns
    assert (
        "struct<l_quantity:double,l_extendedprice:double,l_discount:double,"
        "l_shipdate:timestamp_ntz>" in plan
    )
    # global agg is partial map-side: exactly one single-partition exchange
    assert plan.count("Exchange") >= 1 and "partial_sum" in plan


def test_bucketed_join_is_shuffle_free(spark):
    """Both sides bucketed on the join key: the SortMergeJoin must consume
    the bucket layout directly — no Exchange anywhere below the join (the
    only shuffles allowed are for the aggregate above it)."""
    plan = _plan(spark, "join_bucketed_colocated")
    tree = plan.split("\n\n")[0]  # the indented operator tree section
    lines = tree.splitlines()
    smj_idx = next(i for i, l in enumerate(lines) if "SortMergeJoin" in l)
    below_join = lines[smj_idx + 1 :]  # tree prints children after the node
    assert any("Scan parquet" in l for l in below_join)
    assert not any("Exchange" in l for l in below_join)


def test_q18_partial_agg_before_join(spark):
    plan = _plan(spark, "q18_large_orders")
    # lineitem scan pruned to orderkey+quantity and pre-aggregated before
    # any join (shuffle carries one row per orderkey, not per lineitem)
    assert "struct<l_orderkey:bigint,l_quantity:double>" in plan
    assert "partial_sum(l_quantity" in plan
    assert "BroadcastHashJoin" in plan  # customer dim broadcast
