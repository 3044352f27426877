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


def test_q21_single_fact_scan(spark):
    """The algebraized Q21 reads lineitem once; the naive EXISTS/NOT
    EXISTS formulation needs three scans + two pair self-joins."""
    plan = _plan(spark, "q21_waiting_suppliers")
    assert plan.count("lineitem.parquet") == 1
    assert "TakeOrderedAndProject" in plan  # top-20 without global sort


def test_q16_filters_before_distinct(spark):
    """Part predicates must be pushed to the part scan (the broadcast
    filter side), and supplier-count dedup happens post-filter."""
    plan = _plan(spark, "q16_part_supplier_variety")
    assert "Not(EqualTo(p_brand,Brand#5))" in plan
    assert "In(p_size" in plan


def test_q15_no_global_window(spark):
    """Max-revenue supplier must come from a 1-row aggregate broadcast
    back, not a Window over an unpartitioned frame."""
    plan = _plan(spark, "q15_top_supplier")
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_q17_decorrelated_single_shuffle(spark):
    """The per-part AVG subquery must appear as an aggregate + broadcast
    join, not a per-row re-scan: exactly one scan of lineitem feeding
    both sides via a semi-filtered projection is ideal, but the guard is
    no more than two fact scans and a broadcast application."""
    plan = _plan(spark, "q17_small_quantity_revenue")
    assert plan.count("lineitem.parquet") <= 2
    assert "BroadcastHashJoin" in plan


def test_sample_split_is_scan_plus_project(spark):
    """Hash-split membership must be a narrow map: no Exchange before
    the audit aggregation's own shuffle."""
    plan = _plan(spark, "sample_hash_split")
    # exactly one hash exchange (the audit groupBy); the only other
    # allowed exchange is the final orderBy's range partitioning
    assert plan.count("hashpartitioning(") == 1


def test_zorder_is_one_range_shuffle(spark):
    from pyspark.sql import functions as F

    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.zorder import cluster_zorder

    df = spark.range(1000).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    plan = (
        cluster_zorder(df, ["x", "y"], bits=8, num_files=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the curve layout costs exactly ONE exchange (range on zval); the
    # within-partition sort must not add another
    assert plan.count("Exchange") == 1
    assert "rangepartitioning(zval" in plan.lower()
    # z-value computation stays in codegen (no UDF / BatchEval nodes)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_temperature_mix_broadcasts_weights(spark):
    from pyspark.sql import functions as F

    from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.operators.sampling import temperature_mix

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("source"),
        F.lit(100).alias("n_chars"),
    )
    plan = (
        temperature_mix(df, "source", "n_chars", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # thresholds join back via broadcast: the corpus side is never
    # shuffled on the domain key
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q7_dims_broadcast_dates_pushed(spark):
    plan = _plan(spark, "q7_volume_shipping")
    # ship-date range reaches the lineitem scan; nation pair filter
    # reaches both nation scans; every dim joins by broadcast
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "Or(EqualTo(n_name," in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q8_selective_dims_pushed_no_smj(spark):
    plan = _plan(spark, "q8_market_share")
    # the two most selective predicates prune at the scans, so the
    # lineitem pipeline never widens past the surviving part/region keys
    assert "EqualTo(p_type," in plan
    assert "EqualTo(r_name," in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q9_part_name_pushed_no_smj(spark):
    plan = _plan(spark, "q9_product_type_profit")
    assert "StringContains(p_name," in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q22_anti_join_and_pushdown(spark):
    plan = _plan(spark, "q22_dormant_customers")
    # NOT EXISTS stays an anti-join (never a cross/inner + filter) and
    # both selective predicates reach the scans
    assert "LeftAnti" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "GreaterThan(c_acctbal,0.0)" in plan


def test_dedup_lines_pushdown_no_cartesian(spark):
    """Cross-corpus line dedup: the doc_id filter reaches every scan of
    the documents table, and the survivors join is a keyed equi-join —
    never a cartesian/nested-loop (which at 100 TB would be corpus^2).
    When another suite module has .cache()d the documents table in the
    shared session, the source becomes an InMemoryTableScan (the cached
    relation's description still mentions its parquet scan, without the
    pushdown) — only pin PushedFilters on an uncached plan."""
    plan = _plan(spark, "dedup_lines")
    if "InMemoryTableScan" not in plan:
        assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,300)]" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
