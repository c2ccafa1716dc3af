"""Physical-plan shape tests: the oracle tests prove results are right;
these prove the PLANS are the ones that survive a 100x scale-up —
filters reach the parquet scan, small sides broadcast, top-k never
global-sorts, nothing falls back to a cartesian product.

Plans are inspected via explain(formatted) text. AQE is on (session
fixture), so assertions target the initial physical plan, which is what
static planning guarantees; AQE only improves on it at runtime.
"""

from __future__ import annotations

import re

import pytest

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _registry():
    import __spark_entry__ as e

    return e.queries()


QS = _registry()


# every registered query must avoid cartesian products and row-at-a-time
# Python UDFs in its plan — the two classic scale killers
@pytest.mark.parametrize("name", sorted(QS))
def test_no_cartesian_no_python_udf(spark, name):
    plan = _plan(QS[name](spark, SF_DIR))
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time Python UDF"


def test_filter_pushdown_reaches_scan(spark):
    """q1's shipdate filter must appear in the parquet scan's
    PushedFilters, not as a post-scan Filter only."""
    plan = _plan(QS["q1_pricing_summary"](spark, SF_DIR))
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "l_shipdate" in m.group(1), plan[:2000]


def test_column_pruning_reaches_scan(spark):
    """topk_orders projects 3 of 6 order columns; ReadSchema must not
    include the unused ones."""
    plan = _plan(QS["topk_orders"](spark, SF_DIR))
    m = re.search(r"ReadSchema: (.*)", plan)
    assert m
    schema = m.group(1)
    assert "o_orderkey" in schema and "o_totalprice" in schema
    assert "o_orderpriority" not in schema and "o_orderstatus" not in schema


@pytest.mark.parametrize(
    "name",
    ["q3_shipping_priority", "q5_local_supplier_volume", "q10_returned_items", "flagship_revenue"],
)
def test_dimension_joins_broadcast(spark, name):
    """Star joins against small dimensions must be broadcast hash joins;
    at most one shuffle join (the fact-fact edge) is acceptable."""
    plan = _plan(QS[name](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join in plan"
    n_smj = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    assert n_smj <= 1, f"{name}: {n_smj} shuffle joins"


@pytest.mark.parametrize("name", ["topk_orders", "q3_shipping_priority", "q10_returned_items"])
def test_topk_is_take_ordered(spark, name):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject —
    per-partition top-k and a k-row driver merge, never a global Sort."""
    plan = _plan(QS[name](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, f"{name}: top-k fell back to global sort"


def test_q4_semi_join(spark):
    """EXISTS must plan as a semi join (probe rows never duplicate)."""
    plan = _plan(QS["q4_order_priority"](spark, SF_DIR))
    assert "LeftSemi" in plan, plan[:2000]


def _n_exchanges(plan: str) -> int:
    """Count physical Exchange nodes via their detail entries (the tree
    section and the detail section each mention a node once)."""
    return len(re.findall(r"\(\d+\) Exchange", plan))


def test_whole_stage_codegen_on_aggregates(spark):
    """The scan-heavy q1 aggregate must run inside WholeStageCodegen
    (simple-mode explain marks codegen stages with '*('); AQE is
    disabled for the check because adaptive plans defer codegen ids."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = QS["q1_pricing_summary"](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "*(" in plan, plan[:1500]


def test_minhash_single_shuffle_to_signatures(spark):
    """The signature pipeline must shuffle exactly once before the
    aggregate: the explicit repartition(id), whose partitioning the
    groupBy(id) reuses (no second exchange)."""
    from designing_data_warehouse_in_sql_server_spark.operators.dedup_text import (
        minhash_signatures,
    )
    from designing_data_warehouse_in_sql_server_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(minhash_signatures(docs, "doc_id", "text"))
    assert _n_exchanges(plan) == 1, plan[:3000]


def test_salted_agg_two_exchanges(spark):
    """Salted aggregation is exactly two shuffles: (key, salt) then key."""
    plan = _plan(QS["salted_aggregation"](spark, SF_DIR))
    assert _n_exchanges(plan) == 2, plan[:3000]


@pytest.mark.parametrize("name", ["train_val_test_split", "stratified_sample", "string_functions"])
def test_per_row_ops_shuffle_free(spark, name):
    """Split / sample / string suites are pure per-row projections and
    predicates — zero exchanges, embarrassingly parallel at any scale."""
    plan = _plan(QS[name](spark, SF_DIR))
    assert _n_exchanges(plan) == 0, plan[:3000]


@pytest.mark.parametrize(
    "name",
    [
        "pack_sequences",
        "window_lag_lead_delta",
        "ntile_quartiles",
        "histogram_totalprice",
        "events_sliding_window",
        "grouping_sets_aggregate",
        "unpivot_event_counts",
    ],
)
def test_single_shuffle_ops(spark, name):
    """Window / grouped ops that need exactly one hash exchange; a second
    exchange would double the shuffle volume at scale."""
    plan = _plan(QS[name](spark, SF_DIR))
    assert _n_exchanges(plan) == 1, plan[:3000]


def test_quantile_broadcasts_percentile_list(spark):
    """The 3-row quantile list must join via broadcast (nested-loop on a
    broadcast side is fine; a shuffle join on rn=ceil(p*n) would shuffle
    the ranked fact table a second time)."""
    plan = _plan(QS["quantile_disc"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan[:3000]
    assert _n_exchanges(plan) == 1, plan[:3000]


def test_fk_audit_anti_joins_broadcast_dims(spark):
    """FK audits are anti joins; the dimension-sized parents (customer,
    nation) must broadcast — only the orders parent may shuffle."""
    plan = _plan(QS["fk_integrity_audit"](spark, SF_DIR))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_cobucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables co-bucketed on the join key must sort-merge join with
    ZERO exchanges — the storage-level co-location contract that makes
    recurring 100 TB fact-fact joins affordable."""
    from pyspark.sql import functions as F

    from designing_data_warehouse_in_sql_server_spark.sources.bucketing import (
        read_bucketed,
        write_bucketed,
    )
    from designing_data_warehouse_in_sql_server_spark.sources.parquet import load_table

    lineitem = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    write_bucketed(lineitem, "b_lineitem", str(tmp_path / "li"), "l_orderkey", 8)
    write_bucketed(orders, "b_orders", str(tmp_path / "o"), "l_orderkey", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, "b_lineitem").join(
            read_bucketed(spark, "b_orders"), "l_orderkey"
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan[:3000]
        assert _n_exchanges(plan) == 0, plan[:3000]
        # sanity: result matches the plain join
        assert joined.count() == lineitem.join(orders, "l_orderkey").count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_q8_star_join_all_dims_broadcast(spark):
    """q8's seven-table star: every dimension side broadcasts; the part
    filter is pushed into its scan (pre-filtered build side)."""
    plan = _plan(QS["q8_market_share"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 5, plan[:2000]
    assert "SortMergeJoin" not in plan
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(p_type,ECONOMY\)", plan), (
        "part-type filter not pushed to the dim scan"
    )


def test_dataset_mix_shards_zero_shuffle(spark):
    """Mixing + shard assignment is a pure projection + explode — any
    Exchange in this plan means the zero-shuffle contract broke."""
    plan = _plan(QS["dataset_mix_shards"](spark, SF_DIR))
    assert "Exchange" not in plan, plan[:2000]


def test_segment_dedup_no_join(spark):
    """Segment dedup is explode -> one hash-partitioned window -> one
    group-back; it must never plan a join (the 'seen before' decision is
    the window, not a self-join)."""
    plan = _plan(QS["dedup_segments"](spark, SF_DIR))
    assert "Join" not in plan, plan[:2000]
    assert "Window" in plan


def test_q17_threshold_is_single_window_not_rejoin(spark):
    """q17's per-part average threshold must be a window over the
    already-joined rows (one shuffle), not a second aggregate + re-join
    of the fact."""
    plan = _plan(QS["q17_small_quantity"](spark, SF_DIR))
    assert "Window" in plan
    n_joins = len(re.findall(r"\(\d+\) \w*Join", plan))
    assert n_joins == 1 and "SortMergeJoin" not in plan, plan[:2000]


def test_gap_fill_spine_joins_equi(spark):
    """The hour spine joins actual counts on (user, hour) as an
    equi-join — a nested-loop/cartesian here would be quadratic."""
    plan = _plan(QS["timeseries_gap_fill"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


@pytest.mark.parametrize("name", ["cohort_retention", "funnel_conversion"])
def test_no_forced_broadcast_of_per_user_side(spark, name):
    """Per-user aggregates derived from the events fact are unbounded
    (one row per user); forcing F.broadcast() on them OOMs executors at
    10^8+ users. The logical plan must carry NO broadcast hint — AQE may
    still pick a broadcast at runtime from measured sizes, which is fine
    because that decision is size-aware, not forced."""
    df = QS[name](spark, SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, f"{name} forces a join-strategy hint"


# Real (linearly-scaling) customer/supplier/fact columns — if any of
# these appears inside a ResolvedHint subtree, the plan forces a
# broadcast of a relation that grows with the fact tables (~300 MB per
# executor at sf10, impossible at the 100 TB design point), bypassing
# both the autoBroadcast threshold and AQE's size-based fallback.
_LINEAR_COLS = re.compile(
    r"\b(c_custkey|c_nationkey|c_mktsegment|c_name|c_acctbal"
    r"|s_suppkey|s_nationkey|s_name|s_acctbal"
    r"|l_orderkey|l_partkey|l_suppkey|o_orderkey|o_custkey"
    r"|p_partkey|p_brand|p_retailprice)\b"
)

# part-derived hints are allowed only when selectively filtered (q16's
# brand/type exclusion, q20's name prefix, q8's type filter, q2's SMALL
# filter): the filter is visible inside the hint subtree
_FILTERED_PART_OK = re.compile(r"Filter .*p_(type|name|brand)")


@pytest.mark.parametrize(
    "name",
    [
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q7_volume_shipping",
        "q8_market_share",
        "q9_product_profit",
        "q10_returned_items",
        "q15_top_supplier",
        "q16_supplier_relationship",
        "q18_large_orders",
        "q19_brand_discounts",
        "q20_promotion_candidates",
        "q21_waiting_supplier",
        "q2_min_cost_supplier",
        "q11_important_stock",
        "flagship_revenue",
        "topk_per_group",
        "basket_brand_pairs",
    ],
)
def test_no_forced_broadcast_of_linear_relations(spark, name):
    """No unconditional broadcast hint on customer/supplier/fact-derived
    sides (they grow linearly with scale factor); nation/region and
    selectively-filtered part may still be hinted. AQE still broadcasts
    the linear sides at test scale from measured sizes — that decision
    is size-aware, which is the point."""
    df = QS[name](spark, SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    lines = analyzed.splitlines()
    for i, line in enumerate(lines):
        if "ResolvedHint" not in line:
            continue
        indent = len(line) - len(line.lstrip(" :+-"))
        subtree = []
        for nxt in lines[i + 1 :]:
            if (len(nxt) - len(nxt.lstrip(" :+-"))) <= indent:
                break
            subtree.append(nxt)
        sub = "\n".join(subtree)
        m = _LINEAR_COLS.search(sub)
        if m and m.group(0).startswith("p_") and _FILTERED_PART_OK.search(sub):
            continue
        assert not m, (
            f"{name}: broadcast hint forces a linearly-scaling relation "
            f"(matched {m.group(0) if m else ''}):\n{sub[:1500]}"
        )


def test_pareto_frontier_no_single_partition_exchange_above_threshold(spark):
    """The skyline's running max is SIZE-ADAPTIVE: above
    WINDOW_FORM_MAX_ROWS the two-phase range-partitioned form
    (prefix_max_exclusive) must be chosen — no Exchange SinglePartition
    may appear, because the distinct-price cardinality is adversarially
    O(|part|). Forcing the threshold to -1 simulates the 100 TB side of
    the dispatch on the sf0.1 fixture."""
    from designing_data_warehouse_in_sql_server_spark.operators import ids

    saved = ids.WINDOW_FORM_MAX_ROWS
    ids.WINDOW_FORM_MAX_ROWS = -1
    try:
        plan = _plan(QS["pareto_frontier"](spark, SF_DIR))
    finally:
        ids.WINDOW_FORM_MAX_ROWS = saved
    # formatted explain prints the exchange mode on its own Arguments
    # line, so match the bare token (the "Exchange SinglePartition"
    # spelling only appears in simple-mode explain)
    assert "SinglePartition" not in plan, plan[:2000]


def test_two_phase_family_adaptive_dispatch(spark):
    """Size-adaptive dispatch, both sides, for every two-phase caller:
    BELOW the threshold (sf0.1 fixture counts) the single-window plan
    runs — exactly one small SinglePartition sort and NO broadcast
    offsets join; ABOVE it (threshold forced to -1) the two-phase plan
    runs with no SinglePartition anywhere. Both forms are
    property-tested bit-identical (tests/test_properties.py)."""
    from designing_data_warehouse_in_sql_server_spark.operators import ids

    names = [
        "pareto_frontier",
        "abc_classification",
        "customer_rfm_segmentation",
        "percent_rank_global",
    ]
    for name in names:
        small = _plan(QS[name](spark, SF_DIR))
        assert "SinglePartition" in small, (
            f"{name}: expected the cheap single-window form at sf0.1"
        )
    saved = ids.WINDOW_FORM_MAX_ROWS
    ids.WINDOW_FORM_MAX_ROWS = -1
    try:
        for name in names:
            big = _plan(QS[name](spark, SF_DIR))
            assert "SinglePartition" not in big, (
                f"{name}: two-phase form must avoid SinglePartition\n" + big[:2000]
            )
    finally:
        ids.WINDOW_FORM_MAX_ROWS = saved


def test_q2_min_cost_is_single_window_all_dims_broadcast(spark):
    """q2's min-cost-per-part must be a window over the joined rows, with
    the bounded dims broadcast. The supplier-side join is deliberately
    UNHINTED (supplier grows linearly with scale factor), so the static
    plan may carry a sort-merge join — the assertion is that AQE's
    size-aware runtime re-plan converts it to a broadcast join at test
    scale, which is the behavior a 100x scale-up preserves safely."""
    df = QS["q2_min_cost_supplier"](spark, SF_DIR)
    static = _plan(df)
    assert "Window" in static
    assert len(re.findall(r"BroadcastHashJoin", static)) >= 2
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    final = final.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final, final[:2000]


def test_q9_star_broadcasts_dims(spark):
    """q9's part/supplier/nation joins broadcast; orders is the one
    permissible shuffle join edge."""
    plan = _plan(QS["q9_product_profit"](spark, SF_DIR))
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 3
    assert len(re.findall(r"SortMergeJoin", plan)) <= 1


def test_q16_excluded_suppliers_anti_join_broadcast(spark):
    """The negative-balance supplier exclusion must be a broadcast
    anti-join (tiny build side), never a shuffle."""
    plan = _plan(QS["q16_supplier_relationship"](spark, SF_DIR))
    assert re.search(r"BroadcastHashJoin .*LeftAnti", plan), plan[:2000]


def test_zorder_key_is_pure_projection(spark):
    """The Morton key is a constant-folded per-row projection — any
    Exchange/Window/Join here would make the layout step quadratic in
    shuffles before the intentional repartitionByRange even starts."""
    plan = _plan(QS["zorder_layout_key"](spark, SF_DIR))
    assert "Exchange" not in plan, plan[:2000]
    assert "Join" not in plan and "Window" not in plan


def test_profile_prunes_columns_no_expand(spark):
    """r12 shape: one single-COLUMN pruned scan per profiled column (4
    total), never an Expand. The old one-scan wide aggregate planned its
    four COUNT(DISTINCT ...) via the grouping-id Expand that multiplies
    every scanned row 5x before partial aggregation (measured 1.8 s ->
    0.5 s at sf0.1); four pruned branches read the same total bytes with
    no row multiplication. Guarded both ways: no Expand may return, and
    every scan must read exactly one column (pruning intact)."""
    plan = _plan(QS["data_quality_profile"](spark, SF_DIR))
    scan_ids = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scan_ids) == 4, plan[:2000]
    assert "Expand" not in plan, plan[:2000]
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all(s.count(":") == 1 for s in schemas), schemas


def test_interval_coalesce_no_self_join(spark):
    """Island detection must be the running-max window form, not the
    O(n^2) overlap self-join."""
    plan = _plan(QS["interval_coalesce"](spark, SF_DIR))
    assert "Join" not in plan, plan[:2000]
    assert "Window" in plan


def test_heavy_hitters_broadcasts_scalar_total(spark):
    """The global total is a 1-row aggregate joined by broadcast; the
    fact table is scanned once and shuffled once (on user_id)."""
    plan = _plan(QS["heavy_hitter_users"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan


def test_cumulative_distinct_windows_aggregate_not_fact(spark):
    """The running sum must run over the per-day aggregate (tiny), with
    the fact-sized shuffles confined to hash aggregates — the window's
    single partition is safe only because its input is |days| rows."""
    plan = _plan(QS["cumulative_distinct_users"](spark, SF_DIR))
    assert "Window" in plan
    # two hash aggregates (per-user firsts, per-day counts) before the window
    assert len(re.findall(r"HashAggregate", plan)) >= 4  # partial+final each


def test_bm25_broadcasts_idf_side(spark):
    """Per-term idf (|query terms| rows) and corpus stats (1 row) are
    broadcast; only the token-level aggregates shuffle."""
    plan = _plan(QS["bm25_search"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts


def test_scd2_point_in_time_broadcasts_dim(spark):
    """The versioned dim must broadcast (dimension-sized build side) with
    the validity range as join residual — a shuffle or a range
    cross-join over the fact would be the 100 TB killer."""
    plan = _plan(QS["scd2_point_in_time"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_split_leakage_self_join_is_equi(spark):
    """The leakage audit self-joins on the fingerprint hash — an
    equi-join on a collision-bounded key, never a nested loop."""
    plan = _plan(QS["split_leakage_audit"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    """With runtime bloom filters on, a selective dim-side filter must
    inject a might_contain() probe into the fact scan side — the runtime
    row-level filter that cuts shuffle volume on selective fact-fact
    joins at 100 TB. Thresholds are lowered here because sf0.1 relations
    are below the production defaults (10 GB creation side); the plan
    shape is what production-scale inputs get for free."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        from designing_data_warehouse_in_sql_server_spark.sources.parquet import load_table

        li = load_table(spark, SF_DIR, "lineitem")
        orders = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        assert "might_contain" in _plan(j)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_inverted_index_bounds_postings_before_collect(spark):
    """Postings must be capped BEFORE any list aggregation: a row_number
    window filter (<= 20 rows/token) feeds the collect_list, so no
    aggregation buffer ever holds a heavy-hitter token's full document
    list. Spark additionally plans a WindowGroupLimit (Partial),
    bounding each token to 20 rows MAP-SIDE before the window shuffle —
    pin that too. In formatted-explain details, children print before
    parents, so the bounding Filter must precede the first
    partial_collect_list."""
    plan = _plan(QS["inverted_index_postings"](spark, SF_DIR))
    assert "partial_collect_list" in plan
    assert re.search(r"row_number\(\), 20, Partial", plan), (
        "map-side WindowGroupLimit missing"
    )
    m = re.search(r"__rn#\d+ <= 20", plan)
    assert m, plan[:3000]
    assert m.start() < plan.index("partial_collect_list"), (
        "collect_list aggregates rows that were never __rn-bounded"
    )


def test_reservoir_sample_bounds_groups_map_side(spark):
    """k-per-group sampling must plan a WindowGroupLimit (Partial):
    each task keeps <= k rows per group BEFORE the shuffle, so shuffle
    volume is #tasks x #groups x k regardless of input size."""
    plan = _plan(QS["reservoir_sample_per_group"](spark, SF_DIR))
    assert re.search(r"row_number\(\), 5, Partial", plan), plan[:3000]
    assert _n_exchanges(plan) == 1, plan[:3000]


def test_decontaminate_bloom_probe_before_exact_verify(spark):
    """The bloom probe (shiftright over the literal bitset) must sit on
    the corpus side BELOW the exact-verify join, and the verify join
    must still exist (broadcast) — prune-then-confirm, bit-identical
    output to the exact form."""
    plan = _plan(QS["decontaminate_bloom"](spark, SF_DIR))
    assert "shiftright" in plan, plan[:3000]
    assert "BroadcastHashJoin" in plan, plan[:3000]
    # details print children first: the probe Filter precedes the join
    assert plan.index("shiftright") < plan.rindex("BroadcastHashJoin")


def test_label_encode_assigns_on_dictionary_not_fact(spark):
    """Ids are assigned on the distinct-category relation and joined
    back broadcast — the fact side must never pass through a window."""
    plan = _plan(QS["categorical_label_encode"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan[:3000]
    # the window's input is the materialized-once distinct dictionary
    # (the checkpoint hides the distinct aggregate behind ExistingRDD);
    # the dictionary subtree carries exactly the 1 dictionary column
    assert "Window" in plan and "Scan ExistingRDD" in plan, plan[:3000]


def test_linear_interpolate_single_shuffle(spark):
    """Both neighbor windows share one (user_id) partitioning: exactly
    one exchange, O(1)-state running frames, no self-join."""
    plan = _plan(QS["linear_interpolate"](spark, SF_DIR))
    assert "Join" not in plan, plan[:3000]
    assert _n_exchanges(plan) == 1, plan[:3000]


def test_approx_rollup_merges_sketches_without_rescan(spark):
    """The ALL row's estimate must come from hll_union_agg over the
    per-type sketches; only the exact twin rescans (exact distinct is
    not mergeable) — so exactly two parquet scans of events appear."""
    plan = _plan(QS["approx_distinct_rollup"](spark, SF_DIR))
    assert "hll_union_agg" in plan, plan[:3000]
    # the per-type sketch relation is checkpointed (built once — its
    # parquet scan is inside the ExistingRDD); the ONLY parquet scan in
    # this plan is the exact ALL twin's, proving the merged estimate
    # itself never rescans the fact table
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 1, plan[:3000]
    assert "Scan ExistingRDD" in plan, plan[:3000]


def test_k_anonymity_single_aggregate(spark):
    """One hash aggregate, no joins/windows — the audit is a pure
    grouped count with map-side partials."""
    plan = _plan(QS["k_anonymity_audit"](spark, SF_DIR))
    assert "Join" not in plan and "Window" not in plan
    assert _n_exchanges(plan) == 1, plan[:2000]


def test_incremental_lsh_single_asymmetric_join(spark):
    """Batch bands probe corpus bands through exactly ONE equi-join —
    no corpus self-join anywhere in the increment path."""
    plan = _plan(QS["dedup_incremental_lsh"](spark, SF_DIR))
    n_joins = len(re.findall(r"\(\d+\) (?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)", plan))
    assert n_joins == 1, plan[:3000]


def test_topk_with_ties_rank_group_limit(spark):
    """RANK-based top-k must also bound map-side (WindowGroupLimit in
    rank mode) — boundary ties survive, volume stays #tasks x groups x
    ~k."""
    plan = _plan(QS["topk_per_group_with_ties"](spark, SF_DIR))
    assert re.search(r"rank\([^)]*\), 3, Partial", plan), plan[:3000]
    assert _n_exchanges(plan) == 1, plan[:3000]


def test_minmax_scale_single_fact_scan_broadcast_stats(spark):
    """The (min,max) dictionary joins back broadcast; the fact side is
    scanned twice at most (stats + probe) with no window and no shuffle
    of the probe side."""
    plan = _plan(QS["feature_minmax_scale"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "Window" not in plan
    # stats aggregate shuffles; the probe side must not
    assert _n_exchanges(plan) <= 1, plan[:3000]


def test_asof_forward_no_join_one_exchange(spark):
    """Both as-of directions are union + one ordered window — never a
    range join; one (user_id) exchange."""
    for name in ("asof_join_attribution", "asof_join_forward"):
        plan = _plan(QS[name](spark, SF_DIR))
        assert "Join" not in plan, f"{name}\n" + plan[:2000]
        assert "Window" in plan
        assert _n_exchanges(plan) == 1, f"{name}\n" + plan[:3000]


def test_revenue_gini_all_windows_partitioned(spark):
    """Every Gini window is nation-partitioned — no global ordering, no
    single-partition exchange anywhere."""
    plan = _plan(QS["revenue_gini"](spark, SF_DIR))
    assert "SinglePartition" not in plan, plan[:3000]
    assert "Window" in plan


def test_incremental_lsh_store_probe_scans_store(spark, tmp_path):
    """The production increment path: the corpus side is scanned FROM THE
    PERSISTED signature store (no re-shingle of corpus text anywhere in
    the plan), and the probe is still exactly one asymmetric equi-join."""
    from pyspark.sql import functions as F

    from designing_data_warehouse_in_sql_server_spark.operators.dedup_text import (
        minhash_signatures,
    )
    from designing_data_warehouse_in_sql_server_spark.plans.extensions import (
        BANDS,
        ROWS_PER_BAND,
        _incremental_lsh_store_probe,
        _with_near_copies,
    )
    from designing_data_warehouse_in_sql_server_spark.sources.parquet import load_table
    from designing_data_warehouse_in_sql_server_spark.sources.table_store import (
        TableStore,
    )

    docs = _with_near_copies(load_table(spark, SF_DIR, "documents"))
    store = TableStore(spark, str(tmp_path))
    store.overwrite(
        "signatures",
        minhash_signatures(
            docs.filter(F.col("doc_id") % 10 != 0),
            "doc_id", "text", k=3, bands=BANDS, rows_per_band=ROWS_PER_BAND,
        ),
    )
    out = _incremental_lsh_store_probe(
        docs.filter(F.col("doc_id") % 10 == 0), store.read("signatures")
    )
    plan = _plan(out)
    n_joins = len(
        re.findall(r"\(\d+\) (?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)", plan)
    )
    assert n_joins == 1, plan[:3000]
    # the corpus side reads the persisted store files, not documents.parquet:
    # the only documents scans are the batch side's planted-copies union
    # (2 scans); a corpus recompute would double that to 4
    assert str(tmp_path) in plan, plan[:3000]
    assert plan.count("documents.parquet") == 2, plan[:3000]


def test_bitmap_distinct_no_expand_two_aggregates(spark):
    """The bitmap form must NOT plan COUNT(DISTINCT)'s Expand; both
    stages are plain hash aggregates with map-side partials, so the
    shuffled state is bitmap words, never raw ids."""
    plan = _plan(QS["bitmap_exact_distinct"](spark, SF_DIR))
    assert "Expand" not in plan, plan[:2000]
    assert "Join" not in plan and "Window" not in plan
    assert _n_exchanges(plan) == 2, plan[:2000]


def test_argmax_no_window_single_exchange(spark):
    """Argmax is a mergeable MAX-over-struct aggregate — no window, one
    exchange, map-side partial aggregation."""
    plan = _plan(QS["argmax_per_group"](spark, SF_DIR))
    assert "Window" not in plan, plan[:2000]
    assert "Join" not in plan
    assert _n_exchanges(plan) == 1, plan[:2000]
    assert "partial_max" in plan or re.search(r"max\([^)]*\), Partial", plan), plan[:2000]


def test_weighted_median_one_sort_per_group(spark):
    """Running-weight and total frames share ONE per-group sort: exactly
    one Window operator and one exchange before the final aggregate."""
    plan = _plan(QS["weighted_median"](spark, SF_DIR))
    n_windows = len(re.findall(r"\(\d+\) Window", plan))
    assert n_windows == 1, plan[:3000]
    assert "SinglePartition" not in plan, plan[:3000]


def test_weighted_median_family_two_phase_above_threshold(spark):
    """Above WINDOW_FORM_MAX_ROWS neither weighted_median nor
    conversion_lag_median may sort a group through one task: the grouped
    two-phase form broadcasts the per-(partition, group) offsets back —
    no SinglePartition exchange, no data-sized shuffle join; the only
    Windows partition by (__pid, group)."""
    from designing_data_warehouse_in_sql_server_spark.plans.analytics import (
        _conversion_lag_plan,
        _weighted_median_plan,
    )

    for fn in (_weighted_median_plan, _conversion_lag_plan):
        plan = _plan(fn(spark, SF_DIR, None))
        assert "SinglePartition" not in plan, plan[:3000]
        assert "__offset" in plan, plan[:3000]
        assert "BroadcastHashJoin" in plan, plan[:3000]
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan[:3000]
        assert "__pid" in plan, plan[:3000]


def test_asof_nearest_no_join_one_exchange(spark):
    """The nearest mode keeps the directional modes' shape: union + one
    ordered per-user window — never a range join, one exchange."""
    plan = _plan(QS["asof_join_nearest"](spark, SF_DIR))
    assert "Join" not in plan, plan[:2000]
    assert "Window" in plan
    assert _n_exchanges(plan) == 1, plan[:3000]


def test_yoy_aggregate_materialized_once(spark):
    """The (nation x month) aggregate is checkpointed before the
    self-join: both join sides scan the SAME materialized relation and
    the fact table appears NOWHERE in the final plan — the orders scan
    + broadcast customer join ran exactly once, inside the checkpoint."""
    plan = _plan(QS["yoy_growth"](spark, SF_DIR))
    assert plan.count("orders.parquet") == 0, plan[:3000]
    assert len(re.findall(r"\(\d+\) Scan ExistingRDD", plan)) == 2, plan[:3000]
    assert "LeftOuter" in plan, plan[:3000]


def test_unknown_member_broadcast_left_join(spark):
    """The dim fallback join must broadcast the dimension side."""
    plan = _plan(QS["unknown_member_join"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan, plan[:2000]


def test_wave2_single_scan_windows_over_daily_aggregate(spark):
    """The round-6 time-series family (bollinger / RSI / rolling corr /
    seasonal CMA) is ONE fact scan -> one hash aggregate to the
    calendar grain -> windows over that bounded relation: exactly one
    parquet scan, no joins."""
    for name in (
        "bollinger_breakout",
        "rsi_indicator",
        "rolling_correlation",
        "seasonal_decompose_cma",
    ):
        plan = _plan(QS[name](spark, SF_DIR))
        n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
        assert n_scans == 1, f"{name}: {n_scans} scans\n" + plan[:2000]
        assert "Join" not in plan, f"{name}\n" + plan[:2000]
        assert "Window" in plan, f"{name}\n" + plan[:2000]


def test_mutual_information_marginals_from_joint_aggregate(spark):
    """MI marginals come from windows over the joint-count aggregate —
    one parquet scan, no joins, no second fact pass."""
    plan = _plan(QS["mutual_information"](spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan[:2000]
    assert "Join" not in plan, plan[:2000]


def test_ab_test_single_pass_no_shuffle_groups(spark):
    """All four counts are conditional aggregates in ONE pass: one
    scan, no joins, no windows; the only exchange is the 1-row global
    aggregate's."""
    plan = _plan(QS["ab_test_proportions"](spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan[:2000]
    assert "Join" not in plan and "Window" not in plan, plan[:2000]


def test_hypothetical_rank_probes_never_multiply_fact(spark):
    """The probe unpivot happens on the aggregate, not the fact: one
    scan, no joins, and the explode (Generate) sits ABOVE the final
    aggregate in the plan."""
    plan = _plan(QS["hypothetical_rank"](spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan[:2000]
    assert "Join" not in plan, plan[:2000]
    gen = plan.index("Generate")
    agg = plan.index("HashAggregate")
    assert gen < agg, "explode must be downstream (printed above) of the aggregate"


def test_skew_kurtosis_two_pass_broadcast_mean(spark):
    """Two-pass central moments: the per-group mean dictionary joins
    back BROADCAST (never a shuffle join), exactly two fact scans, no
    windows."""
    plan = _plan(QS["skew_kurtosis_moments"](spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2, plan[:3000]
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "Window" not in plan


def test_countmin_probe_side_broadcast_exact_side_pruned(spark):
    """The sketch grid joins the 32-row probe relation broadcast, and
    the exact companion's scan carries the user_id IN (...) filter down
    to parquet."""
    plan = _plan(QS["countmin_frequency"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("user_id" in f for f in m), m


def test_kmv_sketch_topk_is_map_side_group_limit(spark):
    """Per-set k-smallest and the merged sketch both compile to
    WindowGroupLimit (rank <= k pushed map-side) — shuffle volume is
    ~tasks*k, never the distinct-user relation through a full sort."""
    plan = _plan(QS["kmv_distinct_intersection"](spark, SF_DIR))
    assert "WindowGroupLimit" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_feature_hashing_single_aggregate_no_dictionary(spark):
    """The hashing trick needs no vocabulary: tokenize -> explode ->
    ONE (doc,bucket) hash aggregate; one scan, no joins, no windows."""
    plan = _plan(QS["feature_hashing"](spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan[:2000]
    assert "Join" not in plan and "Window" not in plan, plan[:2000]


def test_auc_prefix_sum_two_phase_offsets_broadcast(spark):
    """AUC's running negative count rides the two-phase prefix-sum: the
    per-partition offsets join back BROADCAST (the __offset relation),
    and no data-sized shuffle join or global ordered Window appears."""
    plan = _plan(QS["auc_roc"](spark, SF_DIR))
    assert "__offset" in plan, plan[:3000]
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan[:3000]


def test_ml_eval_single_scan_family(spark):
    """calibration / confusion / PSI are one scan + conditional
    aggregates; no joins."""
    for name in ("calibration_bins", "confusion_matrix_metrics", "psi_drift_bins"):
        plan = _plan(QS[name](spark, SF_DIR))
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, f"{name}\n" + plan[:2000]
        assert "Join" not in plan, f"{name}\n" + plan[:2000]


def test_zipf_topk_never_full_vocabulary_sort(spark):
    """Top-100 tokens must reach the driver through a bounded top-k —
    TakeOrderedAndProject (per-partition top-k + 100-row merge; what
    Spark picks for the unpartitioned rank<=k) or WindowGroupLimit —
    never a full vocabulary sort through one partition first."""
    plan = _plan(QS["zipf_law_fit"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan, plan[:3000]


def test_ols_single_join_single_global_aggregate(spark):
    """OLS normal equations: per-order features join orders ONCE (the
    fact-fact edge may shuffle), then one global aggregate; no windows,
    no second join."""
    plan = _plan(QS["ols_multi_regression"](spark, SF_DIR))
    n_joins = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") + plan.count("BroadcastHashJoin")
    # tree + details double-print: one physical join node appears twice
    assert n_joins <= 2, plan[:3000]
    assert "Window" not in plan, plan[:3000]


def test_allocation_windows_on_dimension_aggregate_only(spark):
    """Largest-remainder allocation: dims broadcast into the fact
    aggregate; the apportionment windows run AFTER the 25-row nation
    aggregate (windows appear above the aggregate in the printed tree)."""
    plan = _plan(QS["largest_remainder_allocation"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan[:3000]
    first_window = plan.index("Window")
    first_agg = plan.index("HashAggregate")
    assert first_window < first_agg, "windows must be downstream of the nation aggregate"


def test_neardup_banded_dedup_before_vector_verify(spark):
    """Banded sign-LSH near-dup: the band explode ships only
    (id, band, key); candidate pairs are DEDUPED (aggregate) before the
    quantized vectors join back by id for the exact verify — wide
    arrays never ride the band shuffle and multi-band collisions are
    verified once."""
    plan = _plan(QS["embedding_neardup_pairs"](spark, SF_DIR))
    assert "Generate" in plan, plan[:3000]              # band explode
    assert "HashAggregate" in plan, plan[:3000]          # pair dedup
    assert "CartesianProduct" not in plan
    # pair dedup (printed above) must precede the vector join-back scans
    assert plan.index("HashAggregate") < plan.rindex("Scan parquet"), plan[:3000]


def test_clamped_running_sum_single_sort_two_stacked_windows(spark):
    """The reflected-walk closed form must plan as ONE exchange + ONE
    per-part sort with both running frames (sum, min-of-sum) stacked on
    it, and the report aggregate reusing the window's partitioning —
    never a recursive per-key loop or a second shuffle."""
    plan = _plan(QS["clamped_running_sum"](spark, SF_DIR))
    assert _n_exchanges(plan) == 1, plan[:3000]
    assert len(re.findall(r"\(\d+\) Sort\b", plan)) == 1, plan[:3000]
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 2, plan[:3000]
    assert "SinglePartition" not in plan, plan[:3000]


def test_bfs_khop_frontier_checkpointed_no_joins_in_final_plan(spark):
    """BFS materializes each hop eagerly: the returned plan is a pure
    union of checkpointed frontiers (seeds + one per hop) — the
    per-hop joins already ran, bounded by the frontier, and nothing
    re-derives the graph at consumption time."""
    plan = _plan(QS["bfs_khop"](spark, SF_DIR))
    assert "Join" not in plan, plan[:2000]
    assert len(re.findall(r"\(\d+\) Scan ExistingRDD", plan)) == 4, plan[:3000]


def test_per_group_trend_broadcast_dims_no_window(spark):
    """Trend slopes: dims broadcast into the fact aggregate; both
    aggregates are hash aggregates — no windows, no shuffle joins."""
    plan = _plan(QS["per_group_trend"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]


def test_covariance_matrix_one_scan_one_aggregate(spark):
    """All 15 moment sums ride ONE scan and one 1-row aggregate; the
    long-form stack is a projection above it (Generate), never a join
    or a second pass."""
    plan = _plan(QS["covariance_matrix"](spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan[:2000]
    assert "Join" not in plan and "Window" not in plan, plan[:2000]


def test_welch_ttest_single_scan_no_joins(spark):
    """Welch's t: one conditional-aggregate pass — no joins, no windows,
    a single parquet scan."""
    plan = _plan(QS["welch_ttest"](spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan[:2000]
    assert "Join" not in plan and "Window" not in plan, plan[:2000]


def test_set_similarity_prefix_join_no_cartesian_equi_joins_only(spark):
    """The prefix-filter join must stay all equi-joins: candidates come
    from the prefix-token equi-join (the a.oid < b.oid predicate is a
    join residual, not a nested loop), and the verify stage joins
    deduped candidate pairs back by key."""
    plan = _plan(QS["set_similarity_prefix_join"](spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan[:3000]
    assert "HashAggregate" in plan, plan[:2000]


def test_zscore_cap_stats_join_above_threshold(spark):
    """Above WINDOW_FORM_MAX_ROWS the z-score stats must come from a
    hash aggregate + BROADCAST join — an unordered per-group window
    would buffer each of the 3 return-flag groups through one task."""
    from designing_data_warehouse_in_sql_server_spark.plans.parity import (
        _zscore_cap_plan,
    )

    plan = _plan(_zscore_cap_plan(spark, SF_DIR, 10**12))
    assert "Window" not in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan[:2000]


def test_fifo_allocation_bucketed_equi_join(spark):
    """The FIFO interval intersection must ride the bucket explode +
    (part, bucket) equi-join — Generate feeding a hash-keyed join —
    never a per-part all-pairs or range nested loop."""
    plan = _plan(QS["fifo_allocation"](spark, SF_DIR))
    assert "Generate" in plan, plan[:2000]
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_temporal_split_embargo_single_user_exchange(spark):
    """The rank window, per-user count, and boundary-timestamp pick all
    partition by user_id — the plan must shuffle on user_id ONCE and
    chain the Window operators over it; and nothing may collapse to a
    single partition (the split must scale with users)."""
    plan = _plan(QS["temporal_split_embargo"](spark, SF_DIR))
    assert "SinglePartition" not in plan
    user_exchanges = re.findall(r"hashpartitioning\(user_id", plan)
    assert len(user_exchanges) == 1, plan[:3000]


def test_walk_forward_splits_broadcast_no_sort(spark):
    """The fold spec is a constant-size dimension: it must broadcast
    (never shuffle the fact side for it), and the whole query is scan →
    fan-out → hash aggregate — no sort anywhere."""
    plan = _plan(QS["walk_forward_splits"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan, plan[:3000]
    assert "Sort" not in plan, plan[:3000]
    assert "SortMergeJoin" not in plan


def test_kcore_decomposition_no_single_partition(spark):
    """Each peel round is degree-aggregate + two node-partitioned joins;
    no stage may collapse to a single partition, and the keep-set is
    joined relationally (the plan contains real joins, not a collected
    IN-list literal)."""
    plan = _plan(QS["kcore_decomposition"](spark, SF_DIR))
    assert "SinglePartition" not in plan


def test_ndcg_windowgrouplimit_and_broadcasts(spark):
    """The per-query top-10 must run as map-side WindowGroupLimit (each
    task keeps 10 rows per query before the shuffle — never a full
    per-query sort of all candidates downstream), and both the query
    vectors and the label totals must broadcast."""
    plan = _plan(QS["ndcg_at_k"](spark, SF_DIR))
    assert "WindowGroupLimit" in plan, plan[:3000]
    assert plan.count("BroadcastExchange") >= 2, plan[:3000]
    assert "SinglePartition" not in plan


def test_group_kfold_no_single_partition_above_threshold(spark):
    """group_kfold ranks the groups relation through the size-adaptive
    sequential-id operator. Below the row threshold (all test scales)
    the single small-relation window is the chosen form; above it the
    two-phase form must keep the plan free of SinglePartition — pin the
    dispatch by calling the operator directly with a large hint."""
    from pyspark.sql import functions as F

    from designing_data_warehouse_in_sql_server_spark.operators.ids import (
        WINDOW_FORM_MAX_ROWS,
        assign_sequential_ids,
    )
    from designing_data_warehouse_in_sql_server_spark.sources.parquet import load_table

    g = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
    )
    big = assign_sequential_ids(
        g,
        "rk",
        [F.col("cnt").desc(), F.col("user_id")],
        n_hint=WINDOW_FORM_MAX_ROWS + 1,
    )
    assert "SinglePartition" not in _plan(big)


def test_bpe_train_merges_scan_count(spark):
    """The trainer's per-iteration pair count runs on the VOCABULARY
    relation, not the corpus: the returned merge table is driver-built
    (3 rows), and each iteration's aggregate job reads the documents
    scan once into a vocab groupBy — pin that the query executes and
    returns exactly BPE_TRAIN_MERGES rules with positive counts."""
    from designing_data_warehouse_in_sql_server_spark.plans.quality import (
        BPE_TRAIN_MERGES,
    )

    rows = QS["bpe_train_merges"](spark, SF_DIR).collect()
    assert len(rows) == BPE_TRAIN_MERGES
    assert all(r.cnt > 0 for r in rows)
    assert len({r.pair for r in rows}) == BPE_TRAIN_MERGES  # distinct rules


def test_bpe_encode_corpus_vocab_join_shape(spark):
    """The encoder (round 8) must tokenize at VOCABULARY granularity and
    reach documents through one equi-join + per-doc hash aggregate: the
    corpus-side plan is scan -> explode -> hash join on the word -> two-
    phase aggregate. No per-row Python, no windows, no single-partition
    exchange (the trainer's K argmax collects happen during plan
    construction, not in this plan)."""
    plan = _plan(QS["bpe_encode_corpus"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "Window" not in plan, plan[:2000]
    assert "SinglePartition" not in plan, plan[:2000]
    assert "HashJoin" in plan and "HashAggregate" in plan, plan[:2000]


def test_semantic_dedup_plan(spark):
    """SemDeDup prune: the Lloyd assignment runs eagerly behind the
    operator's localCheckpoint (the iterative-kernel pattern), so the
    RETURNED plan is the prune itself — ONE cid-keyed equi self-join
    (the cluster is the blocking key) and a left join on the dropped-id
    set. Never an all-pairs product, no windows, no single-partition
    exchange — the pair volume is bounded by cluster size, which the
    registered query bounds by deriving k = isqrt(n) from the footer
    row count."""
    plan = _plan(QS["semantic_dedup"](spark, SF_DIR))
    assert "SinglePartition" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    assert "HashAggregate" in plan, plan[:2000]


# Ratchet: the exact set of registered queries whose sf0.001 plan
# contains an Exchange SinglePartition. Every member is one of three
# BOUNDED classes — (1) a 1-row global aggregate (welch_ttest,
# covariance_matrix, chi-square, OLS, ...: the single partition carries
# one row), (2) a global window over a provably small relation (the
# calendar-bounded daily grain, the vocabulary/top-k relation, the
# label list, ...), or (3) a size-adaptive operator's small-relation
# form, which flips to the two-phase range-partitioned plan above
# WINDOW_FORM_MAX_ROWS (percent_rank_global, systematic_sample,
# group_kfold, ...). A NEW query appearing here — or a dispatch change
# moving one in/out — must be justified against those classes and the
# set updated explicitly; an unbounded single-partition sort of a fact
# table must never hide inside a green run.
SINGLE_PARTITION_BOUNDED = {
    "ab_test_proportions", "abc_classification", "acf_daily_revenue",
    "anova_oneway", "approx_distinct_rollup", "association_rules",
    "auc_roc", "benford_first_digit", "bm25_search", "bollinger_breakout",
    "categorical_label_encode", "confusion_matrix_metrics",
    "contingency_chi_square", "covariance_matrix",
    "cumulative_distinct_users", "customer_rfm_segmentation",
    "cusum_mean_shift", "curriculum_phases", "data_quality_profile",
    "dsir_importance_weights",
    "equi_depth_histogram",
    "fk_integrity_audit", "funnel_conversion", "group_kfold",
    "heavy_hitter_users", "js_divergence_sources", "kaplan_meier_churn",
    "kmv_distinct_intersection", "ks_test_two_sample",
    "largest_remainder_allocation", "mannwhitney_u_test",
    # r11: inherits sequence_pack_tokens' size-adaptive prefix sum —
    # the doc-level manifest relation plans the window form below
    # WINDOW_FORM_MAX_ROWS (sf0.001), two-phase above; the composite
    # llm_pipeline_end_to_end is NOT here (its stage aggregates run
    # behind the eager checkpoint, so the returned plan is a scan)
    "packed_shard_manifest",
    "model_lift_deciles", "mutual_information",
    "ols_multi_regression", "pareto_frontier", "peak_concurrency",
    "percent_rank_global", "poisson_bootstrap_ci", "psi_drift_bins",
    "q11_important_stock",
    "q14_promo_effect", "q15_top_supplier", "q17_small_quantity",
    "q19_brand_discounts", "q22_dormant_customers", "q6_revenue_forecast",
    "rolling_correlation", "rolling_median_7d", "rrf_hybrid_search",
    "rsi_indicator",
    "seasonal_decompose_cma", "sequence_pack_tokens", "share_of_parent",
    "sliding_distinct_users", "stupid_backoff_lm",
    "systematic_sample", "temperature_mix_weights", "tfidf_top_terms",
    "triangle_count", "unigram_lm_score", "vocab_coverage",
    "wasserstein_1d", "welch_ttest",
}


# Companion ratchet, same plan pass: BroadcastNestedLoopJoin is the
# non-equi-join fallback — fine ONLY when one side is a broadcast
# CONSTANT-SIZED relation (a 1-row global aggregate, the query-vector
# side of a top-k, a fold/percentile spec). Every member below is that
# shape; a new entry means a non-equi join crept in whose broadcast
# side must be proven constant-size (or the join re-keyed) before
# whitelisting. (semantic_dedup's centroid broadcast is k = isqrt(n)
# rows — sqrt-bounded rather than constant, justified in
# operators/clustering.py — but it executes EAGERLY behind the
# operator's localCheckpoint, so the returned plan carries no BNLJ and
# the query is deliberately NOT in this set.)
BNLJ_CONSTANT_SIDE = {
    "ann_recall_at_k",  # fixed 20-row query panel + 16-row centroid build sides
    "approx_distinct_rollup", "association_rules", "bm25_search",
    "bitext_margin_mining",  # fixed 20-row query-panel build side
    "dsir_importance_weights",  # 1-row feature-total aggregate
    "hard_negative_mining",  # fixed 20-row query-panel build side
    "stupid_backoff_lm",  # 1-row training-corpus token-total aggregate
    # (knn_label_noise's panel BNLJ executes eagerly behind the votes
    # localCheckpoint — the semantic_dedup pattern — so its RETURNED
    # plan carries no BNLJ and it is deliberately NOT in this set.)

    "heavy_hitter_users", "jl_projection_topk", "js_divergence_sources",
    "kaplan_meier_churn", "kmeans_embeddings", "kmv_distinct_intersection",
    "ndcg_at_k", "q11_important_stock", "q22_dormant_customers",
    "quantile_disc", "rrf_hybrid_search", "similarity_ivf_topk",
    "similarity_topk_cosine",
    "temperature_mix_weights", "tfidf_top_terms", "triangle_count",
    "unigram_lm_score", "vocab_coverage", "walk_forward_splits",
}


# Shuffle-count ratchet (round 8, VERDICT r7 #5): the EXACT number of
# shuffle Exchange nodes in the sf0.001 initial plan of the 20 most
# expensive registry queries (by the committed bench). The shape
# ratchets above catch scale-killer plan CLASSES; this catches a
# regression that silently adds one avoidable extra shuffle to a heavy
# query (e.g. a lost size-hint re-introducing a join where a window
# sufficed, or a dropped reuse re-shuffling the same relation twice).
# A count change — either direction — must be justified in the diff
# that makes it and the number updated explicitly. Iterative kernels
# (BFS / Bellman-Ford / connected components / incremental stores) and
# the TableStore pipeline run their loop shuffles EAGERLY behind
# localCheckpoint / committed writes, so their RETURNED plan tails pin
# at 0-1 — the ratchet then guards against tail regressions (the loop
# bodies are pinned by their own operator tests).
SHUFFLE_COUNT_TOP20 = {
    "pipeline_end_to_end": 0,
    "prepare_corpus": 5,
    # r12: 14 -> 4. The verify stage joins candidate pairs against the
    # checkpointed per-order basket ARRAYS (array_intersect) instead of
    # re-exploding the (order, part) relation through two corpus-sized
    # shuffle joins + a pair-count aggregate + two basket-size joins;
    # basket sizes ride the arrays (n = size). Measured 3.32 -> 2.2 s at
    # sf0.1 and 2.25x at the 10x frontier (linear: 10x/3x = 3.36).
    "set_similarity_prefix_join": 4,
    "bellman_ford_mincost": 0,
    "dedup_keep_best": 1,
    "dedup_connected_components": 0,
    # r11: 7 -> 5. Initial ranks now derive from the checkpointed
    # degree-attached edge relation instead of re-deriving the base
    # join + distinct + degree aggregate in the final job (exchange
    # reuse never crosses the checkpoint boundary); the two exchanges
    # that vanished were exactly that recomputation.
    "pagerank_fixed": 5,
    "bfs_khop": 0,
    "incremental_agg_refresh": 0,
    "kcore_decomposition": 1,
    "simhash_near_pairs": 1,
    # r12: 2 -> 8. The one-scan wide aggregate (whose four
    # COUNT(DISTINCT) planned an Expand multiplying every scanned row
    # 5x) became four pruned single-column branches, each the standard
    # two-exchange single-distinct shape over ~kB of distinct values.
    # More exchanges of tiny aggregates, 5x fewer rows through the
    # scan stage: measured 1.8 -> 0.5 s at sf0.1.
    "data_quality_profile": 8,
    "dedup_ngram_jaccard": 1,
    "dedup_incremental_lsh_store": 0,
    "decontaminate_bloom": 1,
    "approx_distinct": 3,
    "dedup_containment": 1,
    "association_rules": 11,
    "dedup_minhash_lsh": 1,
    "dedup_incremental_lsh": 2,
    # r9: winnowing rewritten to ONE full-relation exchange (VERDICT r8
    # #3 — collect_set by h with map-side dedup + array-side pair HOF;
    # the remaining exchanges are the spread, the post-cap sizes/pairs
    # aggregates and the two small joins); the semantic_dedup pair pins
    # cover the checkpoint-visible tail (Lloyd/IVF assignment runs
    # behind the localCheckpoint)
    "winnow_fingerprint_pairs": 9,
    "semantic_dedup": 4,
    "semantic_dedup_ivf": 4,
    # r9 late extension: the round's new/unpinned entries in the current
    # bench top-20 (hilbert_layout_key is excluded — its dedicated test
    # already pins ZERO exchanges). corpus_curation_funnel's 14 is the
    # four-stage composition (scan filters + text-key window + the
    # dup-span kernel + four per-source aggregates and their joins);
    # source_overlap_matrix's 5 = gram dedup, per-gram source sets, the
    # pair aggregate, totals, display sort; spearman's 5 = the grouped
    # two-phase prefix-sum family's documented shape.
    "source_overlap_matrix": 5,
    "poisson_bootstrap_ci": 2,
    "ngram_novelty_score": 3,
    "quality_repetition": 1,
    "quantile_cont": 1,
    "range_join_event_pairs": 0,
    "spearman_rank_corr": 5,
    # r11: 14 -> 9. s3 (the post-dedup survivor set) is now lazily
    # checkpointed inside _funnel_stages — it feeds three consumers
    # (dup-span base, s4 join, per-source aggregate) and each used to
    # replan the text-key window + upstream scan filters; the five
    # exchanges that vanished were those duplicated subtrees (measured
    # 2.8 -> 1.8 s at sf0.1, and the LLM composite shares the win).
    # r12: 9 -> 8. The dup-span gram gate ">= 2 distinct docs" became
    # min(doc_id) != max(doc_id) — same boolean, but plain map-side
    # combinable aggregates instead of COUNT(DISTINCT)'s second
    # (gram, doc_id) dedup aggregation level; one exchange of the
    # corpus-token-scale pos relation vanished with it.
    "corpus_curation_funnel": 8,
    # r9 late wave: lsh_recall_certification's 8 = the certified truth
    # pipeline (shingle spread, df/prefix windows, candidate distinct,
    # intersection aggregate) + the banded-LSH side + the 3-row bucket
    # aggregate — its corpus is the 1-in-4 certification sample;
    # knn_label_noise's 4 = the panel-window rank, the vote aggregate
    # (checkpoint-visible tail), the majority window and the final
    # sort; stupid_backoff_lm's 9 = the gram collapse, the two model
    # aggregates, three model joins, the per-doc aggregate and sort.
    "lsh_recall_certification": 8,
    "knn_label_noise": 4,
    "stupid_backoff_lm": 9,
    # r11 (VERDICT r10 #2): the round-10 heavies that entered the bench
    # top-20 unpinned. semantic_dedup_incremental_store's 0 = index
    # build + batch probe both run EAGERLY (TableStore writes +
    # localCheckpoint) so the returned keep-set plan is
    # checkpoint-visible, the iterative-kernel convention above.
    # image_near_dup_phash's 1 = the single banded-key candidate
    # aggregate; dHash itself is a no-shuffle Arrow mapInPandas pass
    # and verification rides the banded equi-join's partitioning.
    # packed_sequence_roundtrip's 0 = the packed WRITER materializes
    # through the TableStore before return; the read-back fill
    # accounting is scan-shaped over the stored table.
    # semantic_dedup_ivf3's 4 matches its flat/ivf siblings —
    # coarse/mid/fine assignment runs behind the localCheckpoint, the
    # pinned tail is the cid prune join + keep aggregate family.
    # table_restore_roundtrip's 0 = all versioned DML executes eagerly
    # in the store; the returned post-RESTORE read is a pure scan.
    "semantic_dedup_incremental_store": 0,
    "image_near_dup_phash": 1,
    "packed_sequence_roundtrip": 0,
    "semantic_dedup_ivf3": 4,
    "table_restore_roundtrip": 0,
}


@pytest.mark.parametrize("name", sorted(SHUFFLE_COUNT_TOP20))
def test_shuffle_count_ratchet_top20(spark, name):
    plan = _plan(QS[name](spark, SF_DIR))
    got = len(re.findall(r"\(\d+\) Exchange\b", plan))
    want = SHUFFLE_COUNT_TOP20[name]
    assert got == want, (
        f"{name}: {got} shuffle Exchanges (ratchet pinned {want}) — "
        "justify the plan change and update SHUFFLE_COUNT_TOP20"
    )


def test_single_partition_and_bnlj_ratchets(spark):
    got_sp, got_bnlj = set(), set()
    for name in sorted(QS):
        plan = _plan(QS[name](spark, SF_DIR))
        if "SinglePartition" in plan:
            got_sp.add(name)
        if "BroadcastNestedLoopJoin" in plan:
            got_bnlj.add(name)
    for got, allowed, label in (
        (got_sp, SINGLE_PARTITION_BOUNDED, "single-partition"),
        (got_bnlj, BNLJ_CONSTANT_SIDE, "broadcast-nested-loop"),
    ):
        new = got - allowed
        gone = allowed - got
        assert not new, f"NEW {label} plans (justify + whitelist): {sorted(new)}"
        assert not gone, f"stale {label} whitelist entries (remove): {sorted(gone)}"


# ---------------------------------------------------------------------------
# Round-8 additions
# ---------------------------------------------------------------------------
def test_hilbert_layout_key_plan_is_one_codegen_projection(spark):
    """The Hilbert key must be a pure per-row projection: zero
    exchanges, zero windows, zero Python — and the 16 rotate/reflect
    levels must stay LINEAR named-alias steps (a nested single
    expression duplicates each level's subtree 3-4x and grows the tree
    4^16-fold; the plan-text size bound catches that regression)."""
    plan = _plan(QS["hilbert_layout_key"](spark, SF_DIR))
    assert "Exchange" not in plan and "Window" not in plan, plan[:2000]
    assert "BatchEvalPython" not in plan
    assert "Scan parquet" in plan
    assert len(plan) < 2_000_000, f"plan text {len(plan)} bytes — expression blow-up"


def test_spearman_plan_never_windows_the_fact(spark):
    """Ranks come from prefix-summed distinct-value COUNTS joined back,
    never a row_number/rank window over the fact table: the plan's
    Window operators (the size-adaptive small-scale form) must sit
    above an Aggregate, and the fact side reaches the final moment
    aggregate through hash joins."""
    plan = _plan(QS["spearman_rank_corr"](spark, SF_DIR))
    assert "SinglePartition" not in plan, plan[:2000]
    assert "HashAggregate" in plan and "HashJoin" in plan, plan[:2000]


def test_ks_plan_aggregates_before_windowing(spark):
    """The fact must collapse to per-distinct-value counts (hash
    aggregate) BEFORE any window: the global ECDF windows then run over
    the domain-bounded counts relation, which is what makes the
    SinglePartition whitelisted."""
    plan = _plan(QS["ks_test_two_sample"](spark, SF_DIR))
    first_window = plan.find("Window")
    first_agg = plan.find("HashAggregate")
    assert first_agg != -1 and first_window != -1
    # formatted plans list operators leaves-first, so the aggregate
    # must appear before the window in the numbered tree walk
    m_agg = re.search(r"\((\d+)\) HashAggregate", plan)
    m_win = re.search(r"\((\d+)\) Window", plan)
    assert int(m_agg.group(1)) < int(m_win.group(1)), plan[:2000]


def test_jsd_pair_relation_joins_not_grid(spark):
    """JSD touches only PRESENT (source, token) pairs: the plan must
    contain the token-total equi-join and the broadcast source-total /
    grand-total joins, and no cartesian grid."""
    plan = _plan(QS["js_divergence_sources"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert plan.count("Generate explode") <= 1, plan[:2000]
