"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's registry
(one entry per implemented operator from SURVEY.md §2, plus the
scale-extension operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from designing_data_warehouse_in_sql_server_spark.plans import QUERIES, ORACLES
from designing_data_warehouse_in_sql_server_spark.plans.parity import flagship_revenue

# Importing these modules populates the registry.
import designing_data_warehouse_in_sql_server_spark.plans.parity  # noqa: F401
import designing_data_warehouse_in_sql_server_spark.plans.analytics  # noqa: F401
import designing_data_warehouse_in_sql_server_spark.plans.extensions  # noqa: F401
import designing_data_warehouse_in_sql_server_spark.plans.training  # noqa: F401
import designing_data_warehouse_in_sql_server_spark.plans.quality  # noqa: F401


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_revenue(spark, "/root/testdata/sf0.001")


# The driver's correctness harness verifies the registry front-to-back (each
# round covers the first 50 entries), so ordering decides which queries get
# the official oracle check each round. Round 4 front-loads (a) queries with
# NO green driver row yet: the 7 registered this round plus the two approx
# sketches, which gained deterministic verified-approximate oracles this round
# (previously `no_oracle` by design); (b) queries whose implementation changed
# this round (batched multi-ordering ntile for RFM, two-phase pareto skyline,
# single-token bigram guard, integer-div fuzzy pair counts, and every star plan
# whose forced customer/supplier broadcast was dropped in favor of AQE); then
# (c) queries whose only green driver row is from round 1, oldest first, per
# the round-3 verdict's rotation ask. Entries rotated behind the window all
# have green rows in CORRECTNESS_r02/r03.json; every query is also
# oracle-diffed locally in tests/test_oracle_parity.py on every run.
_CHECK_FIRST = (
    # (a) never driver-checked: new round-4 queries
    "last_touch_attribution",
    "dyadic_ewma",
    "percent_rank_global",
    "triangle_count",
    "repeat_purchase_interval",
    "late_event_ratio",
    "inverted_index_postings",
    # (a) approx sketches, oracle-verified for the first time
    "approx_distinct",
    "approx_percentiles",
    # (b) implementation changed this round
    "customer_rfm_segmentation",
    "abc_classification",
    "pareto_frontier",
    "corpus_bigram_topk",
    "fuzzy_name_pairs",
    "mad_outliers",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q15_top_supplier",
    "q16_supplier_relationship",
    "q18_large_orders",
    "q19_brand_discounts",
    "q20_promotion_candidates",
    "q21_waiting_supplier",
    "flagship_revenue",
    "topk_per_group",
    "basket_brand_pairs",
    # (c) r1-only greens, oldest first
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "sessionize_events",
    "json_extract_events",
    "q1_pricing_summary",
    "q4_order_priority",
    "dedup_exact_hash",
    "events_tumbling_window",
    "events_sliding_window",
    "window_running_sum",
    "window_lag_lead_delta",
    "window_first_last",
    "ntile_quartiles",
    "topk_orders",
    "set_operations",
    "rollup_aggregate",
    "grouping_sets_aggregate",
    # --- 50-query window boundary is here ---
    "pivot_event_counts",
    "unpivot_event_counts",
    "distinct_count",
    "quantile_disc",
    "histogram_totalprice",
    "mode_per_group",
    "string_functions",
    "scalar_expressions",
    "date_enrichment",
    "date_dimension",
    "surrogate_key_join",
    "correlated_subquery",
    "impute_group_mean",
    "zscore_cap",
    "dedup_row_number",
    "distinct_dimension",
    "watermark_max_date",
    "fk_integrity_audit",
    "similarity_topk_cosine",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
)


def _prioritized(registry: dict) -> dict:
    head = {k: registry[k] for k in _CHECK_FIRST if k in registry}
    tail = {k: v for k, v in registry.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _prioritized(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _prioritized(dict(ORACLES))
