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
# the official oracle check each round. Round 6 front-loads (a0) the 15
# queries registered this round; (a) the 5 checked-last-round queries whose
# implementation changed this round (bloom probe-parameter coupling ->
# decontaminate_bloom; parquet-footer n_hint sourcing -> peak_concurrency /
# pareto_frontier / abc_classification / percent_rank_global, the last two
# also picking up the one-sort prefix_sum total); then (b) ALL 30 queries
# whose latest green driver row is round 2 (the staleness ceiling —
# VERDICT r5 item 1), which closes the window at exactly 50. The 36
# r3-stale queries are queued immediately after the boundary for round 7
# (VERDICT r5 item 7). Entries behind the window all have green rows in
# CORRECTNESS_r03-r05.json; every query is also oracle-diffed locally in
# tests/test_oracle_parity.py on every run.
_CHECK_FIRST = (
    # (a0) registered this round — never driver-checked
    "dedup_incremental_lsh_store",
    "weighted_median",
    "asof_join_nearest",
    "cusum_mean_shift",
    "equi_depth_histogram",
    "argmax_per_group",
    "yoy_growth",
    "share_of_parent",
    "benford_first_digit",
    "contingency_chi_square",
    "stratified_kfold",
    "unknown_member_join",
    "bitmap_exact_distinct",
    "systematic_sample",
    "minhash_jaccard_estimate",
    # (a) implementation changed this round
    "decontaminate_bloom",
    "peak_concurrency",
    "pareto_frontier",
    "abc_classification",
    "percent_rank_global",
    # (b) r2 greens — the full 30-query staleness ceiling, alphabetical
    "funnel_conversion",
    "impute_group_mean",
    "lang_id_ngram",
    "merge_insert_only",
    "merge_upsert_full_outer",
    "mode_per_group",
    "multimodal_features",
    "pack_sequences",
    "pii_scrub",
    "prepare_corpus",
    "q12_ship_delay",
    "q13_order_distribution",
    "q14_promo_effect",
    "q17_small_quantity",
    "q22_dormant_customers",
    "q6_revenue_forecast",
    "quality_repetition",
    "range_join_event_pairs",
    "salted_skew_join",
    "scalar_expressions",
    "simhash_near_pairs",
    "stratified_sample",
    "surrogate_key_join",
    "text_quality_score",
    "timeseries_gap_fill",
    "token_count",
    "train_val_test_split",
    "watermark_max_date",
    "window_relative_rank",
    "zscore_cap",
    # --- 50-query window boundary is here (15 new + 5 changed + 30
    # r2-stale). Below: the round-7 queue — embedding_neardup_pairs
    # first (its implementation changed to banded sign-LSH late in
    # round 6, after the window filled), then the 25 wave-2/3 queries
    # registered late in round 6 (locally oracle-diffed every pytest
    # run; driver-checked first thing next round), then the 36
    # r3-stale queries ---
    "embedding_neardup_pairs",
    "kaplan_meier_churn",
    "bollinger_breakout",
    "rolling_correlation",
    "seasonal_decompose_cma",
    "rsi_indicator",
    "mutual_information",
    "format_mask_profile",
    "hypothetical_rank",
    "ab_test_proportions",
    "skew_kurtosis_moments",
    "kmv_distinct_intersection",
    "countmin_frequency",
    "feature_hashing",
    "sliding_distinct_users",
    # wave-3 (also round 6, also locally oracle-diffed every run)
    "auc_roc",
    "calibration_bins",
    "confusion_matrix_metrics",
    "psi_drift_bins",
    "ols_multi_regression",
    "anova_oneway",
    "association_rules",
    "zipf_law_fit",
    "readability_scores",
    "largest_remainder_allocation",
    "conversion_lag_median",
    "bm25_search",
    "boilerplate_removal",
    "corr_regression_stats",
    "cumulative_distinct_users",
    "data_quality_profile",
    "dedup_containment",
    "domain_cap_sample",
    "embedding_decontaminate",
    "event_transition_matrix",
    "events_hourly_unique_users",
    "file_format_roundtrip",
    "forward_fill_locf",
    "heavy_hitter_users",
    "incremental_agg_refresh",
    "interval_coalesce",
    "kmeans_embeddings",
    "m4_downsample",
    "multimodal_frame_sample",
    "pagerank_fixed",
    "quantile_cont",
    "rolling_anomaly_zscore",
    "salted_aggregation",
    "scd2_point_in_time",
    "session_paths_topk",
    "split_leakage_audit",
    "tfidf_top_terms",
    "time_grain_rollup",
    "time_weighted_average",
    "token_entropy_quality",
    "unigram_lm_score",
    "user_day_streaks",
    "vector_arithmetic_hof",
    "vocab_coverage",
    "weighted_sample",
    "winsorize_percentile",
    "zorder_layout_key",
)


def _prioritized(registry: dict) -> dict:
    head = {k: registry[k] for k in _CHECK_FIRST if k in registry}
    tail = {k: v for k, v in registry.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _prioritized(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _prioritized(dict(ORACLES))
