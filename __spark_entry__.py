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
# the official oracle check each round. Round 5 front-loads (a) queries whose
# implementation changed this round: the size-adaptive two-phase family
# (rfm/abc/pareto/percent_rank via operators/ids.py dispatch), the
# skew-adaptive triangle closure, and the bounded-before-collect inverted
# index; then (b) every query by STALENESS of its latest green driver row —
# all 15 r1-only greens, then the r2 block alphabetically as far as the
# 50-entry window reaches (44 r2 queries exist; the ~27 that do not fit
# rotate in next round). Entries
# rotated behind the window all have green rows in CORRECTNESS_r02-r04.json;
# every query is also oracle-diffed locally in tests/test_oracle_parity.py
# on every run.
_CHECK_FIRST = (
    # (a0) registered this round — never driver-checked
    "revenue_gini",
    "peak_concurrency",
    "recursive_month_spine",
    "rolling_range_window",
    "asof_join_forward",
    "topk_per_group_with_ties",
    "feature_minmax_scale",
    "events_session_window",
    "approx_distinct_rollup",
    "k_anonymity_audit",
    "dedup_incremental_lsh",
    "reservoir_sample_per_group",
    "decontaminate_bloom",
    "categorical_label_encode",
    "linear_interpolate",
    # (a) implementation changed this round
    "customer_rfm_segmentation",
    "abc_classification",
    "pareto_frontier",
    "percent_rank_global",
    "triangle_count",
    "inverted_index_postings",
    # (b) r1-only greens (stalest first)
    "collect_set_sorted",
    "cube_aggregate",
    "date_dimension",
    "date_enrichment",
    "distinct_count",
    "fk_integrity_audit",
    "histogram_totalprice",
    "pivot_event_counts",
    "quantile_disc",
    "scd2_dimension",
    "similarity_ivf_topk",
    "similarity_lsh_topk",
    "similarity_topk_cosine",
    "string_functions",
    "unpivot_event_counts",
    # (b) r2 greens, alphabetical
    "asof_join_attribution",
    "chunk_documents",
    "cohort_retention",
    "correlated_subquery",
    "dataset_mix_shards",
    "decontaminate_ngrams",
    "dedup_connected_components",
    "dedup_keep_best",
    "dedup_row_number",
    "dedup_segments",
    "distinct_dimension",
    "doc_fingerprint",
    "embedding_centroids",
    "embedding_neardup_pairs",
    # --- 50-query window boundary is here (15 round-5 queries + 6
    # changed + 15 r1 + the r2 block through embedding_neardup_pairs);
    # the ~29 remaining r2 greens below rotate in next round ---
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
    "salted_aggregation",
    "salted_skew_join",
    "scalar_expressions",
    "simhash_near_pairs",
    "split_leakage_audit",
    "stratified_sample",
    "surrogate_key_join",
    "text_quality_score",
    "token_count",
    "train_val_test_split",
    "watermark_max_date",
    "weighted_sample",
    "zscore_cap",
)


def _prioritized(registry: dict) -> dict:
    head = {k: registry[k] for k in _CHECK_FIRST if k in registry}
    tail = {k: v for k, v in registry.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _prioritized(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _prioritized(dict(ORACLES))
