"""Driver contract for the spark-graft builder (PySpark target).

Delegates to clickhouse_objects_analysis_spark.queries — the named,
oracle-checked registry covering SURVEY.md §2 (relational core, custom
operators, lineage pipeline, LLM-data ops, streaming slice).

Ordering: the driver hash-checks a capped front-to-back window of this
dict, so entries that have NEVER sat in a driver window go first — this
round (r7) that is the 2 not-yet-driver-green queries
(`group_array_last_n`, fixed to emit a canonicalizer-safe string column;
`kmv_user_overlap`, which landed after the r6 window was cut), then the
round-7 additions, then the rest in natural module-import order.
Full-registry verification every round is tools/local_parity.py, which
oracle-checks every entry regardless of this ordering.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clickhouse_objects_analysis_spark.queries import ORACLE, QUERIES

# Never driver-green as of r6 (CORRECTNESS_r01..r06 union = 243/245):
# group_array_last_n erred in the r6 window on the driver canonicalizer
# (now emits a string column); kmv_user_overlap landed after the r6
# window was cut.
_NEVER_DRIVER_GREEN = [
    "group_array_last_n",
    "kmv_user_overlap",
]

# Round-7 additions (never driver-checked by definition).
_R7_ADDITIONS: list[str] = [
    "semantic_dedup_ivf",
    "skew_kurt_samp",
    "covar_pop_matrix",
    "ch_r7_function_surface",
    "dsir_importance_weights",
    "ch_r7_function_surface_2",
    "substring_dup_spans",
    "heaps_law_fit",
    "bitmap_segment_ops",
    "ch_r7_function_surface_3",
    "ann_pq_topk",
    "lineage_cycle_detection",
    "morton_zorder_locality",
    "string_distance_suite",
    "ch_r7_function_surface_4",
    "ch_r7_function_surface_5",
    "gd_logistic_regression",
    "parts_storage_stats",
    "bm25_retrieval",
    "incremental_minhash_dedup",
    "bpe_merge_training",
    "sequence_match_time_gap",
    "html_text_extraction",
    "audio_wav_decode",
    "video_avi_frame_sample",
    "generate_series_source",
    "udtf_sentence_split",
    "streaming_series_source",
    "ch_r7_function_surface_6",
    "image_resize_real",
    "export_sharded_dataset",
    "record_linkage_fuzzy_join",
    "association_rules",
    "tukey_outlier_fences",
    "dominant_period_autocorr",
    "cusum_changepoint",
    "theil_sen_slope",
    "holt_linear_smoothing",
    "psi_drift",
    "benford_digit_audit",
    "seasonal_decompose_weekday",
    "mann_kendall_trend",
    "benjamini_hochberg_fdr",
    "gini_source_concentration",
    "bigram_lm_cross_entropy",
    "hard_negative_mining",
    "containment_overlap_pairs",
    "rrf_hybrid_retrieval",
    "dedup_survivorship",
    "neardup_graph_triangles",
    "uniq_upto_agg",
    "unpivot_lineitem_metrics",
    "holt_winters_weekday",
    "weighted_reservoir_sample",
    "flesch_reading_ease",
    "mmr_diversified_rerank",
    "rolling_median_7d",
    "funnel_conversion_time",
    "rate_spike_zscore",
    "source_schema_evolution",
    "quantile_deterministic",
    "bigram_pmi_top",
    "rolling_7d_active_users",
    "stratified_weighted_sample",
    "bloom_semijoin_prune",
    "dict_has_or_default",
    "mad_robust_scale",
    "trimmed_mean_value",
    "first_touch_attribution",
    "event_transition_matrix",
    "embedding_centroid_drift",
    "table_profile_orders",
    "ch_url_form_surface",
    "rake_keyword_extraction",
    "scd2_dimension_merge",
    "lateral_view_surface",
    "char_ngram_jaccard_pairs",
    "k_anonymity_audit",
    "embedding_label_outliers",
    "knn_eval_metrics",
    "dup_cluster_size_histogram",
    "ship_latency_by_priority",
    "sql_udf_surface",
    "variant_json_surface",
    "deletion_vector_read",
    "dynamic_partition_pruning_join",
    "linear_touch_attribution",
    "quality_threshold_sweep",
    "embedding_dimension_stats",
    "snapshot_diff_report",
    "referential_integrity_audit",
    "functional_dependency_audit",
    "dedup_method_overlap",
    "bootstrap_mean_ci",
    "top_event_paths",
    "kaplan_meier_survival",
    "longest_event_streak",
    "seasonal_naive_backtest",
    "lorenz_curve_customers",
    "copurchase_item_similarity",
    "rfm_segmentation",
    "new_vs_returning_daily",
    "ab_test_power_analysis",
    "session_bounce_rate",
    "multimodal_binary_dedup",
    "topk_plus_other_rollup",
]


def _ordered(mapping: dict) -> dict:
    front = _NEVER_DRIVER_GREEN + _R7_ADDITIONS
    out = {k: mapping[k] for k in front if k in mapping}
    out.update((k, v) for k, v in mapping.items() if k not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-shape pricing summary on sf0.001 (scan → pushed
    filter → hash agg → sort; SURVEY §7 M0)."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, with the
    never-driver-verified entries front-loaded (see module docstring)."""
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL equivalents; keys without an entry are the
    deliberately non-SQL-expressible ops (approx sketches, LSH candidate
    sets, stubbed decoders) → rows-only checks."""
    return _ordered(dict(ORACLE))
