"""Driver contract for the spark-graft builder (PySpark target).

Delegates to clickhouse_objects_analysis_spark.queries — the named,
oracle-checked registry covering SURVEY.md §2 (relational core, custom
operators, lineage pipeline, LLM-data ops, streaming slice).

Ordering: the driver hash-checks a capped front-to-back window of this
dict, so entries that have NEVER sat in a driver window go first — this
round (r9) that is the 49 queries left over after the r8 window
(driver-green union after r8 = 343/392: 8 r7-overflow + 41 round-8
additions), followed by the 17 round-9 additions, then the rest in
natural module-import order. The 50-entry r9 window covers the 49
carried-over names plus the first r9 addition; the other 16 r9 names
are LOCAL_PARITY-green and queue for the r10 window.
Full-registry verification every round is tools/local_parity.py, which
oracle-checks every entry regardless of this ordering.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clickhouse_objects_analysis_spark.queries import ORACLE, QUERIES

# Never driver-green as of r8 (CORRECTNESS_r01..r08 union = 343/392):
# the 49 names below (r7-overflow tail + all round-8 additions past the
# r8 window cut); every one is green in LOCAL_PARITY_r08.json.
_NEVER_DRIVER_GREEN = [
    "lorenz_curve_customers",
    "copurchase_item_similarity",
    "rfm_segmentation",
    "new_vs_returning_daily",
    "ab_test_power_analysis",
    "session_bounce_rate",
    "multimodal_binary_dedup",
    "topk_plus_other_rollup",
    "ch_r8_function_surface",
    "ch_r8_function_surface_2",
    "ab_ztest_power_suite",
    "k_core_decomposition",
    "grid_spatial_join",
    "cohort_retention_matrix",
    "ctr_wilson_ranking",
    "js_divergence_sources",
    "token_coverage_curve",
    "stratified_kfold_assignment",
    "nonnegative_derivative_rate",
    "compaction_planning",
    "lineage_depth_levels",
    "ch_r8_function_surface_3",
    "url_canonicalize_dedup",
    "base58_roundtrip",
    "feature_hashing_vectorizer",
    "markov_next_event_accuracy",
    "geo_function_surface",
    "label_propagation_communities",
    "isotonic_calibration",
    "cross_correlation_leadlag",
    "granger_causality_lag1",
    "url_significant_domain",
    "bpe_encode_apply",
    "ch_r8_function_surface_4",
    "join_skew_audit",
    "time_decay_attribution",
    "nelson_aalen_hazard",
    "u_shaped_attribution",
    "difference_in_differences",
    "sprt_sequential_monitor",
    "cuped_variance_reduction",
    "sample_ratio_mismatch",
    "personalized_pagerank_copurchase",
    "interarrival_burstiness",
    "simpsons_paradox_audit",
    "cohort_ltv_curve",
    "markov_entropy_rate",
    "covariate_balance_smd",
    "count_overdispersion_index",
]

# Round-9 additions (never driver-checked by definition): appended below
# the 49 carried-over names so the 50-entry r9 window closes the r1-r8
# backlog first.
_R9_ADDITIONS: list[str] = [
    "time_weighted_average",
    "ohlc_daily_bars",
    "ewma_smoothing",
    "theil_sen_trend",
    "equi_depth_histogram",
    "association_rules_lift",
    "winnowing_fingerprints",
    "geohashes_in_box",
    "neyman_allocation",
    "source_vocab_overlap",
    "quality_dedup_confusion",
    "quantile_treatment_effect",
    "bayes_beta_posterior_ab",
    "segment_uplift_table",
    "char_class_profile",
    "dedup_threshold_roi",
    "record_linkage_fs",
    "dow_hour_heatmap",
    "simpson_diversity_sources",
    "wasserstein_length_drift",
]


def _ordered(mapping: dict) -> dict:
    front = _NEVER_DRIVER_GREEN + _R9_ADDITIONS
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
