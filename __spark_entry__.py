"""Driver contract for the spark-graft builder (PySpark target).

Delegates to clickhouse_objects_analysis_spark.queries — the named,
oracle-checked registry covering SURVEY.md §2 (relational core, custom
operators, lineage pipeline, LLM-data ops, streaming slice).

Ordering: the driver hash-checks a capped front-to-back window of this
dict, so entries that have NEVER sat in a driver window go first — this
round (r6) that is the 29 queries added or never-sampled in r5
(driver-green union was 199/228), then the 5 rank statistics whose
driver-green rows predate their r5 dist_rank rewrite, then any round-6
additions, then the rest in natural module-import order. Full-registry
verification every round is tools/local_parity.py, which oracle-checks
every entry regardless of this ordering.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clickhouse_objects_analysis_spark.queries import ORACLE, QUERIES

# Never driver-checked as of r5 (CORRECTNESS_r01..r05 union = 199/228):
# the 25 round-5 additions + ann_lsh_topk / ann_ivf_topk /
# tablesample_fraction + the rows-only decode stub.
_NEVER_DRIVER_CHECKED = [
    "ann_ivf_topk",
    "ann_lsh_topk",
    "array_concat_agg",
    "categorical_iv",
    "cramers_v_bias_corrected",
    "delta_sum_timestamp",
    "entropy_agg",
    "exponential_moving_average",
    "group_array_insert_at",
    "group_array_moving_avg",
    "group_concat_agg",
    "kmeans_clusters",
    "lineage_pagerank",
    "mean_z_test",
    "multimodal_decode",
    "multimodal_decode_stub",
    "ngram_novelty",
    "quantile_interpolated_weighted",
    "quantile_timing_weighted",
    "single_value_sum_count",
    "source_orc_roundtrip",
    "source_overlap_matrix",
    "sparkbar_hourly",
    "streaming_join_left_outer",
    "sum_map_filtered",
    "tablesample_fraction",
    "theils_u",
    "token_frequency_spectrum",
    "window_funnel_strict_dedup",
    "zipf_fit",
]

# Rewritten on operators/dist_rank.py in r5; their driver-green rows
# predate the rewrite, so re-verify under the new implementation.
_R5_REWRITTEN = [
    "array_auc",
    "rank_corr_spearman",
    "mann_whitney_utest",
    "kolmogorov_smirnov_test",
    "curriculum_quality_buckets",
]

# Round-6 additions (never driver-checked by definition).
_R6_ADDITIONS: list[str] = [
    "ch_r6_function_surface",
    "corr_matrix",
    "any_heavy_mode",
    "group_array_last_n",
    "json_props_stats",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q11_important_stock",
    "q16_supplier_cnt",
    "q20_part_promotion",
    "q21_waiting_suppliers",
    "anova_ftest",
    "group_array_sorted",
    "kmv_distinct_users",
    "gd_linear_regression",
    "cms_heavy_hitters",
]


def _ordered(mapping: dict) -> dict:
    front = _NEVER_DRIVER_CHECKED + _R5_REWRITTEN + _R6_ADDITIONS
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
