"""Driver contract for the spark-graft builder (PySpark target).

Delegates to clickhouse_objects_analysis_spark.queries — the named,
oracle-checked registry covering SURVEY.md §2 (relational core, custom
operators, lineage pipeline, LLM-data ops, streaming slice).

Ordering: the driver hash-checks a capped front-to-back window of this
dict, so entries that have NEVER sat in a driver window go first. The
r10 window closed the entire backlog (CORRECTNESS_r01..r10 union =
443/443), so round 11 fronts only its own additions (_R11_ADDITIONS,
6 names) and the remaining window slots re-verify previously-green
entries in the historical front order. Full-registry verification every
round is tools/local_parity.py, which oracle-checks every entry
regardless of this ordering (LOCAL_PARITY_r12: 450/450 green).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clickhouse_objects_analysis_spark.queries import ORACLE, QUERIES

# Never driver-green as of r9 (CORRECTNESS_r01..r09 union = 393/412):
# the 19 round-9 additions past the r9 window cut; every one is green in
# LOCAL_PARITY_r09.json.
_NEVER_DRIVER_GREEN = [
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

# Round-10 additions (never driver-checked by definition): appended below
# the 19 carried-over names so the r10 window closes the r9 backlog first.
_R10_ADDITIONS: list[str] = [
    "page_hinkley_drift",
    "kendall_tau_b_binned",
    "gini_split_stump",
    "mutual_information_nmi",
    "population_stability_index",
    "mcnemar_quality_rules",
    "hll_distinct_audit",
    "conformal_interval_calibration",
    "hill_tail_index",
    "kish_effective_sample_size",
    "cohens_kappa_rules",
    "kruskal_wallis_htest",
    "brown_forsythe_variance",
    "good_turing_chao1",
    "james_stein_nation_means",
    "logrank_test",
    "delta_method_ratio_ci",
    "hodges_lehmann_shift",
    "ece_reliability_bins",
    "theil_atkinson_inequality",
    "ch_r10_function_surface",
    "cochran_armitage_trend",
    "gumbel_block_maxima",
    "pacf_yule_walker",
    "tukey_hsd_pairs",
    "markov_removal_attribution",
    "goodman_kruskal_lambda",
    "goodman_kruskal_gamma",
    "odds_ratio_ci",
    "segmented_trend_break",
    "source_neardup_leakage",
]

# Round-11 additions (never driver-checked by definition). The r10
# window closed the whole backlog (443/443 driver-green union), so the
# r11 window is free: these go first, the rest of the 50 slots re-check
# previously-green entries.
_R11_ADDITIONS: list[str] = [
    "ch_r11_function_surface",
    "ch_r11_function_surface_2",
    "lineage_write_edges",
    "gopher_repetition_rules",
    "pii_redaction_scan",
    "minhash_estimate_calibration",
]

# Round-12 additions (never driver-checked by definition): front of the
# window; the union through r11 is 449/449 driver-green so every other
# slot is a re-verify.
_R12_ADDITIONS: list[str] = [
    "ch_r12_function_surface",
]

# Round-13 additions (never driver-checked): front of the window.
_R13_ADDITIONS: list[str] = [
    "ch_r13_function_surface",
    "ch_r13_function_surface_2",
    "ch_r13_function_surface_3",
    "ch_r13_function_surface_4",
    "dict_hierarchy_walk",
]


def _ordered(mapping: dict) -> dict:
    front = (
        _R13_ADDITIONS + _R12_ADDITIONS + _R11_ADDITIONS
        + _NEVER_DRIVER_GREEN + _R10_ADDITIONS
    )
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
