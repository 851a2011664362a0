#!/usr/bin/env python
"""Benchmark: run the registered query set at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Every query is forced through the noop sink (full materialization — a bare
count() would let Catalyst prune the projected expressions away and
under-report).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clickhouse_objects_analysis_spark.queries import QUERIES
from clickhouse_objects_analysis_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Ten mixed-cost sentinels re-run in a FRESH JVM at the end of the
#: bench (r8 verdict #4): if in-session timings drift vs fresh-process
#: timings, the round-over-round signal is session aging (pinned blocks,
#: JIT state, heap fragmentation); if they agree but calibration moved,
#: it's host drift. One subprocess answers which.
SENTINELS = [
    "q1_pricing_summary", "q18_large_volume_customer", "asof_join",
    "quantiles", "window_ranking", "dedup_exact",
    "ngram_jaccard_pairs", "ann_cosine_topk", "lang_id",
    "lineage_edges",
]


def sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _cal_best(spark, n_rows: int, reps_: int) -> float:
    """Data-independent host-speed probe (see the main() comment)."""
    import pyspark.sql.functions as F

    runs = []
    for _ in range(reps_):
        t0 = time.perf_counter()
        (
            spark.range(n_rows)
            .select((F.col("id") % 97).alias("k"), F.col("id"))
            .groupBy("k")
            .agg(F.sum("id").alias("s"), F.count("id").alias("c"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def sentinel_main() -> None:
    """Fresh-JVM sentinel pass (invoked as `bench.py --sentinel` in a
    subprocess): warm up, run the 10 sentinels best-of-2 plus the long
    calibration, print ONE JSON line for the parent to embed."""
    spark = get_spark("bench-sentinel")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    out: dict[str, float] = {}
    for name in SENTINELS:
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
        out[name] = round(min(runs), 3)
    cal = _cal_best(spark, 8_000_000_000, 3)
    print(
        json.dumps(
            {"sentinels": out, "calibration_long_sec": cal},
            separators=(",", ":"),
        )
    )


def main() -> None:
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on the flagship query (not timed).
    QUERIES["q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    # Arrow/Python-worker warmup (not timed): the first pandas_udf in the
    # run otherwise gets charged several seconds of worker spin-up that
    # belongs to the session, not the query.
    import pyspark.sql.functions as F

    from clickhouse_objects_analysis_spark.operators.similarity import dot_pd

    (
        spark.range(10_000)
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .select(F.array(F.lit(1.0), F.lit(2.0)).alias("a"))
        .select(dot_pd("a", "a").alias("d"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # Streaming engine warmup, timed once as the SETUP figure: the first
    # StreamingQuery in a JVM pays ~8-10 s of class loading / state-store
    # provider init that belongs to the session, not to whichever
    # streaming query happens to run first. One throwaway availableNow
    # replay absorbs it; the per-query entries below are steady-state
    # (their own per-run checkpoint + microbatch cost only).
    from clickhouse_objects_analysis_spark.streaming.pipeline import (
        tumbling_counts,
    )

    t0 = time.perf_counter()
    tumbling_counts(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    streaming_setup = round(time.perf_counter() - t0, 3)

    # Fixed calibration micro-query: a data-independent spark.range agg
    # whose cost depends only on host speed (CPU + JVM), never on the
    # query set or sf. Round-over-round comparisons divide per-query
    # times by the ratio of calibration_sec values to cancel uniform
    # host slowdowns (virtualization jitter, thermal state) instead of
    # explaining them in prose. Best of 3.
    calibration = _cal_best(spark, 50_000_000, 3)
    # The 50M figure lands at ~0.3-0.6 s, where fresh-process best-of-3
    # still swings ±25% (measured r7: 0.329 / 0.414 / 0.499 across three
    # JVMs) — job-overhead-dominated, too noisy to resolve host factors
    # under ~1.3x. 8B rows is compute-dominated and measured ±1% within
    # a JVM (5.571/5.504/5.498); use THIS one for round-over-round
    # normalization from r7 on (the short one stays for continuity with
    # the r6 record). r9 (verdict #4): measured at pre / mid / post so
    # within-run host drift is visible, plus a fresh-JVM sentinel pass at
    # the end to split host drift from session aging.
    calibration_long = _cal_best(spark, 8_000_000_000, 3)

    # Best-of-N per query (default 2): single-shot timings on this host
    # show rare multi-second spikes (JVM GC / virtualization jitter) that
    # land on arbitrary queries — two back-to-back runs and taking the min
    # reports the query's actual cost, not the noise floor.
    #
    # r10 verdict #3 (noise model): the r10 end-of-round run measured the
    # SAME code ~27% slower than a mid-round run (cal_mid 6.38 vs 4.45),
    # making round-over-round per-query ratios meaningless. Three
    # additions make the artifact noise-robust:
    #   1. every raw pass is stored (BENCH_FULL.json "raw_passes"),
    #   2. a cheap data-independent probe (1B-row range-agg, best-of-2,
    #      ~2 s) runs every CAL_EVERY queries → "cal_track",
    #   3. "queries_norm" divides each query's best time by its window's
    #      host-speed factor (local probe / fastest probe of the run),
    #      i.e. every number is restated as-if the whole run happened at
    #      the host's best observed state. Round-over-round comparisons
    #      should use queries_norm (and cal_ref to cross-normalize
    #      between rounds).
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    cal_every = int(os.environ.get("SPARK_GRAFT_CAL_EVERY", "32"))
    timings: dict[str, float] = {}
    raw_passes: dict[str, list[float]] = {}
    cal_track: list[list[float]] = []  # [query_index, probe_sec]
    ordered = sorted(QUERIES)
    cal_mid = None
    for qi, name in enumerate(ordered):
        if qi == len(ordered) // 2:
            cal_mid = _cal_best(spark, 8_000_000_000, 3)
        if qi % cal_every == 0:
            cal_track.append([qi, _cal_best(spark, 1_000_000_000, 2)])
        runs: list[float] = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        # Adaptive third rep: when the two runs disagree badly on a
        # non-trivial query, a noise spike hit one (or both) of them —
        # one more sample prevents a 3x-inflated floor from being
        # reported as the query's cost.
        if len(runs) >= 2 and min(runs) > 0.5 and max(runs) > 1.5 * min(runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
        raw_passes[name] = [round(r, 3) for r in runs]
    cal_track.append([len(ordered), _cal_best(spark, 1_000_000_000, 2)])

    cal_post = _cal_best(spark, 8_000_000_000, 3)

    # Host-state normalization: for each query, the local host-speed
    # factor is the linear interpolation of the two surrounding probes,
    # referenced to the fastest probe of the run.
    cal_ref = min(c for _, c in cal_track)

    def _cal_at(qi: float) -> float:
        for (i0, c0), (i1, c1) in zip(cal_track, cal_track[1:]):
            if i0 <= qi <= i1:
                if i1 == i0:
                    return c0
                return c0 + (c1 - c0) * (qi - i0) / (i1 - i0)
        return cal_track[-1][1]

    queries_norm = {
        name: round(timings[name] * cal_ref / _cal_at(qi), 3)
        for qi, name in enumerate(ordered)
    }
    total_norm = round(sum(queries_norm.values()), 3)
    noise_model = {
        "method": "best-of-%d (adaptive 3rd rep on >1.5x spread); "
        "per-window host normalization via interleaved 1B-row probes"
        % reps,
        "cal_ref": cal_ref,
        "cal_spread": round(
            max(c for _, c in cal_track) / cal_ref, 3
        ),
        "cal_every": cal_every,
        "norm_rule": "queries_norm[q] = best(q) * cal_ref / "
        "interp(cal_track at q's index)",
    }

    # Fresh-JVM sentinel pass (r8 verdict #4): subprocess = new JVM, new
    # Python workers, empty block manager. Comparing its sentinel times
    # to THIS session's times for the same queries separates session
    # aging from host drift; its calibration vs cal_pre/mid/post bounds
    # within-round host movement.
    fresh: dict = {}
    try:
        import subprocess

        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--sentinel"],
            capture_output=True,
            text=True,
            timeout=900,
            env=dict(os.environ),
        )
        for ln in reversed(proc.stdout.strip().splitlines()):
            try:
                fresh = json.loads(ln)
                break
            except json.JSONDecodeError:
                continue
    except Exception as exc:  # sentinel pass is diagnostics, never fatal
        fresh = {"error": str(exc)[:200]}
    sentinel_delta = {}
    for name in SENTINELS:
        fv = (fresh.get("sentinels") or {}).get(name)
        if fv and name in timings and timings[name] > 0:
            sentinel_delta[name] = round(fv / timings[name], 3)

    total = round(sum(timings.values()), 3)
    sf = sf_of(SF_DIR)

    # Full per-query timings: side file + an EARLY stdout line. The
    # driver keeps only the last 2000 chars of stdout and json-parses the
    # final line — a ~150-entry queries dict blows that budget (rounds 1-2
    # recorded "parsed": null because the one fat line was truncated
    # mid-dict). So the detail goes first, and the FINAL line is a compact
    # headline subset guaranteed to fit the tail.
    full = {
        "metric": "total_query_set_runtime",
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "queries": timings,
        "sf": sf,
        # one-time streaming engine spin-up (class loading, state-store
        # provider init) — paid once per JVM, excluded from the per-query
        # steady-state entries
        "streaming_setup_sec": streaming_setup,
        # host-speed normalizer (see comment at the measurement site)
        "calibration_sec": calibration,
        "calibration_long_sec": calibration_long,
        # within-run drift probes + fresh-JVM control (r8 verdict #4)
        "cal_pre": calibration_long,
        "cal_mid": cal_mid,
        "cal_post": cal_post,
        "fresh_session": fresh,
        "fresh_over_insession": sentinel_delta,
        # noise-robust view (r10 verdict #3)
        "raw_passes": raw_passes,
        "cal_track": cal_track,
        "queries_norm": queries_norm,
        "value_norm": total_norm,
        "noise_model": noise_model,
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_FULL.json"),
        "w",
    ) as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
    print(json.dumps(full, separators=(",", ":")))

    headline = [
        "q1_pricing_summary", "q3_shipping_priority",
        "q5_local_supplier_volume", "q18_large_volume_customer",
        "asof_join", "range_bin_join", "skew_salted_join",
        "bucketed_colocated_join", "join_full_outer",
        "grouping_sets", "quantiles", "with_totals",
        "window_ranking", "window_funnel", "cumulative_daily_revenue",
        "hypertable_rollup", "dedup_exact", "dedup_minhash_lsh",
        "dedup_simhash", "dedup_clusters", "ngram_jaccard_pairs",
        "semantic_dedup", "incremental_dedup_batch",
        "ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk",
        "knn_classify", "embedding_neardup_pairs",
        "text_quality", "lang_id", "token_count", "doc_fingerprint",
        "gopher_quality_rules", "tfidf_top_terms",
        "decontaminate_ngram_overlap", "passage_chunking",
        "multimodal_frame_sample", "streaming_tumbling_window",
        "streaming_stateful_state", "streaming_dedup",
        "lineage_edges", "lineage_transitive_closure",
        "mutation_delete_where", "sink_partitioned_parquet",
        "linear_regression_agg", "boilerplate_span_scrub",
        "lttb_downsample", "rank_corr_spearman",
        # round-6 continuation: gram-pipeline rewrites + new families
        "ngram_novelty", "token_frequency_spectrum",
        "q21_waiting_suppliers", "q2_min_cost_supplier",
        "anova_ftest", "gd_linear_regression",
        "cms_heavy_hitters", "kmv_distinct_users",
        # round-7: IVF dedup path + moments/DSIR additions
        "semantic_dedup_ivf", "dsir_importance_weights",
        "skew_kurt_samp", "covar_pop_matrix",
        # round-7 sessions 6-23: retrieval/dedup/graph/audit additions
        "bigram_lm_cross_entropy", "rrf_hybrid_retrieval",
        "dedup_survivorship", "neardup_graph_triangles",
        "char_ngram_jaccard_pairs", "rake_keyword_extraction",
        "bloom_semijoin_prune", "bootstrap_mean_ci",
        "dynamic_partition_pruning_join", "kaplan_meier_survival",
    ]
    compact = {
        "metric": "total_query_set_runtime",
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "queries": {n: timings[n] for n in headline if n in timings},
        "sf": sf,
        "streaming_setup_sec": streaming_setup,
        "calibration_sec": calibration,
        "calibration_long_sec": calibration_long,
        "cal_pre": calibration_long,
        "cal_mid": cal_mid,
        "cal_post": cal_post,
        "fresh_cal": fresh.get("calibration_long_sec"),
        "fresh_over_insession": sentinel_delta,
        "value_norm": total_norm,
        # full noise_model (method prose, cal_track) lives in
        # BENCH_FULL.json; the stdout line carries the two numbers a
        # cross-round comparison needs
        "noise_model": {
            "cal_ref": noise_model["cal_ref"],
            "cal_spread": noise_model["cal_spread"],
        },
        "full": "BENCH_FULL.json",
    }
    line = json.dumps(compact, separators=(",", ":"))
    while len(line) >= 1900 and compact["queries"]:
        # keep the line inside the driver's budget by shedding trailing
        # headline entries; the full per-query map is in BENCH_FULL.json
        compact["queries"].popitem()
        compact["queries_truncated"] = True
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    if "--sentinel" in sys.argv:
        sentinel_main()
    else:
        main()
