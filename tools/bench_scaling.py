"""Scaling bench (VERDICT r3 item 6): time the headline queries at
sf0.1 and at the 10x synthesized sf1 (tools/make_scaled_sf.py), and
record per-query scaling exponents.

exponent = log10(t_sf1 / t_sf0.1) for a 10x data step: 1.0 = linear,
< 1 = sublinear (fixed overheads amortizing), > 1 = superlinear (named
cause required in SCALE.md).

Writes BENCH_sf1.json at the repo root.

Usage: python tools/bench_scaling.py [sf1_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_objects_analysis_spark.queries import QUERIES  # noqa: E402
from clickhouse_objects_analysis_spark.queries.llm_wave4 import (  # noqa: E402
    semantic_dedup_ivf_labels,
)
from clickhouse_objects_analysis_spark.session import get_spark  # noqa: E402
from clickhouse_objects_analysis_spark.streaming import pipeline  # noqa: E402

#: Bench-only callables measured alongside the registry: the IVF dedup
#: pipeline WITHOUT its exact-baseline recall gate (the registry's
#: semantic_dedup_ivf builds the quadratic exact pair set to assert
#: recall, which would drown the IVF path's scaling exponent).
EXTRA_BENCH = {
    "semantic_dedup_ivf_path": semantic_dedup_ivf_labels,
}

#: Streaming queries whose post-run pipeline.STATE_METRICS snapshot is
#: attached to the bench record (numRowsTotal / memoryUsedBytes per
#: batch) — registry name -> STATE_METRICS tag.
STATE_TAGS = {
    "streaming_dedup": "streaming_dedup",
    "streaming_join_left_outer": "stream_stream_left_outer",
    "streaming_stream_stream_join": "stream_stream_click_purchase",
    "streaming_stateful_state": "stateful_user_peaks",
}

SF01 = "/root/testdata/sf0.1"

#: Always-measured operator families (one per family even when cheap).
MUST_HAVE = [
    "q1_pricing_summary", "q3_shipping_priority", "q8_market_share",
    "q9_product_profit", "q18_large_volume_customer",
    "asof_join", "range_bin_join", "skew_salted_join",
    "window_funnel", "window_ranking", "quantiles",
    "linear_regression_agg",
    "dedup_exact", "dedup_minhash_lsh", "dedup_clusters",
    "ngram_jaccard_pairs", "semantic_dedup",
    "embedding_neardup_pairs", "ann_cosine_topk",
    "text_quality", "tfidf_top_terms",
    "streaming_tumbling_window",
    "boilerplate_span_scrub", "rank_corr_spearman", "lttb_downsample",
    "simhash_hamming_pairs", "mann_whitney_utest",
    "kolmogorov_smirnov_test", "max_intersections",
    "array_auc", "curriculum_quality_buckets", "limit_with_ties",
    "weighted_median", "quantiles_exact_weighted", "kmeans_clusters",
    "ngram_novelty", "normalize_text_dedup",
    # round-9 additions: measured families
    "time_weighted_average", "ohlc_daily_bars", "ewma_smoothing",
    "equi_depth_histogram", "association_rules_lift",
    "winnowing_fingerprints", "geohashes_in_box",
    "source_vocab_overlap", "quality_dedup_confusion",
]


def headline(root: str, top_n: int = 50) -> list[str]:
    """MUST_HAVE plus the top-N most expensive registry queries from the
    latest full bench (VERDICT r4 item 7: every family with real cost
    gets a measured exponent), deduped, registry-validated."""
    import json as _json

    costs: dict[str, float] = {}
    try:
        with open(os.path.join(root, "BENCH_FULL.json")) as fh:
            costs = _json.load(fh).get("queries", {})
    except OSError:
        pass
    by_cost = sorted(costs, key=lambda n: -costs[n])[:top_n]
    out, seen = [], set()
    for n in MUST_HAVE + by_cost:
        if n in QUERIES and n not in seen:
            seen.add(n)
            out.append(n)
    return out


def run_query(df) -> None:
    """Materialize through the noop sink — same convention as bench.py.
    A driver-side collect() would (a) charge driver serialization to the
    query and (b) blow the driver heap on pair-output queries at large
    SFs (the r6 sf10 run died exactly this way on ngram_jaccard_pairs /
    simhash_hamming_pairs: millions of result rows collected into a 16g
    heap)."""
    df.write.format("noop").mode("overwrite").save()


def best_of(fn, runs: int = 2, between=None) -> float:
    """Min wall-clock over ``runs`` invocations; ``between`` (the
    reclaim hook) runs after every iteration EXCEPT inside the timed
    window — without it, iteration 1's localCheckpoint blocks (a
    60M-row checkpoint at sf10 for the copurchase cp) are still pinned
    when iteration 2 re-materializes its own, and the 16g heap dies in
    BlockManager.doPut (observed r10: OOM on the second sf10 run of a
    query that passes alone)."""
    ts = []
    for i in range(runs):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
        if between is not None and i < runs - 1:
            between()
    return min(ts)


def main() -> None:
    """Default: sf0.1 -> .scratch/sf1 over the headline set, writing
    BENCH_sf1.json. Generalized step (the sf1 -> sf10 second decade,
    VERDICT r5 item 4):

        python tools/bench_scaling.py BIG_DIR --small SMALL_DIR \\
            --out FILE --names n1,n2,... --label "sf1 -> sf10 (10x rows)"
    """
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    argv = sys.argv[1:]

    def opt(flag: str, default: str) -> str:
        if flag in argv:
            i = argv.index(flag)
            val = argv[i + 1]
            del argv[i : i + 2]
            return val
        return default

    small = opt("--small", SF01)
    out_file = opt("--out", os.path.join(root, "BENCH_sf1.json"))
    names_arg = opt("--names", "")
    label = opt("--label", "sf0.1 -> sf1 (10x rows)")
    big = argv[0] if argv else os.path.join(root, ".scratch", "sf1")

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM + python workers + streaming engine once
    run_query(QUERIES["q1_pricing_summary"](spark, small))
    run_query(QUERIES["streaming_tumbling_window"](spark, small))

    lookup = dict(QUERIES)
    lookup.update(EXTRA_BENCH)
    names = (
        [n for n in names_arg.split(",") if n in lookup]
        if names_arg
        else headline(root) + list(EXTRA_BENCH)
    )
    small_key = f"{os.path.basename(small.rstrip('/'))}_sec"
    big_key = f"{os.path.basename(big.rstrip('/'))}_sec"
    print(f"measuring {len(names)} queries: {small} -> {big}", flush=True)
    out: dict[str, dict] = {}

    def state_snapshot(tag: str) -> list[dict] | None:
        snaps = pipeline.STATE_METRICS.get(tag)
        return snaps or None

    def reclaim() -> None:
        """Release checkpoint/cache blocks the finished query pinned.
        Iterative operators (k_core, label_propagation, the CC loop)
        localCheckpoint edges-sized intermediates; the blocks are only
        reaped after BOTH the Python references die and the JVM object
        is collected — without forcing that here, a big-SF sweep
        carries each query's pinned blocks into the next one and OOMs
        queries that fit comfortably on their own (observed: sf10
        k_core 66 s green, then the NEXT query's heap death)."""
        import gc as _gc

        _gc.collect()
        try:
            spark._jvm.System.gc()  # noqa: SLF001
        except Exception:  # noqa: BLE001 - GC nudge is best-effort
            pass

    def flush_partial() -> None:
        with open(out_file, "w") as f:
            json.dump({"step": label, "queries": out}, f, indent=1)

    for name in names:
        fn = lookup[name]
        try:
            t_small = best_of(lambda: run_query(fn(spark, small)), between=reclaim)
            state_small = state_snapshot(STATE_TAGS.get(name, ""))
            reclaim()
            t_big = best_of(lambda: run_query(fn(spark, big)), between=reclaim)
            state_big = state_snapshot(STATE_TAGS.get(name, ""))
            reclaim()
        except Exception as ex:  # noqa: BLE001 - record, try to go on
            out[name] = {"err": f"{type(ex).__name__}: {ex}"[:200]}
            print(name, "ERR", out[name]["err"], flush=True)
            flush_partial()
            reclaim()
            continue
        exp = math.log10(t_big / t_small) if t_small > 0 else None
        out[name] = {
            small_key: round(t_small, 3),
            big_key: round(t_big, 3),
            "ratio": round(t_big / t_small, 2),
            "exponent": round(exp, 3),
        }
        if state_big is not None:
            out[name]["state_" + small_key[:-4]] = state_small
            out[name]["state_" + big_key[:-4]] = state_big
        print(name, out[name], flush=True)
        flush_partial()

    # Watermark-eviction probe (directive r6#3): event-time-sliced dedup
    # replay on the unique key; plateau_ok/bounded_ok must hold at every
    # measured scale or the watermark story is prose, not behavior.
    probes = {}
    for tag, d in (("small", small), ("big", big)):
        probes[tag] = {"dir": d, **pipeline.dedup_state_probe(spark, d)}
        print("state_probe", tag, probes[tag], flush=True)
        if not (probes[tag]["plateau_ok"] and probes[tag]["bounded_ok"]):
            print(f"STATE PLATEAU VIOLATION at {d}", flush=True)

    with open(out_file, "w") as f:
        json.dump(
            {"step": label, "queries": out, "state_probe": probes},
            f,
            indent=1,
        )


if __name__ == "__main__":
    main()
