"""max_df cap in ngram_jaccard_pairs: mega-df stop-shingles are dropped
from the inverted index before any pair forms, bounding the Σ C(df,2)
blowup; true near-dups that share content beyond the boilerplate still
surface."""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401 — parity with op modules

from clickhouse_objects_analysis_spark.operators.dedup import (
    ngram_jaccard_pairs,
    shingle_sets,
)

#: Every doc opens with the same boilerplate sentence (a mega-df shingle
#: factory); docs 0/1 additionally share their whole body (true near-dup).
BOILER = "terms of service apply to all users"
BODY_DUP = "the quick brown fox jumps over the lazy dog again and again"


def _corpus(spark, n=40):
    rows = [(0, f"{BOILER} {BODY_DUP}"), (1, f"{BOILER} {BODY_DUP} extra")]
    rows += [
        (
            i,
            f"{BOILER} unique content number {i} about topic {i * 7} "
            f"with details {i * 3} and findings {i * 11} plus notes "
            f"{i * 13} appendix {i * 17} end",
        )
        for i in range(2, n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cap_bounds_pair_stream_and_keeps_true_dups(spark):
    docs = _corpus(spark)
    capped = ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, threshold=0.3, max_df=5
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in capped}
    # The genuine near-dup pair survives the cap (its overlap is body
    # content, df=2); boilerplate-only pairs are gone.
    assert (0, 1) in got
    assert all(p == (0, 1) for p in got)


def test_cap_equals_manual_stop_shingle_removal(spark):
    """Capped output must equal exact Jaccard computed on shingle sets
    with the >max_df shingles manually removed — the approximation is
    exactly 'ignore stop-shingles in the numerator', nothing else."""
    docs = _corpus(spark, n=12)
    max_df = 4
    sets = {
        r["id"]: set(r["shingles"])
        for r in shingle_sets(docs, "doc_id", "text", 3).collect()
    }
    from collections import Counter

    df_counts = Counter(s for shs in sets.values() for s in shs)
    stop = {s for s, c in df_counts.items() if c > max_df}
    expected = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len((sets[a] - stop) & (sets[b] - stop))
            union = len(sets[a]) + len(sets[b]) - inter
            if union and inter / union >= 0.05:
                expected[(a, b)] = round(inter / union, 4)
    got = {
        (r["id_a"], r["id_b"]): r["jacc"]
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=0.05, max_df=max_df
        ).collect()
    }
    assert got == expected


def test_uncapped_unchanged(spark):
    """max_df=None keeps the exact semantics (regression guard)."""
    docs = _corpus(spark, n=10)
    exact = ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5)
    assert {(r["id_a"], r["id_b"]) for r in exact.collect()} == {(0, 1)}
