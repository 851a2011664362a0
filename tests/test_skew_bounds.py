"""Skew-fixture property tests (r8 verdict #8): synthetic whale
baskets, a hot join key, and a near-duplicate blob cluster — asserting
CANDIDATE-STREAM CARDINALITY BOUNDS, not just output correctness. These
are the patterns that pass every sf0.01 value check and then go
quadratic on one bad key at corpus scale; the bounds here are the ones
SCALE.md documents for the capped operators.
"""

from __future__ import annotations

from math import comb

import pyspark.sql.functions as F

from clickhouse_objects_analysis_spark.operators.dedup import (
    ngram_jaccard_pairs,
)
from clickhouse_objects_analysis_spark.operators.skew import (
    SALT_COL,
    salted_join,
    with_salt,
)
from clickhouse_objects_analysis_spark.queries.r7_wave25 import (
    capped_basket_pairs,
)

_WHALE_BASKET = 2000
_N_NORMIES = 50
_NORMIE_BASKET = 10
_CAP = 64


def _whale_fixture(spark):
    """One bot/reseller account with a 2000-item basket plus 50 normal
    customers with 10 items each (normie items shared across customers
    so cross-customer co-occurrence survives the cap)."""
    rows = [(0, p) for p in range(_WHALE_BASKET)]
    for c in range(1, _N_NORMIES + 1):
        rows += [(c, p) for p in range(_NORMIE_BASKET)]
    return spark.createDataFrame(rows, "cust long, part long")


def test_whale_basket_pair_stream_bound(spark):
    """The capped pair stream must be EXACTLY
    Σ_cust C(min(basket, cap), 2): the whale contributes C(64,2)=2016
    pairs, not C(2000,2)=1,999,000 — a 991x stream reduction on this
    fixture alone."""
    cp = _whale_fixture(spark)
    capped = capped_basket_pairs(cp, _CAP)
    expected = comb(_CAP, 2) + _N_NORMIES * comb(_NORMIE_BASKET, 2)
    assert capped.count() == expected
    # and the whale's own contribution is the capped triangle
    whale = capped.filter(F.col("cust") == 0).count()
    assert whale == comb(_CAP, 2)


def test_whale_cap_no_op_below_cap(spark):
    """A cap larger than every basket must be a byte-for-byte no-op —
    the property that keeps the sf0.01 oracle hash unchanged."""
    cp = _whale_fixture(spark).filter(F.col("cust") > 0)  # normies only
    uncapped = (
        cp.alias("a")
        .join(cp.alias("b"), "cust")
        .filter(F.col("a.part") < F.col("b.part"))
        .count()
    )
    assert capped_basket_pairs(cp, _CAP).count() == uncapped


def test_hot_key_salted_join_exact_and_spread(spark):
    """One key holds 96%% of the fact rows. The salted join must (a)
    return exactly the unsalted result and (b) spread the hot key's
    rows across (nearly) all n_salts buckets instead of one task."""
    n_hot, n_salts = 20000, 16
    fact = spark.range(n_hot).select(
        F.lit("hot").alias("k"), F.col("id").alias("rid")
    )
    cold = spark.range(800).select(
        F.concat(F.lit("c"), (F.col("id") % 100).cast("string")).alias(
            "k"
        ),
        (F.col("id") + n_hot).alias("rid"),
    )
    fact = fact.unionAll(cold)
    dim = spark.createDataFrame(
        [("hot", 1)] + [(f"c{i}", i + 2) for i in range(100)],
        "k string, payload int",
    )
    out = salted_join(fact, dim, ["k"], ["rid"], n_salts=n_salts)
    plain = fact.join(dim, "k")
    assert out.count() == plain.count() == n_hot + 800
    assert (
        out.select(F.sum("payload")).first()[0]
        == plain.select(F.sum("payload")).first()[0]
    )
    spread = (
        with_salt(fact.filter(F.col("k") == "hot"), ["rid"], n_salts)
        .select(SALT_COL)
        .distinct()
        .count()
    )
    assert spread == n_salts  # 20k hashed rows hit every salt bucket


def test_blob_cluster_max_df_bounds_pair_stream(spark):
    """A cluster of identical documents makes every shingle's df equal
    the cluster size, so the uncapped inverted-index pair stream is
    n_shingles * C(df, 2). With max_df below the cluster size those
    stop-shingles drop BEFORE the pair join — the candidate stream for
    the blob collapses to zero (documented lower-bound semantics), while
    genuinely small-df near-dup pairs elsewhere still surface."""
    blob_text = "alpha beta gamma delta epsilon zeta eta theta iota"
    rows = [(i, blob_text) for i in range(100)]
    # a separate near-dup pair with unique low-df shingles
    rows += [
        (1000, "one two three four five six seven"),
        (1001, "one two three four five six eight"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # uncapped on a trimmed blob (20 docs) — the exact quadratic count
    small = df.filter((F.col("doc_id") < 20) | (F.col("doc_id") >= 1000))
    uncapped = ngram_jaccard_pairs(
        small, "doc_id", "text", k=3, threshold=0.5
    )
    assert uncapped.filter(F.col("id_a") < 20).count() == comb(20, 2)

    capped = ngram_jaccard_pairs(
        df, "doc_id", "text", k=3, threshold=0.5, max_df=64
    )
    pairs = capped.collect()
    # blob pairs (df=100 > 64) are gone; the low-df near-dup survives
    assert all(r["id_a"] >= 1000 for r in pairs), pairs[:5]
    assert any(
        r["id_a"] == 1000 and r["id_b"] == 1001 for r in pairs
    ), pairs
