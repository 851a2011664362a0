"""Deterministic integer k-means over embedding columns.

Iterative algorithms are where cross-engine determinism usually dies:
float centroid means accumulate in engine-specific order, and a
last-ulp difference flips a borderline assignment in the next
iteration.  This implementation makes every step EXACT integer
arithmetic, so the whole trajectory is reproducible bit-for-bit on any
engine:

- vectors quantize to int64 at 1e-6 (``round(x·1e6)``);
- distances are exact int64 squared-L2 sums (64 dims × (2e6)² ≈ 2.6e14
  per pair — far inside int64);
- the argmin encodes tie-breaks integrally: ``enc = dist·k + cluster``,
  so ``min(enc)`` picks smallest distance then smallest cluster id, and
  ``enc DIV k`` recovers the exact distance for the inertia report;
- centroid updates are element-wise integer mean (``sum DIV count``),
  keeping the next iteration's inputs integral.

Initialization is the k lowest-id vectors (deterministic, no RNG).

Scale shape: each iteration is one broadcast cross join against the k
centroid rows (k·n skinny rows, map-side), one hash aggregate per
vector for the argmin, and a (cluster, dim)-keyed aggregate +
map-rebuild for the update — no driver-side loops over data, no
single-task sorts; the only per-iteration driver work is scheduling.
A 100 TB corpus runs the same plan with the centroid table still k
rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def quantize_vectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, arr) with arr = round(vec·1e6) as array<long>."""
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col), lambda x: F.round(x * 1e6, 0).cast("long")
        ).alias("arr"),
    )


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kmeans_assignments(
    e: DataFrame, k: int = 4, iters: int = 2, dim: int | None = None
) -> DataFrame:
    """Run ``iters`` exact-integer Lloyd iterations over ``e`` (from
    quantize_vectors). Returns one row per vector: (id, cl, dist)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if dim is None:
        dim = e.select(F.size("arr")).head()[0]
    cents = (
        e.orderBy("id")
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy("id")) - 1).alias("cl"),
            F.col("arr").alias("c"),
        )
    )
    for it in range(iters):
        j = e.crossJoin(F.broadcast(cents))
        enc = _sq_dist(F.col("arr"), F.col("c")) * k + F.col("cl")
        assigned = j.groupBy("id").agg(
            F.min(enc).alias("enc"), F.first("arr").alias("arr")
        )
        a = assigned.select(
            "id", "arr", (F.col("enc") % k).alias("cl"),
            F.expr(f"enc DIV {k}").alias("dist"),
        )
        if it == iters - 1:
            break  # the final assignment needs no centroid rebuild
        n_cl = a.groupBy("cl").agg(F.count(F.lit(1)).alias("n"))
        sums = (
            a.select("cl", F.posexplode("arr").alias("pos", "v"))
            .groupBy("cl", "pos")
            .agg(F.sum("v").alias("s"))
        )
        # element-wise integer mean: s DIV n truncates toward zero on
        # BOTH engines (verified against DuckDB's //), so negative sums
        # stay deterministic
        cents = (
            sums.groupBy("cl")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct(F.col("pos"), F.col("s")))
                ).alias("m")
            )
            .join(F.broadcast(n_cl), "cl")
            .withColumn(
                "c",
                F.expr(
                    f"transform(sequence(0, {dim - 1}), "
                    f"i -> element_at(m, i) DIV n)"
                ),
            )
            .select("cl", "c")
        )
    return a


def kmeans_report(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Per-cluster report after ``iters`` iterations: cluster id, member
    count, scaled inertia (Σ dist DIV 1000 — exact int64, identical on
    any engine)."""
    e = quantize_vectors(vectors, id_col, vec_col)
    a = kmeans_assignments(e, k=k, iters=iters)
    return (
        a.groupBy(F.col("cl").cast("long").alias("cluster"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum(F.expr("dist DIV 1000")).cast("long").alias("inertia_k"),
        )
        .orderBy("cluster")
    )
