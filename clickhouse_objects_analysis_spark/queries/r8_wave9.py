"""Round-8 query wave 9: isotonic regression calibration — the
monotone recalibration step every quality-classifier pipeline runs
before thresholding scores (Platt's sibling with no parametric form).

Computed EXACTLY via the minimax characterization of the pool-adjacent-
violators solution: over score buckets b (ascending), the isotonic fit
is   fitted(b) = max_{i<=b} min_{j>=b} wavg(i..j)
with wavg the positive-rate of the pooled buckets i..j. After the
per-bucket aggregation the problem is BUCKETS-sized (20 rows), so the
cubic minimax enumeration is a constant-cost tail on an otherwise
map-side scan — the 100 TB shape is one aggregation plus driver-trivial
algebra, not an iterative PAV state machine.

Reference parity note: no calibration surface in the reference; extends
the ML-curation charter (SURVEY §7) alongside gd_logistic_regression /
curriculum_quality_buckets.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import query, tables

_NB = 20  # score buckets
_BW = 28  # n_chars per bucket (testdata n_chars spans ~48..553)


@query(
    "isotonic_calibration",
    oracle=f"""
    WITH agg AS (
        SELECT least(CAST(floor(n_chars / {_BW}) AS BIGINT), {_NB - 1})
                   AS bucket,
               CAST(COUNT(*) AS BIGINT) AS w,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                    AS BIGINT) AS pos
        FROM documents GROUP BY 1
    ),
    pre AS (
        SELECT bucket, w, pos,
               SUM(w) OVER (ORDER BY bucket) AS cw,
               SUM(pos) OVER (ORDER BY bucket) AS cp
        FROM agg
    ),
    pairs AS (
        SELECT i.bucket AS i, j.bucket AS j,
               CAST(j.cp - i.cp + i.pos AS DOUBLE)
                   / (j.cw - i.cw + i.w) AS avg_ij
        FROM pre i JOIN pre j ON i.bucket <= j.bucket
    ),
    inner_min AS (
        SELECT b.bucket AS b, p.i, MIN(p.avg_ij) AS m
        FROM pre b JOIN pairs p ON p.i <= b.bucket AND p.j >= b.bucket
        GROUP BY b.bucket, p.i
    ),
    fit AS (SELECT b, MAX(m) AS fitted FROM inner_min GROUP BY b)
    SELECT a.bucket, a.w, a.pos,
           CAST(floor(CAST(a.pos AS DOUBLE) / a.w * 1000000 + 0.5)
                AS BIGINT) AS raw_rate_u,
           CAST(floor(f.fitted * 1000000 + 0.5) AS BIGINT) AS fitted_u
    FROM agg a JOIN fit f ON f.b = a.bucket
    ORDER BY a.bucket
    """,
)
def isotonic_calibration_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration of a length-derived quality score against
    the binary outcome lang = 'en': documents bucket by n_chars (20
    fixed-width bins), and the monotone fit comes from the minimax
    formula over pooled-bucket positive rates (ratios of exact integer
    prefix sums — both engines build the identical doubles, and the
    rendered fit is scaled-floor). The cross-bucket enumeration runs on
    the 20-row aggregate: three tiny joins, no per-document state."""
    d = tables(spark, sf_dir)["documents"]
    bucket = F.least(
        F.floor(F.col("n_chars") / _BW).cast("long"), F.lit(_NB - 1)
    )
    agg = d.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("w"),
        F.sum((F.col("lang") == "en").cast("long"))
        .cast("long")
        .alias("pos"),
    )
    # 20 rows post-aggregation: the global window is constant-sized.
    cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    pre = agg.select(
        "bucket", "w", "pos",
        F.sum("w").over(cum).alias("cw"),
        F.sum("pos").over(cum).alias("cp"),
    )
    i, j = pre.alias("i"), pre.alias("j")
    pairs = (
        i.join(j, F.col("i.bucket") <= F.col("j.bucket"))
        .select(
            F.col("i.bucket").alias("pi"),
            F.col("j.bucket").alias("pj"),
            (
                (F.col("j.cp") - F.col("i.cp") + F.col("i.pos")).cast(
                    "double"
                )
                / (F.col("j.cw") - F.col("i.cw") + F.col("i.w"))
            ).alias("avg_ij"),
        )
    )
    inner_min = (
        pre.select(F.col("bucket").alias("b"))
        .join(
            pairs,
            (F.col("pi") <= F.col("b")) & (F.col("pj") >= F.col("b")),
        )
        .groupBy("b", "pi")
        .agg(F.min("avg_ij").alias("m"))
    )
    fit = inner_min.groupBy("b").agg(F.max("m").alias("fitted"))
    return (
        agg.join(fit, agg["bucket"] == fit["b"])
        .select(
            "bucket", "w", "pos",
            F.floor(F.col("pos").cast("double") / F.col("w") * 1000000 + 0.5)
            .cast("long")
            .alias("raw_rate_u"),
            F.floor(F.col("fitted") * 1000000 + 0.5)
            .cast("long")
            .alias("fitted_u"),
        )
        .orderBy("bucket")
    )
