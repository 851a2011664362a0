"""Round-7 session-19 queries: quality-threshold calibration sweep and
per-dimension embedding statistics.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has neither; the sweep is the filter-calibration curve a
curation run reads before picking a quality cutoff (how much data —
and how many tokens — each candidate threshold costs), and the
dimension stats are the embedding-health profile (dead/low-variance
dimensions) read before training an IVF index or a quantizer on the
column."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.text import quality_score
from .registry import query, tables

_Q_SQL = """
        SELECT doc_id,
               CAST(FLOOR((0.4 * least(len(ws) / 100.0, 1.0)
                     + 0.4 * len(list_distinct(ws))
                           / greatest(len(ws), 1)::DOUBLE
                     + 0.2 * (1 - least(punct
                           / greatest(n_chars, 1)::DOUBLE * 10, 1.0)))
                     * 1000000 + 0.5) AS BIGINT) AS q_micro,
               CAST(len(ws) AS BIGINT) AS n_words
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(trim(text), '\\s+'),
                                 x -> length(x) > 0) AS ws,
                     length(text) AS n_chars,
                     length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                         AS punct
              FROM documents)
"""


@query(
    "quality_threshold_sweep",
    oracle=f"""
    WITH q AS ({_Q_SQL}),
    t AS (SELECT unnest([100000, 300000, 500000, 700000, 900000])
              AS t_micro),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM q)
    SELECT CAST(t.t_micro AS BIGINT) AS t_micro,
           CAST(COUNT(*) FILTER (WHERE q.q_micro >= t.t_micro) AS BIGINT)
               AS n_kept,
           FLOOR(CAST(COUNT(*) FILTER (WHERE q.q_micro >= t.t_micro)
                 AS DOUBLE) / ANY_VALUE(tot.n_total) * 10000 + 0.5) / 10000
               AS kept_share,
           CAST(COALESCE(SUM(q.n_words)
                FILTER (WHERE q.q_micro >= t.t_micro), 0) AS BIGINT)
               AS tokens_kept,
           CAST(COALESCE(SUM(q.q_micro)
                FILTER (WHERE q.q_micro >= t.t_micro), 0) AS BIGINT)
               AS sum_q_micro
    FROM t CROSS JOIN q CROSS JOIN tot
    GROUP BY t.t_micro ORDER BY t_micro
    """,
)
def quality_threshold_sweep_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-calibration sweep: for five candidate quality cutoffs,
    how many documents — and how many TOKENS, the number that actually
    prices a training run — survive, plus the kept quality mass. This
    is the curve read before committing a threshold: the knee between
    'keeps everything' and 'starves the token budget'.

    The quality score is the registry's text_quality formula quantized
    to integer micro-units per document BEFORE any aggregation, so all
    five sweep points aggregate exact integers (mean quality =
    sum_q_micro / n_kept, derivable by the reader without float
    exposure). One pass computes the per-doc scores; the sweep is a
    5-literal broadcast cross join — the corpus is scanned once, not
    five times."""
    d = tables(spark, sf_dir)["documents"]
    q = d.select(
        F.floor(quality_score(F.col("text")) * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("q_micro"),
        F.size(
            F.filter(
                F.split(F.trim("text"), r"\s+"), lambda x: F.length(x) > 0
            )
        ).cast("long").alias("n_words"),
    ).localCheckpoint(eager=False)  # one scan feeds all sweep points
    tot = q.agg(F.count("*").cast("long").alias("n_total"))
    t = spark.createDataFrame(
        [(100000,), (300000,), (500000,), (700000,), (900000,)],
        "t_micro long",
    )
    kept = F.col("q_micro") >= F.col("t_micro")
    share = F.col("n_kept").cast("double") / F.col("n_total")
    return (
        F.broadcast(t)
        .crossJoin(q)
        .crossJoin(F.broadcast(tot))
        .groupBy("t_micro")
        .agg(
            F.sum(kept.cast("long")).cast("long").alias("n_kept"),
            F.first("n_total").alias("n_total"),
            F.coalesce(F.sum(F.when(kept, F.col("n_words"))), F.lit(0))
            .cast("long")
            .alias("tokens_kept"),
            F.coalesce(F.sum(F.when(kept, F.col("q_micro"))), F.lit(0))
            .cast("long")
            .alias("sum_q_micro"),
        )
        .select(
            "t_micro",
            "n_kept",
            (F.floor(share * 10000 + F.lit(0.5)) / 10000).alias("kept_share"),
            "tokens_kept",
            "sum_q_micro",
        )
        .orderBy("t_micro")
    )


@query(
    "embedding_dimension_stats",
    oracle="""
    WITH q AS (
        SELECT list_transform(embedding::DOUBLE[],
                              x -> CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT))
                   AS v
        FROM embeddings),
    d AS (SELECT g.i AS dim, g.x
          FROM q, (SELECT unnest(v) AS x,
                          generate_subscripts(v, 1) AS i) AS g),
    s AS (SELECT dim,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS s1,
                 CAST(SUM(x * x) AS BIGINT) AS s2,
                 CAST(MIN(x) AS BIGINT) AS min_micro,
                 CAST(MAX(x) AS BIGINT) AS max_micro
          FROM d GROUP BY dim)
    SELECT CAST(dim AS BIGINT) AS dim,
           FLOOR(CAST(s1 AS DOUBLE) / n / 1000000.0 * 1000000 + 0.5)
               / 1000000 AS mean_val,
           FLOOR(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                      / (n - 1)) / 1000000.0 * 1000000 + 0.5) / 1000000
               AS std_val,
           min_micro, max_micro,
           (sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                 / (n - 1)) / 1000000.0 < 0.01) AS low_variance
    FROM s ORDER BY dim
    """,
)
def embedding_dimension_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding health profile: mean, sample std,
    min/max per coordinate, and a low-variance flag — the check run
    before trusting an IVF index or int8 quantizer on the column (a
    dead dimension wastes a codebook axis; an unbounded one dominates
    L2). Components quantize to integer micro-units so (n, Σx, Σx²)
    are exact under any row/partition order, and mean/std are one
    fixed expression over those integers (Σx² of micro-units stays
    under 2^63 to ~10^9 rows at |x|≤1; past that, re-scale the grid).
    One 64× posexplode feeding a map-side-combined groupBy — output is
    64 rows regardless of corpus size."""
    e = tables(spark, sf_dir)["embeddings"]
    q = e.select(
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000000 + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("v")
    )
    d = q.select(F.posexplode("v").alias("dim0", "x")).select(
        (F.col("dim0") + 1).cast("long").alias("dim"), "x"
    )
    s = d.groupBy("dim").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
        F.min("x").cast("long").alias("min_micro"),
        F.max("x").cast("long").alias("max_micro"),
    )
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n")
    ) / (F.col("n") - 1)
    std_units = F.sqrt(var) / F.lit(1000000.0)
    mean_units = F.col("s1").cast("double") / F.col("n") / F.lit(1000000.0)
    q6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return s.select(
        "dim",
        q6(mean_units).alias("mean_val"),
        q6(std_units).alias("std_val"),
        "min_micro",
        "max_micro",
        (std_units < 0.01).alias("low_variance"),
    ).orderBy("dim")
