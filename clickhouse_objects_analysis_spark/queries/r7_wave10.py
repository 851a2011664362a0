"""Round-7 session-10 queries: windowed z-score spike detection,
parquet schema-evolution merge reads, and quantileDeterministic.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has none of these; the z-score monitor is the anomaly
complement of psi_drift/cusum_changepoint, schema evolution is a
first-class 100 TB lake concern (batches gain columns over time), and
quantileDeterministic is the ClickHouse aggregate whose determinator
argument replaces RNG sampling with a reproducible hash."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.io import scratch_path
from .registry import query, tables


def _sf_key(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/")) or "default"


@query(
    "rate_spike_zscore",
    oracle="""
    WITH base AS (
        SELECT event_type,
               datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
    w AS (
        SELECT event_type, d, c,
               CAST(COUNT(*) OVER win AS BIGINT)      AS n,
               CAST(SUM(c)  OVER win AS BIGINT)       AS s1,
               CAST(SUM(c * c) OVER win AS BIGINT)    AS s2
        FROM base
        WINDOW win AS (PARTITION BY event_type ORDER BY d
                       ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING)),
    z AS (
        SELECT event_type, CAST(d AS BIGINT) AS d, c, n,
               (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)
                   AS var,
               c - CAST(s1 AS DOUBLE) / n AS dev
        FROM w WHERE n >= 7)
    SELECT event_type, d, c,
           FLOOR(dev / sqrt(var) * 10000 + 0.5) / 10000 AS z
    FROM z WHERE var > 0 ORDER BY event_type, d
    """,
)
def rate_spike_zscore_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score rate monitor: each day's event count
    scored against the mean/stddev of the PRECEDING 14 days (current
    day excluded — a spike must not inflate its own baseline), the
    spike-alert complement of psi_drift (distributional) and
    cusum_changepoint (retrospective). Days with fewer than 7 prior
    samples or zero variance are unscored.

    Float parity: the window emits integer (n, Σc, Σc²) — exact under
    any accumulation order — and mean/variance/z are ONE fixed
    expression over those integers, quantized floor(z·1e4+0.5) (not
    round(): integer-ratio inputs sit on .00005 boundaries where
    Spark's shortest-repr rounding diverges). Scale: one shuffle on
    the series key; the window is ROWS-bounded so state is O(15) per
    series regardless of volume."""
    ev = tables(spark, sf_dir)["events"]
    base = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d"),
    ).agg(F.count("*").cast("long").alias("c"))
    win = (
        Window.partitionBy("event_type").orderBy("d").rowsBetween(-14, -1)
    )
    w = base.select(
        "event_type",
        F.col("d").cast("long").alias("d"),
        "c",
        F.count("*").over(win).cast("long").alias("n"),
        F.sum("c").over(win).cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).over(win).cast("long").alias("s2"),
    ).filter(F.col("n") >= 7)
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n")
    ) / (F.col("n") - 1)
    dev = F.col("c") - F.col("s1").cast("double") / F.col("n")
    z = F.floor(dev / F.sqrt(var) * 10000 + F.lit(0.5)) / 10000
    return (
        w.withColumn("var", var)
        .filter(F.col("var") > 0)
        .select("event_type", "d", "c", z.alias("z"))
        .orderBy("event_type", "d")
    )


@query(
    "source_schema_evolution",
    oracle="""
    WITH u AS (
        SELECT CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END AS batch,
               o_totalprice,
               CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
                   AS o_orderpriority
        FROM orders)
    SELECT CAST(batch AS BIGINT) AS batch,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(o_orderpriority) AS BIGINT) AS n_priority,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM u GROUP BY batch ORDER BY batch
    """,
)
def source_schema_evolution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet batches — the lake reality a
    100 TB pipeline must survive: batch 1 (even orderkeys) is written
    WITHOUT o_orderpriority, batch 2 (odd) WITH it; the merged read
    (`mergeSchema=true` + partition discovery over batch=N dirs) must
    union the schemas, null-fill the missing column for old files, and
    keep aggregates exact. The oracle replays the split from the
    source table, so a row lost or a column mis-aligned in the
    round trip cannot hash-match.

    Scale note: mergeSchema performs footer-schema union at planning
    time — O(files) driver work, the documented cost of evolving
    schemas; steady-state readers should pin an explicit read schema
    instead (the read_csv discipline in sources/io.py)."""
    o = tables(spark, sf_dir)["orders"]
    root = scratch_path("sinks", _sf_key(sf_dir), "schema_evo", "x")
    root = os.path.dirname(root)
    o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    ).write.mode("overwrite").parquet(os.path.join(root, "batch=1"))
    o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).write.mode("overwrite").parquet(os.path.join(root, "batch=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(root)
    return (
        merged.groupBy(F.col("batch").cast("long").alias("batch"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.count("o_orderpriority").cast("long").alias("n_priority"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).cast("long").alias("sum_cents"),
        )
        .orderBy("batch")
    )


@query(
    "quantile_deterministic",
    oracle="""
    WITH keyed AS (
        SELECT event_type, value,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id)
                   AS rk
        FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           FLOOR(median(value) * 1000000 + 0.5) / 1000000 AS median_sampled
    FROM keyed WHERE rk <= 100
    GROUP BY event_type ORDER BY event_type
    """,
)
def quantile_deterministic_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `quantileDeterministic(x, determinator)`: reservoir
    quantile whose sample is chosen by a HASH of the determinator
    column instead of an RNG, so reruns (and engine swaps) see the
    identical sample. Here: per event type, the 100 rows with the
    lowest md5(event_id) digests form the reservoir and the exact
    interpolated median of `value` over that sample is reported —
    the md5 hex ORDER itself is the selection, no float in the
    sampling path at all.

    Scale: the rank-per-group is one window over the group key — at
    100 TB swap row_number for a per-partition top-100 + 100-row merge
    (the weighted_reservoir_sample plan) to avoid sorting whole
    groups; semantics are identical because the hash order is total."""
    ev = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    sampled = ev.select(
        "event_type", "value", F.row_number().over(w).alias("rk")
    ).filter(F.col("rk") <= 100)
    med = F.expr("percentile(value, 0.5)")
    return (
        sampled.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_sampled"),
            (F.floor(med * 1000000 + F.lit(0.5)) / 1000000).alias(
                "median_sampled"
            ),
        )
        .orderBy("event_type")
    )
