"""Round-7 session-12 queries: dictHas/dictGetOrDefault, robust scale
statistics (MAD, trimmed mean), first-touch attribution, and the event
transition matrix.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has none of these; dictHas/dictGetOrDefault complete the
dictionary-function family started by dict_get_lookup (flipping two
CH_FUNCTION_COVERAGE 'unsupported' rows to registry), MAD/trimmed-mean
extend the robust-statistics family (Tukey fences, winsorize,
Theil–Sen), and attribution/transition are the funnel-adjacent event
analytics every CH deployment runs."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import query, tables


@query(
    "dict_has_or_default",
    oracle="""
    WITH d AS (SELECT n_nationkey, n_name FROM nation WHERE n_regionkey <= 2)
    SELECT c.c_custkey AS c_custkey,
           (d.n_nationkey IS NOT NULL) AS dict_has,
           COALESCE(d.n_name, 'UNKNOWN') AS nation_or_default
    FROM customer c LEFT JOIN d ON c.c_nationkey = d.n_nationkey
    ORDER BY c_custkey LIMIT 200
    """,
)
def dict_has_or_default_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `dictHas('dict', key)` and
    `dictGetOrDefault('dict', 'attr', key, default)` — the membership
    probe and the null-safe lookup over an external dictionary. In
    Spark the dictionary IS a broadcast hash table (dict_get_lookup's
    contract); dictHas is the NULL-ness of a broadcast LEFT join's
    match and dictGetOrDefault is coalesce over the joined attribute.
    The dictionary here is deliberately PARTIAL (nations of regions
    0–2) so both branches of both functions are exercised. One
    broadcast, no shuffle of the probe side, same plan at 100 TB."""
    t = tables(spark, sf_dir)
    d = (
        t["nation"]
        .filter(F.col("n_regionkey") <= 2)
        .select("n_nationkey", "n_name")
    )
    return (
        t["customer"]
        .join(F.broadcast(d), F.col("c_nationkey") == F.col("n_nationkey"), "left")
        .select(
            "c_custkey",
            F.col("n_nationkey").isNotNull().alias("dict_has"),
            F.coalesce("n_name", F.lit("UNKNOWN")).alias("nation_or_default"),
        )
        .orderBy("c_custkey")
        .limit(200)
    )


@query(
    "mad_robust_scale",
    oracle="""
    WITH med AS (SELECT event_type, median(value) AS m
                 FROM events GROUP BY event_type),
    dev AS (SELECT e.event_type, ABS(e.value - med.m) AS ad, med.m
            FROM events e JOIN med ON e.event_type = med.event_type)
    SELECT event_type,
           FLOOR(ANY_VALUE(m) * 1000000 + 0.5) / 1000000 AS median_value,
           FLOOR(median(ad) * 1000000 + 0.5) / 1000000 AS mad,
           FLOOR(median(ad) * 1.4826 * 1000000 + 0.5) / 1000000
               AS sigma_robust
    FROM dev GROUP BY event_type ORDER BY event_type
    """,
)
def mad_robust_scale_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust scale estimate
    (breakdown point 50%) that stddev cannot provide under heavy
    tails; ×1.4826 makes it a consistent σ estimate for normal data.
    Two exact interpolated medians: the group median rides a broadcast
    join back onto the stream, then the median of absolute deviations.
    Float parity: each median interpolates between two stored doubles
    (one multiply-add), the deviation is one subtraction, and every
    output quantizes with the floor form — no accumulation anywhere.
    Scale: two shuffles on the group key, both map-side combinable in
    the percentile's partial state."""
    ev = tables(spark, sf_dir)["events"]
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("m")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "m", F.abs(F.col("value") - F.col("m")).alias("ad")
    )
    q6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return (
        dev.groupBy("event_type")
        .agg(
            q6(F.first("m")).alias("median_value"),
            q6(F.expr("percentile(ad, 0.5)")).alias("mad"),
            q6(F.expr("percentile(ad, 0.5)") * F.lit(1.4826)).alias(
                "sigma_robust"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "trimmed_mean_value",
    oracle="""
    WITH ranked AS (
        SELECT event_type,
               CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS v_micro,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events),
    kept AS (SELECT event_type, v_micro
             FROM ranked
             WHERE rk > CAST(FLOOR(n * 0.05) AS BIGINT)
               AND rk <= n - CAST(FLOOR(n * 0.05) AS BIGINT))
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           FLOOR(CAST(SUM(v_micro) AS DOUBLE) / COUNT(*) / 1000000.0
                 * 1000000 + 0.5) / 1000000 AS trimmed_mean
    FROM kept GROUP BY event_type ORDER BY event_type
    """,
)
def trimmed_mean_value_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed mean per group: drop the floor(0.05·n) lowest and
    highest values by rank and average the middle 90% — the
    outlier-robust mean between winsorize (clamp) and median (discard
    all order information).

    Scale shape: the first cut of this query ranked with
    row_number() over |event_type| partitions — a single-task sort per
    group that the sf1→sf10 sweep measured at exponent 1.088. Now it
    rides operators/dist_rank.dist_cumsum: collapse to the per-group
    distinct-VALUE histogram (hash shuffle, map-side combined; a hot
    value is one row), range-partitioned two-pass cumulative counts
    with no unpartitioned sort, then each value keeps
    overlap([below+1, below+cnt], [cut+1, n−cut]) occurrences — ties
    share a value, so which duplicate rows are dropped cannot change
    the kept SUM, making this bit-identical to the oracle's
    row-rank + event_id tie-break formulation. Float parity: values
    quantize to integer micro-units before any aggregation; the mean
    is one exact-integer ratio."""
    from ..operators.dist_rank import dist_cumsum

    ev = tables(spark, sf_dir)["events"]
    hist = (
        ev.select(
            "event_type",
            F.floor(F.col("value") * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("v_micro"),
        )
        .groupBy("event_type", "v_micro")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    cum = dist_cumsum(hist, "v_micro", ["cnt"], keys=["event_type"])
    totals = hist.groupBy("event_type").agg(
        F.sum("cnt").cast("long").alias("n")
    )
    j = cum.join(F.broadcast(totals), "event_type")
    cut = F.floor(F.col("n") * 0.05).cast("long")
    lo = F.greatest(F.col("cum_cnt") - F.col("cnt") + 1, cut + 1)
    hi = F.least(F.col("cum_cnt"), F.col("n") - cut)
    kept_j = F.greatest(hi - lo + 1, F.lit(0).cast("long"))
    tm = (
        F.col("sum_micro").cast("double") / F.col("n_kept") / F.lit(1000000.0)
    )
    return (
        j.select(
            "event_type", kept_j.alias("k"), (kept_j * F.col("v_micro")).alias("kv")
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("long").alias("n_kept"),
            F.sum("kv").cast("long").alias("sum_micro"),
        )
        .select(
            "event_type",
            "n_kept",
            (F.floor(tm * 1000000 + F.lit(0.5)) / 1000000).alias(
                "trimmed_mean"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "first_touch_attribution",
    oracle="""
    WITH firsts AS (
        SELECT user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rk
        FROM events),
    ft AS (SELECT user_id, event_type AS first_touch, ts AS t0
           FROM firsts WHERE rk = 1),
    conv AS (SELECT DISTINCT f.user_id, f.first_touch
             FROM ft f JOIN events e
               ON e.user_id = f.user_id
              AND e.event_type = 'purchase' AND e.ts > f.t0)
    SELECT f.first_touch,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(c.user_id) AS BIGINT) AS n_converted,
           FLOOR(CAST(COUNT(c.user_id) AS DOUBLE) / COUNT(*)
                 * 10000 + 0.5) / 10000 AS conversion_rate
    FROM ft f LEFT JOIN conv c
      ON f.user_id = c.user_id AND f.first_touch = c.first_touch
    GROUP BY f.first_touch ORDER BY f.first_touch
    """,
)
def first_touch_attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: every user's FIRST event (ts +
    event_id tie-break) gets the credit; a user converts if any later
    'purchase' follows. Reported per first-touch channel: users,
    conversions, conversion rate — the marketing-analytics staple next
    to the windowFunnel family. The conversion probe is a
    semi-join-shaped EXISTS against later purchases; the rate is one
    integer-ratio division quantized with the floor form.

    r15 (OPTIMIZATION_r15.md, the gopher min-struct recipe): the
    first-touch pick is ``min(struct(ts, event_id, event_type))`` per
    user instead of a row_number window — identical row because
    struct ordering is lexicographic and (ts, event_id) is the old
    window's (unique) sort key; the aggregate partial-combines
    map-side, so the shuffle carries one row per (map, user) instead
    of the whole event stream through a partition sort."""
    ev = tables(spark, sf_dir)["events"]
    ft = (
        ev.groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id", "event_type")).alias("f"))
        .select(
            "user_id",
            F.col("f.event_type").alias("first_touch"),
            F.col("f.ts").alias("t0"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pt")
    )
    conv = (
        ft.join(
            purchases,
            (F.col("user_id") == F.col("pu")) & (F.col("pt") > F.col("t0")),
        )
        .select("user_id", "first_touch")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    rate = F.col("n_converted").cast("double") / F.col("n_users")
    return (
        ft.join(conv, ["user_id", "first_touch"], "left")
        .groupBy("first_touch")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.count("converted").cast("long").alias("n_converted"),
        )
        .select(
            "first_touch",
            "n_users",
            "n_converted",
            (F.floor(rate * 10000 + F.lit(0.5)) / 10000).alias(
                "conversion_rate"
            ),
        )
        .orderBy("first_touch")
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events),
    pairs AS (SELECT event_type AS src, nxt AS dst FROM seq
              WHERE nxt IS NOT NULL),
    tot AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n_src
            FROM pairs GROUP BY src)
    SELECT p.src, p.dst,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(t.n_src)
                 * 1000000 + 0.5) / 1000000 AS p_transition
    FROM pairs p JOIN tot t ON p.src = t.src
    GROUP BY p.src, p.dst ORDER BY p.src, p.dst
    """,
)
def event_transition_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next = dst | current = src) from consecutive-event
    pairs (ts + event_id total order), the behavioral fingerprint
    behind sequence_next_node and path-sankey dashboards. One lead()
    window per user builds the pair stream map-side; the per-src
    normalizer is a 5-row broadcast. Probabilities are one
    integer-ratio division, floor-quantized."""
    ev = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    tot = pairs.groupBy("src").agg(F.count("*").cast("long").alias("n_src"))
    p = F.col("n").cast("double") / F.col("n_src")
    return (
        pairs.groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("n"))
        .join(F.broadcast(tot), "src")
        .select(
            "src",
            "dst",
            "n",
            (F.floor(p * 1000000 + F.lit(0.5)) / 1000000).alias(
                "p_transition"
            ),
        )
        .orderBy("src", "dst")
    )
