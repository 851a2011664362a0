"""Round-9 query wave 1: time-series aggregates the earlier waves left
uncovered — time-weighted average (TWAP), OHLC bars, EWMA smoothing,
Theil–Sen robust trend — plus an equi-depth histogram built on the
scale-safe dist_cumsum primitive and market-basket association rules.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has none of these; they extend the analytics charter with
the standard monitoring/finance/stats primitives (CH grammar reaches
them all through the generic aggregate-function rule,
generated_ch_parser/ClickHouseParser.py:15571).

Float-parity discipline: every order-dependent double sum goes through
the sorted-struct left fold (both engines sort array<struct<tu,eid,…>>
lexicographically and fold in that pinned order); every reported score
is floor-quantized (registry.q6); single divisions of exact integers
are left as one IEEE expression.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import q6, query, tables

# ---------------------------------------------------------------------------
# time_weighted_average
# ---------------------------------------------------------------------------

_TWAP_FILTER = 40  # user_id bound: keeps per-user series non-trivial


@query(
    "time_weighted_average",
    oracle=f"""
    WITH p AS (
        SELECT user_id, epoch_us(ts) AS tu, event_id, value,
               lead(epoch_us(ts)) OVER w AS nxt
        FROM events WHERE user_id < {_TWAP_FILTER}
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    t AS (
        SELECT user_id,
               list_sort(list(struct_pack(
                   tu := tu, eid := event_id,
                   term := value * (nxt - tu)))) AS terms,
               CAST(SUM(nxt - tu) AS BIGINT) AS total_us,
               CAST(COUNT(*) AS BIGINT) AS n_intervals
        FROM p WHERE nxt IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n_intervals, total_us,
           FLOOR(list_reduce(
                     list_prepend(CAST(0.0 AS DOUBLE),
                                  list_transform(terms, s -> s.term)),
                     (a, b) -> a + b) / total_us * 1000000 + 0.5)
               / 1000000 AS twap
    FROM t ORDER BY user_id
    """,
)
def time_weighted_average_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) per user: each observation holds
    until the next one, so its weight is the exact microsecond interval
    to the successor (the last point carries no interval). The weighted
    sum is order-dependent in doubles, so both engines fold the SAME
    sorted array<struct(tu, eid, term)>; the denominator is an exact
    integer sum.

    Scale shape: one (user, ts) window shuffle for lead(), one
    groupBy(user) carrying a per-user array bounded by that user's
    event count — the standard sessionization partitioning. 100 TB:
    shuffle keys are users; no global sort, no driver state."""
    ev = tables(spark, sf_dir)["events"].filter(
        F.col("user_id") < _TWAP_FILTER
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select(
        "user_id",
        F.unix_micros("ts").alias("tu"),
        "event_id",
        "value",
        F.lead(F.unix_micros("ts")).over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    t = p.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("tu"),
                    F.col("event_id").alias("eid"),
                    (F.col("value") * (F.col("nxt") - F.col("tu"))).alias(
                        "term"
                    ),
                )
            )
        ).alias("terms"),
        F.sum(F.col("nxt") - F.col("tu")).cast("long").alias("total_us"),
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
    )
    fold = F.aggregate(
        F.transform(F.col("terms"), lambda s: s.getField("term")),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    return t.select(
        "user_id",
        "n_intervals",
        "total_us",
        q6(fold / F.col("total_us")).alias("twap"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# ohlc_daily_bars
# ---------------------------------------------------------------------------


@query(
    "ohlc_daily_bars",
    oracle="""
    WITH p AS (
        SELECT ts::DATE AS day, epoch_us(ts) AS tu, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY ts::DATE
                                  ORDER BY ts, event_id) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY ts::DATE
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MIN(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(MAX(tu) - MIN(tu) AS BIGINT) AS span_us
    FROM p GROUP BY day ORDER BY day
    """,
)
def ohlc_daily_bars_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC (open/high/low/close) bars over the event stream —
    the candlestick rollup every metrics store provides. Open/close are
    deterministic ends of the (ts, event_id) total order within the
    day (row_number, not min_by — both engines agree on composite
    tie-breaks); high/low are plain MIN/MAX; values are hashed raw
    (no arithmetic, no float discipline needed).

    Scale shape: one (day) window + one groupBy(day) — day partitions
    are date-bounded, so the window never degenerates into a global
    sort; at 100 TB widen the key to (day, symbol) and nothing else
    changes."""
    ev = tables(spark, sf_dir)["events"]
    day = F.col("ts").cast("date")
    wa = Window.partitionBy(day).orderBy("ts", "event_id")
    wd = Window.partitionBy(day).orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    p = ev.select(
        day.alias("day"),
        F.unix_micros("ts").alias("tu"),
        "event_id",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return (
        p.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min(F.when(F.col("rn_a") == 1, F.col("value"))).alias(
                "open"
            ),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.min(F.when(F.col("rn_d") == 1, F.col("value"))).alias(
                "close"
            ),
            (F.max("tu") - F.min("tu")).cast("long").alias("span_us"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            "open",
            "high",
            "low",
            "close",
            "span_us",
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# ewma_smoothing
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.3
_EWMA_FILTER = 30


@query(
    "ewma_smoothing",
    oracle=f"""
    WITH p AS (
        SELECT user_id, epoch_us(ts) AS tu, event_id, value
        FROM events WHERE user_id < {_EWMA_FILTER}
    ),
    t AS (
        SELECT user_id,
               list_transform(
                   list_sort(list(struct_pack(
                       tu := tu, eid := event_id, v := value))),
                   s -> s.v) AS vals,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM p GROUP BY user_id
    )
    SELECT user_id, n,
           FLOOR(list_reduce(vals,
                     (acc, x) -> acc * {1 - _EWMA_ALPHA}
                                 + x * {_EWMA_ALPHA})
                 * 1000000 + 0.5) / 1000000 AS ewma
    FROM t WHERE n >= 2 ORDER BY user_id
    """,
)
def ewma_smoothing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user (α = 0.3, seeded
    with the first observation): the standard smoothing/alerting
    baseline. The recurrence is order-dependent by definition, so both
    engines fold the identical sorted value list — DuckDB's seedless
    list_reduce takes the first element as the accumulator; the Spark
    side replays that exactly with aggregate(slice(vals, 2, n-1),
    vals[1], …). Final value floor-quantized.

    Scale shape: one groupBy(user) carrying per-user arrays; the fold
    is a codegen'd array aggregate — no window, no Python."""
    ev = tables(spark, sf_dir)["events"].filter(
        F.col("user_id") < _EWMA_FILTER
    )
    t = ev.groupBy("user_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.unix_micros("ts").alias("tu"),
                        F.col("event_id").alias("eid"),
                        F.col("value").alias("v"),
                    )
                )
            ),
            lambda s: s.getField("v"),
        ).alias("vals"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    ewma = F.aggregate(
        F.slice(F.col("vals"), 2, F.size("vals") - 1),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: acc * (1 - _EWMA_ALPHA) + x * _EWMA_ALPHA,
    )
    return (
        t.filter(F.col("n") >= 2)
        .select("user_id", "n", q6(ewma).alias("ewma"))
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# theil_sen_trend
# ---------------------------------------------------------------------------


@query(
    "theil_sen_trend",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1995-01-01', o_orderdate)
                    AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM orders
        WHERE o_orderdate BETWEEN DATE '1995-01-01'
                              AND DATE '1995-12-31'
        GROUP BY 1
    ),
    slopes AS (
        SELECT a.d AS d1, b.d AS d2,
               CAST(b.c - a.c AS DOUBLE) / (b.d - a.d) AS slope
        FROM daily a JOIN daily b ON a.d < b.d
    ),
    sel AS (
        SELECT slope,
               ROW_NUMBER() OVER (ORDER BY slope, d1, d2) AS rn
        FROM slopes
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM slopes),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
    SELECT nd.n_days, m.n_pairs,
           FLOOR(sel.slope * 1000000 + 0.5) / 1000000
               AS slope_per_day
    FROM sel, m, nd
    WHERE sel.rn = (m.n_pairs + 1) // 2
    """,
)
def theil_sen_trend_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of the 1995 daily order count: the median
    of all pairwise slopes (c2-c1)/(d2-d1) — outlier-days cannot move
    it, unlike least squares. Median = the lower median under the
    deterministic total order (slope, d1, d2), so ties are unambiguous
    on both engines; each slope is one IEEE division of exact integers.

    Scale shape: the pair set is C(365, 2) ≈ 66k — a CONSTANT: the
    series length is calendar-bounded regardless of corpus size (the
    daily rollup in front of it is the part that scales, one hash
    agg). The median pick is sort-limit over the constant pair table,
    never a global sort of raw data. The one driver scalar is the pair
    count that indexes the median."""
    o = tables(spark, sf_dir)["orders"].filter(
        F.col("o_orderdate").between("1995-01-01", "1995-12-31")
    )
    daily = (
        o.groupBy(
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
            .cast("long")
            .alias("d")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)  # feeds both join sides + count
    )
    a = daily.select(F.col("d").alias("d1"), F.col("c").alias("c1"))
    b = daily.select(F.col("d").alias("d2"), F.col("c").alias("c2"))
    slopes = (
        a.join(F.broadcast(b), F.col("d1") < F.col("d2"))
        .select(
            "d1",
            "d2",
            (
                (F.col("c2") - F.col("c1")).cast("double")
                / (F.col("d2") - F.col("d1"))
            ).alias("slope"),
        )
        .localCheckpoint(eager=False)  # counted AND median-picked
    )
    n_days = daily.count()
    n_pairs = slopes.count()
    k = (n_pairs + 1) // 2
    med = (
        slopes.orderBy("slope", "d1", "d2")
        .limit(k)
        .orderBy(F.desc("slope"), F.desc("d1"), F.desc("d2"))
        .limit(1)
    )
    return med.select(
        F.lit(n_days).cast("long").alias("n_days"),
        F.lit(n_pairs).cast("long").alias("n_pairs"),
        q6(F.col("slope")).alias("slope_per_day"),
    )


# ---------------------------------------------------------------------------
# equi_depth_histogram
# ---------------------------------------------------------------------------

_EDH_BUCKETS = 8


@query(
    "equi_depth_histogram",
    oracle=f"""
    WITH r AS (
        SELECT o_totalprice AS v,
               ROW_NUMBER() OVER (ORDER BY o_totalprice) - 1 AS r0,
               COUNT(*) OVER () AS n
        FROM orders
    )
    SELECT CAST(r0 * {_EDH_BUCKETS} // n AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(v) AS lo, MAX(v) AS hi
    FROM r GROUP BY 1 ORDER BY 1
    """,
)
def equi_depth_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-height) histogram of o_totalprice in 8 buckets
    — the optimizer-statistics primitive. NOT the naive
    ntile()-over-everything (a single-task global sort, memory trap #3):
    built on operators/dist_rank.dist_cumsum — distinct-value histogram
    → range-partitioned cumulative counts → each value's rank interval
    [below+1, below+cnt] is intersected with every bucket's rank range,
    so a value straddling a boundary contributes its exact row split.
    Bucket populations and min/max match the row-level NTILE oracle
    because equal values are interchangeable.

    Scale shape: one hash agg to the distinct histogram, dist_cumsum's
    bounded range-sort, one bucket-constant explode — nothing global."""
    from ..operators.dist_rank import dist_cumsum

    o = tables(spark, sf_dir)["orders"]
    hist = o.groupBy(F.col("o_totalprice").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    cum = dist_cumsum(hist, "v", ["cnt"])
    total = cum.agg(F.max("cum_cnt").alias("n"))
    b = F.col("b")
    # 1-based rank r lands in bucket floor((r-1)·B/n), so bucket b's
    # rank range is [ceil(b·n/B)+1, ceil((b+1)·n/B)] — ceil via the
    # exact integer (x + B - 1) div B form (a double division here
    # could mis-floor at large n).
    lo_rank = (
        F.expr(f"(b * n + {_EDH_BUCKETS - 1}) div {_EDH_BUCKETS}") + 1
    )
    hi_rank = F.expr(
        f"((b + 1) * n + {_EDH_BUCKETS - 1}) div {_EDH_BUCKETS}"
    )
    lo_v = F.col("cum_cnt") - F.col("cnt") + 1
    hi_v = F.col("cum_cnt")
    overlap = F.greatest(
        F.lit(0).cast("long"),
        F.least(hi_v, hi_rank) - F.greatest(lo_v, lo_rank) + F.lit(1),
    )
    return (
        cum.crossJoin(F.broadcast(total))
        .select(
            "v",
            "cnt",
            "cum_cnt",
            "n",
            F.explode(
                F.sequence(F.lit(0), F.lit(_EDH_BUCKETS - 1))
            ).alias("b"),
        )
        .withColumn("ov", overlap)
        .filter(F.col("ov") > 0)
        .groupBy(F.col("b").cast("long").alias("bucket"))
        .agg(
            F.sum("ov").cast("long").alias("n_rows"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# association_rules_lift
# ---------------------------------------------------------------------------


@query(
    "association_rules_lift",
    oracle="""
    WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
          FROM b),
    s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t
          FROM b GROUP BY event_type),
    p AS (SELECT x.event_type AS ante, y.event_type AS cons,
                 CAST(COUNT(*) AS BIGINT) AS n_both
          FROM b x JOIN b y
            ON x.user_id = y.user_id
           AND x.event_type < y.event_type
          GROUP BY 1, 2)
    SELECT p.ante, p.cons, p.n_both, sa.n_t AS n_ante, sc.n_t AS n_cons,
           FLOOR(CAST(p.n_both AS DOUBLE) / n.n_users
                 * 1000000 + 0.5) / 1000000 AS support,
           FLOOR(CAST(p.n_both AS DOUBLE) / sa.n_t
                 * 1000000 + 0.5) / 1000000 AS confidence,
           FLOOR(CAST(p.n_both AS DOUBLE) * n.n_users
                 / (sa.n_t * sc.n_t) * 1000000 + 0.5) / 1000000 AS lift
    FROM p JOIN s sa ON p.ante = sa.event_type
           JOIN s sc ON p.cons = sc.event_type
           CROSS JOIN n
    ORDER BY ante, cons
    """,
)
def association_rules_lift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over per-user event-type sets:
    support, confidence and lift for every unordered type pair — the
    classic a-priori first rung ('users who trigger X also trigger Y').
    All three scores are fixed expressions over four exact counts.

    Scale shape: the basket relation is one distinct over (user, type);
    the pair stream is the same self-join-on-basket-key discipline as
    copurchase_item_similarity — Σ_user C(|types|, 2) with |types|
    bounded by the type vocabulary (5 here; cap with max_basket
    semantics if the vocabulary were unbounded); per-type counts are a
    vocabulary-sized broadcast."""
    ev = tables(spark, sf_dir)["events"]
    b = ev.select("user_id", "event_type").distinct().localCheckpoint(
        eager=False
    )
    n_users = b.select("user_id").distinct().count()
    s = b.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_t")
    )
    x = b.select("user_id", F.col("event_type").alias("ante"))
    y = b.select("user_id", F.col("event_type").alias("cons"))
    p = (
        x.join(y, "user_id")
        .filter(F.col("ante") < F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    sa = s.select(F.col("event_type").alias("ante"), F.col("n_t").alias("n_ante"))
    sc = s.select(F.col("event_type").alias("cons"), F.col("n_t").alias("n_cons"))
    nb = F.col("n_both").cast("double")
    return (
        p.join(F.broadcast(sa), "ante")
        .join(F.broadcast(sc), "cons")
        .select(
            "ante",
            "cons",
            "n_both",
            "n_ante",
            "n_cons",
            q6(nb / F.lit(n_users)).alias("support"),
            q6(nb / F.col("n_ante")).alias("confidence"),
            q6(
                nb * F.lit(n_users) / (F.col("n_ante") * F.col("n_cons"))
            ).alias("lift"),
        )
        .orderBy("ante", "cons")
    )
