"""ClickHouse's behavioral-analytics aggregate family, re-expressed
Spark-first: windowFunnel, retention, sumMap (grammar:
generated_ch_parser list of combinator/aggregate names; these three are
the canonical ClickHouse-specific aggregates users migrate with).

Semantics documented per query; each has a DuckDB oracle that recomputes
the same definition relationally (EXISTS joins / conditional flags), so
the hard value-hash gate applies.

Float discipline: event values are summed as DECIMAL(18,2) (exact, order-
independent), never as doubles; funnel/retention outputs are pure integer
counts; all timestamps compare as integer microseconds (unix_micros /
epoch_us) so both engines evaluate identical arithmetic."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import query, tables

#: Funnel steps and window (3 days, in microseconds).
_STEPS = ("view", "click", "purchase")
_FUNNEL_W_US = 3 * 24 * 3600 * 1_000_000


@query(
    "window_funnel",
    oracle=f"""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
    l1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'view'),
    l2 AS (SELECT DISTINCT v.user_id
           FROM e v JOIN e c ON v.user_id = c.user_id
           WHERE v.event_type = 'view' AND c.event_type = 'click'
             AND c.t > v.t AND c.t - v.t <= {_FUNNEL_W_US}),
    l3 AS (SELECT DISTINCT v.user_id
           FROM e v
           JOIN e c ON v.user_id = c.user_id
           JOIN e p ON v.user_id = p.user_id
           WHERE v.event_type = 'view' AND c.event_type = 'click'
             AND p.event_type = 'purchase'
             AND c.t > v.t AND p.t > c.t
             AND p.t - v.t <= {_FUNNEL_W_US}),
    lv AS (SELECT u.user_id,
                  CASE WHEN l3.user_id IS NOT NULL THEN 3
                       WHEN l2.user_id IS NOT NULL THEN 2
                       WHEN l1.user_id IS NOT NULL THEN 1
                       ELSE 0 END AS funnel_level
           FROM (SELECT DISTINCT user_id FROM e) u
           LEFT JOIN l1 ON u.user_id = l1.user_id
           LEFT JOIN l2 ON u.user_id = l2.user_id
           LEFT JOIN l3 ON u.user_id = l3.user_id)
    SELECT CAST(funnel_level AS INT) AS funnel_level,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM lv GROUP BY funnel_level ORDER BY funnel_level
    """,
)
def window_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(window)(ts, cond1, cond2, cond3)``:
    per-user max funnel depth — the largest k such that events of types
    view → click → purchase occur at strictly increasing timestamps with
    the whole chain inside a 3-day window of its first event; reported as
    users per reached level.

    Spark side is the DP expressed RELATIONALLY (all JVM window
    functions, no Python): for each level keep the max chain-start time
    over chains reaching it — which dominates every other chain for both
    the window bound and the ordering bound — as a running max over a
    STRICT range frame (rangeBetween(-inf, -1) on integer microseconds,
    so same-timestamp events never chain):

      last_view  = max(t where view)      over (< t)   -- best level-1 start
      start2     = last_view  if click and t-last_view <= W
      best2      = max(start2)            over (< t)   -- best level-2 start
      level 3    = purchase and t-best2 <= W

    The intermediate-step window check is redundant-but-harmless (any
    chain whose LAST event violates it violates it at the end too), so
    checking at each extension equals ClickHouse's check-at-end. One
    shuffle on user_id, one sort, two Window nodes over the same spec,
    then a map-side-combined two-level aggregate. The EXISTS-join oracle
    restates the definition relationally (quadratic per user — fine at
    oracle scale; tests/test_property_ops.py pins the DP against brute
    force on 300 random streams)."""
    ev = tables(spark, sf_dir)["events"].select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("t"),
    )
    # Only funnel-relevant events enter the window shuffle; the full user
    # universe comes back via the skinny distinct-users left join below
    # (users with no step events report level 0, matching the oracle).
    e = ev.filter(F.col("event_type").isin(*_STEPS))

    from pyspark.sql import Window

    w_prior = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    typ, t = F.col("event_type"), F.col("t")
    with_lv = e.withColumn(
        "last_view", F.max(F.when(typ == _STEPS[0], t)).over(w_prior)
    ).withColumn(
        "start2",
        F.when(
            (typ == _STEPS[1]) & (t - F.col("last_view") <= _FUNNEL_W_US),
            F.col("last_view"),
        ),
    )
    scored = with_lv.withColumn("best2", F.max("start2").over(w_prior))
    lv = scored.groupBy("user_id").agg(
        F.max(
            F.when(
                (typ == _STEPS[2]) & (t - F.col("best2") <= _FUNNEL_W_US), 3
            )
            .when(F.col("start2").isNotNull(), 2)
            .when(typ == _STEPS[0], 1)
            .otherwise(0)
        ).alias("funnel_level")
    )
    all_users = ev.select("user_id").distinct()
    levels = all_users.join(lv, "user_id", "left").select(
        F.coalesce("funnel_level", F.lit(0)).cast("int").alias("funnel_level")
    )
    return (
        levels.groupBy("funnel_level")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("funnel_level")
    )


@query(
    "sequence_match",
    oracle="""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
    m AS (SELECT DISTINCT s.user_id
          FROM e s JOIN e p ON s.user_id = p.user_id
          WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
            AND p.t > s.t),
    u AS (SELECT DISTINCT user_id FROM e)
    SELECT CAST(COUNT(m.user_id) AS BIGINT) AS n_matched,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(CAST(COUNT(m.user_id) AS DOUBLE) / COUNT(*), 6) AS rate
    FROM u LEFT JOIN m ON u.user_id = m.user_id
    """,
)
def sequence_match_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2)')(ts, cond1, cond2)``: does
    a signup event precede a purchase event (any gap) per user — the
    unwindowed ordering predicate behind activation analysis.

    Same machinery as window_funnel: a running max of cond1 timestamps
    over a STRICT range frame decides cond2 rows in one window pass (no
    self-join on the engine side — the EXISTS join is the oracle's
    restatement). One shuffle on user_id, integer-exact output."""
    ev = tables(spark, sf_dir)["events"].select(
        "user_id", "event_type", F.unix_micros("ts").alias("t")
    )
    e = ev.filter(F.col("event_type").isin("signup", "purchase"))

    from pyspark.sql import Window

    w_prior = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    typ = F.col("event_type")
    scored = e.withColumn(
        "last_signup", F.max(F.when(typ == "signup", F.col("t"))).over(w_prior)
    )
    per_user = scored.groupBy("user_id").agg(
        F.max(
            F.when(
                (typ == "purchase") & F.col("last_signup").isNotNull(), 1
            ).otherwise(0)
        ).alias("matched")
    )
    levels = (
        ev.select("user_id")
        .distinct()
        .join(per_user, "user_id", "left")
        .select(F.coalesce("matched", F.lit(0)).alias("matched"))
    )
    return levels.agg(
        F.sum("matched").alias("n_matched"),
        F.count(F.lit(1)).alias("n_users"),
        F.round(
            F.sum("matched").cast("double") / F.count(F.lit(1)), 6
        ).alias("rate"),
    )


@query(
    "retention_cohort",
    oracle="""
    WITH f AS (SELECT user_id,
                      MAX(CASE WHEN event_type = 'signup'
                               AND ts < TIMESTAMP '2024-01-08'
                          THEN 1 ELSE 0 END) AS c1,
                      MAX(CASE WHEN ts >= TIMESTAMP '2024-01-08'
                               AND ts < TIMESTAMP '2024-01-15'
                          THEN 1 ELSE 0 END) AS c2,
                      MAX(CASE WHEN ts >= TIMESTAMP '2024-01-15'
                               AND ts < TIMESTAMP '2024-01-22'
                          THEN 1 ELSE 0 END) AS c3
               FROM events GROUP BY user_id)
    SELECT CAST(SUM(c1) AS BIGINT) AS cohort,
           CAST(SUM(c1 * c2) AS BIGINT) AS retained_w2,
           CAST(SUM(c1 * c3) AS BIGINT) AS retained_w3,
           ROUND(CAST(SUM(c1 * c2) AS DOUBLE) / SUM(c1), 6) AS rate_w2,
           ROUND(CAST(SUM(c1 * c3) AS DOUBLE) / SUM(c1), 6) AS rate_w3
    FROM f
    """,
)
def retention_cohort_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``retention(cond1, cond2, ...)``: per-user condition
    flags where every later flag is AND-ed with the first (cohort
    membership), summed into cohort retention — here: signed up in week 1,
    still active in week 2 / week 3.

    Scale shape: ONE map-side-combined groupBy(user_id) producing three
    0/1 flags (MAX of conditions — no event rows survive the partial
    aggregate), then a scalar rollup. This is the textbook two-level
    aggregation ClickHouse's retention runs; integer flags make the
    driver hash exact."""
    ev = tables(spark, sf_dir)["events"]
    c1 = F.max(
        F.when(
            (F.col("event_type") == "signup")
            & (F.col("ts") < F.lit("2024-01-08").cast("timestamp")),
            1,
        ).otherwise(0)
    ).alias("c1")
    c2 = F.max(
        F.when(
            (F.col("ts") >= F.lit("2024-01-08").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-15").cast("timestamp")),
            1,
        ).otherwise(0)
    ).alias("c2")
    c3 = F.max(
        F.when(
            (F.col("ts") >= F.lit("2024-01-15").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-22").cast("timestamp")),
            1,
        ).otherwise(0)
    ).alias("c3")
    f = ev.groupBy("user_id").agg(c1, c2, c3)
    return f.agg(
        F.sum("c1").alias("cohort"),
        F.sum(F.col("c1") * F.col("c2")).alias("retained_w2"),
        F.sum(F.col("c1") * F.col("c3")).alias("retained_w3"),
        F.round(
            F.sum(F.col("c1") * F.col("c2")).cast("double") / F.sum("c1"), 6
        ).alias("rate_w2"),
        F.round(
            F.sum(F.col("c1") * F.col("c3")).cast("double") / F.sum("c1"), 6
        ).alias("rate_w3"),
    )


@query(
    "batch_sessionization",
    oracle="""
    WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
    l AS (SELECT user_id, t,
                 lag(t) OVER (PARTITION BY user_id ORDER BY t) AS prev_t
          FROM e),
    s AS (SELECT user_id, t,
                 SUM(CASE WHEN prev_t IS NULL
                          OR t - prev_t > 1800000000 THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY t
                           ROWS UNBOUNDED PRECEDING) AS session_id
          FROM l),
    per_sess AS (SELECT user_id, session_id,
                        COUNT(*) AS n_events,
                        MAX(t) - MIN(t) AS dur_us
                 FROM s GROUP BY user_id, session_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(MAX(n_events) AS BIGINT) AS max_session_events,
           ROUND(CAST(SUM(dur_us) AS DOUBLE) / COUNT(*) / 1e6, 6)
               AS mean_session_sec
    FROM per_sess
    """,
)
def batch_sessionization_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the lag + running-sum session assigner (a
    new session starts after a 30-minute silence), the batch twin of the
    streaming `session_window` query. ClickHouse users build this from
    neighbor()/arraySplit; the relational form is two window passes over
    ONE user_id sort plus a map-side-combined rollup.

    All session arithmetic is integer microseconds; the single double
    division at the end keeps the hash gate exact."""
    e = tables(spark, sf_dir)["events"].select(
        "user_id", F.unix_micros("ts").alias("t")
    )
    from pyspark.sql import Window

    w_ord = Window.partitionBy("user_id").orderBy("t")
    s = (
        e.withColumn("prev_t", F.lag("t").over(w_ord))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_t").isNull()
                | (F.col("t") - F.col("prev_t") > 1800 * 1_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_sess").over(
                w_ord.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    per_sess = s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("t") - F.min("t")).alias("dur_us"),
    )
    return per_sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
        F.round(
            F.sum("dur_us").cast("double") / F.count(F.lit(1)) / 1e6, 6
        ).alias("mean_session_sec"),
    )


@query(
    "sum_map_by_user",
    oracle="""
    WITH s AS (SELECT user_id, event_type,
                      SUM(CAST(value AS DECIMAL(18,2))) AS total
               FROM events WHERE value IS NOT NULL
               GROUP BY user_id, event_type)
    SELECT user_id,
           string_agg(event_type || ':' || CAST(total AS VARCHAR), ','
                      ORDER BY event_type) AS type_totals
    FROM s GROUP BY user_id ORDER BY user_id
    """,
)
def sum_map_by_user_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sumMap(map(event_type, value))``: merge maps by
    summing values per key — per user, the value total for every event
    type it emitted, rendered as the canonical sorted ``key:total`` string
    (a map type hashes differently across engines; the canonical string
    is representation-portable and keeps the merged-map semantics
    visible).

    Scale shape: the (user, type) partial sums combine map-side (keys per
    user are bounded by the type vocabulary, exactly sumMap's state), one
    shuffle on user_id for the final merge. DECIMAL(18,2) accumulation is
    exact and order-independent — a double SUM here would be partial-agg-
    order dependent and fail the hash gate.

    NULL values are filtered BEFORE grouping on both sides: an all-NULL
    (user, type) group would otherwise render as ``type:`` via concat_ws
    (which skips NULLs) but vanish entirely from DuckDB's string_agg
    (``x || NULL`` is NULL) — a latent hash divergence."""
    ev = tables(spark, sf_dir)["events"]
    s = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("total"))
    )
    return (
        s.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("event_type", "total"))
                    ),
                    lambda st: F.concat_ws(
                        ":",
                        st["event_type"],
                        st["total"].cast("string"),
                    ),
                ),
                ",",
            ).alias("type_totals")
        )
        .orderBy("user_id")
    )


@query(
    "group_array_moving_sum",
    oracle="""
    WITH m AS (
        SELECT user_id, event_id,
               SUM(CAST(value AS DECIMAL(18,2))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ) AS mv
        FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id,
           string_agg(CAST(mv AS VARCHAR), ',' ORDER BY event_id)
               AS moving_sums
    FROM m GROUP BY user_id ORDER BY user_id
    """,
)
def group_array_moving_sum_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupArrayMovingSum(3)(value)``: per group, the array
    of 3-element moving sums in event order. Relational form: one
    rows-frame window (2 PRECEDING..CURRENT) over the (user, time) sort,
    then the per-user array rendered as the canonical comma string (array
    hashing differs across engines; the string is representation-portable).
    DECIMAL(18,2) keeps every window sum exact; (ts, event_id) ordering is
    tie-proof.

    Scale shape: one shuffle on user_id; the window and the collect reuse
    the same sort — no second exchange."""
    ev = tables(spark, sf_dir)["events"].filter(
        F.col("event_type") == "purchase"
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    m = ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).alias("mv"),
    )
    return (
        m.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("event_id", "mv"))),
                    lambda st: st["mv"].cast("string"),
                ),
                ",",
            ).alias("moving_sums")
        )
        .orderBy("user_id")
    )


@query(
    "histogram_fixed_bins",
    oracle="""
    WITH b AS (SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
               FROM lineitem),
    binned AS (
        SELECT CASE WHEN b.hi = b.lo THEN CAST(0 AS BIGINT)
                    ELSE LEAST(CAST(FLOOR((l_extendedprice - b.lo)
                                          / (b.hi - b.lo) * 10) AS BIGINT),
                               9) END AS bin
        FROM lineitem, b
    )
    SELECT bin, COUNT(*) AS n
    FROM binned GROUP BY bin ORDER BY bin
    """,
)
def histogram_fixed_bins_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``histogram(10)(x)`` rendered as the deterministic
    fixed-width variant (CH's adaptive bin centers are
    streaming-order-dependent and so not even reproducible between two CH
    runs; fixed-width over the exact [min, max] IS deterministic, which is
    what a hash-checked histogram needs). Bin arithmetic runs in double on
    identical operands — IEEE-deterministic; counts are integers. A
    degenerate all-equal column (hi = lo) maps every row to bin 0 on both
    engines — without the guard Spark's floor(0/0=NaN) yields NULL while
    DuckDB's CAST(NaN AS BIGINT) errors.

    Scale shape: min/max is one tiny all-reduce broadcast back; binning is
    a map; the count shuffles 10 rows."""
    li = tables(spark, sf_dir)["lineitem"]
    b = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    binned = li.crossJoin(F.broadcast(b)).select(
        F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("l_extendedprice") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * 10
                ).cast("long"),
                F.lit(9).cast("long"),
            )
        )
        .alias("bin")
    )
    return binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n")).orderBy("bin")


@query(
    "conditional_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT CASE WHEN o_orderpriority = '1-URGENT'
                                    THEN o_custkey END) AS BIGINT)
               AS urgent_customers,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS all_customers
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def conditional_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``uniqExactIf(o_custkey, cond)`` — the -If combinator
    fused onto an exact distinct count (combinator convention via the
    generic function rule, ClickHouseParser.py:15571). Spark plans both
    distinct aggregates through expand + two-phase hash aggregate —
    map-side partial distinct before any shuffle; integer-exact output."""
    o = tables(spark, sf_dir)["orders"]
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count_distinct(
                F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_custkey"))
            ).alias("urgent_customers"),
            F.count_distinct("o_custkey").alias("all_customers"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "topk_weighted",
    oracle="""
    WITH w AS (
        SELECT event_type,
               SUM(CAST(value AS DECIMAL(18,2))) AS weight
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type
    ),
    r AS (SELECT event_type, weight,
                 row_number() OVER (ORDER BY weight DESC, event_type) AS rnk
          FROM w)
    SELECT CAST(rnk AS INT) AS rnk, event_type,
           CAST(ROUND(weight, 2) AS DOUBLE) AS weight
    FROM r WHERE rnk <= 3 ORDER BY rnk
    """,
)
def topk_weighted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``topKWeighted(3)(event_type, value)``: heaviest keys
    by summed weight, not occurrence count. Exact decimal weights so the
    rank boundary can't drift; the aggregate map-side combines to one row
    per key before the single-partition top-3 (a vocabulary-sized sort at
    any corpus scale)."""
    ev = tables(spark, sf_dir)["events"].filter(F.col("value").isNotNull())
    from pyspark.sql import Window

    w = ev.groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("weight")
    )
    r = w.withColumn(
        "rnk",
        F.row_number().over(
            Window.orderBy(F.col("weight").desc(), "event_type")
        ),
    )
    return (
        r.filter(F.col("rnk") <= 3)
        .select(
            F.col("rnk").cast("int").alias("rnk"),
            "event_type",
            F.round("weight", 2).cast("double").alias("weight"),
        )
        .orderBy("rnk")
    )


@query(
    "weighted_median",
    oracle="""
    WITH w AS (
        SELECT l_returnflag, l_extendedprice,
               CAST(l_quantity AS BIGINT) AS wt
        FROM lineitem
    ),
    c AS (
        SELECT l_returnflag, l_extendedprice,
               SUM(wt) OVER (PARTITION BY l_returnflag
                             ORDER BY l_extendedprice
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cumw,
               SUM(wt) OVER (PARTITION BY l_returnflag) AS total
        FROM w
    )
    SELECT l_returnflag,
           MIN(l_extendedprice) AS weighted_median
    FROM c WHERE 2 * cumw >= total
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def weighted_median_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantileExactWeighted(0.5)(price, qty)``: the
    weighted median — smallest value whose cumulative weight reaches half
    the total. The threshold compares ``2*cumw >= total`` in BIGINT (the
    weights are integral), so no double division can drift the boundary;
    ties in the sort key can't change the answer because the selected
    value is the MIN price in the crossing block.

    Scale shape (r5): the per-group window sort this replaced put a
    third of the table in one task (sf1 exponent 0.985, the worst
    measured). r15 (OPTIMIZATION_r15.md): the full dist_cumsum paid two
    near-fact-sized exchanges because prices are near-unique; the
    median selector only needs the crossing-bucket values, so the
    cumulative weights now come from the two-level boundary histogram
    (weighted_quantile_boundary_cw — zero fact-sized exchanges, one
    extra columnar scan; equivalence argument in the operator
    docstring). $64 buckets over the scale-free TPC-H price domain give
    ~1.6k buckets per group at any SF. The answer is unchanged: the
    crossing happens at the same minimal price whether cumulated per
    row or per distinct value, because the cumsum at price p includes
    every tied row."""
    li = tables(spark, sf_dir)["lineitem"]
    from ..operators.dist_rank import weighted_quantile_boundary_cw

    rows = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.col("l_quantity").cast("long").alias("__w"),
    )
    c = weighted_quantile_boundary_cw(
        rows, "l_returnflag", "l_extendedprice", [(2, 1)], 64
    )
    return (
        c.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("weighted_median"))
        .orderBy("l_returnflag")
    )


@query(
    "linear_regression_agg",
    oracle="""
    WITH b AS (
        SELECT l_returnflag,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    m AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy,
               CAST(SUM(y * y) AS DOUBLE) AS syy
        FROM b GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(ROUND(
             (n * sxy - sx * sy) / (n * sxx - sx * sx) / 100.0, 6)
           AS DOUBLE) AS slope,
           CAST(ROUND(
             (sy / 100.0
              - (n * sxy - sx * sy) / (n * sxx - sx * sx) / 100.0 * sx)
             / n, 6) AS DOUBLE) AS intercept,
           CAST(ROUND(
             (n * sxy - sx * sy)
             / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
           AS DOUBLE) AS corr_xy
    FROM m ORDER BY l_returnflag
    """,
)
def linear_regression_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``simpleLinearRegression(x, y)`` + ``corr(x, y)`` per
    group, from exact integer moments: x = quantity (integral), y = price
    in integer cents (prices carry exactly 2 decimal digits), so every
    moment sum is an exact order-independent integer, then slope /
    intercept / corr are evaluated ONCE per group in double with the
    IDENTICAL expression tree on both engines. The built-in
    F.corr/F.regr_* aggregates stream doubles and would be
    partial-order-dependent — unusable under a hash gate.

    All hot-path arithmetic is int64 (whole-stage codegen; the round-3
    version summed DECIMAL(38,6) products — a per-row interpreted
    BigDecimal path that cost 7.3 s at sf0.1 for a 3-row answer). Sums
    that could exceed int64 at large scale (sy, sxy, y²) accumulate as
    hi/lo integer splits — quotient and remainder by a fixed divisor sum
    separately, each staying far inside int64 up to ~1e11 rows per group
    (≈ 100 TB of lineitem) — and are reconstructed exactly in
    decimal(38,0) on the handful of group rows. DuckDB sums BIGINT into
    HUGEINT natively, so the oracle needs no split; both engines cast the
    same exact integer to double, which IEEE-rounds identically.

    Scale shape: one map-side-combined aggregate; nine int64 moments per
    group is the whole shuffle payload."""
    li = tables(spark, sf_dir)["lineitem"]
    b = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
    )
    x, y = F.col("x"), F.col("y")
    # Split divisors sized so hi and lo sums balance: per-row bounds are
    # y ≤ 1.1e7 cents, x*y ≤ 5.5e8, y*y ≤ 1.2e14.
    m = b.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(F.expr("y DIV 10000")).alias("sy_hi"),
        F.sum(F.expr("y % 10000")).alias("sy_lo"),
        F.sum(F.expr("x * y DIV 100000")).alias("sxy_hi"),
        F.sum(F.expr("x * y % 100000")).alias("sxy_lo"),
        F.sum(F.expr("y * y DIV 10000000")).alias("syy_hi"),
        F.sum(F.expr("y * y % 10000000")).alias("syy_lo"),
    )

    def _join(hi: str, lo: str, div: int):  # exact reconstruct, per group
        return (
            F.col(hi).cast("decimal(38,0)") * F.lit(div) + F.col(lo)
        ).cast("double")

    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    sxxd = F.col("sxx").cast("double")
    syd = _join("sy_hi", "sy_lo", 10000)
    sxyd = _join("sxy_hi", "sxy_lo", 100000)
    syyd = _join("syy_hi", "syy_lo", 10000000)
    num = nd * sxyd - sxd * syd
    denx = nd * sxxd - sxd * sxd
    deny = nd * syyd - syd * syd
    slope = num / denx / F.lit(100.0)
    intercept = (syd / F.lit(100.0) - num / denx / F.lit(100.0) * sxd) / nd
    corr = num / F.sqrt(denx * deny)
    return m.select(
        "l_returnflag",
        F.round(slope, 6).cast("double").alias("slope"),
        F.round(intercept, 6).cast("double").alias("intercept"),
        F.round(corr, 6).cast("double").alias("corr_xy"),
    ).orderBy("l_returnflag")


@query(
    "delta_sum_agg",
    oracle="""
    WITH s AS (
        SELECT user_id,
               CAST(value AS DECIMAL(18,2)) AS v,
               lag(CAST(value AS DECIMAL(18,2))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS pv
        FROM events WHERE event_type = 'view'
    )
    SELECT user_id,
           CAST(ROUND(SUM(CASE WHEN pv IS NOT NULL AND v > pv THEN v - pv
                               ELSE CAST(0 AS DECIMAL(18,2)) END), 2)
                AS DOUBLE) AS delta_sum
    FROM s GROUP BY user_id ORDER BY user_id
    """,
)
def delta_sum_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``deltaSum(value)``: the sum of positive increments in
    the time-ordered series — counter-style metrics (monotonic totals
    with resets) reduce to this. One lag window over the (user, time)
    sort, decimal differences, map-side-combined final sum; (ts,
    event_id) ordering is tie-proof."""
    from pyspark.sql import Window

    ev = tables(spark, sf_dir)["events"].filter(F.col("event_type") == "view")
    v = F.col("value").cast("decimal(18,2)")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select("user_id", v.alias("v"), F.lag(v).over(w).alias("pv"))
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        s.groupBy("user_id")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("pv").isNotNull() & (F.col("v") > F.col("pv")),
                        F.col("v") - F.col("pv"),
                    ).otherwise(zero)
                ),
                2,
            )
            .cast("double")
            .alias("delta_sum")
        )
        .orderBy("user_id")
    )


@query(
    "min_max_map_by_user",
    oracle="""
    WITH s AS (SELECT user_id, event_type,
                      MIN(CAST(value AS DECIMAL(18,2))) AS mn,
                      MAX(CAST(value AS DECIMAL(18,2))) AS mx
               FROM events WHERE value IS NOT NULL
               GROUP BY user_id, event_type)
    SELECT user_id,
           string_agg(event_type || ':' || CAST(mn AS VARCHAR), ','
                      ORDER BY event_type) AS min_map,
           string_agg(event_type || ':' || CAST(mx AS VARCHAR), ','
                      ORDER BY event_type) AS max_map
    FROM s GROUP BY user_id ORDER BY user_id
    """,
)
def min_max_map_by_user_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``minMap`` / ``maxMap``: per-key extrema merged across
    rows — the same mergeable-map state as sumMap with min/max combine.
    Canonical sorted key:value strings keep the map representation
    portable across engines' map hashing."""
    ev = tables(spark, sf_dir)["events"].filter(F.col("value").isNotNull())
    v = F.col("value").cast("decimal(18,2)")
    s = ev.groupBy("user_id", "event_type").agg(
        F.min(v).alias("mn"), F.max(v).alias("mx")
    )

    def render(col: str):
        return F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("event_type", col))),
                lambda st: F.concat_ws(
                    ":", st["event_type"], st[col].cast("string")
                ),
            ),
            ",",
        )

    return (
        s.groupBy("user_id")
        .agg(
            render("mn").alias("min_map"),
            render("mx").alias("max_map"),
        )
        .orderBy("user_id")
    )


@query(
    "bounding_ratio_agg",
    oracle="""
    WITH e AS (
        SELECT user_id, value, epoch_us(ts) AS t,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rf,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rl
        FROM events WHERE event_type = 'purchase'
    ),
    g AS (
        SELECT user_id,
               MAX(CASE WHEN rf = 1 THEN value END) AS first_v,
               MAX(CASE WHEN rl = 1 THEN value END) AS last_v,
               MIN(t) AS t0, MAX(t) AS t1
        FROM e GROUP BY user_id
    )
    SELECT user_id,
           CAST(ROUND((last_v - first_v) / (CAST(t1 - t0 AS DOUBLE) / 1e6),
                      6) + 0.0 AS DOUBLE) AS bounding_ratio
    FROM g WHERE t1 > t0 ORDER BY user_id
    """,
)
def bounding_ratio_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``boundingRatio(ts, value)``: slope between the
    first and last point of each user's series — (last−first value) /
    (last−first second). Endpoint values are selected by tie-broken
    row_number windows over (ts, event_id) — ascending for the first
    point, descending for the last — so timestamp ties resolve
    identically on both engines (a composite integer key µs*K+event_id
    was rejected: it overflows int64 under ANSI mode, see inline
    comment); the one division runs in double on identical operands."""
    from pyspark.sql import Window

    ev = tables(spark, sf_dir)["events"].filter(
        F.col("event_type") == "purchase"
    )
    # endpoint selection via tie-broken row_number windows: a composite
    # integer key (us*K + event_id) overflows int64 under ANSI mode, and
    # DuckDB would widen to HUGEINT — diverging, not just erroring
    w_f = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_l = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    e = ev.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("t"),
        F.row_number().over(w_f).alias("rf"),
        F.row_number().over(w_l).alias("rl"),
    )
    g = e.groupBy("user_id").agg(
        F.max(F.when(F.col("rf") == 1, F.col("value"))).alias("first_v"),
        F.max(F.when(F.col("rl") == 1, F.col("value"))).alias("last_v"),
        F.min("t").alias("t0"),
        F.max("t").alias("t1"),
    )
    return (
        g.filter(F.col("t1") > F.col("t0"))
        .select(
            "user_id",
            # + 0.0 normalizes IEEE negative zero: round(-1e-9, 6) is
            # -0.0 on one engine and 0.0 on the other — equal under ==,
            # different under a value hash
            (F.round(
                (F.col("last_v") - F.col("first_v"))
                / ((F.col("t1") - F.col("t0")).cast("double") / 1e6),
                6,
            ) + F.lit(0.0))
            .cast("double")
            .alias("bounding_ratio"),
        )
        .orderBy("user_id")
    )


@query(
    "sequence_count_agg",
    oracle="""
    WITH e AS (
        SELECT user_id,
               CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS is_s,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
               ts, event_id
        FROM events WHERE event_type IN ('signup', 'purchase')
    ),
    pre AS (
        SELECT user_id, is_p,
               SUM(is_p - is_s) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS excess
        FROM e
    )
    SELECT user_id,
           CAST(SUM(is_p) - GREATEST(MAX(excess), 0) AS BIGINT)
               AS n_matches
    FROM pre GROUP BY user_id
    HAVING SUM(is_p) > 0 AND SUM(1 - is_p) > 0
    ORDER BY user_id
    """,
)
def sequence_count_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceCount('(?1)(?2)')(ts, signup, purchase)``:
    the number of DISJOINT signup→purchase pairs per user (greedy
    non-overlapping matching). The greedy scan is a running state, but
    it has a closed window form: matched = total_purchases −
    max(0, max_prefix(cum_purchases − cum_signups)) — the bracket-
    matching identity (a purchase is unmatched iff it extends the
    maximal prefix excess of purchases over signups). One running-sum
    window over the (user, time) sort, integer-exact, no Python and no
    per-row state machine."""
    from pyspark.sql import Window

    ev = tables(spark, sf_dir)["events"].filter(
        F.col("event_type").isin("signup", "purchase")
    )
    is_s = F.when(F.col("event_type") == "signup", 1).otherwise(0)
    is_p = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pre = ev.select(
        "user_id",
        is_p.alias("is_p"),
        is_s.alias("is_s"),
        F.sum(is_p - is_s).over(w).alias("excess"),
    )
    g = pre.groupBy("user_id").agg(
        F.sum("is_p").alias("np"),
        F.sum("is_s").alias("ns"),
        F.max("excess").alias("mx"),
    )
    return (
        g.filter((F.col("np") > 0) & (F.col("ns") > 0))
        .select(
            "user_id",
            (F.col("np") - F.greatest(F.col("mx"), F.lit(0)))
            .cast("long")
            .alias("n_matches"),
        )
        .orderBy("user_id")
    )


@query(
    "skew_kurt_agg",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(l_quantity AS BIGINT)) AS s1,
               SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                   AS s2,
               SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                   * CAST(l_quantity AS BIGINT)) AS s3,
               SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                   * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                   AS s4
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(ROUND(
             (CAST(s3 AS DOUBLE)/n
              - 3*(CAST(s1 AS DOUBLE)/n)*(CAST(s2 AS DOUBLE)/n)
              + 2*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)
                 *(CAST(s1 AS DOUBLE)/n))
             / POWER(CAST(s2 AS DOUBLE)/n
                     - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n), 1.5),
           6) AS DOUBLE) AS skew_pop,
           CAST(ROUND(
             (CAST(s4 AS DOUBLE)/n
              - 4*(CAST(s1 AS DOUBLE)/n)*(CAST(s3 AS DOUBLE)/n)
              + 6*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)
                 *(CAST(s2 AS DOUBLE)/n)
              - 3*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)
                 *(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))
             / ((CAST(s2 AS DOUBLE)/n
                 - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))
                * (CAST(s2 AS DOUBLE)/n
                   - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))),
           6) AS DOUBLE) AS kurt_pop
    FROM m ORDER BY l_returnflag
    """,
)
def skew_kurt_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``skewPop`` / ``kurtPop`` from exact integer power sums
    (l_quantity is integral, so s1..s4 are exact BIGINTs in any
    accumulation order — q^4 ≤ 6.25e6 keeps even sf-100 sums inside
    int64), evaluated once per group in double with the identical
    central-moment expression tree on both engines. POWER(x, 1.5) =
    x*sqrt(x) is avoided as a rewrite precisely because both engines
    must run the SAME operator — they do (pow with literal 1.5).

    Same scale shape as linear_regression_agg: one map-side-combined
    aggregate, four moments per group."""
    li = tables(spark, sf_dir)["lineitem"]
    q = F.col("l_quantity").cast("long")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
        F.sum(q * q * q * q).alias("s4"),
    )
    n = F.col("n")
    mean = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n - mean * mean
    m3 = (
        F.col("s3").cast("double") / n
        - 3 * mean * (F.col("s2").cast("double") / n)
        + 2 * mean * mean * mean
    )
    m4 = (
        F.col("s4").cast("double") / n
        - 4 * mean * (F.col("s3").cast("double") / n)
        + 6 * mean * mean * (F.col("s2").cast("double") / n)
        - 3 * mean * mean * mean * mean
    )
    return m.select(
        "l_returnflag",
        F.round(m3 / F.pow(m2, F.lit(1.5)), 6).cast("double").alias("skew_pop"),
        F.round(m4 / (m2 * m2), 6).cast("double").alias("kurt_pop"),
    ).orderBy("l_returnflag")


@query(
    "group_bit_agg",
    oracle="""
    SELECT o_orderstatus,
           CAST(bit_and(CAST(o_custkey AS BIGINT)) AS BIGINT) AS band,
           CAST(bit_or(CAST(o_custkey AS BIGINT)) AS BIGINT) AS bor,
           CAST(bit_xor(CAST(o_custkey AS BIGINT)) AS BIGINT) AS bxor
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def group_bit_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupBitAnd/Or/Xor``: bitwise-fold aggregates
    (bitmask accumulation). Bitwise ops are associative+commutative, so
    any partial-agg order gives identical results — the rare float-free
    aggregate family that's hash-gate-safe with zero discipline."""
    o = tables(spark, sf_dir)["orders"]
    k = F.col("o_custkey").cast("long")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bit_and(k).alias("band"),
            F.bit_or(k).alias("bor"),
            F.bit_xor(k).alias("bxor"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "interval_length_sum",
    oracle="""
    WITH iv AS (
        SELECT user_id, epoch_us(ts) AS lo,
               epoch_us(ts) + CAST(3600e6 AS BIGINT) AS hi
        FROM events WHERE event_type = 'view'
    ),
    flagged AS (
        SELECT user_id, lo, hi,
               CASE WHEN lo > COALESCE(MAX(hi) OVER (
                        PARTITION BY user_id ORDER BY lo, hi
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -9223372036854775808)
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
    ),
    islands AS (
        SELECT user_id, lo, hi,
               SUM(new_island) OVER (PARTITION BY user_id
                                     ORDER BY lo, hi
                                     ROWS UNBOUNDED PRECEDING) AS island
        FROM flagged
    )
    SELECT user_id,
           CAST(FLOOR(SUM(len) / 1000000) AS BIGINT) AS covered_sec
    FROM (SELECT user_id, island, MAX(hi) - MIN(lo) AS len
          FROM islands GROUP BY user_id, island)
    GROUP BY user_id ORDER BY user_id
    """,
)
def interval_length_sum_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``intervalLengthSum(start, end)``: total length covered
    by a set of possibly-overlapping intervals (each view event opens a
    1-hour attention window; overlaps must not double-count). Classic
    gaps-and-islands: an interval starts a new island iff its start
    exceeds the running max end of everything before it; island id is
    the running sum of those flags; covered = Σ per-island (max end −
    min start). Two windows over ONE (user, lo) sort plus two
    aggregates, all integer microseconds — no sweep-line state machine,
    no Python."""
    from pyspark.sql import Window

    ev = tables(spark, sf_dir)["events"].filter(F.col("event_type") == "view")
    lo = F.unix_micros("ts")
    iv = ev.select(
        "user_id",
        lo.alias("lo"),
        (lo + F.lit(3600_000_000).cast("long")).alias("hi"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("lo", "hi")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("lo", "hi")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(
            F.col("lo")
            > F.coalesce(
                F.max("hi").over(w_prev),
                F.lit(-9223372036854775808).cast("long"),
            ),
            1,
        ).otherwise(0),
    ).withColumn("island", F.sum("new_island").over(w_run))
    per_island = flagged.groupBy("user_id", "island").agg(
        (F.max("hi") - F.min("lo")).alias("len")
    )
    return (
        per_island.groupBy("user_id")
        .agg(
            F.floor(F.sum("len") / 1000000).cast("long").alias("covered_sec")
        )
        .orderBy("user_id")
    )
