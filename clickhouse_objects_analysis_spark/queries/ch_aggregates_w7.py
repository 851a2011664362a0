"""Round-5 aggregate wave: more ClickHouse behavioral aggregates
(grammar: plain aggregate-function names reachable from the generic
function rule, generated_ch_parser/ClickHouseParser.py:15571) —
theilsU, categoricalInformationValue, meanZTest, deltaSumTimestamp,
groupConcat, groupArrayArray, singleValueOrNull + sumCount,
cramersVBiasCorrected, groupArrayInsertAt, sparkbar.

Float discipline (SCALE.md playbook): every count/moment accumulates as
an exact integer; per-cell transcendental terms (entropy, WoE, chi^2)
are evaluated with the IDENTICAL double expression tree on both engines
and quantized to int64 (FLOOR(x*1e9 + 0.5)) BEFORE the cross-cell sum,
so accumulation order can never change the hash; each final statistic
divides once.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import query, tables

#: Shared quantizer: order-independent integer sum of double terms.
_Q = 1_000_000_000


def _q(col):
    return F.floor(col * F.lit(_Q) + F.lit(0.5)).cast("long")


@query(
    "theils_u",
    oracle="""
    WITH cells AS (
        SELECT o_orderpriority AS x, o_orderstatus AS y,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM orders GROUP BY 1, 2
    ),
    xm AS (SELECT x, SUM(o) AS nx FROM cells GROUP BY x),
    ym AS (SELECT y, SUM(o) AS ny FROM cells GROUP BY y),
    tot AS (SELECT SUM(o) AS n FROM cells),
    hx AS (
        SELECT SUM(CAST(FLOOR(
            -(CAST(nx AS DOUBLE) / t.n) * LN(CAST(nx AS DOUBLE) / t.n)
            * 1e9 + 0.5) AS BIGINT)) AS q
        FROM xm CROSS JOIN tot t
    ),
    hxy AS (
        SELECT SUM(CAST(FLOOR(
            -(CAST(c.o AS DOUBLE) / t.n)
            * LN(CAST(c.o AS DOUBLE) / y.ny)
            * 1e9 + 0.5) AS BIGINT)) AS q
        FROM cells c JOIN ym y ON c.y = y.y CROSS JOIN tot t
    )
    SELECT CAST(t.n AS BIGINT) AS n,
           CAST(ROUND((CAST(hx.q AS DOUBLE) - hxy.q)
                      / CAST(hx.q AS DOUBLE), 6) AS DOUBLE) AS theils_u
    FROM hx CROSS JOIN hxy CROSS JOIN tot t
    """,
)
def theils_u_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``theilsU(x, y)`` — the uncertainty coefficient
    U(X|Y) = (H(X) − H(X|Y)) / H(X) for order priority given order
    status: how much the status tells you about the priority, 0..1,
    asymmetric (unlike cramersV).  H terms are per-cell doubles over
    exact integer counts, quantized to int64 before the sum (the
    cramers_v_contingency discipline); the 1e9 quantum cancels in the
    final ratio, so U needs no de-scaling.  Two tiny aggregates over
    the |X|x|Y| contingency cells — one fact-table shuffle."""
    o = tables(spark, sf_dir)["orders"]
    cells = o.groupBy(
        F.col("o_orderpriority").alias("x"), F.col("o_orderstatus").alias("y")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    xm = cells.groupBy("x").agg(F.sum("o").alias("nx"))
    ym = cells.groupBy("y").agg(F.sum("o").alias("ny"))
    tot = cells.agg(F.sum("o").alias("n"))
    nd = F.col("n").cast("double")
    hx = (
        xm.crossJoin(F.broadcast(tot))
        .select(
            _q(
                -(F.col("nx").cast("double") / nd)
                * F.log(F.col("nx").cast("double") / nd)
            ).alias("t")
        )
        .agg(F.sum("t").alias("hx_q"))
    )
    hxy = (
        cells.join(F.broadcast(ym), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            _q(
                -(F.col("o").cast("double") / nd)
                * F.log(F.col("o").cast("double") / F.col("ny"))
            ).alias("t")
        )
        .agg(F.sum("t").alias("hxy_q"))
    )
    j = hx.crossJoin(F.broadcast(hxy)).crossJoin(F.broadcast(tot))
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.round(
            (F.col("hx_q").cast("double") - F.col("hxy_q"))
            / F.col("hx_q").cast("double"),
            6,
        )
        .cast("double")
        .alias("theils_u"),
    )


@query(
    "categorical_iv",
    oracle="""
    WITH b AS (
        SELECT o_orderpriority AS cat,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
        FROM orders
    ),
    per AS (
        SELECT cat,
               CAST(SUM(1 - bad) AS BIGINT) AS g,
               CAST(SUM(bad) AS BIGINT) AS bd
        FROM b GROUP BY cat
    ),
    tot AS (SELECT SUM(g) AS gt, SUM(bd) AS bt FROM per),
    terms AS (
        SELECT cat,
               CAST(FLOOR(
                 (CAST(g AS DOUBLE) / t.gt - CAST(bd AS DOUBLE) / t.bt)
                 * LN((CAST(g AS DOUBLE) / t.gt)
                      / (CAST(bd AS DOUBLE) / t.bt))
                 * 1e9 + 0.5) AS BIGINT) AS q
        FROM per CROSS JOIN tot t
        WHERE g > 0 AND bd > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cats,
           CAST(ROUND(SUM(q) / 1e9, 6) AS DOUBLE) AS information_value
    FROM terms
    """,
)
def categorical_iv_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``categoricalInformationValue(cat, tag)``: the credit
    -scoring IV of order priority predicting fulfilled status —
    IV = Σ_cat (g/G − b/B)·ln((g/G)/(b/B)).  Categories missing either
    class are excluded (WoE undefined), matching ClickHouse's skip of
    empty cells.  Integer class counts, per-category quantized WoE
    terms, one division at the end."""
    o = tables(spark, sf_dir)["orders"]
    b = o.select(
        F.col("o_orderpriority").alias("cat"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("bad"),
    )
    per = b.groupBy("cat").agg(
        F.sum(1 - F.col("bad")).cast("long").alias("g"),
        F.sum("bad").cast("long").alias("bd"),
    )
    tot = per.agg(F.sum("g").alias("gt"), F.sum("bd").alias("bt"))
    gd = F.col("g").cast("double") / F.col("gt")
    bd_ = F.col("bd").cast("double") / F.col("bt")
    terms = (
        per.crossJoin(F.broadcast(tot))
        .filter((F.col("g") > 0) & (F.col("bd") > 0))
        .select(_q((gd - bd_) * F.log(gd / bd_)).alias("q"))
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_cats"),
        F.round(F.sum("q") / F.lit(1e9), 6).cast("double").alias(
            "information_value"
        ),
    )


@query(
    "mean_z_test",
    oracle="""
    WITH b AS (
        SELECT l_returnflag = 'A' AS is_a,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem WHERE l_returnflag IN ('A', 'R')
    ),
    m AS (
        SELECT is_a,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS s1,
               CAST(SUM(y * y // 100000000) AS BIGINT) AS s2_hi,
               CAST(SUM(y * y % 100000000) AS BIGINT) AS s2_lo
        FROM b GROUP BY is_a
    ),
    w AS (
        SELECT
          MAX(CASE WHEN is_a THEN n END) AS na,
          MAX(CASE WHEN NOT is_a THEN n END) AS nr,
          MAX(CASE WHEN is_a THEN CAST(s1 AS DOUBLE) END) AS sa,
          MAX(CASE WHEN NOT is_a THEN CAST(s1 AS DOUBLE) END) AS sr,
          MAX(CASE WHEN is_a THEN CAST(s2_hi AS HUGEINT) * 100000000
                                  + s2_lo END) AS qa,
          MAX(CASE WHEN NOT is_a THEN CAST(s2_hi AS HUGEINT) * 100000000
                                      + s2_lo END) AS qr
        FROM m
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nr AS BIGINT) AS n_r,
           CAST(ROUND(
             (sa / na - sr / nr)
             / SQRT((CAST(qa AS DOUBLE) / na - (sa / na) * (sa / na)) / na
                    + (CAST(qr AS DOUBLE) / nr - (sr / nr) * (sr / nr)) / nr)
             , 6) AS DOUBLE) AS z_stat
    FROM w
    """,
)
def mean_z_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``meanZTest(...)(x, tag)``: two-sample z statistic for
    mean extended price between return flags A and R, with the
    population variances taken from the data (the known-variance z-test
    degenerate form).  Same exact-moment scaffolding as
    student_welch_ttest: integer cents, hi/lo-split sums of squares
    (cents^2 ≈ 1e14 per row leaves int64 at ~9e4 rows), one double
    expression per statistic, identical tree both engines."""
    li = tables(spark, sf_dir)["lineitem"].filter(
        F.col("l_returnflag").isin("A", "R")
    )
    b = li.select(
        (F.col("l_returnflag") == "A").alias("is_a"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
    )
    m = b.groupBy("is_a").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").alias("s1"),
        F.sum(F.expr("y * y DIV 100000000")).alias("s2_hi"),
        F.sum(F.expr("y * y % 100000000")).alias("s2_lo"),
    )

    w = m.agg(
        F.max(F.when(F.col("is_a"), F.col("n"))).alias("na"),
        F.max(F.when(~F.col("is_a"), F.col("n"))).alias("nr"),
        F.max(F.when(F.col("is_a"), F.col("s1").cast("double"))).alias("sa"),
        F.max(F.when(~F.col("is_a"), F.col("s1").cast("double"))).alias("sr"),
        F.max(
            F.when(
                F.col("is_a"),
                F.col("s2_hi").cast("decimal(38,0)") * F.lit(100000000)
                + F.col("s2_lo"),
            )
        ).alias("qa"),
        F.max(
            F.when(
                ~F.col("is_a"),
                F.col("s2_hi").cast("decimal(38,0)") * F.lit(100000000)
                + F.col("s2_lo"),
            )
        ).alias("qr"),
    )
    na, nr = F.col("na"), F.col("nr")
    sa, sr = F.col("sa"), F.col("sr")
    qa = F.col("qa").cast("double")
    qr = F.col("qr").cast("double")
    z = (sa / na - sr / nr) / F.sqrt(
        (qa / na - (sa / na) * (sa / na)) / na
        + (qr / nr - (sr / nr) * (sr / nr)) / nr
    )
    return w.select(
        na.cast("long").alias("n_a"),
        nr.cast("long").alias("n_r"),
        F.round(z, 6).cast("double").alias("z_stat"),
    )


@query(
    "delta_sum_timestamp",
    oracle="""
    WITH s AS (
        SELECT user_id, event_type,
               CAST(value AS DECIMAL(18,2)) AS v,
               lag(CAST(value AS DECIMAL(18,2)))
                 OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS pv
        FROM events
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN pv IS NOT NULL AND v > pv
                         THEN v - pv ELSE CAST(0 AS DECIMAL(18,2)) END)
                AS DOUBLE) AS delta_sum
    FROM s GROUP BY event_type ORDER BY event_type
    """,
)
def delta_sum_timestamp_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``deltaSumTimestamp(value, ts)``: deltaSum with the
    increments taken in TIMESTAMP order (the state-merge-safe variant of
    deltaSum) — here per (user, event_type) counter series, rolled up
    per event type.  The window partitions on the series key, so task
    size is bounded by one series (the 100 TB shape: millions of small
    series, never a global sort); sums are exact decimals with one
    double cast per output row."""
    ev = tables(spark, sf_dir)["events"]
    v = F.col("value").cast("decimal(18,2)")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    s = ev.select(
        "user_id", "event_type", v.alias("v"), F.lag(v).over(w).alias("pv")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        s.groupBy("event_type")
        .agg(
            F.sum(
                F.when(
                    F.col("pv").isNotNull() & (F.col("v") > F.col("pv")),
                    F.col("v") - F.col("pv"),
                ).otherwise(zero)
            )
            .cast("double")
            .alias("delta_sum")
        )
        .orderBy("event_type")
    )


@query(
    "group_concat_agg",
    oracle="""
    SELECT o_orderstatus,
           string_agg(o_orderpriority, ','
                      ORDER BY o_orderpriority, o_orderkey) AS priorities,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders WHERE o_orderkey % 97 = 0
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def group_concat_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupConcat(',')(x)`` — all values of a column joined
    into one string per group.  ClickHouse leaves the order to the
    input stream; cross-engine determinism pins it to (value, key)
    sort.  Built as sort_array(collect_list(struct)) so the sort
    happens once per group row, map-side-combined; the 1/97 key slice
    keeps the strings bounded (groupConcat at corpus scale is a
    rendering aggregate, not a data movement one)."""
    o = tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") % 97 == 0)
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col("o_orderpriority"), F.col("o_orderkey")
                            )
                        )
                    ),
                    lambda s: s["o_orderpriority"],
                ),
                ",",
            ).alias("priorities"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "array_concat_agg",
    oracle="""
    SELECT p_brand,
           array_to_string(
             list_sort(flatten(list(string_split(p_name, ' ')))),
             ',') AS words,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM part WHERE p_partkey % 53 = 0
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def array_concat_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupArrayArray(arr)`` / ``arrayConcatAgg`` — array
    columns concatenated across the group's rows.  flatten(collect_list)
    is the native Spark spelling; the result is sorted and joined so the
    hash gate compares canonical text (ClickHouse keeps stream order,
    which no distributed engine should promise)."""
    p = tables(spark, sf_dir)["part"].filter(F.col("p_partkey") % 53 == 0)
    return (
        p.groupBy("p_brand")
        .agg(
            F.array_join(
                F.sort_array(
                    F.flatten(F.collect_list(F.split(F.col("p_name"), " ")))
                ),
                ",",
            ).alias("words"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .orderBy("p_brand")
    )


@query(
    "single_value_sum_count",
    oracle="""
    SELECT l_returnflag,
           CASE WHEN COUNT(DISTINCT l_linestatus) = 1
                THEN MIN(l_linestatus) END AS single_status,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q,
           CAST(COUNT(l_quantity) AS BIGINT) AS cnt_q
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def single_value_sum_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``singleValueOrNull(x)`` (the value when the group has
    exactly one distinct value, else NULL) and ``sumCount(x)`` (the
    (sum, count) pair a later Merge can finish into an average) — both
    plain map-side-combined aggregates."""
    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.when(
                F.count_distinct("l_linestatus") == 1, F.min("l_linestatus")
            ).alias("single_status"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sum_q"),
            F.count("l_quantity").cast("long").alias("cnt_q"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "cramers_v_bias_corrected",
    oracle="""
    WITH cells AS (
        SELECT o_orderstatus AS r, o_orderpriority AS c,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM orders GROUP BY 1, 2
    ),
    margins AS (SELECT r, SUM(o) AS ro FROM cells GROUP BY r),
    colm AS (SELECT c, SUM(o) AS co FROM cells GROUP BY c),
    tot AS (SELECT SUM(o) AS n, COUNT(DISTINCT r) AS nr,
                   COUNT(DISTINCT c) AS nc FROM cells),
    terms AS (
        SELECT CAST(FLOOR(
                 (CAST(cells.o AS DOUBLE)
                    - CAST(m.ro AS DOUBLE) * cm.co / t.n)
                 * (CAST(cells.o AS DOUBLE)
                    - CAST(m.ro AS DOUBLE) * cm.co / t.n)
                 / (CAST(m.ro AS DOUBLE) * cm.co / t.n)
                 * 1e9 + 0.5) AS BIGINT) AS q
        FROM cells
        JOIN margins m ON cells.r = m.r
        JOIN colm cm ON cells.c = cm.c
        CROSS JOIN tot t
    ),
    s AS (SELECT SUM(q) AS chi2q FROM terms)
    SELECT CAST(t.n AS BIGINT) AS n,
           CAST(ROUND(SQRT(
             GREATEST(CAST(s.chi2q AS DOUBLE) / 1e9 / t.n
                      - (t.nr - 1.0) * (t.nc - 1.0) / (t.n - 1), 0.0)
             / (LEAST(t.nr - (t.nr - 1.0) * (t.nr - 1.0) / (t.n - 1),
                      t.nc - (t.nc - 1.0) * (t.nc - 1.0) / (t.n - 1)) - 1)
             ), 6) AS DOUBLE) AS cramers_v_bc
    FROM s CROSS JOIN tot t
    """,
)
def cramers_v_bias_corrected_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``cramersVBiasCorrected(x, y)`` — the Bergsma bias
    -corrected Cramér's V (Bergsma 2013): φ²_+ = max(0, φ² −
    (r−1)(c−1)/(n−1)), r_+ = r − (r−1)²/(n−1), c_+ = c − (c−1)²/(n−1),
    V = sqrt(φ²_+ / (min(r_+, c_+) − 1)).  Reuses the quantized integer
    chi² of cramers_v_contingency; one double expression per output,
    identical tree both engines."""
    o = tables(spark, sf_dir)["orders"]
    cells = o.groupBy(
        F.col("o_orderstatus").alias("r"), F.col("o_orderpriority").alias("c")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    margins = cells.groupBy("r").agg(F.sum("o").alias("ro"))
    colm = cells.groupBy("c").agg(F.sum("o").alias("co"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.count_distinct("r").alias("nr"),
        F.count_distinct("c").alias("nc"),
    )
    nd = F.col("n").cast("double")
    e = F.col("ro").cast("double") * F.col("co") / nd
    terms = (
        cells.join(F.broadcast(margins), "r")
        .join(F.broadcast(colm), "c")
        .crossJoin(F.broadcast(tot))
        .select(
            _q(
                (F.col("o").cast("double") - e)
                * (F.col("o").cast("double") - e)
                / e
            ).alias("q")
        )
    )
    s = terms.agg(F.sum("q").alias("chi2q"))
    j = s.crossJoin(F.broadcast(tot))
    nrd = F.col("nr").cast("double")
    ncd = F.col("nc").cast("double")
    phi2 = F.col("chi2q").cast("double") / F.lit(1e9) / nd
    phi2p = F.greatest(
        phi2 - (nrd - 1.0) * (ncd - 1.0) / (nd - 1), F.lit(0.0)
    )
    rp = nrd - (nrd - 1.0) * (nrd - 1.0) / (nd - 1)
    cp = ncd - (ncd - 1.0) * (ncd - 1.0) / (nd - 1)
    v = F.sqrt(phi2p / (F.least(rp, cp) - 1))
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.round(v, 6).cast("double").alias("cramers_v_bc"),
    )


@query(
    "group_array_insert_at",
    oracle="""
    WITH cell AS (
        SELECT o_orderstatus AS st,
               CAST(substr(o_orderpriority, 1, 1) AS BIGINT) - 1 AS pos,
               MIN(o_orderpriority) AS val
        FROM orders GROUP BY 1, 2
    ),
    grid AS (
        SELECT st, gs.pos
        FROM (SELECT DISTINCT st FROM cell)
        CROSS JOIN (SELECT UNNEST(generate_series(0, 4)) AS pos) gs
    )
    SELECT g.st AS o_orderstatus,
           string_agg(COALESCE(c.val, '-'), ',' ORDER BY g.pos) AS arr
    FROM grid g LEFT JOIN cell c ON g.st = c.st AND g.pos = c.pos
    GROUP BY g.st ORDER BY g.st
    """,
)
def group_array_insert_at_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupArrayInsertAt('-', 5)(value, pos)``: a fixed
    -size array per group with each value written at its position and
    holes filled with the default — here the priority name at slot
    priority−1 per order status.  Colliding writes are pinned to MIN
    (ClickHouse keeps 'any'; a distributed engine must pick a
    deterministic one).  Spark builds the array map-side from the
    (pos → val) entries via sequence+transform — no per-slot join;
    rendered as a joined string for the canonical-text hash gate."""
    o = tables(spark, sf_dir)["orders"]
    cell = o.groupBy(
        F.col("o_orderstatus").alias("st"),
        (F.substring("o_orderpriority", 1, 1).cast("long") - 1).alias("pos"),
    ).agg(F.min("o_orderpriority").alias("val"))
    per = cell.groupBy("st").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("pos"), F.col("val")))
        ).alias("m")
    )
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(4)),
        lambda i: F.coalesce(
            F.element_at(F.col("m"), i.cast("long")), F.lit("-")
        ),
    )
    return (
        per.select(
            F.col("st").alias("o_orderstatus"),
            F.array_join(arr, ",").alias("arr"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "sparkbar_hourly",
    oracle="""
    WITH h AS (
        SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT t.event_type, gs.hr
        FROM (SELECT DISTINCT event_type FROM h) t
        CROSS JOIN (SELECT UNNEST(generate_series(0, 23)) AS hr) gs
    ),
    fil AS (
        SELECT g.event_type, g.hr, COALESCE(h.c, 0) AS c,
               MAX(COALESCE(h.c, 0)) OVER (PARTITION BY g.event_type) AS mx
        FROM grid g LEFT JOIN h ON g.event_type = h.event_type
                               AND g.hr = h.hr
    )
    SELECT event_type,
           string_agg(substr('▁▂▃▄▅▆▇█',
                             CAST(CASE WHEN c = 0 THEN 0
                                  ELSE (c * 7 + mx - 1) // mx END
                                  AS BIGINT) + 1, 1),
                      '' ORDER BY hr) AS bar
    FROM fil GROUP BY event_type ORDER BY event_type
    """,
)
def sparkbar_hourly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sparkbar(24)(hour, count)`` — the unicode bar-chart
    rendering aggregate: one 24-char ▁..█ string per event type showing
    hourly volume.  Level mapping is pinned to exact integer arithmetic
    (ceil(c·7/mx) per non-empty bucket) so both engines pick identical
    glyphs; empty hours render the baseline glyph.  One small aggregate
    + a per-group array build; the fact table shuffles once."""
    ev = tables(spark, sf_dir)["events"]
    h = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hr")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    per = h.groupBy("event_type").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("hr"), F.col("c")))
        ).alias("m"),
        F.max("c").alias("mx"),
    )
    bar = "▁▂▃▄▅▆▇█"

    def glyph(i):
        c = F.coalesce(F.element_at(F.col("m"), i.cast("long")), F.lit(0))
        # ceil(c*7/mx) via exact integer arithmetic: counts stay far
        # below 2^53, so the double division truncates exactly
        level = F.when(c == 0, F.lit(0)).otherwise(
            F.floor((c * 7 + F.col("mx") - 1) / F.col("mx")).cast("int")
        )
        return F.substring(F.lit(bar), level.cast("int") + 1, 1)

    glyphs = F.transform(F.sequence(F.lit(0), F.lit(23)), glyph)
    return (
        per.select(
            "event_type", F.array_join(glyphs, "").alias("bar")
        ).orderBy("event_type")
    )


@query(
    "window_funnel_strict_dedup",
    oracle="""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
    m AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN t END) AS t1
        FROM e GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, m.t1,
               MIN(CASE WHEN e.event_type = 'view' AND e.t > m.t1
                        THEN e.t END) AS v2,
               MIN(CASE WHEN e.event_type = 'click' AND e.t > m.t1
                             AND e.t - m.t1 <= {W}
                        THEN e.t END) AS t2
        FROM e JOIN m USING (user_id)
        GROUP BY e.user_id, m.t1
    ),
    s3 AS (
        SELECT s2.user_id, s2.t1, s2.v2, s2.t2,
               MIN(CASE WHEN e.event_type = 'click' AND e.t > s2.t2
                        THEN e.t END) AS c2,
               MIN(CASE WHEN e.event_type = 'purchase' AND e.t > s2.t2
                             AND e.t - s2.t1 <= {W}
                        THEN e.t END) AS t3
        FROM s2 LEFT JOIN e ON e.user_id = s2.user_id
        GROUP BY s2.user_id, s2.t1, s2.v2, s2.t2
    ),
    lv AS (
        SELECT user_id,
               CASE
                 WHEN t1 IS NULL THEN 0
                 WHEN t2 IS NULL OR (v2 IS NOT NULL AND v2 <= t2) THEN 1
                 WHEN t3 IS NULL OR (c2 IS NOT NULL AND c2 <= t3) THEN 2
                 ELSE 3
               END AS lvl
        FROM s3
    )
    SELECT CAST(lvl AS INT) AS funnel_level,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM lv WHERE lvl > 0 GROUP BY lvl ORDER BY lvl
    """.replace("{W}", "259200000000"),
)
def window_funnel_strict_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(window, 'strict_dedup')(ts, v, c, p)``:
    the view→click→purchase funnel where a REPEAT of an already-matched
    step before the next step interrupts the chain — a second view
    before the first click caps the user at level 1, a second click
    before the first purchase caps at level 2 (the dedup guard CH docs
    specify; plain windowFunnel would keep searching).

    Spark shape: the per-step earliest-times are conditional MINs over
    per-user windows — one shuffle on user_id, four Window aggregates
    over the same partitioning (Catalyst collapses them into one sort),
    integer microsecond arithmetic throughout."""
    from pyspark.sql import Window

    W = 3 * 24 * 3600 * 1_000_000
    ev = tables(spark, sf_dir)["events"].select(
        "user_id", "event_type", F.unix_micros("ts").alias("t")
    )
    wu = Window.partitionBy("user_id")
    is_ = lambda et: F.col("event_type") == et  # noqa: E731
    d = ev.withColumn("t1", F.min(F.when(is_("view"), F.col("t"))).over(wu))
    d = d.withColumn(
        "v2",
        F.min(
            F.when(is_("view") & (F.col("t") > F.col("t1")), F.col("t"))
        ).over(wu),
    ).withColumn(
        "t2",
        F.min(
            F.when(
                is_("click")
                & (F.col("t") > F.col("t1"))
                & (F.col("t") - F.col("t1") <= W),
                F.col("t"),
            )
        ).over(wu),
    )
    d = d.withColumn(
        "c2",
        F.min(
            F.when(is_("click") & (F.col("t") > F.col("t2")), F.col("t"))
        ).over(wu),
    ).withColumn(
        "t3",
        F.min(
            F.when(
                is_("purchase")
                & (F.col("t") > F.col("t2"))
                & (F.col("t") - F.col("t1") <= W),
                F.col("t"),
            )
        ).over(wu),
    )
    per = d.groupBy("user_id").agg(
        F.first("t1").alias("t1"),
        F.first("v2").alias("v2"),
        F.first("t2").alias("t2"),
        F.first("c2").alias("c2"),
        F.first("t3").alias("t3"),
    )
    lvl = (
        F.when(F.col("t1").isNull(), 0)
        .when(
            F.col("t2").isNull()
            | (F.col("v2").isNotNull() & (F.col("v2") <= F.col("t2"))),
            1,
        )
        .when(
            F.col("t3").isNull()
            | (F.col("c2").isNotNull() & (F.col("c2") <= F.col("t3"))),
            2,
        )
        .otherwise(3)
    )
    return (
        per.select("user_id", lvl.alias("lvl"))
        .filter(F.col("lvl") > 0)
        .groupBy(F.col("lvl").cast("int").alias("funnel_level"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("funnel_level")
    )


@query(
    "entropy_agg",
    oracle="""
    WITH c AS (
        SELECT l_returnflag, l_shipdate AS v, CAST(COUNT(*) AS BIGINT) AS k
        FROM lineitem GROUP BY 1, 2
    ),
    t AS (SELECT l_returnflag, SUM(k) AS n FROM c GROUP BY 1),
    q AS (
        SELECT c.l_returnflag,
               SUM(CAST(FLOOR(
                 -(CAST(k AS DOUBLE) / t.n)
                 * LN(CAST(k AS DOUBLE) / t.n) / LN(2.0)
                 * 1e9 + 0.5) AS BIGINT)) AS hq,
               MAX(t.n) AS n
        FROM c JOIN t USING (l_returnflag) GROUP BY c.l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           CAST(ROUND(hq / 1e9, 6) AS DOUBLE) AS entropy_bits
    FROM q ORDER BY l_returnflag
    """,
)
def entropy_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``entropy(x)`` — Shannon entropy (bits) of a column's
    value distribution per group, here ship dates per return flag.
    Distinct-value counts are exact integers; each −p·log2(p) term is
    quantized to int64 before the cross-value sum (the w7 discipline),
    one de-scale division at the end.  Two chained hash aggregates."""
    li = tables(spark, sf_dir)["lineitem"]
    c = li.groupBy("l_returnflag", F.col("l_shipdate").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    t = c.groupBy("l_returnflag").agg(F.sum("k").alias("n"))
    nd = F.col("n").cast("double")
    p = F.col("k").cast("double") / nd
    q = (
        c.join(F.broadcast(t), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.sum(_q(-p * F.log(p) / F.log(F.lit(2.0)))).alias("hq"),
            F.max("n").alias("n"),
        )
    )
    return q.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("hq") / F.lit(1e9), 6)
        .cast("double")
        .alias("entropy_bits"),
    ).orderBy("l_returnflag")


@query(
    "exponential_moving_average",
    oracle="""
    WITH s AS (
        SELECT user_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS r,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM events WHERE event_type = 'purchase'
    ),
    q AS (
        SELECT user_id,
               SUM(CAST(FLOOR(cents * POWER(0.5, n - r) * 1e6 + 0.5)
                        AS BIGINT)) AS num_q,
               SUM(CAST(FLOOR(POWER(0.5, n - r) * 1e6 + 0.5)
                        AS BIGINT)) AS den_q
        FROM s WHERE n - r <= 40
        GROUP BY user_id
    )
    SELECT user_id,
           CAST(ROUND(CAST(num_q AS DOUBLE) / den_q / 100.0, 6) AS DOUBLE)
               AS ema
    FROM q ORDER BY user_id
    """,
)
def exponential_moving_average_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``exponentialMovingAverage(1)(value, pos)`` — the
    normalized EMA of each user's purchase stream with per-step decay
    0.5: Σ v_i·0.5^(n−i) / Σ 0.5^(n−i).  The recurrence unrolls into a
    weighted sum, so it's one per-series window (row_number — partition
    bounded by the series) + a hash aggregate; each term is quantized to
    int64 at 1e-6 before summing so accumulation order can't move the
    hash, and steps older than 40 half-lives (weight < 1e-12) are
    dropped identically on both engines."""
    from pyspark.sql import Window

    ev = tables(spark, sf_dir)["events"].filter(
        F.col("event_type") == "purchase"
    )
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        F.row_number().over(wu).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
    ).filter(F.col("n") - F.col("r") <= 40)
    wgt = F.pow(F.lit(0.5), F.col("n") - F.col("r"))

    def q6(col):
        return F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("long")

    q = s.groupBy("user_id").agg(
        F.sum(q6(F.col("cents") * wgt)).alias("num_q"),
        F.sum(q6(wgt)).alias("den_q"),
    )
    return q.select(
        "user_id",
        F.round(
            F.col("num_q").cast("double") / F.col("den_q") / F.lit(100.0), 6
        )
        .cast("double")
        .alias("ema"),
    ).orderBy("user_id")


@query(
    "quantile_interpolated_weighted",
    oracle="""
    WITH h AS (
        SELECT l_returnflag,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y,
               SUM(CAST(l_quantity AS BIGINT)) AS w
        FROM lineitem GROUP BY 1, 2
    ),
    c AS (
        SELECT l_returnflag, y, w,
               SUM(w) OVER (PARTITION BY l_returnflag ORDER BY y
                            ROWS UNBOUNDED PRECEDING) AS cw,
               SUM(w) OVER (PARTITION BY l_returnflag) AS tw
        FROM h
    ),
    lo AS (
        SELECT l_returnflag,
               MAX(CASE WHEN 2 * cw <= tw THEN y END) AS y_lo,
               MIN(CASE WHEN 2 * cw >= tw THEN y END) AS y_hi,
               MAX(CASE WHEN 2 * cw <= tw THEN cw END) AS cw_lo,
               MAX(tw) AS tw
        FROM c GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(ROUND(CASE
             WHEN y_lo IS NULL THEN y_hi
             WHEN 2 * cw_lo = tw AND y_hi IS NOT NULL AND y_hi > y_lo
               THEN (y_lo + y_hi) / 2.0
             ELSE y_hi
           END / 100.0, 4) AS DOUBLE) AS median_interp
    FROM lo ORDER BY l_returnflag
    """,
)
def quantile_interpolated_weighted_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``quantileInterpolatedWeighted(0.5)(y, w)`` — the
    weighted median with linear interpolation at an exact boundary hit:
    when the cumulative weight lands exactly on half the total, the
    answer is the midpoint of the straddling values; otherwise the
    crossing value.  Built on the SAME distributed histogram cumsum as
    weighted_median (operators/dist_rank.py) — the interpolation is two
    conditional aggregates over the cumsum, integer comparisons only
    until the final midpoint division.

    r15 (OPTIMIZATION_r15.md): cumulative weights come from the
    two-level boundary histogram (weighted_quantile_boundary_cw — zero
    fact-sized exchanges, one extra columnar scan) instead of the full
    dist_cumsum; the y_lo/y_hi/cw_lo selectors are unchanged and the
    pruned frame provably contains their arg-extremes (operator
    docstring)."""
    from ..operators.dist_rank import weighted_quantile_boundary_cw

    li = tables(spark, sf_dir)["lineitem"]
    rows = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
        F.col("l_quantity").cast("long").alias("__w"),
    )
    c = weighted_quantile_boundary_cw(
        rows, "l_returnflag", "y", [(2, 1)], 4096
    )
    lo = c.groupBy("l_returnflag").agg(
        F.max(
            F.when(2 * F.col("cw") <= F.col("tw"), F.col("y"))
        ).alias("y_lo"),
        F.min(
            F.when(2 * F.col("cw") >= F.col("tw"), F.col("y"))
        ).alias("y_hi"),
        F.max(
            F.when(2 * F.col("cw") <= F.col("tw"), F.col("cw"))
        ).alias("cw_lo"),
        F.max("tw").alias("tw"),
    )
    med = (
        F.when(F.col("y_lo").isNull(), F.col("y_hi").cast("double"))
        .when(
            (2 * F.col("cw_lo") == F.col("tw"))
            & F.col("y_hi").isNotNull()
            & (F.col("y_hi") > F.col("y_lo")),
            (F.col("y_lo") + F.col("y_hi")) / F.lit(2.0),
        )
        .otherwise(F.col("y_hi").cast("double"))
    )
    return lo.select(
        "l_returnflag",
        F.round(med / F.lit(100.0), 4).cast("double").alias("median_interp"),
    ).orderBy("l_returnflag")


@query(
    "sum_map_filtered",
    oracle="""
    WITH s AS (SELECT user_id, event_type,
                      SUM(CAST(value AS DECIMAL(18,2))) AS total
               FROM events
               WHERE value IS NOT NULL AND event_type IN ('view', 'click')
               GROUP BY user_id, event_type)
    SELECT user_id,
           string_agg(event_type || ':' || CAST(total AS VARCHAR), ','
                      ORDER BY event_type) AS type_totals
    FROM s GROUP BY user_id ORDER BY user_id
    """,
)
def sum_map_filtered_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sumMapFiltered(['view','click'])(k, v)`` — sumMap
    restricted to a fixed key allowlist (the monitoring idiom: keep only
    the counters you chart). The filter lands BEFORE the first
    aggregate, so the map-side state never holds unwanted keys; rendered
    as the canonical sorted key:total string like sum_map_by_user."""
    ev = tables(spark, sf_dir)["events"]
    s = (
        ev.filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin("view", "click")
        )
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
                        ":", st["event_type"], st["total"].cast("string")
                    ),
                ),
                ",",
            ).alias("type_totals")
        )
        .orderBy("user_id")
    )


@query(
    "group_array_moving_avg",
    oracle="""
    WITH m AS (
        SELECT user_id, event_id,
               SUM(CAST(value AS DECIMAL(18,2))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ) AS mv
        FROM events WHERE event_type = 'purchase'
    ),
    a AS (
        SELECT user_id, event_id,
               CAST(ROUND(CAST(mv AS DOUBLE) / 3, 4) AS DOUBLE) AS avg3
        FROM m
    )
    SELECT user_id,
           string_agg(CAST(avg3 AS VARCHAR), ',' ORDER BY event_id)
               AS moving_avgs
    FROM a GROUP BY user_id ORDER BY user_id
    """,
)
def group_array_moving_avg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupArrayMovingAvg(3)(value)`` — the moving-average
    sibling of groupArrayMovingSum: window sum over the same
    (user, time) rows frame, divided by the WINDOW SIZE (ClickHouse
    semantics: leading elements are partial sums over the full divisor,
    not an adaptive mean). The sum stays exact decimal; the one double
    division per element is the identical tree on both engines."""
    ev = tables(spark, sf_dir)["events"].filter(
        F.col("event_type") == "purchase"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    m = ev.select(
        "user_id",
        "event_id",
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
            / F.lit(3),
            4,
        )
        .cast("double")
        .alias("avg3"),
    )
    return (
        m.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("event_id", "avg3"))
                    ),
                    lambda st: st["avg3"].cast("string"),
                ),
                ",",
            ).alias("moving_avgs")
        )
        .orderBy("user_id")
    )


@query(
    "quantile_timing_weighted",
    oracle="""
    WITH b AS (
        SELECT event_type,
               CASE WHEN CAST(ROUND(value, 0) AS BIGINT) < 1024
                    THEN CAST(ROUND(value, 0) AS BIGINT)
                    ELSE LEAST(CAST(ROUND(value, 0) AS BIGINT) // 16 * 16,
                               30000) END AS ms,
               event_id % 5 + 1 AS w
        FROM events
    ),
    h AS (SELECT event_type, ms, SUM(w) AS w FROM b GROUP BY 1, 2),
    c AS (
        SELECT event_type, ms, w,
               SUM(w) OVER (PARTITION BY event_type ORDER BY ms
                            ROWS UNBOUNDED PRECEDING) AS cw,
               SUM(w) OVER (PARTITION BY event_type) AS tw
        FROM h
    )
    SELECT event_type,
           MIN(CASE WHEN 2 * cw >= tw THEN ms END) AS p50_ms
    FROM c GROUP BY event_type ORDER BY event_type
    """,
)
def quantile_timing_weighted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantileTimingWeighted(0.5)(t, w)`` — the timing
    sketch with per-row weights (weight = a deterministic event-id
    derived repeat count): same ms bucketing as quantile_timing, then
    the weighted median over the bucket histogram via the distributed
    cumsum (operators/dist_rank.py) — integer threshold comparisons,
    no single-task sort."""
    from ..operators.dist_rank import dist_cumsum

    ev = tables(spark, sf_dir)["events"]
    v = F.round(F.col("value"), 0).cast("long")
    b = ev.select(
        "event_type",
        F.when(v < 1024, v)
        .otherwise(
            F.least(
                F.expr("CAST(ROUND(value, 0) AS BIGINT) DIV 16 * 16"),
                F.lit(30000),
            )
        )
        .alias("ms"),
        (F.col("event_id") % 5 + 1).alias("w"),
    )
    h = b.groupBy("event_type", "ms").agg(F.sum("w").alias("w"))
    h = dist_cumsum(h, "ms", ["w"], keys=["event_type"])
    tot = h.groupBy("event_type").agg(F.sum("w").alias("tw"))
    return (
        h.join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(
            F.min(
                F.when(2 * F.col("cum_w") >= F.col("tw"), F.col("ms"))
            ).alias("p50_ms")
        )
        .orderBy("event_type")
    )
