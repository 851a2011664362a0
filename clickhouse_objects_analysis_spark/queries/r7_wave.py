"""Round-7 query wave: sample skewness/kurtosis (skewSamp/kurtSamp),
the population covariance matrix (covarPopMatrix, the covariance twin of
round-6's corrMatrix), and the round-7 translation-table names exercised
end-to-end over real rows (functions/ch.py wave 9/9b — grammar anchor
ClickHouseParser.py:15571 treats every function as a generic call).

Cross-engine float discipline (the driver hashes exact values): every
aggregate accumulates INTEGER power sums (l_quantity ≤ 50 so Σx⁴ fits
int64 at any SF: 50⁴·n = 6.25e6·n < 9.2e18 up to n ≈ 1.5e12 rows per
group); the final skew/kurt/covariance values are fixed-shape double
expressions over those exact integers, so both engines evaluate
bit-identical IEEE trees, rounded to 6 places per registry convention.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.ch import ch_expr
from .registry import query, tables


@query(
    "skew_kurt_samp",
    oracle="""
    WITH s AS (
        SELECT l_returnflag AS flag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s4
        FROM lineitem GROUP BY l_returnflag
    ),
    m AS (
        SELECT flag, n,
               CAST(s1 AS DOUBLE) / n AS mu,
               s1, s2, s3, s4
        FROM s
    ),
    c AS (
        SELECT flag, n, mu,
               (CAST(s2 AS DOUBLE) - mu * s1) / (n - 1) AS var_samp,
               (CAST(s3 AS DOUBLE) - 3 * mu * s2 + 2 * mu * mu * s1)
                   / (n - 1) AS m3,
               (CAST(s4 AS DOUBLE) - 4 * mu * s3 + 6 * mu * mu * s2
                - 3 * mu * mu * mu * s1) / (n - 1) AS m4
        FROM m
    )
    SELECT flag, n,
           ROUND(mu, 6) AS mean_qty,
           ROUND(var_samp, 6) AS var_samp,
           ROUND(m3 / POW(var_samp, 1.5), 6) AS skew_samp,
           ROUND(m4 / (var_samp * var_samp), 6) AS kurt_samp
    FROM c ORDER BY flag
    """,
)
def skew_kurt_samp_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``skewSamp(x)`` / ``kurtSamp(x)``: sample central
    moments mₖ = Σ(x−μ)ᵏ/(n−1) normalized by varSamp^{k/2} (kurtosis is
    the CH non-excess form, m4/σ⁴). Central sums expand to raw integer
    power sums — Σ(x−μ)³ = s3 − 3μs2 + 2μ²s1, Σ(x−μ)⁴ = s4 − 4μs3 +
    6μ²s2 − 3μ³s1 — so the shuffle carries 5 exact BIGINTs per group
    (map-side combined) and the float tree is one fixed shape at the
    end. 100 TB: this is the canonical one-pass moments aggregation."""
    li = tables(spark, sf_dir)["lineitem"]
    x = F.col("l_quantity").cast("long")
    s = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("long").alias("s1"),
        F.sum(x * x).cast("long").alias("s2"),
        F.sum(x * x * x).cast("long").alias("s3"),
        F.sum(x * x * x * x).cast("long").alias("s4"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    m = s.select("flag", "n", mu.alias("mu"), "s1", "s2", "s3", "s4")
    var_samp = (F.col("s2").cast("double") - F.col("mu") * F.col("s1")) / (
        F.col("n") - 1
    )
    m3 = (
        F.col("s3").cast("double")
        - 3 * F.col("mu") * F.col("s2")
        + 2 * F.col("mu") * F.col("mu") * F.col("s1")
    ) / (F.col("n") - 1)
    m4 = (
        F.col("s4").cast("double")
        - 4 * F.col("mu") * F.col("s3")
        + 6 * F.col("mu") * F.col("mu") * F.col("s2")
        - 3 * F.col("mu") * F.col("mu") * F.col("mu") * F.col("s1")
    ) / (F.col("n") - 1)
    c = m.select(
        "flag", "n", "mu",
        var_samp.alias("var_samp"), m3.alias("m3"), m4.alias("m4"),
    )
    return c.select(
        "flag",
        "n",
        F.round("mu", 6).alias("mean_qty"),
        F.round("var_samp", 6).alias("var_samp"),
        F.round(F.col("m3") / F.pow("var_samp", 1.5), 6).alias("skew_samp"),
        F.round(
            F.col("m4") / (F.col("var_samp") * F.col("var_samp")), 6
        ).alias("kurt_samp"),
    ).orderBy("flag")


@query(
    "covar_pop_matrix",
    oracle="""
    WITH b AS (
        SELECT l_returnflag AS flag,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(l_linenumber AS BIGINT) AS y,
               CAST(round(l_discount * 100) AS BIGINT) AS z
        FROM lineitem
    ),
    s AS (
        SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(z) AS BIGINT) AS sz,
               CAST(SUM(x*x) AS BIGINT) AS sxx,
               CAST(SUM(x*y) AS BIGINT) AS sxy,
               CAST(SUM(x*z) AS BIGINT) AS sxz,
               CAST(SUM(y*y) AS BIGINT) AS syy,
               CAST(SUM(y*z) AS BIGINT) AS syz,
               CAST(SUM(z*z) AS BIGINT) AS szz
        FROM b GROUP BY flag
    )
    SELECT flag, n,
           ROUND((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / n, 6)
               AS cov_xx,
           ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / n, 6)
               AS cov_xy,
           ROUND((CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * sz / n) / n, 6)
               AS cov_xz,
           ROUND((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / n, 6)
               AS cov_yy,
           ROUND((CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * sz / n) / n, 6)
               AS cov_yz,
           ROUND((CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz / n) / n, 6)
               AS cov_zz
    FROM s ORDER BY flag
    """,
)
def covar_pop_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``covarPopMatrix(x, y, z)``: the 3×3 population
    covariance matrix per group, emitted WIDE (one row per group, the
    upper triangle as columns — driver-canonicalizer-safe, no array
    cells). Same single-pass shape as round-6 corrMatrix: one groupBy
    carrying 10 exact integer sums, covariances as fixed-shape double
    expressions. 100 TB: one shuffle of 10 longs per group."""
    li = tables(spark, sf_dir)["lineitem"]
    b = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("x"),
        F.col("l_linenumber").cast("long").alias("y"),
        F.round(F.col("l_discount") * 100).cast("long").alias("z"),
    )
    s = b.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("z").cast("long").alias("sz"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("z")).cast("long").alias("sxz"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("y") * F.col("z")).cast("long").alias("syz"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("szz"),
    )

    def cov(spq: str, sa: str, sb_: str):
        return F.round(
            (
                F.col(spq).cast("double")
                - F.col(sa).cast("double") * F.col(sb_) / F.col("n")
            )
            / F.col("n"),
            6,
        )

    return s.select(
        "flag",
        "n",
        cov("sxx", "sx", "sx").alias("cov_xx"),
        cov("sxy", "sx", "sy").alias("cov_xy"),
        cov("sxz", "sx", "sz").alias("cov_xz"),
        cov("syy", "sy", "sy").alias("cov_yy"),
        cov("syz", "sy", "sz").alias("cov_yz"),
        cov("szz", "sz", "sz").alias("cov_zz"),
    ).orderBy("flag")


@query(
    "ch_r7_function_surface",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, ts, value, event_type,
               concat('https://www.ex', user_id % 3, '.org/p',
                      event_id % 7, '?k=', event_id % 5, '#f') AS url
        FROM events WHERE event_id % 20 = 1
    )
    SELECT event_id::BIGINT AS eid,
           (((event_id - 50) % 7) + 7) % 7 AS pm,
           GREATEST(LEAST(value, 50.0), 10.0) AS cl,
           strftime(make_date(2000 + CAST(event_id % 30 AS INT),
                              1 + CAST(event_id % 12 AS INT),
                              1 + CAST(event_id % 28 AS INT)),
                    '%Y-%m-%d') AS md,
           CAST(strftime(ts, '%Y%m%d%H%M%S') AS BIGINT) AS ymd,
           strftime(ts::DATE + CAST((7 - isodow(ts::DATE)) % 7 AS INT),
                    '%Y-%m-%d') AS ldw,
           date_trunc('month', ts)::TIMESTAMP AS dtr,
           concat('ex', user_id % 3, '.org') AS dw,
           concat('https://ex', user_id % 3, '.org/p', event_id % 7,
                  '?k=', event_id % 5, '#f') AS cw,
           concat('/p', event_id % 7, '?k=', event_id % 5) AS pf,
           concat('k=', event_id % 5, '#f') AS qf,
           ((user_id % 300) <= 255 AND (event_id % 300) <= 255) AS ip4,
           concat('l1-', event_id % 9) AS fl,
           CASE WHEN ends_with(event_type, 'e') THEN event_type
                ELSE concat(event_type, 'e') END AS ap,
           (event_id % 2 = 1) AS tb,
           SIGN(value) * FLOOR(ABS(value) * POW(10, 1)) / POW(10, 1) AS tr
    FROM e ORDER BY eid
    """,
)
def ch_r7_function_surface_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7 translation-table names end-to-end against DuckDB
    construction twins: positiveModulo, clamp, makeDate,
    toYYYYMMDDhhmmss, toLastDayOfWeek (Sunday-ending week), date_trunc,
    the URL family (domainWithoutWWW / cutWWW / pathFull /
    queryStringAndFragment over a column-built URL), isIPv4String,
    firstLine, appendTrailingCharIfAbsent, toBool, trunc. The oracle
    CONSTRUCTS the expected strings from the same columns instead of
    re-parsing, so the check is a true two-sided derivation."""
    ev = tables(spark, sf_dir)["events"].filter(F.col("event_id") % 20 == 1)
    url = F.concat(
        F.lit("https://www.ex"), (F.col("user_id") % 3).cast("string"),
        F.lit(".org/p"), (F.col("event_id") % 7).cast("string"),
        F.lit("?k="), (F.col("event_id") % 5).cast("string"), F.lit("#f"),
    )
    multiline = F.concat(
        F.lit("l1-"), (F.col("event_id") % 9).cast("string"),
        F.lit("\nl2"),
    )
    return ev.select(
        F.col("event_id").cast("long").alias("eid"),
        ch_expr("positiveModulo", F.col("event_id") - 50, F.lit(7)).alias(
            "pm"
        ),
        ch_expr("clamp", F.col("value"), F.lit(10.0), F.lit(50.0)).alias(
            "cl"
        ),
        ch_expr(
            "makeDate",
            (2000 + F.col("event_id") % 30).cast("int"),
            (1 + F.col("event_id") % 12).cast("int"),
            (1 + F.col("event_id") % 28).cast("int"),
        ).cast("string").alias("md"),
        ch_expr("toYYYYMMDDhhmmss", F.col("ts")).alias("ymd"),
        ch_expr("toLastDayOfWeek", F.col("ts").cast("date"))
        .cast("string")
        .alias("ldw"),
        ch_expr("date_trunc", "month", F.col("ts")).alias("dtr"),
        ch_expr("domainWithoutWWW", url).alias("dw"),
        ch_expr("cutWWW", url).alias("cw"),
        ch_expr("pathFull", url).alias("pf"),
        ch_expr("queryStringAndFragment", url).alias("qf"),
        ch_expr(
            "isIPv4String",
            F.concat(
                (F.col("user_id") % 300).cast("string"),
                F.lit(".0.0."),
                (F.col("event_id") % 300).cast("string"),
            ),
        ).alias("ip4"),
        ch_expr("firstLine", multiline).alias("fl"),
        ch_expr(
            "appendTrailingCharIfAbsent", F.col("event_type"), "e"
        ).alias("ap"),
        ch_expr("toBool", F.col("event_id") % 2).alias("tb"),
        ch_expr("trunc", F.col("value"), 1).alias("tr"),
    ).orderBy("eid")


@query(
    "dsir_importance_weights",
    oracle="""
    WITH tgt AS (SELECT text FROM documents WHERE source IN ('src0','src1')),
    raw AS (SELECT doc_id, text FROM documents
            WHERE source NOT IN ('src0','src1')),
    tw AS (SELECT unnest(string_split(text, ' ')) AS w FROM tgt),
    rw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM raw),
    tc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS t FROM tw GROUP BY w),
    rc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS r FROM rw GROUP BY w),
    vocab AS (SELECT w FROM tc UNION SELECT w FROM rc),
    freq AS (
        SELECT v.w, COALESCE(tc.t, 0) + 1 AS tp, COALESCE(rc.r, 0) + 1 AS rp
        FROM vocab v LEFT JOIN tc ON v.w = tc.w LEFT JOIN rc ON v.w = rc.w
    ),
    tot AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM tw) AS T,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM rw) AS R,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM vocab) AS V
    ),
    per_doc AS (
        SELECT rw.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               list_sort(list([f.tp, f.rp])) AS pairs
        FROM rw JOIN freq f ON rw.w = f.w
        GROUP BY rw.doc_id
    ),
    scored AS (
        SELECT doc_id, n_words,
               list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(pairs, x -> ln(x[1]) - ln(x[2]))),
                   (a, b) -> a + b)
               + n_words * (ln(CAST(R + V AS DOUBLE))
                            - ln(CAST(T + V AS DOUBLE))) AS w_raw
        FROM per_doc, tot
    ),
    ranked AS (
        SELECT doc_id, n_words, w_raw,
               row_number() OVER (ORDER BY w_raw DESC, doc_id) AS rnk
        FROM scored
    )
    SELECT doc_id, n_words,
           ROUND(w_raw, 6) AS log_importance,
           CAST(CASE WHEN rnk <= 50 THEN 1 ELSE 0 END AS INT) AS selected
    FROM ranked ORDER BY doc_id
    """,
)
def dsir_importance_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023)
    at the unigram-feature baseline: score every raw-pool document by
    the add-1-smoothed log importance ratio Σ_w [ln p_target(w) −
    ln p_raw(w)], target = the src0/src1 slice, then deterministically
    keep the top 50 (the resampling step with a fixed quota instead of
    Gumbel noise, so both engines agree exactly).

    Float discipline: per-word inputs are the exact integer pairs
    (t_w+1, r_w+1); each doc folds ln-differences over the
    lexicographically sorted pair list — identical addition order in
    both engines (the unigram_logprob_quality convention) — plus one
    closed-form n_words·(ln(R+V) − ln(T+V)) term.

    100 TB: two map-side-combined word counts, a vocabulary-sized
    broadcast join onto the exploded word stream, one groupBy(doc_id).
    The quota rank is the only global stage and it runs on doc-level
    rows, not words; at real scale it becomes the documented
    dist_rank/top-k path."""
    d = tables(spark, sf_dir)["documents"]
    is_tgt = F.col("source").isin("src0", "src1")
    tgt_words = d.filter(is_tgt).select(
        F.explode(F.split("text", " ")).alias("w")
    )
    raw_words = d.filter(~is_tgt).select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    tc = tgt_words.groupBy("w").agg(F.count(F.lit(1)).alias("t"))
    rc = raw_words.groupBy("w").agg(F.count(F.lit(1)).alias("r"))
    freq = (
        tc.join(rc, "w", "full")
        .select(
            "w",
            (F.coalesce(F.col("t"), F.lit(0)) + 1).alias("tp"),
            (F.coalesce(F.col("r"), F.lit(0)) + 1).alias("rp"),
        )
    )
    tot = (
        tgt_words.agg(F.count(F.lit(1)).cast("long").alias("T"))
        .crossJoin(raw_words.agg(F.count(F.lit(1)).cast("long").alias("R")))
        .crossJoin(freq.agg(F.count(F.lit(1)).cast("long").alias("V")))
    )
    per_doc = (
        raw_words.join(F.broadcast(freq), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.array_sort(
                F.collect_list(F.array(F.col("tp"), F.col("rp")))
            ).alias("pairs"),
        )
    )
    scored = per_doc.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_words",
        (
            F.aggregate(
                F.transform(
                    "pairs",
                    lambda x: F.log(x[0].cast("double"))
                    - F.log(x[1].cast("double")),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            + F.col("n_words")
            * (
                F.log((F.col("R") + F.col("V")).cast("double"))
                - F.log((F.col("T") + F.col("V")).cast("double"))
            )
        ).alias("w_raw"),
    )
    from pyspark.sql import Window

    rnk = F.row_number().over(
        Window.orderBy(F.col("w_raw").desc(), "doc_id")
    )
    return (
        scored.withColumn("rnk", rnk)
        .select(
            "doc_id",
            "n_words",
            F.round("w_raw", 6).alias("log_importance"),
            F.when(F.col("rnk") <= 50, 1).otherwise(0).cast("int")
            .alias("selected"),
        )
        .orderBy("doc_id")
    )
