"""Round-6 second wave: statistical-test, sketch, and iterative-ML
aggregates from the ClickHouse surface (reference grammar
generated_ch_parser/ClickHouseParser.py:15571 aggregate-function rules):

  analysisOfVariance  -> anova_ftest          (one-way ANOVA F statistic)
  groupArraySorted(n) -> group_array_sorted   (n smallest values per group)
  uniqTheta           -> kmv_distinct_users   (min-k KMV distinct sketch)
  stochasticLinearRegression -> gd_linear_regression
                                              (fixed-point full-batch GD)

Cross-engine determinism notes (the driver hashes exact values):

- ANOVA accumulates n, Σv, Σv² in DECIMAL(38,6) (order-independent);
  the per-group s²/n terms and the final F are fixed-shape double
  expressions, so both engines evaluate bit-identical IEEE trees.
- The KMV sketch ranks the engine-portable 60-bit md5 hash
  (operators.text.hash64); (k-1)·2^60 is exactly representable in a
  double (6 significant bits + trailing zeros) and both engines convert
  int→double with round-to-nearest, so the estimate is bit-stable.
- Gradient descent runs entirely in integer micro-units with
  DECIMAL(38,0) gradient sums. The update's truncating division is
  spelled SIGN(g) * FLOOR(ABS(g)/d): Spark's double→long cast truncates
  while DuckDB's rounds, so the expression keeps the value integral
  before either engine casts. Like operators/kmeans.py, the point is an
  exactly reproducible ITERATIVE trajectory — the thing float SGD can
  never give you across engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import query, tables

_DEC = "decimal(38,6)"


@query(
    "anova_ftest",
    oracle="""
    WITH g AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(value AS DECIMAL(38,6))) AS s,
               SUM(CAST(value * value AS DECIMAL(38,6))) AS ss
        FROM events GROUP BY event_type
    ),
    terms AS (
        SELECT n, ss,
               CAST(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n
                    AS DECIMAL(38,6)) AS term,
               s
        FROM g
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n) AS BIGINT) AS n_total,
               SUM(s) AS s_all,
               SUM(ss) AS ss_all,
               SUM(term) AS term_all
        FROM terms
    )
    SELECT k, n_total,
           CAST(ROUND(
             ((CAST(term_all AS DOUBLE)
               - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE) / n_total)
              / (k - 1))
             / ((CAST(ss_all AS DOUBLE) - CAST(term_all AS DOUBLE))
                / (n_total - k)), 6) AS DOUBLE) AS f_stat
    FROM tot
    """,
)
def anova_ftest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse analysisOfVariance (one-way ANOVA over events.value
    grouped by event_type): F = (SSB/(k-1)) / (SSW/(N-k)). Two
    aggregations — a map-side-combined group pass (one shuffle on the
    group key) and a k-row roll-up; at 100 TB the fact table is read
    once and everything after the first agg is group-cardinality-sized.
    Decimal accumulators keep the sums order-independent; the F itself
    is a fixed-shape double expression over those exact sums."""
    ev = tables(spark, sf_dir)["events"]
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast(_DEC)).alias("s"),
        F.sum((F.col("value") * F.col("value")).cast(_DEC)).alias("ss"),
    )
    terms = g.select(
        "n",
        "ss",
        "s",
        (F.col("s").cast("double") * F.col("s").cast("double") / F.col("n"))
        .cast(_DEC)
        .alias("term"),
    )
    tot = terms.agg(
        F.count("*").alias("k"),
        F.sum("n").cast("long").alias("n_total"),
        F.sum("s").alias("s_all"),
        F.sum("ss").alias("ss_all"),
        F.sum("term").alias("term_all"),
    )
    ssb = (
        F.col("term_all").cast("double")
        - F.col("s_all").cast("double") * F.col("s_all").cast("double") / F.col("n_total")
    )
    ssw = F.col("ss_all").cast("double") - F.col("term_all").cast("double")
    return tot.select(
        "k",
        "n_total",
        F.round((ssb / (F.col("k") - 1)) / (ssw / (F.col("n_total") - F.col("k"))), 6)
        .cast("double")
        .alias("f_stat"),
    )


@query(
    "group_array_sorted",
    oracle="""
    WITH ranked AS (
        SELECT lang, n_chars,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY n_chars, doc_id) AS rn
        FROM documents
    )
    SELECT lang,
           array_to_string(list(n_chars ORDER BY n_chars, rn), ',')
               AS smallest5
    FROM ranked WHERE rn <= 5
    GROUP BY lang ORDER BY lang
    """,
)
def group_array_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse groupArraySorted(5): the 5 smallest n_chars per lang,
    ascending. Top-n-per-group is computed in two window stages: stage 1
    ranks within (lang, salt-of-64) partitions and keeps ≤5 rows per
    salt, shrinking each language to ≤320 candidate rows, so stage 2's
    per-lang window — the one that would be a hot-partition sort at
    100 TB with only a handful of languages — runs on a
    dimension-sized input. Values-only output (stringified, like
    groupArray), so tie order among equal values cannot affect the
    hash."""
    d = tables(spark, sf_dir)["documents"]
    salted = d.select(
        "lang", "n_chars", "doc_id", F.pmod(F.xxhash64("doc_id"), F.lit(64)).alias("salt")
    )
    w1 = Window.partitionBy("lang", "salt").orderBy("n_chars", "doc_id")
    pruned = salted.withColumn("rn1", F.row_number().over(w1)).filter(F.col("rn1") <= 5)
    w2 = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    top5 = pruned.withColumn("rn", F.row_number().over(w2)).filter(F.col("rn") <= 5)
    return (
        top5.groupBy("lang")
        .agg(F.array_join(F.sort_array(F.collect_list("n_chars")), ",").alias("smallest5"))
        .orderBy("lang")
    )


@query(
    "kmv_distinct_users",
    oracle="""
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS hv
        FROM events
    ),
    ranked AS (
        SELECT event_type, hv,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY hv) AS rn
        FROM h
    ),
    per_type AS (
        SELECT event_type,
               CAST(MAX(rn) AS BIGINT) AS exact_users,
               MAX(CASE WHEN rn = 64 THEN hv END) AS h_k
        FROM ranked WHERE rn <= 64
        GROUP BY event_type
    )
    SELECT event_type,
           CASE WHEN exact_users < 64 THEN exact_users
                ELSE CAST(ROUND(63 * power(2, 60) / h_k) AS BIGINT)
           END AS est_users,
           exact_users
    FROM per_type ORDER BY event_type
    """,
)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse uniqTheta: a KMV (k minimum values, k=64) distinct
    sketch per event_type, with the <k exact fallback the real sketch
    uses. The distinct() is map-side partial dedup — the shuffle carries
    distinct (type, hash) pairs only — and the per-type window ranks a
    ≤|users| input. Unlike HLL (approx_count_distinct, already covered),
    the min-k hash set is mergeable AND supports set-intersection
    estimates; the estimate (k-1)·2^60/h_k is bit-stable because both
    engines convert int→double by round-to-nearest and (k-1)·2^60 has
    only 6 significant bits."""
    ev = tables(spark, sf_dir)["events"]
    hv = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    h = ev.select("event_type", hv.alias("hv")).distinct()
    w = Window.partitionBy("event_type").orderBy("hv")
    ranked = h.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 64)
    per_type = ranked.groupBy("event_type").agg(
        F.max("rn").cast("long").alias("exact_users"),
        F.max(F.when(F.col("rn") == 64, F.col("hv"))).alias("h_k"),
    )
    est = F.when(F.col("exact_users") < 64, F.col("exact_users")).otherwise(
        F.round(F.lit(63) * F.pow(F.lit(2), F.lit(60)) / F.col("h_k")).cast("long")
    )
    return per_type.select(
        "event_type", est.alias("est_users"), "exact_users"
    ).orderBy("event_type")


def _gd_step(fact: DataFrame, state: DataFrame) -> DataFrame:
    """One full-batch gradient-descent step in integer micro-units.

    state is a 1-row (w, b) frame, broadcast into the fact scan; the
    gradient sums are exact DECIMAL(38,0); the lr=1/1024 update uses
    SIGN·FLOOR(ABS/d) so the truncating division is engine-portable
    (see module docstring). Each step is one map-side-combined
    aggregation over the fact table — at 100 TB you cache the two-column
    projection once and each step reads the cached columnar form."""
    r = F.col("w") * F.col("x") + F.col("b") - F.col("y")
    grads = (
        fact.join(F.broadcast(state))
        .agg(
            F.sum((r * F.col("x")).cast("decimal(38,0)")).alias("gw"),
            F.sum(r.cast("decimal(38,0)")).alias("gb"),
            F.count("*").alias("n"),
            F.first("w").alias("w"),
            F.first("b").alias("b"),
        )
    )
    div = 512 * F.col("n")

    def upd(p: str, g: str):
        q = F.signum(F.col(g).cast("double")) * F.floor(
            F.abs(F.col(g)).cast("double") / div
        )
        return (F.col(p) - q).cast("long").alias(p)

    return grads.select(upd("w", "gw"), upd("b", "gb"), "n")


_GD_ORACLE_STEP = """
    {out} AS (
        SELECT CAST({prev}.w - SIGN(CAST(g.gw AS DOUBLE))
                    * FLOOR(ABS(CAST(g.gw AS DOUBLE)) / (512 * g.n))
                    AS BIGINT) AS w,
               CAST({prev}.b - SIGN(CAST(g.gb AS DOUBLE))
                    * FLOOR(ABS(CAST(g.gb AS DOUBLE)) / (512 * g.n))
                    AS BIGINT) AS b,
               g.n AS n
        FROM (SELECT SUM(CAST(({prev}.w * f.x + {prev}.b - f.y) * f.x
                              AS DECIMAL(38,0))) AS gw,
                     SUM(CAST({prev}.w * f.x + {prev}.b - f.y
                              AS DECIMAL(38,0))) AS gb,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM fact f CROSS JOIN {prev}) g CROSS JOIN {prev}
    )"""


@query(
    "gd_linear_regression",
    oracle=(
        """
    WITH fact AS (
        SELECT CAST(l_quantity AS BIGINT) AS x,
               CAST(round(l_extendedprice * 1000000) AS BIGINT) AS y
        FROM lineitem
    ),
    s0 AS (SELECT CAST(0 AS BIGINT) AS w, CAST(0 AS BIGINT) AS b),
    """
        + _GD_ORACLE_STEP.format(out="s1", prev="s0")
        + ","
        + _GD_ORACLE_STEP.format(out="s2", prev="s1")
        + ","
        + _GD_ORACLE_STEP.format(out="s3", prev="s2")
        + """
    SELECT w AS w_micros, b AS b_micros, n AS n_rows FROM s3
    """
    ),
)
def gd_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse stochasticLinearRegression, re-expressed as its
    deterministic distributed twin: three full-batch gradient-descent
    steps (lr=1/1024) fitting l_extendedprice ≈ w·l_quantity + b in
    integer micro-units. Full-batch instead of stochastic because a
    sample order does not exist in a distributed scan — and because the
    fixed-point trajectory is then EXACTLY reproducible (same contract
    as kmeans_clusters). Each step is one aggregation with map-side
    partial sums; the 1-row state broadcasts back into the next scan; no
    step shuffles more than the partial-aggregate rows."""
    li = tables(spark, sf_dir)["lineitem"]
    fact = li.select(
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 1000000).cast("long").alias("y"),
    )
    state = spark.range(1).select(
        F.lit(0).cast("long").alias("w"), F.lit(0).cast("long").alias("b")
    )
    for _ in range(3):
        state = _gd_step(fact, state)
    return state.select(
        F.col("w").alias("w_micros"), F.col("b").alias("b_micros"), F.col("n").alias("n_rows")
    )


@query(
    "cms_heavy_hitters",
    oracle="""
    WITH cells AS (
        SELECT k.k,
               CAST(('0x' || substr(md5(k.k || ':' ||
                         CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
                   % 1024 AS b
        FROM events CROSS JOIN (SELECT unnest(['0','1','2','3']) AS k) k
    ),
    cms AS (SELECT k, b, CAST(COUNT(*) AS BIGINT) AS c
            FROM cells GROUP BY k, b),
    top10 AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt
        FROM events GROUP BY user_id
        ORDER BY exact_cnt DESC, user_id LIMIT 10
    ),
    probes AS (
        SELECT t.user_id, t.exact_cnt, k.k,
               CAST(('0x' || substr(md5(k.k || ':' ||
                         CAST(t.user_id AS VARCHAR)), 1, 15)) AS BIGINT)
                   % 1024 AS b
        FROM top10 t CROSS JOIN (SELECT unnest(['0','1','2','3']) AS k) k
    )
    SELECT p.user_id, p.exact_cnt,
           CAST(MIN(c.c) AS BIGINT) AS est_cnt
    FROM probes p JOIN cms c ON c.k = p.k AND c.b = p.b
    GROUP BY p.user_id, p.exact_cnt
    ORDER BY p.exact_cnt DESC, p.user_id
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (depth 4 x width 1024) over events.user_id, read
    back for the exact top-10 heavy hitters — the mergeable counting
    sketch behind approximate topK at scale (the registry's topk_frequent
    is the exact twin). Each event increments 4 cells keyed by the
    engine-portable 60-bit hash with a per-row seed prefix, so the whole
    sketch — and therefore every estimate, collisions included — is
    bit-identical in the DuckDB replay; est >= exact always (one-sided
    CMS error). The sketch build is one 4x-fanout map + a 4096-cell
    aggregate (map-side combined, mergeable across partitions exactly
    like the production sketch merges across executors); probes are
    dimension-sized."""
    ev = tables(spark, sf_dir)["events"]
    w = 1024

    def bucket(user, k: int):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{k}:"), user.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        return F.pmod(h, F.lit(w))

    cells = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(str(k)).alias("k"),
                        bucket(F.col("user_id"), k).alias("b"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("cell")
    ).select("cell.k", "cell.b")
    cms = cells.groupBy("k", "b").agg(F.count(F.lit(1)).cast("long").alias("c"))
    top10 = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "user_id")
        .limit(10)
    )
    probes = top10.select(
        "user_id",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(str(k)).alias("k"),
                        bucket(F.col("user_id"), k).alias("b"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("cell"),
    ).select("user_id", "exact_cnt", "cell.k", "cell.b")
    return (
        probes.join(F.broadcast(cms), ["k", "b"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("c").cast("long").alias("est_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "user_id")
    )


@query(
    "kmv_user_overlap",
    oracle="""
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS hv
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    sk AS (
        SELECT event_type, hv
        FROM (SELECT event_type, hv,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY hv) AS rn
              FROM h)
        WHERE rn <= 64
    ),
    merged AS (
        SELECT hv, CAST(COUNT(*) AS BIGINT) AS sides
        FROM sk GROUP BY hv
        ORDER BY hv LIMIT 64
    ),
    est AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS k_both,
               MAX(hv) AS h_k
        FROM merged
    ),
    exact AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersection
        FROM (SELECT hv FROM h GROUP BY hv HAVING COUNT(*) = 2)
    )
    SELECT k_both,
           CAST(ROUND(CAST(k_both AS DOUBLE) / k, 6) AS DOUBLE)
               AS est_jaccard,
           CAST(ROUND((CAST(k_both AS DOUBLE) / k)
                      * ROUND((k - 1) * power(2, 60) / h_k), 0) AS BIGINT)
               AS est_intersection,
           exact_intersection
    FROM est CROSS JOIN exact
    """,
)
def kmv_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET OPERATIONS — the capability HLL lacks and the
    reason uniqTheta exists: estimate |click-users ∩ purchase-users| by
    merging the two per-type min-64 sketches (union sketch = 64 smallest
    of the merged hash sets; Jaccard ≈ share of union-sketch hashes
    present in both sides; intersection ≈ Jaccard × union estimate),
    with the exact intersection alongside. Every step is integer rank
    arithmetic on the portable 60-bit hash plus one fixed-shape double
    expression, so the DuckDB replay is bit-identical. Plan: one distinct
    (map-side-deduped) pass over the filtered fact, two ≤64-row windows,
    dimension-sized everything after."""
    ev = tables(spark, sf_dir)["events"]
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    h = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", hv.alias("hv"))
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("hv")
    sk = h.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 64)
    merged = (
        sk.groupBy("hv")
        .agg(F.count(F.lit(1)).cast("long").alias("sides"))
        .orderBy("hv")
        .limit(64)
    )
    est = merged.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.when(F.col("sides") == 2, 1).otherwise(0))
        .cast("long")
        .alias("k_both"),
        F.max("hv").alias("h_k"),
    )
    exact = (
        h.groupBy("hv")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") == 2)
        .agg(F.count(F.lit(1)).cast("long").alias("exact_intersection"))
    )
    jac = F.col("k_both").cast("double") / F.col("k")
    union_est = F.round(
        (F.col("k") - 1) * F.pow(F.lit(2), F.lit(60)) / F.col("h_k")
    )
    return est.join(F.broadcast(exact)).select(
        "k_both",
        F.round(jac, 6).cast("double").alias("est_jaccard"),
        F.round(jac * union_est, 0).cast("long").alias("est_intersection"),
        "exact_intersection",
    )
