"""Round-8 query wave 2: graph k-core decomposition, the grid-bucketed
spatial self-join, weekly cohort retention, Wilson-interval CTR
ranking, Jensen–Shannon corpus divergence, token coverage curves, and
deterministic stratified k-fold assignment.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has none of these; they extend the LLM-data-pipeline and
analytics charter (SURVEY §7 north star) with the standard curation /
experimentation primitives a 100 TB corpus pipeline runs daily.

Float-parity discipline (driver hashes exact values): every aggregate
carries exact integers through the shuffle; doubles appear only in
fixed-shape expression trees evaluated identically by Spark and DuckDB,
and any SUM over data-dependent double terms goes through the
sorted-array left-fold idiom (r7_wave6._ln_fold) so addition order is
pinned on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.ch import ch_expr
from ..operators.dedup import ngram_jaccard_pairs
from ..operators.graph import k_core
from ..operators.spatial import grid_neighbor_pairs
from .llm import _SCORED_CTE, _SHINGLE_CTE
from .registry import q6, query, tables

_Z95 = 1.9599639845400545


def _kcore_peel_cte(k: int, iters: int, tag: str) -> str:
    """Unrolled peeling chain: alive edges after round i. The oracle
    unrolls a FIXED number of rounds (16 ≥ the peeling depth of every
    testdata graph — asserted by the convergence test); once the peel
    reaches fixpoint further rounds are identity, so Spark's
    run-to-convergence loop and this fixed unroll agree exactly."""
    # AS MATERIALIZED is load-bearing: each e_{{i+1}} references e_i
    # three times, so letting the optimizer inline the chain would
    # re-evaluate the base scan 3^iters times (observed as an fd
    # exhaustion on the parquet file before the hint was added).
    parts = [f"e0_{tag} AS MATERIALIZED (SELECT u, v FROM pairs_{tag})"]
    for i in range(iters):
        parts.append(
            f"d{i}_{tag} AS MATERIALIZED (SELECT n, COUNT(*) AS d FROM "
            f"(SELECT u AS n FROM e{i}_{tag} "
            f"UNION ALL SELECT v FROM e{i}_{tag}) GROUP BY n)"
        )
        parts.append(
            f"a{i}_{tag} AS MATERIALIZED "
            f"(SELECT n FROM d{i}_{tag} WHERE d >= {k})"
        )
        parts.append(
            f"e{i + 1}_{tag} AS MATERIALIZED (SELECT u, v FROM e{i}_{tag} "
            f"WHERE u IN (SELECT n FROM a{i}_{tag}) "
            f"AND v IN (SELECT n FROM a{i}_{tag}))"
        )
    return ",\n    ".join(parts)


_KCORE_ITERS = 16


@query(
    "k_core_decomposition",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    {_SCORED_CTE},
    p0 AS (
      SELECT id_a AS u, id_b AS v FROM scored
      WHERE inter / (la + lb - inter) >= 0.5
    ),
    pairs_k2 AS (SELECT * FROM p0),
    pairs_k3 AS (SELECT * FROM p0),
    {_kcore_peel_cte(2, _KCORE_ITERS, "k2")},
    {_kcore_peel_cte(3, _KCORE_ITERS, "k3")},
    nodes_k2 AS (SELECT DISTINCT n FROM (
        SELECT u AS n FROM e{_KCORE_ITERS}_k2
        UNION ALL SELECT v FROM e{_KCORE_ITERS}_k2)),
    nodes_k3 AS (SELECT DISTINCT n FROM (
        SELECT u AS n FROM e{_KCORE_ITERS}_k3
        UNION ALL SELECT v FROM e{_KCORE_ITERS}_k3))
    SELECT 2 AS k,
           CAST((SELECT COUNT(*) FROM nodes_k2) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e{_KCORE_ITERS}_k2) AS BIGINT)
               AS n_edges,
           CAST(COALESCE((SELECT SUM(n) FROM nodes_k2), 0) AS BIGINT)
               AS sum_node_ids
    UNION ALL
    SELECT 3,
           CAST((SELECT COUNT(*) FROM nodes_k3) AS BIGINT),
           CAST((SELECT COUNT(*) FROM e{_KCORE_ITERS}_k3) AS BIGINT),
           CAST(COALESCE((SELECT SUM(n) FROM nodes_k3), 0) AS BIGINT)
    ORDER BY k
    """,
)
def k_core_decomposition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition of the near-duplicate similarity graph
    (edge = word-trigram Jaccard ≥ 0.5) for k ∈ {{2, 3}} — the density
    audit one step past connected components: a big 2-core that
    collapses at k=3 is threshold-chaining (weak links stringing unlike
    documents together), while surviving 3-cores are genuinely dense
    duplicate families safe to collapse to one survivor.

    Spark side is operators/graph.k_core — iterative peeling, each
    round one degree aggregation plus two semi-joins, run to fixpoint
    with per-round localCheckpoints (the connected-components loop
    discipline). The oracle unrolls 16 peel rounds in plain CTEs, so
    the engines agree only if Spark's fixpoint equals the bounded
    unroll (the convergence test asserts depth < 16 with margin)."""
    d = tables(spark, sf_dir)["documents"]
    edges = ngram_jaccard_pairs(d, "doc_id", "text", k=3, threshold=0.5)
    edges = edges.localCheckpoint(eager=False)  # feeds both k runs
    out = None
    for k in (2, 3):
        nodes = k_core(edges, "id_a", "id_b", k)
        agg = nodes.agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            (F.coalesce(F.sum("deg"), F.lit(0)) / 2)
            .cast("long")
            .alias("n_edges"),
            F.coalesce(F.sum("n"), F.lit(0))
            .cast("long")
            .alias("sum_node_ids"),
        ).select(F.lit(k).alias("k"), "*")
        out = agg if out is None else out.unionAll(agg)
    return out.orderBy("k")


_TWO64 = "18446744073709551616"
# intHash64 over HUGEINT (same salt + split-multiply chain as
# r8_wave._H64_CTE), parameterized on the source CTE; scatters the
# order key to 2-D.
_FMIX_PTS_CTE = f"""
    h0 AS (SELECT pid,
           xor(pid::HUGEINT, 5544725790478674055::HUGEINT) AS x FROM o),
    h1 AS (SELECT pid, xor(x, x >> 33) AS x FROM h0),
    h2 AS (SELECT pid,
           ((x * 3981806797::HUGEINT) % {_TWO64}::HUGEINT
            + ((x * 4283543511::HUGEINT) % 4294967296::HUGEINT)
              * 4294967296::HUGEINT) % {_TWO64}::HUGEINT AS x FROM h1),
    h3 AS (SELECT pid, xor(x, x >> 33) AS x FROM h2),
    h4 AS (SELECT pid,
           ((x * 444984403::HUGEINT) % {_TWO64}::HUGEINT
            + ((x * 3301882366::HUGEINT) % 4294967296::HUGEINT)
              * 4294967296::HUGEINT) % {_TWO64}::HUGEINT AS x FROM h3),
    h5 AS (SELECT pid, xor(x, x >> 33) AS x FROM h4),
    pl AS (SELECT CAST(floor(sqrt(COUNT(*))) AS BIGINT) * 1600
               AS plane FROM o),
    p AS (SELECT pid,
                 CAST((x >> 1) % (SELECT plane FROM pl) AS BIGINT) AS x,
                 CAST((x >> 44) % (SELECT plane FROM pl) AS BIGINT) AS y
          FROM h5)
"""


@query(
    "grid_spatial_join",
    oracle=f"""
    WITH o AS (
        SELECT o_orderkey AS pid FROM orders WHERE o_orderkey % 4 = 0
    ),
    {_FMIX_PTS_CTE},
    pr AS (
        SELECT a.pid AS id_a, b.pid AS id_b,
               (a.x - b.x) * (a.x - b.x)
               + (a.y - b.y) * (a.y - b.y) AS dist2
        FROM p a JOIN p b
          ON a.pid < b.pid
         AND abs(a.x - b.x) <= 400 AND abs(a.y - b.y) <= 400
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_points
            FROM pr)
    SELECT id_a, id_b, CAST(dist2 AS BIGINT) AS dist2,
           tot.n_pairs, tot.n_points
    FROM pr CROSS JOIN tot
    ORDER BY dist2, id_a, id_b LIMIT 50
    """,
)
def grid_spatial_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-grid spatial self-join (operators/spatial.py): all order
    pairs whose derived 2-D points fall within L∞ radius 400, top-50
    closest by squared Euclidean distance. Points scatter through the
    bit-exact intHash64 (fmix64) — a plain multiplicative scatter
    lattices sequential keys into parallel lines with ZERO close pairs,
    which is exactly the structured-input trap a spatial join demo must
    avoid. The plane side scales as floor(sqrt(n))·1600 (≈100k at the
    sf0.01 point count), so point DENSITY — and with it pairs-per-point
    and the grid join's candidate volume — is constant at every SF: the
    first fixed-100k version was quadratic by construction and OOMed
    the sf10 sweep materializing ~10⁸ pairs. Spark replicates each
    point to its 3×3 cell neighborhood (constant map-side fan-out) and
    hash-joins on cell id; the oracle brute-forces the O(n²) theta
    join, so parity proves the grid join finds EXACTLY the pair set
    (no boundary misses, no double counts)."""
    o = tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") % 4 == 0)
    h = ch_expr("intHash64", F.col("o_orderkey"))
    raw = o.select(F.col("o_orderkey").alias("pid"), h.alias("hx"))
    plane = raw.agg(
        (F.floor(F.sqrt(F.count(F.lit(1)))).cast("long") * 1600).alias(
            "plane"
        )
    )
    pts = raw.crossJoin(F.broadcast(plane)).select(
        "pid",
        F.pmod(F.shiftrightunsigned("hx", 1), F.col("plane")).alias("x"),
        F.pmod(F.shiftrightunsigned("hx", 44), F.col("plane")).alias("y"),
    )
    pairs = grid_neighbor_pairs(pts, "pid", "x", "y", 400).select(
        "id_a",
        "id_b",
        (F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy"))
        .cast("long")
        .alias("dist2"),
    )
    pairs = pairs.localCheckpoint(eager=False)  # counted AND ranked
    tot = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    ).crossJoin(pts.agg(F.count(F.lit(1)).cast("long").alias("n_points")))
    return (
        pairs.crossJoin(F.broadcast(tot))
        .orderBy("dist2", "id_a", "id_b")
        .limit(50)
    )


@query(
    "cohort_retention_matrix",
    oracle="""
    WITH fw AS (
        SELECT user_id,
               date_trunc('week', MIN(ts))::DATE AS cohort_week
        FROM events GROUP BY user_id
    ),
    aw AS (
        SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS wk
        FROM events
    ),
    sizes AS (
        SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM fw GROUP BY cohort_week
    ),
    mat AS (
        SELECT fw.cohort_week,
               CAST((aw.wk - fw.cohort_week) / 7 AS BIGINT) AS week_offset,
               CAST(COUNT(DISTINCT aw.user_id) AS BIGINT) AS n_active
        FROM aw JOIN fw USING (user_id)
        GROUP BY 1, 2
    )
    SELECT strftime(mat.cohort_week, '%Y-%m-%d') AS cohort_week,
           week_offset, n_active, s.cohort_size,
           FLOOR(CAST(n_active AS DOUBLE) / s.cohort_size
                 * 1000000 + 0.5) / 1000000 AS retention
    FROM mat JOIN sizes s USING (cohort_week)
    ORDER BY cohort_week, week_offset
    """,
)
def cohort_retention_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix — the canonical growth-analytics
    rollup: users cohorted by first-seen ISO week, each later active
    week counted as (cohort, offset) with retention = active / cohort
    size. Scale shape: one groupBy(user) for first-seen, one distinct
    over (user, week) — both hash shuffles on user_id that AQE
    co-plans — then the matrix aggregation on (cohort, offset), whose
    cardinality is weeks², tiny at any corpus size. The cohort-size
    table is weeks-sized → broadcast. Retention is one double division
    of two exact BIGINTs, rounded to 6."""
    ev = tables(spark, sf_dir)["events"]
    fw = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    aw = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).distinct()
    sizes = fw.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    mat = (
        aw.join(fw, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )
    return (
        mat.join(F.broadcast(sizes), "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            q6(
                F.col("n_active").cast("double") / F.col("cohort_size")
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "ctr_wilson_ranking",
    oracle=f"""
    WITH agg AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN value > 20 THEN 1 ELSE 0 END)
                    AS BIGINT) AS s
        FROM events GROUP BY event_type
    ),
    sc AS (
        SELECT event_type, n, s,
               CAST(s AS DOUBLE) / n AS p
        FROM agg
    )
    SELECT event_type, n, s,
           FLOOR(p * 1000000 + 0.5) / 1000000 AS rate,
           FLOOR((p + {_Z95} * {_Z95} / (2 * n)
                  - {_Z95} * SQRT(p * (1 - p) / n
                                  + {_Z95} * {_Z95} / (4.0 * n * n)))
                 / (1 + {_Z95} * {_Z95} / n) * 1000000 + 0.5) / 1000000
               AS wilson_low
    FROM sc ORDER BY wilson_low DESC, event_type
    """,
)
def ctr_wilson_ranking_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson-score lower-bound ranking of per-event-type success rates
    (value > 20 as the "conversion") — the defensible way to rank
    segments with unequal sample sizes (a raw rate ranks a 3/4 segment
    above a 700/1000 one; the Wilson lower bound does not). One
    map-side-combined aggregation carrying two exact BIGINTs per group;
    the Wilson tree is one fixed double expression over (s, n) with the
    z constant inlined, identical on both engines."""
    ev = tables(spark, sf_dir)["events"]
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("value") > 20, 1).otherwise(0))
        .cast("long")
        .alias("s"),
    )
    p = F.col("s").cast("double") / F.col("n")
    z2 = _Z95 * _Z95
    wilson = (
        p
        + F.lit(z2) / (2 * F.col("n"))
        - F.lit(_Z95)
        * F.sqrt(
            p * (1 - p) / F.col("n")
            + F.lit(z2) / (4.0 * F.col("n") * F.col("n"))
        )
    ) / (1 + F.lit(z2) / F.col("n"))
    return agg.select(
        "event_type",
        "n",
        "s",
        q6(p).alias("rate"),
        q6(wilson).alias("wilson_low"),
    ).orderBy(F.desc("wilson_low"), "event_type")


_JSD_TERM_SQL = """
    0.5 * (CASE WHEN ca > 0 THEN (CAST(ca AS DOUBLE) / ta)
                * ln((CAST(ca AS DOUBLE) / ta)
                     / ((CAST(ca AS DOUBLE) / ta
                         + CAST(cb AS DOUBLE) / tb) / 2))
           ELSE 0.0 END
         + CASE WHEN cb > 0 THEN (CAST(cb AS DOUBLE) / tb)
                * ln((CAST(cb AS DOUBLE) / tb)
                     / ((CAST(ca AS DOUBLE) / ta
                         + CAST(cb AS DOUBLE) / tb) / 2))
           ELSE 0.0 END)
"""


@query(
    "js_divergence_sources",
    oracle=f"""
    WITH tk AS (
        SELECT source IN ('src0', 'src1') AS grp_a,
               unnest(string_split(text, ' ')) AS w
        FROM documents
    ),
    cnt AS (
        SELECT w,
               CAST(SUM(CASE WHEN grp_a THEN 1 ELSE 0 END) AS BIGINT)
                   AS ca,
               CAST(SUM(CASE WHEN grp_a THEN 0 ELSE 1 END) AS BIGINT)
                   AS cb
        FROM tk GROUP BY w
    ),
    top AS (
        SELECT w, ca, cb FROM cnt
        ORDER BY ca + cb DESC, w LIMIT 1000
    ),
    tot AS (
        SELECT CAST(SUM(ca) AS BIGINT) AS ta,
               CAST(SUM(cb) AS BIGINT) AS tb
        FROM cnt
    ),
    withother AS (
        SELECT ca, cb FROM top
        UNION ALL
        SELECT (SELECT ta FROM tot)
               - (SELECT CAST(SUM(ca) AS BIGINT) FROM top),
               (SELECT tb FROM tot)
               - (SELECT CAST(SUM(cb) AS BIGINT) FROM top)
    ),
    terms AS (
        SELECT list_sort(list({_JSD_TERM_SQL})) AS ts,
               CAST(COUNT(*) AS BIGINT) AS n_buckets
        FROM withother CROSS JOIN tot
    )
    SELECT (SELECT ta FROM tot) AS tokens_a,
           (SELECT tb FROM tot) AS tokens_b,
           n_buckets,
           FLOOR(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ts),
                             (a, b) -> a + b) * 1000000 + 0.5) / 1000000
               AS jsd_nats
    FROM terms
    """,
)
def js_divergence_sources_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between the token distributions of two
    corpus halves (sources src0/src1 vs the rest) — the standard
    domain-shift / mixture-drift gauge an LLM data pipeline tracks when
    re-weighting sources. Vocabulary is capped at the top-1000 tokens
    by global count (ties lexical) with all remaining mass folded into
    one OTHER bucket — bounded state at any corpus size, and the cap is
    part of the metric's definition, not a silent truncation.

    Scale shape: one token-count aggregation (map-side combined), a
    top-k TakeOrdered (never a global sort), and a 1001-row tail
    computation. Float parity: each bucket's JSD term is a fixed double
    tree over four exact integers; the final sum left-folds the
    numerically sorted term list on both engines (_ln_fold
    discipline)."""
    d = tables(spark, sf_dir)["documents"]
    tk = d.select(
        F.col("source").isin("src0", "src1").alias("grp_a"),
        F.explode(F.split("text", " ")).alias("w"),
    )
    cnt = tk.groupBy("w").agg(
        F.sum(F.when(F.col("grp_a"), 1).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(F.col("grp_a"), 0).otherwise(1)).cast("long").alias("cb"),
    )
    cnt = cnt.localCheckpoint(eager=False)  # feeds top, tot
    top = cnt.orderBy(
        F.desc(F.col("ca") + F.col("cb")), F.asc("w")
    ).limit(1000)
    tot = cnt.agg(
        F.sum("ca").cast("long").alias("ta"),
        F.sum("cb").cast("long").alias("tb"),
    )
    topsum = top.agg(
        F.sum("ca").cast("long").alias("tca"),
        F.sum("cb").cast("long").alias("tcb"),
    )
    other = (
        tot.crossJoin(topsum)
        .select(
            (F.col("ta") - F.col("tca")).alias("ca"),
            (F.col("tb") - F.col("tcb")).alias("cb"),
        )
    )
    withother = top.select("ca", "cb").unionAll(other)
    pa = F.col("ca").cast("double") / F.col("ta")
    pb = F.col("cb").cast("double") / F.col("tb")
    m = (pa + pb) / 2
    term = F.lit(0.5) * (
        F.when(F.col("ca") > 0, pa * F.log(pa / m)).otherwise(0.0)
        + F.when(F.col("cb") > 0, pb * F.log(pb / m)).otherwise(0.0)
    )
    terms = (
        withother.crossJoin(F.broadcast(tot))
        .select(term.alias("t"))
        .agg(
            F.sort_array(F.collect_list("t")).alias("ts"),
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
        )
    )
    fold = F.aggregate(
        F.col("ts"), F.lit(0.0), lambda a, x: a + x
    )
    return (
        terms.crossJoin(F.broadcast(tot))
        .select(
            F.col("ta").alias("tokens_a"),
            F.col("tb").alias("tokens_b"),
            "n_buckets",
            q6(fold).alias("jsd_nats"),
        )
    )


@query(
    "token_coverage_curve",
    oracle="""
    WITH tk AS (SELECT unnest(string_split(text, ' ')) AS w
                FROM documents),
    cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tk GROUP BY w),
    top AS (SELECT w, c,
                   ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rn
            FROM (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 1000)),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS vocab
            FROM cnt)
    SELECT k,
           CAST((SELECT SUM(c) FROM top WHERE rn <= k) AS BIGINT)
               AS covered_tokens,
           tot.total AS total_tokens,
           tot.vocab AS vocab_size,
           FLOOR(CAST((SELECT SUM(c) FROM top WHERE rn <= k) AS DOUBLE)
                 / tot.total * 1000000 + 0.5) / 1000000 AS coverage
    FROM (SELECT unnest([10, 100, 1000]) AS k) CROSS JOIN tot
    ORDER BY k
    """,
)
def token_coverage_curve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — what fraction of the corpus token
    mass the top-K token types cover, K ∈ {{10, 100, 1000}} — the
    tokenizer-design companion to the registry's Heaps/Zipf fits (a
    vocab whose top-1000 covers 95% tokenizes very differently from one
    covering 60%). Scale shape: one token-count aggregation, then a
    top-1000 TakeOrdered (bounded, never a global sort); the window
    rank runs on 1000 rows. Coverage is one double division of exact
    BIGINTs."""
    d = tables(spark, sf_dir)["documents"]
    cnt = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)  # feeds top AND totals
    )
    top = cnt.orderBy(F.desc("c"), F.asc("w")).limit(1000)
    from pyspark.sql import Window

    ranked = top.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("c"), F.asc("w")))
    )
    tot = cnt.agg(
        F.sum("c").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    ks = F.explode(F.array(F.lit(10), F.lit(100), F.lit(1000))).alias("k")
    kdf = tot.select(ks, "total", "vocab")
    cum = (
        kdf.join(ranked, ranked["rn"] <= kdf["k"])
        .groupBy("k", "total", "vocab")
        .agg(F.sum("c").cast("long").alias("covered_tokens"))
    )
    return cum.select(
        "k",
        "covered_tokens",
        F.col("total").alias("total_tokens"),
        F.col("vocab").alias("vocab_size"),
        q6(
            F.col("covered_tokens").cast("double") / F.col("total")
        ).alias("coverage"),
    ).orderBy("k")


@query(
    "stratified_kfold_assignment",
    oracle="""
    WITH f AS (
        SELECT source,
               ((doc_id * 2654435761) % 1000000007) % 5 AS fold,
               n_chars
        FROM documents
    ),
    per AS (
        SELECT source, fold,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS chars
        FROM f GROUP BY source, fold
    ),
    piv AS (
        SELECT source,
               CAST(SUM(n) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN fold = 0 THEN n END) AS BIGINT) AS f0,
               CAST(SUM(CASE WHEN fold = 1 THEN n END) AS BIGINT) AS f1,
               CAST(SUM(CASE WHEN fold = 2 THEN n END) AS BIGINT) AS f2,
               CAST(SUM(CASE WHEN fold = 3 THEN n END) AS BIGINT) AS f3,
               CAST(SUM(CASE WHEN fold = 4 THEN n END) AS BIGINT) AS f4,
               CAST(SUM(n * n) AS BIGINT) AS nsq_by_fold
        FROM per GROUP BY source
    )
    SELECT source, n_docs, f0, f1, f2, f3, f4,
           FLOOR((5.0 * nsq_by_fold / n_docs - n_docs)
                 * 1000000 + 0.5) / 1000000 AS chi2,
           (5.0 * nsq_by_fold / n_docs - n_docs) < 9.487729036781154
               AS balanced
    FROM piv ORDER BY source
    """,
)
def stratified_kfold_assignment_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic 5-fold assignment by multiplicative hash of the
    document id, audited per source stratum: fold sizes, the χ²
    uniformity statistic, and a pass bit at the 95% critical value
    (df=4). The χ² sum collapses algebraically to 5·Σn_f²/n − n, so the
    shuffle carries only exact integers (Σn_f² per stratum) and the
    statistic is one fixed double tree — no order-dependent float
    accumulation. At 100 TB this is the standard leakage-free
    train/eval splitter: assignment is a pure hash (no global state),
    and the audit is one aggregation."""
    d = tables(spark, sf_dir)["documents"]
    f = d.select(
        "source",
        (((F.col("doc_id") * 2654435761) % 1000000007) % 5).alias("fold"),
        "n_chars",
    )
    per = f.groupBy("source", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
    piv = per.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        *[
            F.sum(F.when(F.col("fold") == i, F.col("n")))
            .cast("long")
            .alias(f"f{i}")
            for i in range(5)
        ],
        F.sum(F.col("n") * F.col("n")).cast("long").alias("nsq_by_fold"),
    )
    chi2 = (
        F.lit(5.0) * F.col("nsq_by_fold") / F.col("n_docs")
        - F.col("n_docs")
    )
    return piv.select(
        "source",
        "n_docs",
        "f0",
        "f1",
        "f2",
        "f3",
        "f4",
        q6(chi2).alias("chi2"),
        (chi2 < 9.487729036781154).alias("balanced"),
    ).orderBy("source")
