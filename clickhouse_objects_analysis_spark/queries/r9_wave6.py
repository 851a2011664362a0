"""Round-9 query wave 6: temporal load heatmap, Simpson diversity, and
exact 1-D Wasserstein distribution drift.

Reference parity note: none in the reference repo; the heatmap is the
canonical ops rollup, Simpson diversity and the Wasserstein drift are
corpus-mix diagnostics (how concentrated is each source's vocabulary,
and how far each source's length distribution sits from the corpus).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import q6, query, tables

# ---------------------------------------------------------------------------
# dow_hour_heatmap
# ---------------------------------------------------------------------------


@query(
    "dow_hour_heatmap",
    oracle="""
    WITH c AS (
        SELECT CAST(isodow(ts) - 1 AS INT) AS dow,
               CAST(hour(ts) AS INT) AS hr,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY 1, 2
    ),
    t AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total FROM c)
    SELECT dow, hr, n_events, n_users,
           FLOOR(CAST(n_events AS DOUBLE) / t.total * 1000000 + 0.5)
               / 1000000 AS share
    FROM c CROSS JOIN t
    ORDER BY dow, hr
    """,
)
def dow_hour_heatmap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour event heatmap (0 = Monday, UTC) with distinct
    users per cell — the capacity-planning rollup every ops dashboard
    opens with. Share is one division of exact integers.

    Scale shape: one (dow, hr) hash agg — 168 output cells at any
    corpus size; COUNT(DISTINCT user) is the only expensive aggregate
    and is exact-by-shuffle on the 168-key space."""
    ev = tables(spark, sf_dir)["events"]
    c = ev.groupBy(
        F.weekday("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hr"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
    )
    t = c.agg(F.sum("n_events").cast("long").alias("total"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "dow",
            "hr",
            "n_events",
            "n_users",
            q6(F.col("n_events").cast("double") / F.col("total")).alias(
                "share"
            ),
        )
        .orderBy("dow", "hr")
    )


# ---------------------------------------------------------------------------
# simpson_diversity_sources
# ---------------------------------------------------------------------------


@query(
    "simpson_diversity_sources",
    oracle="""
    WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS w
               FROM documents),
    cnt AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
            FROM w GROUP BY source, w),
    agg AS (SELECT source,
                   CAST(SUM(c) AS BIGINT) AS total,
                   CAST(SUM(c * c) AS BIGINT) AS sum_sq,
                   CAST(COUNT(*) AS BIGINT) AS vocab
            FROM cnt GROUP BY source)
    SELECT source, total, vocab,
           FLOOR((1 - CAST(sum_sq AS DOUBLE) / (CAST(total AS DOUBLE)
                  * total)) * 1000000 + 0.5) / 1000000 AS simpson,
           FLOOR((CAST(total AS DOUBLE) * total / sum_sq)
                 * 1000000 + 0.5) / 1000000 AS effective_vocab
    FROM agg ORDER BY source
    """,
)
def simpson_diversity_sources_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Simpson diversity index per source, 1 − Σ p_w² — the probability
    two random tokens differ — plus its inverse (the 'effective
    vocabulary size'): the concentration diagnostic that separates a
    source writing about everything from one hammering ten words. The
    naive Σ p² is an order-dependent double sum; rewritten as
    1 − Σc² / total², both Σc² and total are EXACT integers, so the
    score is one fixed IEEE expression per source.

    Scale shape: explode + (source, word) hash agg with map-side
    combine, then a source-sized rollup — no joins, no windows."""
    d = tables(spark, sf_dir)["documents"]
    w = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    cnt = w.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    agg = cnt.groupBy("source").agg(
        F.sum("c").cast("long").alias("total"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_sq"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    tot_d = F.col("total").cast("double")
    return agg.select(
        "source",
        "total",
        "vocab",
        q6(1 - F.col("sum_sq").cast("double") / (tot_d * F.col("total"))).alias(
            "simpson"
        ),
        q6(tot_d * F.col("total") / F.col("sum_sq")).alias(
            "effective_vocab"
        ),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# wasserstein_length_drift
# ---------------------------------------------------------------------------


@query(
    "wasserstein_length_drift",
    oracle="""
    WITH g AS (SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS cg
               FROM documents GROUP BY n_chars),
    gt AS (SELECT CAST(SUM(cg) AS BIGINT) AS ng FROM g),
    st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ns
           FROM documents GROUP BY source),
    sc AS (SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS cs
           FROM documents GROUP BY source, n_chars),
    m AS (  -- per source: the merged value grid with BOTH counts
        SELECT st.source, g.v,
               COALESCE(sc.cs, 0) AS cs, g.cg, st.ns, gt.ng
        FROM st CROSS JOIN g
        LEFT JOIN sc ON sc.source = st.source AND sc.v = g.v
        CROSS JOIN gt
    ),
    cum AS (
        SELECT source, v, ns, ng,
               SUM(cs) OVER (PARTITION BY source ORDER BY v) AS cum_s,
               SUM(cg) OVER (PARTITION BY source ORDER BY v) AS cum_g,
               LEAD(v) OVER (PARTITION BY source ORDER BY v) AS nxt
        FROM m
    ),
    terms AS (
        SELECT source,
               list_transform(
                   list_sort(list(struct_pack(
                       v := v,
                       t := abs(CAST(cum_s AS DOUBLE) / ns
                                - CAST(cum_g AS DOUBLE) / ng)
                            * (nxt - v)))),
                   x -> x.t) AS ts
        FROM cum WHERE nxt IS NOT NULL GROUP BY source
    )
    SELECT source,
           FLOOR(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ts),
                             (a, b) -> a + b) * 1000000 + 0.5) / 1000000
               AS w1_chars
    FROM terms ORDER BY source
    """,
)
def wasserstein_length_drift_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact 1-D Wasserstein (earth-mover) distance between each
    source's document-length distribution and the corpus-wide one:
    W₁ = ∫|CDF_s − CDF_corpus| dv, computed segment-exactly over the
    merged distinct-value grid (each segment contributes
    |cdf_s − cdf_g|·gap). Complements js_divergence_sources — W₁ sees
    HOW FAR mass moved, not just that it differs. Per-segment terms are
    doubles, so the per-source sum folds over the value-sorted term
    list identically on both engines.

    Scale shape: two histogram aggs, one broadcast of the corpus grid
    (distinct lengths — bounded), a per-source cumulative window over
    that bounded grid, and a per-source fold. Nothing scales beyond the
    distinct-value count."""
    d = tables(spark, sf_dir)["documents"]
    g = d.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cg")
    )
    gt = g.agg(F.sum("cg").cast("long").alias("ng"))
    st = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("ns"))
    sc = d.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cs")
    )
    m = (
        st.crossJoin(F.broadcast(g))
        .join(sc, ["source", "v"], "left")
        .crossJoin(F.broadcast(gt))
        .select(
            "source",
            "v",
            F.coalesce(F.col("cs"), F.lit(0)).alias("cs"),
            "cg",
            "ns",
            "ng",
        )
    )
    w = Window.partitionBy("source").orderBy("v")
    cum = m.select(
        "source",
        "v",
        "ns",
        "ng",
        F.sum("cs").over(w).alias("cum_s"),
        F.sum("cg").over(w).alias("cum_g"),
        F.lead("v").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    term = F.abs(
        F.col("cum_s").cast("double") / F.col("ns")
        - F.col("cum_g").cast("double") / F.col("ng")
    ) * (F.col("nxt") - F.col("v"))
    terms = cum.groupBy("source").agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col("v"), term.alias("t")))
            ),
            lambda x: x.getField("t"),
        ).alias("ts")
    )
    fold = F.aggregate(F.col("ts"), F.lit(0.0), lambda a, b: a + b)
    return terms.select("source", q6(fold).alias("w1_chars")).orderBy(
        "source"
    )
