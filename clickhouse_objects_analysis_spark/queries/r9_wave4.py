"""Round-9 query wave 4: heterogeneous-treatment-effect analytics —
quantile treatment effects, Bayesian Beta-posterior A/B summary, the
per-segment uplift table — plus a corpus character-class composition
profile.

Reference parity note: none exist in the reference repo; they round out
the experimentation family (r8 added CUPED/DiD/SPRT/SRM; this adds the
distributional and per-segment readouts) and the curation audit set.

Float discipline: quantile picks are EXACT rank selections over
dist_cumsum (no interpolation, no single-task sort); every reported
score is a fixed expression over exact integers or selected doubles,
floor-quantized via registry.q6.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.dist_rank import dist_cumsum
from .registry import q6, query, tables

# ---------------------------------------------------------------------------
# quantile_treatment_effect
# ---------------------------------------------------------------------------


@query(
    "quantile_treatment_effect",
    oracle="""
    WITH v AS (
        SELECT CAST(user_id % 2 AS INT) AS variant, value
        FROM events
    ),
    r AS (
        SELECT variant, value,
               ROW_NUMBER() OVER (PARTITION BY variant
                                  ORDER BY value) AS rk,
               COUNT(*) OVER (PARTITION BY variant) AS n
        FROM v
    ),
    d AS (SELECT unnest(generate_series(1, 9)) AS dec),
    pick AS (
        SELECT d.dec, r.variant, r.value
        FROM r JOIN d ON r.rk = CAST(ceil(d.dec * r.n / 10.0) AS BIGINT)
    ),
    a AS (SELECT dec, value AS q_control FROM pick WHERE variant = 0),
    b AS (SELECT dec, value AS q_treat FROM pick WHERE variant = 1)
    SELECT a.dec AS decile, a.q_control, b.q_treat,
           FLOOR((b.q_treat - a.q_control) * 1000000 + 0.5) / 1000000
               AS qte
    FROM a JOIN b USING (dec) ORDER BY decile
    """,
)
def quantile_treatment_effect_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects: the difference of each decile of the
    outcome distribution between treatment (user_id odd) and control —
    the distributional readout that catches effects a mean shift hides
    (e.g. treatment compresses the upper tail). Deciles are EXACT lower
    quantiles (the value at rank ceil(q·n)), so no interpolation
    arithmetic can diverge between engines.

    Scale shape: the oracle ranks per variant with row_number — two
    single-task sorts, the exact trap dist_cumsum exists to avoid — so
    the Spark side builds the per-(variant, value) histogram and takes
    range-partitioned cumulative counts (operators/dist_rank); each
    decile is then one rank-interval lookup over the histogram. Hot
    values collapse to one histogram row; nothing sorts more than its
    range slice."""
    ev = tables(spark, sf_dir)["events"]
    v = ev.select(
        (F.col("user_id") % 2).cast("int").alias("variant"), "value"
    )
    hist = v.groupBy("variant", F.col("value").alias("val")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    cum = dist_cumsum(hist, "val", ["cnt"], keys=["variant"])
    totals = cum.groupBy("variant").agg(F.max("cum_cnt").alias("n"))
    deciles = spark.range(1, 10).select(F.col("id").cast("int").alias("dec"))
    target = F.ceil(F.col("dec") * F.col("n") / 10.0).cast("long")
    picked = (
        cum.join(F.broadcast(totals), "variant")
        .crossJoin(F.broadcast(deciles))
        .withColumn("t", target)
        .filter(
            (F.col("cum_cnt") >= F.col("t"))
            & (F.col("cum_cnt") - F.col("cnt") < F.col("t"))
        )
        .select("variant", "dec", "val")
        .localCheckpoint(eager=False)  # feeds BOTH arms' filters —
        # without this the whole dist_cumsum branch re-executes per arm
    )
    a = picked.filter(F.col("variant") == 0).select(
        F.col("dec").alias("decile"), F.col("val").alias("q_control")
    )
    b = picked.filter(F.col("variant") == 1).select(
        F.col("dec").alias("decile"), F.col("val").alias("q_treat")
    )
    return (
        a.join(b, "decile")
        .select(
            "decile",
            "q_control",
            "q_treat",
            q6(F.col("q_treat") - F.col("q_control")).alias("qte"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# bayes_beta_posterior_ab
# ---------------------------------------------------------------------------


@query(
    "bayes_beta_posterior_ab",
    oracle="""
    WITH agg AS (
        SELECT CAST(user_id % 2 AS INT) AS variant,
               CAST(SUM(CASE WHEN value > 10 THEN 1 ELSE 0 END)
                    AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    post AS (
        SELECT variant, s, n,
               CAST(1 + s AS DOUBLE) AS alpha,
               CAST(1 + n - s AS DOUBLE) AS beta
        FROM agg
    ),
    m AS (
        SELECT variant, s, n, alpha, beta,
               alpha / (alpha + beta) AS mean,
               alpha * beta
               / ((alpha + beta) * (alpha + beta) * (alpha + beta + 1))
                   AS var
        FROM post
    )
    SELECT a.s AS s_control, a.n AS n_control,
           b.s AS s_treat, b.n AS n_treat,
           FLOOR(a.mean * 1000000 + 0.5) / 1000000 AS mean_control,
           FLOOR(b.mean * 1000000 + 0.5) / 1000000 AS mean_treat,
           FLOOR((b.mean - a.mean) / sqrt(a.var + b.var)
                 * 1000000 + 0.5) / 1000000 AS z_treat_minus_control
    FROM m a JOIN m b ON a.variant = 0 AND b.variant = 1
    """,
)
def bayes_beta_posterior_ab_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian A/B summary under uniform Beta(1,1) priors: posterior
    Beta(1+s, 1+n−s) per variant, posterior means, and the
    normal-approximation z for P(treat > control) — the z is reported
    rather than the probability because neither engine exposes erf and
    a polynomial Φ would be false cross-engine precision (the
    proportionsZTest precedent). One aggregation shuffle carrying four
    exact integers; the posterior algebra is a fixed IEEE tree."""
    ev = tables(spark, sf_dir)["events"]
    agg = ev.groupBy(
        (F.col("user_id") % 2).cast("int").alias("variant")
    ).agg(
        F.sum(F.when(F.col("value") > 10, 1).otherwise(0))
        .cast("long")
        .alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    alpha = (1 + F.col("s")).cast("double")
    beta = (1 + F.col("n") - F.col("s")).cast("double")
    m = agg.select(
        "variant",
        "s",
        "n",
        (alpha / (alpha + beta)).alias("mean"),
        (
            alpha * beta / ((alpha + beta) * (alpha + beta) * (alpha + beta + 1))
        ).alias("var"),
    )
    a = m.filter(F.col("variant") == 0).select(
        F.col("s").alias("s_control"),
        F.col("n").alias("n_control"),
        F.col("mean").alias("mean_a"),
        F.col("var").alias("var_a"),
    )
    b = m.filter(F.col("variant") == 1).select(
        F.col("s").alias("s_treat"),
        F.col("n").alias("n_treat"),
        F.col("mean").alias("mean_b"),
        F.col("var").alias("var_b"),
    )
    return a.crossJoin(b).select(
        "s_control",
        "n_control",
        "s_treat",
        "n_treat",
        q6(F.col("mean_a")).alias("mean_control"),
        q6(F.col("mean_b")).alias("mean_treat"),
        q6(
            (F.col("mean_b") - F.col("mean_a"))
            / F.sqrt(F.col("var_a") + F.col("var_b"))
        ).alias("z_treat_minus_control"),
    )


# ---------------------------------------------------------------------------
# segment_uplift_table
# ---------------------------------------------------------------------------


@query(
    "segment_uplift_table",
    oracle="""
    WITH agg AS (
        SELECT event_type,
               CAST(user_id % 2 AS INT) AS variant,
               CAST(SUM(CASE WHEN value > 10 THEN 1 ELSE 0 END)
                    AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    piv AS (
        SELECT event_type,
               MIN(CASE WHEN variant = 0 THEN s END) AS s0,
               MIN(CASE WHEN variant = 0 THEN n END) AS n0,
               MIN(CASE WHEN variant = 1 THEN s END) AS s1,
               MIN(CASE WHEN variant = 1 THEN n END) AS n1
        FROM agg GROUP BY event_type
    )
    SELECT event_type, s0, n0, s1, n1,
           FLOOR(CAST(s0 AS DOUBLE) / n0 * 1000000 + 0.5) / 1000000
               AS rate_control,
           FLOOR(CAST(s1 AS DOUBLE) / n1 * 1000000 + 0.5) / 1000000
               AS rate_treat,
           FLOOR((CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
                 * 1000000 + 0.5) / 1000000 AS uplift,
           FLOOR((CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
                 / sqrt(CAST(s0 + s1 AS DOUBLE) / (n0 + n1)
                        * (1 - CAST(s0 + s1 AS DOUBLE) / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1))
                 * 1000000 + 0.5) / 1000000 AS z_pooled
    FROM piv ORDER BY event_type
    """,
)
def segment_uplift_table_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment uplift (heterogeneous treatment effects): conversion
    rate per variant within each event-type segment, the absolute
    uplift, and the pooled two-proportion z — the table that shows
    WHERE a flat topline hides a positive segment and a negative one.
    All scores are fixed expressions over four exact integers per
    segment.

    Scale shape: one (segment, variant) hash agg with map-side combine,
    then a segment-sized pivot — segments are the only post-agg
    cardinality, so at 100 TB this is scan + one narrow shuffle."""
    ev = tables(spark, sf_dir)["events"]
    agg = ev.groupBy(
        "event_type",
        (F.col("user_id") % 2).cast("int").alias("variant"),
    ).agg(
        F.sum(F.when(F.col("value") > 10, 1).otherwise(0))
        .cast("long")
        .alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    piv = agg.groupBy("event_type").agg(
        F.min(F.when(F.col("variant") == 0, F.col("s"))).alias("s0"),
        F.min(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.min(F.when(F.col("variant") == 1, F.col("s"))).alias("s1"),
        F.min(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
    )
    r0 = F.col("s0").cast("double") / F.col("n0")
    r1 = F.col("s1").cast("double") / F.col("n1")
    pp = (F.col("s0") + F.col("s1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    z = (r1 - r0) / F.sqrt(
        pp * (1 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
    )
    return piv.select(
        "event_type",
        "s0",
        "n0",
        "s1",
        "n1",
        q6(r0).alias("rate_control"),
        q6(r1).alias("rate_treat"),
        q6(r1 - r0).alias("uplift"),
        q6(z).alias("z_pooled"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# char_class_profile
# ---------------------------------------------------------------------------


@query(
    "char_class_profile",
    oracle="""
    WITH per AS (
        SELECT source,
               CAST(SUM(length(text)) AS BIGINT) AS n_chars,
               CAST(SUM(length(text)
                        - length(regexp_replace(text, '[a-z]', '', 'g')))
                    AS BIGINT) AS n_alpha,
               CAST(SUM(length(text)
                        - length(regexp_replace(text, '[0-9]', '', 'g')))
                    AS BIGINT) AS n_digit,
               CAST(SUM(length(text)
                        - length(replace(text, ' ', ''))) AS BIGINT)
                   AS n_space
        FROM documents GROUP BY source
    )
    SELECT source, n_chars, n_alpha, n_digit, n_space,
           n_chars - n_alpha - n_digit - n_space AS n_other,
           FLOOR(CAST(n_alpha AS DOUBLE) / n_chars * 1000000 + 0.5)
               / 1000000 AS alpha_ratio,
           FLOOR(CAST(n_space AS DOUBLE) / n_chars * 1000000 + 0.5)
               / 1000000 AS space_ratio
    FROM per ORDER BY source
    """,
)
def char_class_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per source — lowercase-alpha, digit,
    whitespace and other ratios: the cheapest corpus-mix fingerprint
    (code vs prose vs tables separate on exactly these ratios), and the
    standard sanity gate before tokenizer training. Counts via
    length-minus-stripped (both engines count codepoints identically on
    this ASCII corpus); ratios are single divisions of exact integers.

    Scale shape: pure map + one source-keyed hash agg with map-side
    combine — the embarrassingly-parallel profile scan."""
    d = tables(spark, sf_dir)["documents"]
    ln = F.length("text")
    per = d.groupBy("source").agg(
        F.sum(ln).cast("long").alias("n_chars"),
        F.sum(ln - F.length(F.regexp_replace("text", "[a-z]", "")))
        .cast("long")
        .alias("n_alpha"),
        F.sum(ln - F.length(F.regexp_replace("text", "[0-9]", "")))
        .cast("long")
        .alias("n_digit"),
        F.sum(ln - F.length(F.regexp_replace("text", " ", "")))
        .cast("long")
        .alias("n_space"),
    )
    return per.select(
        "source",
        "n_chars",
        "n_alpha",
        "n_digit",
        "n_space",
        (
            F.col("n_chars")
            - F.col("n_alpha")
            - F.col("n_digit")
            - F.col("n_space")
        ).alias("n_other"),
        q6(F.col("n_alpha").cast("double") / F.col("n_chars")).alias(
            "alpha_ratio"
        ),
        q6(F.col("n_space").cast("double") / F.col("n_chars")).alias(
            "space_ratio"
        ),
    ).orderBy("source")
