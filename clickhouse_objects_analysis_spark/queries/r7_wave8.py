"""Round-7 session-8 queries: Holt–Winters seasonal smoothing,
deterministic weighted reservoir sampling, and Flesch readability.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has no time-series/sampling/readability surface; Holt–Winters
extends the timeseries charter (CH analogue seriesDecomposeSTL),
weighted reservoir is the Efraimidis–Spirakis sampler a data-mixing
pipeline uses to downsample by quality weight, and Flesch is the classic
readability quality score for the documents table (SURVEY §7 text
analysis)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import query, tables


@query(
    "holt_winters_weekday",
    oracle="""
    WITH RECURSIVE base AS (
        SELECT event_type,
               datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
               CAST(COUNT(*) AS DOUBLE) AS c
        FROM events GROUP BY 1, 2
    ),
    s AS (SELECT event_type, c,
                 row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
          FROM base),
    ord AS (SELECT event_type, list(c ORDER BY rn) AS ys FROM s GROUP BY 1),
    seed AS (
        SELECT event_type, len(ys) AS n,
               list_reduce(ys[1:7], (a, b) -> a + b) / 7.0 AS l,
               (list_reduce(ys[8:14], (a, b) -> a + b) / 7.0
                - list_reduce(ys[1:7], (a, b) -> a + b) / 7.0) / 7.0 AS b,
               list_transform(ys[1:7],
                   y -> y - list_reduce(ys[1:7], (a, b) -> a + b) / 7.0)
                   AS sl
        FROM ord WHERE len(ys) >= 14),
    rec AS (
        SELECT event_type, 7 AS rn, l, b, sl FROM seed
        UNION ALL
        SELECT r.event_type, r.rn + 1,
               0.5 * (s.c - r.sl[(r.rn % 7) + 1]) + (1 - 0.5) * (r.l + r.b),
               0.3 * ((0.5 * (s.c - r.sl[(r.rn % 7) + 1])
                       + (1 - 0.5) * (r.l + r.b)) - r.l) + (1 - 0.3) * r.b,
               list_concat(list_concat(
                   r.sl[1:(r.rn % 7)],
                   [0.2 * (s.c - (0.5 * (s.c - r.sl[(r.rn % 7) + 1])
                                  + (1 - 0.5) * (r.l + r.b)))
                    + (1 - 0.2) * r.sl[(r.rn % 7) + 1]]),
                   r.sl[(r.rn % 7) + 2:])
        FROM rec r JOIN s
          ON s.event_type = r.event_type AND s.rn = r.rn + 1
    )
    SELECT r.event_type,
           ROUND(r.l, 4) AS level,
           ROUND(r.b, 4) AS trend,
           ROUND(r.sl[(seed.n % 7) + 1], 4) AS season_next,
           ROUND(r.l + r.b + r.sl[(seed.n % 7) + 1], 4) AS fc_1
    FROM rec r JOIN seed USING (event_type)
    WHERE r.rn = seed.n ORDER BY event_type
    """,
)
def holt_winters_weekday_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt–Winters (α=0.5, β=0.3, γ=0.2, period 7) over each
    event type's daily counts — level + trend + weekly season, the
    seasonal upgrade of holt_linear_smoothing. Init from the first two
    weeks (l = week-1 mean, b = week-over-week mean delta / 7,
    s = week-1 residuals), recurrence from day 8; emits the final
    state, the next position's seasonal, and the 1-step forecast.

    The oracle replays the EXACT recurrence as a DuckDB recursive CTE
    carrying the 7-slot seasonal LIST as state (slice-splice update per
    step); season means are left folds over position-ordered lists on
    both engines, and every (1−coef) is written as a runtime
    subtraction on both sides so the double streams are bit-identical
    into the 4-dp round. Ordered recurrences are the one shape Catalyst
    can't express (no 2^k tree) — per-series applyInPandas, across
    series parallel; the daily agg upstream is plain codegen."""
    from ..operators.timeseries import holt_winters_additive

    ev = tables(spark, sf_dir)["events"]
    s = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d"),
    ).agg(F.count("*").cast("double").alias("c"))
    return holt_winters_additive(
        s, "event_type", "d", "c", period=7, alpha=0.5, beta=0.3, gamma=0.2
    ).orderBy("event_type")


@query(
    "weighted_reservoir_sample",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               CAST(FLOOR(
                   pow(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                            AS BIGINT) / 1152921504606846976.0,
                       1.0 / n_chars) * 1e9 + 0.5) AS BIGINT) AS key_nano
        FROM documents WHERE n_chars > 0)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_chars AS BIGINT) AS n_chars, key_nano
    FROM keyed ORDER BY key_nano DESC, doc_id LIMIT 10
    """,
)
def weighted_reservoir_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k=10, weight = n_chars —
    the Efraimidis–Spirakis A-Res sampler a data-mixing pipeline uses
    to draw a quality-weighted subset in one pass: each row gets key
    u^(1/w) with u a uniform deterministic hash fraction (md5 of the
    id, top 60 bits / 2^60), and the global top-k by key IS the
    weighted sample. Deterministic: the key is a pure per-row function
    (same sample on any partitioning, any engine — CH analogue
    quantileDeterministic's determinator argument), keys quantized to
    a 1e-9 grid before ranking so a libm pow() ulp cannot flip the
    boundary.

    100 TB: embarrassingly parallel — per-partition top-k then a k-row
    merge (Spark's TakeOrderedAndProject), no shuffle of the corpus,
    ~zero driver memory. This is the one-pass alternative to
    mixture-rebalance's two-pass quota plan when only a fixed-size
    weighted subset is needed."""
    d = tables(spark, sf_dir)["documents"]
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long") / F.lit(1152921504606846976.0)
    key_nano = F.floor(
        F.pow(u, F.lit(1.0) / F.col("n_chars")) * 1e9 + F.lit(0.5)
    ).cast("long")
    return (
        d.filter(F.col("n_chars") > 0)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_chars").cast("long").alias("n_chars"),
            key_nano.alias("key_nano"),
        )
        .orderBy(F.desc("key_nano"), "doc_id")
        .limit(10)
    )


@query(
    "flesch_reading_ease",
    oracle="""
    WITH f AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                    x -> length(x) > 0)) AS BIGINT) AS n_words,
               CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                    AS BIGINT) AS n_sentences,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                    AS BIGINT) AS n_syllables
        FROM documents)
    SELECT doc_id, n_words, n_sentences, n_syllables,
           FLOOR((206.835 - 1.015 * (n_words / n_sentences)
                  - 84.6 * (n_syllables / n_words)) * 10000 + 0.5) / 10000
               AS flesch,
           FLOOR((0.39 * (n_words / n_sentences)
                  + 11.8 * (n_syllables / n_words) - 15.59) * 10000 + 0.5)
               / 10000 AS fk_grade
    FROM f WHERE n_words > 0 ORDER BY doc_id
    """,
)
def flesch_reading_ease_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease + Flesch–Kincaid grade per document — the
    classic readability pair for corpus quality filtering (too-low ease
    flags run-on machine text, negative grades flag fragment salad).
    Syllables are approximated as vowel-group runs ([aeiouy]+, the
    standard heuristic), sentences as terminal-punctuation runs floored
    at 1. All three inputs are INTEGER counts from regex scans —
    map-side codegen, no shuffle until the final sort — and each score
    is a fixed 5-op double expression over integers, so both engines
    agree bit-for-bit into the 4-dp round."""
    d = tables(spark, sf_dir)["documents"]
    words = F.size(
        F.filter(
            F.split(F.trim("text"), r"\s+"), lambda x: F.length(x) > 0
        )
    ).cast("long")
    sentences = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit(r"[.!?]+"), 0)), F.lit(1)
    ).cast("long")
    syllables = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), 0)
    ).cast("long")
    f = d.select(
        "doc_id",
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    wps = F.col("n_words") / F.col("n_sentences")
    spw = F.col("n_syllables") / F.col("n_words")
    # floor(v*1e4 + 0.5), NOT round(): with integer-ratio inputs the
    # scores land on exact .00005 boundaries, where Spark's round (HALF_UP
    # over Double.toString's shortest repr) and DuckDB's (exact binary
    # expansion) disagree by a full 1e-4. The floor form evaluates the
    # same double expression on both engines — no repr dependence.
    q4 = lambda c: F.floor(c * F.lit(10000) + F.lit(0.5)) / F.lit(  # noqa: E731
        10000
    )
    return f.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        q4(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw)
        .alias("flesch"),
        q4(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59))
        .alias("fk_grade"),
    ).orderBy("doc_id")
