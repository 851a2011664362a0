"""Round-9 query wave 5: dedup-threshold ROI curve and Fellegi–Sunter
probabilistic record linkage over blocked near-duplicate candidates.

Reference parity note: none in the reference repo; both extend the
dedup/curation charter — the ROI curve is the knob-setting readout
('what does each Jaccard threshold actually remove'), F–S is the
classic probabilistic linkage scorer applied to the same candidate
stream the dedup stack already generates.

Exactness note: the threshold sweep compares the EXACT Jaccard
i/(sa+sb−i) against literal thresholds on both engines (the dedup
operator's rounded-to-4 output column would make threshold crossings
engine-dependent), so the pair arithmetic is inlined here from
jaccard_pairs_from_sets rather than read off the operator's display
column.

Scale note: shingles are word TRIGRAMS with a max_df=64 stop-shingle
cap (the dedup-stack discipline) — the first cut used bigrams and
measured 44 s at sf1 (bigram df makes Σ C(df,2) explode); trigram +
cap brings the stream back to the ngram_jaccard envelope. The cap is
applied identically in the SQL twins, so parity holds at every SF.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import shingle_sets
from .registry import q6, query, tables

_MAX_DF = 64  # stop-shingle cap, identical on both engines

#: Word-TRIGRAM shingle CTE with the max_df stop-shingle cap (the
#: dedup-stack discipline): posting lists above _MAX_DF are dropped
#: BEFORE the pair join; set sizes stay the full shingle counts, so
#: the intersection (and hence Jaccard) is the documented lower bound.
_TRIGRAM_CTE = f"""
    sh AS (SELECT doc_id,
                  list_distinct(list_transform(
                      range(1, len(ws) - 1),
                      i -> ws[i] || ' ' || ws[i + 1] || ' '
                           || ws[i + 2])) AS shingles
           FROM (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents)
           WHERE len(ws) >= 3),
    sz AS (SELECT doc_id, len(shingles) AS sz FROM sh),
    inv0 AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
    stopg AS (SELECT g FROM inv0 GROUP BY g
              HAVING COUNT(*) > {{_MAX_DF}}),
    inv AS (SELECT doc_id, g FROM inv0
            WHERE g NOT IN (SELECT g FROM stopg)),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CAST(COUNT(*) AS BIGINT) AS i
              FROM inv a JOIN inv b
                ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    jp AS (SELECT id_a, id_b,
                  CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jacc
           FROM inter JOIN sz sa ON inter.id_a = sa.doc_id
                      JOIN sz sb ON inter.id_b = sb.doc_id)
""".replace("{_MAX_DF}", str(_MAX_DF))


def _exact_trigram_jaccard_pairs(d: DataFrame, threshold: float) -> DataFrame:
    """(id_a, id_b, jacc) with the EXACT jacc double (no display
    rounding) — the inlined core of jaccard_pairs_from_sets over word
    trigrams with the _MAX_DF stop-shingle cap; same inverted-index
    Σ C(min(df, cap), 2) scale bound."""
    sets = shingle_sets(d, "doc_id", "text", 3).localCheckpoint(eager=False)
    sizes = sets.select("id", F.size("shingles").alias("sz"))
    inv = sets.select("id", F.explode("shingles").alias("g"))
    stop = (
        inv.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > _MAX_DF)
        .select("g")
    )
    inv = inv.join(F.broadcast(stop), "g", "left_anti")
    inter = (
        inv.alias("a")
        .join(
            inv.alias("b"),
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("szb"))
    jacc = F.col("i").cast("double") / (
        F.col("sza") + F.col("szb") - F.col("i")
    )
    return (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select("id_a", "id_b", jacc.alias("jacc"))
        .filter(F.col("jacc") >= threshold)
    )


# ---------------------------------------------------------------------------
# dedup_threshold_roi
# ---------------------------------------------------------------------------

_ROI_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)


@query(
    "dedup_threshold_roi",
    oracle=f"""
    WITH {_TRIGRAM_CTE},
    d AS (SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM d),
    th AS (SELECT unnest([{", ".join(str(t) for t in _ROI_THRESHOLDS)}])
               AS threshold),
    removed AS (
        SELECT DISTINCT th.threshold, jp.id_b AS doc_id
        FROM th JOIN jp ON jp.jacc >= th.threshold
    ),
    agg AS (
        SELECT r.threshold,
               CAST(COUNT(*) AS BIGINT) AS docs_removed,
               CAST(SUM(d.n_tokens) AS BIGINT) AS tokens_removed
        FROM removed r JOIN d ON r.doc_id = d.doc_id
        GROUP BY r.threshold
    )
    SELECT th.threshold,
           COALESCE(agg.docs_removed, 0) AS docs_removed,
           COALESCE(agg.tokens_removed, 0) AS tokens_removed,
           FLOOR(CAST(COALESCE(agg.docs_removed, 0) AS DOUBLE)
                 / tot.n_docs * 1000000 + 0.5) / 1000000
               AS doc_frac_removed
    FROM th LEFT JOIN agg ON th.threshold = agg.threshold
    CROSS JOIN tot
    ORDER BY th.threshold
    """,
)
def dedup_threshold_roi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-threshold ROI curve: for each Jaccard threshold, how many
    documents (and tokens) the keep-lowest-id policy would remove — the
    knob-setting readout every dedup rollout starts with (too low eats
    real data, too high leaves near-dups). The word-TRIGRAM pair stream
    is computed ONCE at the loosest threshold; each row of the curve is
    a filter over the same stream, so the sweep costs one small join,
    not five pair computations.

    Scale shape: one inverted-index pair join (the ngram_jaccard
    discipline, Σ C(min(df, 64), 2) under the stop-shingle cap),
    then thresholds × surviving pairs, a constant fan-out."""
    d = tables(spark, sf_dir)["documents"]
    tok = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    ).localCheckpoint(eager=False)  # totals AND removed-token lookup
    tot = tok.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    pairs = _exact_trigram_jaccard_pairs(
        d, min(_ROI_THRESHOLDS)
    ).localCheckpoint(eager=False)  # reused across the threshold sweep
    th = spark.createDataFrame(
        [(t,) for t in _ROI_THRESHOLDS], "threshold double"
    )
    removed = (
        pairs.crossJoin(F.broadcast(th))
        .filter(F.col("jacc") >= F.col("threshold"))
        .select("threshold", F.col("id_b").alias("doc_id"))
        .distinct()
    )
    agg = (
        removed.join(tok, "doc_id")
        .groupBy("threshold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs_removed"),
            F.sum("n_tokens").cast("long").alias("tokens_removed"),
        )
    )
    return (
        th.join(agg, "threshold", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "threshold",
            F.coalesce(F.col("docs_removed"), F.lit(0))
            .cast("long")
            .alias("docs_removed"),
            F.coalesce(F.col("tokens_removed"), F.lit(0))
            .cast("long")
            .alias("tokens_removed"),
            q6(
                F.coalesce(F.col("docs_removed"), F.lit(0)).cast("double")
                / F.col("n_docs")
            ).alias("doc_frac_removed"),
        )
        .orderBy("threshold")
    )


# ---------------------------------------------------------------------------
# record_linkage_fs
# ---------------------------------------------------------------------------

#: Fellegi–Sunter agreement weights, log2(m/u) per field, from fixed
#: published-style m/u probabilities (source: m=.95/u=.25; length band:
#: m=.9/u=.1; prefix: m=.8/u=.01). Literals (repr-rendered into both
#: plans), so both engines compute identical scores.
_FS = {
    "source": (0.95, 0.25),
    "length": (0.90, 0.10),
    "prefix": (0.80, 0.01),
}


def _w(field: str, agree: bool) -> float:
    m, u = _FS[field]
    return math.log2(m / u) if agree else math.log2((1 - m) / (1 - u))


def _fs_score_sql() -> str:
    terms = []
    for field, col in (("source", "f_src"), ("length", "f_len"),
                       ("prefix", "f_pre")):
        # CAST(... AS DOUBLE): DuckDB types a long literal like
        # 1.9259994185562222 as a wide DECIMAL, and the downstream
        # *1000000 then overflows DECIMAL(18) — force the float domain.
        terms.append(
            f"CASE WHEN {col} = 1 THEN CAST({_w(field, True)!r} AS DOUBLE) "
            f"ELSE CAST({_w(field, False)!r} AS DOUBLE) END"
        )
    return "(" + " + ".join(terms) + ")"


_FS_UPPER = 2.0  # score >= upper -> link
_FS_LOWER = 0.0  # lower <= score < upper -> possible; below -> non-link


@query(
    "record_linkage_fs",
    oracle=f"""
    WITH {_TRIGRAM_CTE},
    cand AS (SELECT id_a, id_b FROM jp WHERE jacc >= 0.3),
    feat AS (
        SELECT c.id_a, c.id_b,
               CASE WHEN da.source = db.source THEN 1 ELSE 0 END AS f_src,
               CASE WHEN abs(da.n_chars - db.n_chars)
                         <= 0.1 * greatest(da.n_chars, db.n_chars)
                    THEN 1 ELSE 0 END AS f_len,
               CASE WHEN substr(da.text, 1, 16) = substr(db.text, 1, 16)
                    THEN 1 ELSE 0 END AS f_pre
        FROM cand c JOIN documents da ON c.id_a = da.doc_id
                    JOIN documents db ON c.id_b = db.doc_id
    )
    SELECT id_a, id_b, f_src, f_len, f_pre,
           FLOOR({_fs_score_sql()} * 1000000 + 0.5) / 1000000 AS fs_score,
           CASE WHEN {_fs_score_sql()} >= {_FS_UPPER} THEN 'link'
                WHEN {_fs_score_sql()} >= {_FS_LOWER} THEN 'possible'
                ELSE 'non-link' END AS decision
    FROM feat ORDER BY id_a, id_b
    """,
)
def record_linkage_fs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage over the blocked
    near-duplicate candidate stream: candidates are bigram-Jaccard ≥ 0.3
    pairs (the blocking pass — F–S never scores all pairs), each pair
    gets per-field agreement indicators (same source, lengths within
    10%, equal 16-char prefix) and the classic Σ log2(m/u) /
    log2((1-m)/(1-u)) score against fixed m/u probabilities, classified
    link / possible / non-link by thresholds.

    Scale shape: blocking is the inverted-index pair join; the field
    comparisons are two hash joins back to the records (narrow
    projections); scoring is a fixed literal expression. 100 TB:
    identical to the dedup stack plus two co-partitioned joins."""
    d = tables(spark, sf_dir)["documents"]
    cand = _exact_trigram_jaccard_pairs(d, 0.3).select("id_a", "id_b")
    fields = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.substring("text", 1, 16).alias("pre16"),
    )
    da = fields.select(
        F.col("doc_id").alias("id_a"),
        F.col("source").alias("src_a"),
        F.col("n_chars").alias("nc_a"),
        F.col("pre16").alias("pre_a"),
    )
    db = fields.select(
        F.col("doc_id").alias("id_b"),
        F.col("source").alias("src_b"),
        F.col("n_chars").alias("nc_b"),
        F.col("pre16").alias("pre_b"),
    )
    feat = (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a",
            "id_b",
            F.when(F.col("src_a") == F.col("src_b"), 1)
            .otherwise(0)
            .alias("f_src"),
            F.when(
                F.abs(F.col("nc_a") - F.col("nc_b"))
                <= 0.1 * F.greatest(F.col("nc_a"), F.col("nc_b")),
                1,
            )
            .otherwise(0)
            .alias("f_len"),
            F.when(F.col("pre_a") == F.col("pre_b"), 1)
            .otherwise(0)
            .alias("f_pre"),
        )
    )
    score = (
        F.when(F.col("f_src") == 1, F.lit(_w("source", True))).otherwise(
            F.lit(_w("source", False))
        )
        + F.when(F.col("f_len") == 1, F.lit(_w("length", True))).otherwise(
            F.lit(_w("length", False))
        )
        + F.when(F.col("f_pre") == 1, F.lit(_w("prefix", True))).otherwise(
            F.lit(_w("prefix", False))
        )
    )
    return feat.select(
        "id_a",
        "id_b",
        "f_src",
        "f_len",
        "f_pre",
        q6(score).alias("fs_score"),
        F.when(score >= _FS_UPPER, F.lit("link"))
        .when(score >= _FS_LOWER, F.lit("possible"))
        .otherwise(F.lit("non-link"))
        .alias("decision"),
    ).orderBy("id_a", "id_b")
