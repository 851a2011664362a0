"""Round-9 query wave 2: winnowing document fingerprints (the MOSS
local-minimum sparse fingerprint scheme) and the geohashesInBox geo
family completion (promoted out of UNSUPPORTED this round).

Reference parity note: no counterpart in the reference repo; winnowing
extends the dedup charter (a sparser, offset-robust alternative to the
dense substring_dup_spans windows), geohashesInBox completes the CH geo
function family.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.ch import _GEO32, ch_expr
from .registry import query, tables

# ---------------------------------------------------------------------------
# winnowing_fingerprints
# ---------------------------------------------------------------------------

_WK = 16  # char-gram length
_WW = 8  # winnowing window (consecutive gram hashes per min-selection)
#: Stop-fingerprint cap (the ngram_jaccard max_df discipline): a
#: fingerprint appearing in more than _MAX_DF documents contributes
#: C(df, 2) candidate pairs — boilerplate grams blow the stream up
#: (measured sf0.1: max df 270 → 36k pairs from ONE fingerprint).
#: Dropped from the index on BOTH engines before the pair join, so
#: parity holds at every SF; never binds at sf0.01 (max df 32 there).
_MAX_DF = 64

#: Engine-portable 60-bit hash of one char k-gram (the llm.py _HASH64
#: idiom): md5 prefix, identical on both engines.
_H64_SQL = "CAST(('0x' || substr(md5({g}), 1, 15)) AS BIGINT)"


@query(
    "winnowing_fingerprints",
    oracle=f"""
    WITH d AS (SELECT doc_id, text FROM documents
               WHERE length(text) >= {_WK + _WW - 1}),
    h AS (SELECT doc_id, i,
                 {_H64_SQL.format(g=f"substr(text, CAST(i AS INT), {_WK})")}
                     AS h,
                 length(text) - {_WK} + 1 AS maxpos
          FROM d, unnest(generate_series(1, length(text) - {_WK} + 1))
               AS t(i)),
    w AS (SELECT doc_id, i, maxpos,
                 MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                              ROWS BETWEEN CURRENT ROW
                              AND {_WW - 1} FOLLOWING) AS fp
          FROM h),
    fps AS (SELECT DISTINCT doc_id, fp
            FROM w WHERE i <= maxpos - {_WW - 1}),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp
              FROM fps GROUP BY doc_id),
    keep AS (SELECT fp FROM fps GROUP BY fp
             HAVING COUNT(*) <= {_MAX_DF}),
    idx AS (SELECT f.doc_id, f.fp FROM fps f
            WHERE f.fp IN (SELECT fp FROM keep)),
    pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CAST(COUNT(*) AS BIGINT) AS shared
              FROM idx a JOIN idx b
                ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY 1, 2 HAVING COUNT(*) >= 2)
    SELECT p.id_a, p.id_b, p.shared,
           sa.n_fp AS n_fp_a, sb.n_fp AS n_fp_b
    FROM pairs p JOIN sizes sa ON p.id_a = sa.doc_id
                 JOIN sizes sb ON p.id_b = sb.doc_id
    ORDER BY p.shared DESC, p.id_a, p.id_b LIMIT 50
    """,
)
def winnowing_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the MOSS
    fingerprinting scheme): hash every {_WK}-char gram, keep the MINIMUM
    hash of each {_WW}-window of consecutive grams, deduplicate — a
    guaranteed-coverage sparse fingerprint set (any shared substring of
    length ≥ k+w-1 yields a shared fingerprint) at ~2/(w+1) the density
    of the full window set that substring_dup_spans hashes. Candidate
    pairs share ≥2 fingerprints, ranked by overlap.

    Scale shape: gram hashing is map-side; the window-min runs
    per-document (partitioned window, frame of {_WW} rows — never a
    global sort); the fingerprint index join is the inverted-index
    discipline of the dedup stack, with posting lists already thinned
    ~4x by the min-selection; pair counting is a narrow two-id hash
    agg. 100 TB: identical to ngram_jaccard_pairs with a cheaper index,
    including the _MAX_DF stop-fingerprint cap (never binds at the
    sf0.01 oracle point; applied identically in the SQL twin so parity
    holds at every SF)."""
    from ..operators.dedup import spread_scan

    # The documents file is one parquet row group — an unsplittable
    # 1-task scan — so WITHOUT this the whole gram-hash pass (the
    # query's dominant cost, ~1.4M md5s at sf0.1) runs on ONE core.
    # spread_scan repartitions the pre-explode rows only when the
    # input is actually under-parallel (an already-split 100 TB input
    # pays no text reshuffle), and hashing on doc_id means the window's
    # partitionBy reuses the exchange instead of adding one.
    d = spread_scan(
        tables(spark, sf_dir)["documents"].filter(
            F.length("text") >= _WK + _WW - 1
        ),
        "doc_id",
    )
    # explode positions FIRST, hash per ROW: a transform(...) lambda
    # computing md5 per array element is CodegenFallback (measured 3x
    # slower than this whole-stage-codegen shape — the llm_wave3 lesson
    # again); the duplicated text column dies in the projection before
    # the window exchange.
    h = d.select(
        "doc_id",
        "text",
        (F.length("text") - F.lit(_WK - 1)).alias("maxpos"),
    ).select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.col("maxpos"))).alias("i"),
        "maxpos",
        "text",
    ).select(
        "doc_id",
        "i",
        "maxpos",
        F.conv(
            F.substring(
                F.md5(F.col("text").substr(F.col("i"), F.lit(_WK))), 1, 15
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    w = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, _WW - 1)
    fps = (
        h.withColumn("fp", F.min("h").over(w))
        .filter(F.col("i") <= F.col("maxpos") - (_WW - 1))
        .select("doc_id", "fp")
        .distinct()
        .localCheckpoint(eager=False)  # feeds sizes AND the pair join
    )
    sizes = fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fp")
    )
    stop = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > _MAX_DF)
        .select("fp")
    )
    idx = fps.join(F.broadcast(stop), "fp", "left_anti")
    pairs = (
        idx.alias("a")
        .join(
            # pinned ShuffledHashJoin: sort-merge would SORT both index
            # sides on fp (the r11 jaccard pair-join lesson)
            idx.alias("b").hint("shuffle_hash"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .filter(F.col("shared") >= 2)
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_fp").alias("n_fp_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_fp").alias("n_fp_b"))
    return (
        pairs.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select("id_a", "id_b", "shared", "n_fp_a", "n_fp_b")
        .orderBy(F.desc("shared"), "id_a", "id_b")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# geohashes_in_box
# ---------------------------------------------------------------------------

_GP = 4  # precision under test
_GNLON = (5 * _GP + 1) // 2
_GNLAT = 5 * _GP // 2


def _sql_gh4(xl: str, xt: str) -> str:
    """DuckDB twin of functions/ch._geohash_cell for p=4, emitted from
    the same bit loop (the r8_wave7._sql_geohash6 pattern)."""
    chars = []
    for k in range(_GP):
        terms = []
        for b in range(5):
            i = 5 * k + b
            if i % 2 == 0:
                src, pos = xl, _GNLON - 1 - i // 2
            else:
                src, pos = xt, _GNLAT - 1 - (i - 1) // 2
            terms.append(f"(({src} >> {pos}) & 1) * {1 << (4 - b)}")
        chars.append(
            f"substring('{_GEO32}', CAST({' + '.join(terms)} AS INT) + 1, 1)"
        )
    return " || ".join(chars)


@query(
    "geohashes_in_box",
    oracle=f"""
    WITH src AS (
        SELECT event_id,
               (event_id * 7919 % 2800) / 100.0 - 14 AS lon0,
               (event_id * 104729 % 1600) / 100.0 - 8 AS lat0
        FROM events WHERE event_id % 23 = 7
    ),
    q AS (
        SELECT event_id, lon0, lat0,
               least(CAST(floor((lon0 + 180) / 360 * {1 << _GNLON})
                          AS BIGINT), {(1 << _GNLON) - 1}) AS xl0,
               least(CAST(floor((lon0 + 0.8 + 180) / 360 * {1 << _GNLON})
                          AS BIGINT), {(1 << _GNLON) - 1}) AS xl1,
               least(CAST(floor((lat0 + 90) / 180 * {1 << _GNLAT})
                          AS BIGINT), {(1 << _GNLAT) - 1}) AS xt0,
               least(CAST(floor((lat0 + 0.5 + 90) / 180 * {1 << _GNLAT})
                          AS BIGINT), {(1 << _GNLAT) - 1}) AS xt1
        FROM src
    ),
    g AS (
        SELECT event_id,
               list_sort(flatten(list_transform(
                   generate_series(xl0, xl1),
                   xl -> list_transform(
                       generate_series(xt0, xt1),
                       xt -> {_sql_gh4("xl", "xt")})))) AS ghs
        FROM q
    )
    SELECT event_id::BIGINT AS eid,
           CAST(len(ghs) AS BIGINT) AS n_cells,
           ghs[1] AS first_cell,
           array_to_string(ghs, ',') AS cells
    FROM g ORDER BY eid
    """,
)
def geohashes_in_box_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geohashesInBox end-to-end (promoted from UNSUPPORTED this round):
    every precision-4 geohash cell intersecting a per-event box
    (deterministic synthetic corners, box 0.8°×0.5° ≈ 3×3 cells),
    rendered sorted so both engines hash the identical enumeration.
    The oracle regenerates the cell grid AND the per-cell base-32 fold
    from the same bit loop, so any quantization or interleave drift
    diverges. Pure map stage — the cell fan-out per row is bounded by
    the box size, no shuffle before the final sort."""
    ev = tables(spark, sf_dir)["events"].filter(F.col("event_id") % 23 == 7)
    lon0 = (F.col("event_id") * 7919 % 2800) / 100.0 - 14.0
    lat0 = (F.col("event_id") * 104729 % 1600) / 100.0 - 8.0
    ghs = ch_expr(
        "geohashesInBox", lon0, lat0, lon0 + 0.8, lat0 + 0.5, _GP
    )
    return ev.select(
        F.col("event_id").cast("long").alias("eid"),
        F.size(ghs).cast("long").alias("n_cells"),
        F.element_at(ghs, 1).alias("first_cell"),
        F.array_join(ghs, ",").alias("cells"),
    ).orderBy("eid")
