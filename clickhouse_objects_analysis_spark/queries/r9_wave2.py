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
from pyspark.sql import DataFrame, SparkSession

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


def _winnow_kernel(batches):
    """text → per-doc distinct winnowing fingerprints, one Arrow batch
    at a time: hashlib md5 prefix per char gram (bit-identical to the
    JVM's conv(substring(md5(…),1,15),16,10) — 15 hex digits < 2^60,
    no sign issues), numpy sliding-window min for the w-window
    selection, np.unique for the per-doc distinct. Entirely map-side:
    no position explode, no partitioned-window sort, no global
    distinct shuffle."""
    import numpy as np
    import pandas as pd

    try:
        # the raw OpenSSL constructor skips hashlib's wrapper layer —
        # measured ~40% per-gram (this loop is 222M md5s at sf10)
        from _hashlib import openssl_md5 as md5
    except ImportError:  # pragma: no cover - stdlib always ships it
        from hashlib import md5

    swv = np.lib.stride_tricks.sliding_window_view
    four = np.uint64(4)
    for pdf in batches:
        ids, fps = [], []
        for i, t in zip(pdf["doc_id"], pdf["text"]):
            b = t.encode("utf-8")
            if len(b) == len(t):
                # ASCII fast path: byte offsets == char offsets, so
                # grams slice straight out of the bytes — one encode
                # per document instead of one per gram.
                npos = len(b) - _WK + 1
                digs = b"".join(
                    [md5(b[j : j + _WK]).digest() for j in range(npos)]
                )
            else:
                npos = len(t) - _WK + 1
                digs = b"".join(
                    [
                        md5(t[j : j + _WK].encode("utf-8")).digest()
                        for j in range(npos)
                    ]
                )
            # the first 8 digest bytes big-endian >> 4 IS the first 15
            # hex digits — one vectorized reinterpret of the joined
            # digests instead of per-gram int parsing (values < 2^60,
            # so the int64 view is sign-safe)
            h = (
                np.frombuffer(digs, dtype=">u8").reshape(npos, 2)[:, 0]
                >> four
            ).astype(np.int64)
            ids.append(i)
            fps.append(np.unique(swv(h, _WW).min(axis=1)))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "fps": pd.Series(fps, dtype="object"),
            }
        )




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
    # pays no text reshuffle).
    d = spread_scan(
        tables(spark, sf_dir)["documents"].filter(
            F.length("text") >= _WK + _WW - 1
        ),
        "doc_id",
    )
    # One Arrow kernel computes the whole per-document fingerprint set:
    # gram md5s (hashlib == the JVM md5+conv chain bit-for-bit), the
    # w-window minima as a numpy sliding-window reduce, and the
    # per-doc distinct. The r9 shape (explode positions → codegen md5
    # per row → partitioned window min → global distinct) paid a
    # 22M-row exchange + SORT at sf1 and a 4.8M-row distinct shuffle on
    # top; winnowing is per-document math, so it belongs map-side —
    # measured 6.5 s → sub-second for the hash+min+distinct front at
    # sf1, identical fingerprints (the DuckDB twin still re-derives
    # them from scratch with the window-min SQL).
    # Checkpoint the PER-DOC ARRAY frame, not the exploded index: at
    # sf10 that is 500k array rows instead of 52M (fp, doc_id) rows —
    # the checkpoint write and the sizes scan both shrink ~100x in row
    # overhead, and sizes falls out of F.size with no explode and no
    # groupBy at all (the kernel output is already per-doc distinct).
    sets = (
        d.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        .mapInPandas(_winnow_kernel, schema="doc_id long, fps array<long>")
        .localCheckpoint(eager=False)  # feeds sizes AND the pair join
    )
    sizes = sets.select(
        "doc_id", F.size("fps").cast("long").alias("n_fp")
    )
    fps = sets.select("doc_id", F.explode("fps").alias("fp"))
    stop = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > _MAX_DF)
        .select("fp")
    )
    idx = fps.join(F.broadcast(stop), "fp", "left_anti")
    # Scale-adaptive pair-join partitioning (r15 — the sf30 sweep died
    # in this join's 32-partition hash-table builds; see
    # operators.dedup._pair_join_partitions). The floor binds below
    # ~sf3, so local plans are unchanged.
    from ..operators.dedup import _pair_join_partitions

    n_part = _pair_join_partitions(d)
    if (
        n_part is not None
        and n_part > spark.sparkContext.defaultParallelism
    ):
        idx = idx.repartition(n_part, "fp")
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
    # Size attaches NOT explicitly broadcast (r15): the doc-size table
    # grows with the corpus and the forced form built a >128 MB hash
    # relation at sf30 in the sibling jaccard/containment kernel and
    # died; AQE broadcasts at runtime whenever the measured size fits.
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
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
