"""Round-4 LLM-data wave: text REWRITE operators (the earlier waves
filter, score, split, pack — these change the text itself).

boilerplate_span_scrub is the C4/RefinedWeb-style global boilerplate
pass: any 5-token span appearing in >= MIN_DF distinct documents is
boilerplate (nav bars, license footers, templated headers); every token
covered by such a span is removed and the document reassembled. The
whole operator is joins + windows + aggregates — no Python in the loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import query, tables

_NGRAM = 5
_MIN_DF = 3


def scrub_boilerplate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 5,
    min_df: int = 3,
) -> DataFrame:
    """Remove every token covered by an ``ngram``-token span that occurs
    in >= ``min_df`` distinct documents, and reassemble the text.
    Returns (id_col, scrubbed_text, n_removed). See
    boilerplate_span_scrub_q for the scale analysis."""
    d = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    sh = tok.select(
        "doc_id",
        "pos",
        F.concat_ws(
            " ",
            "w",
            *[F.lead("w", i).over(wd) for i in range(1, ngram)],
        ).alias("s"),
        F.lead("w", ngram - 1).over(wd).isNotNull().alias("is_full"),
    )
    occurrences = sh.filter("is_full")
    frequent = (
        occurrences.groupBy("s")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("s")
    )
    covered = (
        occurrences.join(frequent, "s")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (ngram - 1))
            ).alias("cpos"),
        )
        .distinct()
    )
    kept = tok.join(
        covered,
        (tok["doc_id"] == covered["doc_id"])
        & (tok["pos"] == covered["cpos"]),
        "left_anti",
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "w"))),
                lambda st: st["w"],
            ),
            " ",
        ).alias("scrubbed"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    orig = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_orig")
    )
    return orig.join(rebuilt, "doc_id", "left").select(
        F.col("doc_id").alias(id_col),
        F.coalesce(F.col("scrubbed"), F.lit("")).alias("scrubbed_text"),
        (F.col("n_orig") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
    )


@query(
    "boilerplate_span_scrub",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(ws) AS w,
               CAST(unnest(range(len(ws))) AS BIGINT) AS pos
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    sh AS (
        SELECT doc_id, pos,
               concat_ws(' ', w,
                         lead(w, 1) OVER wd, lead(w, 2) OVER wd,
                         lead(w, 3) OVER wd, lead(w, 4) OVER wd) AS s,
               lead(w, {_NGRAM - 1}) OVER wd IS NOT NULL AS is_full
        FROM tok
        WINDOW wd AS (PARTITION BY doc_id ORDER BY pos)
    ),
    frequent AS (
        SELECT s FROM sh WHERE is_full
        GROUP BY s HAVING COUNT(DISTINCT doc_id) >= {_MIN_DF}
    ),
    covered AS (
        SELECT DISTINCT o.doc_id, o.pos + r.r AS cpos
        FROM (SELECT doc_id, pos FROM sh
              WHERE is_full AND s IN (SELECT s FROM frequent)) o,
             (SELECT unnest(range({_NGRAM})) AS r) r
    ),
    kept AS (
        SELECT t.doc_id, t.w, t.pos
        FROM tok t LEFT JOIN covered c
          ON t.doc_id = c.doc_id AND t.pos = c.cpos
        WHERE c.doc_id IS NULL
    ),
    rebuilt AS (
        SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS scrubbed,
               COUNT(*) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(r.scrubbed, '') AS scrubbed_text,
           CAST(len(string_split(d.text, ' '))
                - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
    FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
    ORDER BY d.doc_id
    """,
)
def boilerplate_span_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate span removal: tokenize with positions,
    form 5-token shingles via lead() windows, find shingles occurring in
    >= 3 distinct docs, expand their occurrences to covered position
    ranges, anti-join tokens against covered positions, reassemble in
    position order.

    Scale shape: the shingle df-count is one map-side-combined aggregate
    on the shingle hash; occurrence expansion is sequence+explode (5 rows
    per hit); the anti-join shuffles (doc_id, pos) pairs — narrow ints,
    not text. At 100 TB the frequent-shingle set is the only candidate
    broadcast, and it is df-capped by construction (same guard as
    ngram_jaccard's max_df). Reassembly is the nested_type_roundtrip
    pattern: partial collect_list before the shuffle, array ops JVM-side.
    """
    d = tables(spark, sf_dir)["documents"]
    return scrub_boilerplate_spans(
        d, "doc_id", "text", ngram=_NGRAM, min_df=_MIN_DF
    ).orderBy("doc_id")


from ..operators.dedup import simhash  # noqa: E402
from .llm import _simhash_oracle  # noqa: E402


@query(
    "simhash_hamming_pairs",
    oracle=f"""
    WITH sh AS ({_simhash_oracle(order_by=False)}),
    bands AS (
        SELECT id, simhash, b.b AS band_id,
               (simhash >> (8 * b.b)) & 255 AS band_val
        FROM sh, (SELECT unnest(range(4)) AS b) b
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b,
               a.simhash AS sa, b.simhash AS sb
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_val = b.band_val
         AND a.id < b.id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 3
    ORDER BY id_a, id_b
    """,
)
def simhash_hamming_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= 3 — the fingerprint
    follow-up to dedup_simhash: band each 32-bit fingerprint into 4
    bytes; by pigeonhole, any pair within distance 3 shares at least one
    intact byte, so candidates come from 4 tiny band-bucket self-joins
    (shuffle on (band, byte) — never all-pairs), then the exact popcount
    of the XOR filters. The oracle rebuilds the identical portable
    fingerprints in SQL and mirrors the banding. Scale shape: this IS
    the Manku/Google simhash dedup layout — at 100 TB the bands become
    the partition key and each bucket stays tiny."""
    d = tables(spark, sf_dir)["documents"]
    fp = simhash(d, "doc_id", "text")
    bands = fp.select(
        "id",
        "simhash",
        F.explode(F.array(*[F.lit(b) for b in range(4)])).alias("band_id"),
    ).withColumn(
        "band_val", F.expr("shiftright(simhash, 8 * band_id) & 255")
    )
    a = bands.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sa"),
        "band_id", "band_val",
    )
    b = bands.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sb"),
        "band_id", "band_val",
    )
    cand = (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sa", "sb")
        .distinct()
    )
    ham = F.bit_count(F.expr("sa ^ sb"))
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )
