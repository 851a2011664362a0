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
from pyspark.sql import DataFrame, SparkSession

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
    boilerplate_span_scrub_q for the scale analysis.

    r14 rewrite (OPTIMIZATION_r14.md): grams are built ARRAY-SIDE from
    the token array (no posexplode + per-doc lead() window sort), and
    the per-token anti-join + positional collect_list reassembly are
    replaced by array ops on the doc row — each doc's frequent-span hit
    positions come back as ONE small array (the only doc-keyed shuffle,
    hit-sized not token-sized), coverage expansion and the keep-filter
    run as higher-order functions map-side.

    r15 rewrite (OPTIMIZATION_r15.md, VERDICT r14 #1): every gram is
    keyed by ``xxhash64(gram)`` — the jaccard-kernel 8-byte-key
    discipline. Per-doc DISTINCT hashes come from ``array_distinct``
    on the doc row, so the span-df aggregate is a plain map-side-
    combined count over longs (the r14 shape shuffled the 5-token
    STRING + doc_id through count_distinct's two-phase distinct — the
    driver-confirmed sf0.1 regression, 1.83→2.50 s). The gram string
    never leaves the map side. Identical output as long as no two
    distinct grams collide in 64 bits (oracle-verified at the tested
    SFs; ~n²/2⁶⁵ for n distinct grams).

    The hit explode MUST be ``posexplode_outer``: with the plain inner
    generator, Catalyst's InferFiltersFromGenerate inserts a
    size(...)>0 filter that re-evaluates the interpreted gram-hash
    transform twice with ``split(text)`` re-inlined PER ELEMENT
    (measured 30×: 11 s vs 0.4 s at sf0.1); the outer form is exempt
    from that rule and the null row of a short doc is dropped by the
    inner join on h."""
    d = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    base = d.select("doc_id", F.split("text", " ").alias("ws"))
    # full-gram start positions 0 .. size(ws)-ngram; shorter docs have
    # no full gram (sequence() would generate a DESCENDING range there,
    # hence the guard)
    gh = F.when(
        F.size("ws") >= ngram,
        F.transform(
            F.sequence(F.lit(0), F.size("ws") - ngram),
            lambda i: F.xxhash64(
                F.concat_ws(
                    " ", *[F.get(F.col("ws"), i + j) for j in range(ngram)]
                )
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    hb = base.select("doc_id", gh.alias("gh"))
    frequent = (
        hb.select(F.explode(F.array_distinct("gh")).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("h")
    )
    # AQE broadcasts `frequent` at any sane min_df; at 100 TB an
    # over-threshold span set degrades to a shuffle join, never OOM
    hit_pos = (
        hb.select("doc_id", F.posexplode_outer("gh").alias("pos", "h"))
        .join(frequent, "h")
        .groupBy("doc_id")
        .agg(F.collect_list("pos").alias("hits"))
    )
    covered = F.array_distinct(
        F.flatten(
            F.transform("hits", lambda p: F.sequence(p, p + (ngram - 1)))
        )
    )
    joined = base.join(hit_pos, "doc_id", "left").withColumn(
        "cov", F.coalesce(covered, F.array().cast("array<int>"))
    )
    kept = F.filter(
        "ws", lambda x, i: ~F.array_contains(F.col("cov"), i)
    )
    return joined.select(
        F.col("doc_id").alias(id_col),
        F.concat_ws(" ", kept).alias("scrubbed_text"),
        (F.size("ws") - F.size(kept)).cast("long").alias("n_removed"),
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
    """Cross-document boilerplate span removal: form 5-token spans from
    each doc's token array, find spans occurring in >= 3 distinct docs,
    pull each doc's hit positions back as one array, and scrub/reassemble
    map-side with higher-order array functions (scrub_boilerplate_spans —
    the r14 array-side shape; the oracle keeps the window/anti-join
    formulation, which is the equivalence proof).

    Scale shape: the span df-count is one map-side-combined aggregate;
    the only doc-keyed shuffle carries hit POSITIONS (ints, hit-sized);
    the token stream itself never shuffles. At 100 TB the frequent-span
    set is the only candidate broadcast and AQE may degrade that join to
    a shuffle, never an OOM."""
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
