"""Round-11 query wave 2: three additions a large-scale training-data
pipeline actually runs — the Gopher repetition filters (the n-gram
repetition block of Rae et al. 2021 §A1.1, the part gopher_quality_rules'
length/stopword block does NOT cover), PII detection + redaction (the
scrub pass every open corpus release documents), and a MinHash
calibration audit (how well the 16-component signature estimate tracks
exact Jaccard, binned — the measurement that justifies the sketch's b×r
choice) — plus lineage_write_edges in lineage_queries.py.

Oracle style: repetition and PII are derived independently by both
engines from the same text (DuckDB list comprehensions / RE2 vs Spark
windows / Java regex — patterns chosen inside the common dialect);
the calibration query uses the portable md5-prefix 60-bit hash for its
signature so DuckDB replays the EXACT same minima, not a lookalike.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import shingle_sets
from .registry import q6, query, tables

# ---------------------------------------------------------------------------
# gopher_repetition_rules
# ---------------------------------------------------------------------------

#: Gopher-style repetition thresholds (fractions of doc characters):
#: most-frequent 2-gram, most-frequent 3-gram, characters inside
#: duplicated (count >= 2) 5-grams.
_T2, _T3, _TD5 = 0.20, 0.18, 0.90


@query(
    "gopher_repetition_rules",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, length(text) AS n_chars,
               list_filter(string_split_regex(trim(text), '\\s+'),
                           x -> length(x) > 0) AS ws
        FROM documents
    ),
    tok AS (
        SELECT doc_id, n_chars, unnest(ws) AS w,
               CAST(unnest(range(len(ws))) AS BIGINT) AS pos,
               len(ws) AS nw
        FROM t
    ),
    g AS (
        SELECT doc_id, n_chars, pos, nw,
               w || ' ' || lead(w, 1) OVER wd AS g2,
               lead(w, 1) OVER wd IS NOT NULL AS f2,
               w || ' ' || lead(w, 1) OVER wd || ' '
                 || lead(w, 2) OVER wd AS g3,
               lead(w, 2) OVER wd IS NOT NULL AS f3,
               w || ' ' || lead(w, 1) OVER wd || ' '
                 || lead(w, 2) OVER wd || ' ' || lead(w, 3) OVER wd
                 || ' ' || lead(w, 4) OVER wd AS g5,
               lead(w, 4) OVER wd IS NOT NULL AS f5
        FROM tok
        WINDOW wd AS (PARTITION BY doc_id ORDER BY pos)
    ),
    top2 AS (
        SELECT doc_id, cnt * length(g2) AS top_chars FROM (
            SELECT doc_id, g2, COUNT(*) AS cnt,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY COUNT(*) DESC, g2) AS rn
            FROM g WHERE f2 GROUP BY doc_id, g2) WHERE rn = 1
    ),
    top3 AS (
        SELECT doc_id, cnt * length(g3) AS top_chars FROM (
            SELECT doc_id, g3, COUNT(*) AS cnt,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY COUNT(*) DESC, g3) AS rn
            FROM g WHERE f3 GROUP BY doc_id, g3) WHERE rn = 1
    ),
    dup5 AS (
        SELECT doc_id,
               COALESCE(SUM(CASE WHEN cnt >= 2
                                 THEN cnt * length(g5) END), 0)
                   AS dup_chars
        FROM (SELECT doc_id, g5, COUNT(*) AS cnt
              FROM g WHERE f5 GROUP BY doc_id, g5)
        GROUP BY doc_id
    )
    SELECT t.doc_id,
           FLOOR(CAST(top2.top_chars AS DOUBLE) / t.n_chars
                 * 1000000 + 0.5) / 1000000 AS top2_frac,
           FLOOR(CAST(top3.top_chars AS DOUBLE) / t.n_chars
                 * 1000000 + 0.5) / 1000000 AS top3_frac,
           FLOOR(CAST(dup5.dup_chars AS DOUBLE) / t.n_chars
                 * 1000000 + 0.5) / 1000000 AS dup5_frac,
           CAST(CASE WHEN CAST(top2.top_chars AS DOUBLE) / t.n_chars
                          <= {_T2}
                      AND CAST(top3.top_chars AS DOUBLE) / t.n_chars
                          <= {_T3}
                      AND CAST(dup5.dup_chars AS DOUBLE) / t.n_chars
                          <= {_TD5}
                THEN 1 ELSE 0 END AS INT) AS keep
    FROM t JOIN top2 USING (doc_id) JOIN top3 USING (doc_id)
           JOIN dup5 USING (doc_id)
    WHERE len(t.ws) >= 5
    ORDER BY t.doc_id
    """,
)
def gopher_repetition_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher repetition filters (Rae et al. 2021, §A1.1): fraction
    of document characters inside the most frequent word 2-gram and
    3-gram, and inside DUPLICATED (count ≥ 2) 5-grams — the
    repetition-loop detector that catches boilerplate and degenerate
    generation which pure length/stopword rules (gopher_quality_rules)
    pass. Top-gram ties break (count DESC, gram ASC) so both engines
    pick the same winner; fractions normalize by raw character length.

    Scale shape (r14 rewrite, OPTIMIZATION_r14.md): grams are built
    ARRAY-SIDE from the token array (transform over an index sequence —
    no posexplode, no per-doc lead() window sort), and because the
    stream is hash-partitioned by doc_id, BOTH aggregations — the
    (doc, width, gram) count and the per-doc top-1/duplicated-mass
    fold — satisfy their clustering requirement on that single
    exchange: one shuffle carries the tokenized text, everything after
    runs exchange-free in-partition. The top-1 (count DESC, gram ASC)
    pick is a min(struct(-cnt, gram)) aggregate (the LPA max-struct
    discipline) instead of a row_number window, and n_chars rides the
    grouping keys so no join back is needed. The old shape paid a
    posexplode + 3-width lead() window sort, two row_number windows,
    and three doc-keyed joins over the same data (r14 A/B best-of-4
    at sf0.1: 2.18 → 1.25 s, and 4.49 → 2.15 s under heavier host
    load; plan 53 → 15 operators, exchanges 8 → 2 with the only
    remaining sorts the output order and the SortAggregate's bounded
    in-partition grouping sort). Docs under 5 words are excluded (no
    full 5-gram exists)."""
    d = (
        tables(spark, sf_dir)["documents"]
        .select(
            "doc_id",
            F.length("text").alias("n_chars"),
            # empty-token filter matches the oracle's list_filter —
            # F.trim strips spaces only, so text ending in \t/\n would
            # otherwise emit a phantom '' token on the Spark side only
            # (the r7_wave8/llm_extras tokenization discipline)
            F.filter(
                F.split(F.trim(F.col("text")), r"\s+"),
                lambda x: F.length(x) > 0,
            ).alias("ws"),
        )
        .filter(F.size("ws") >= 5)
        # the ONE exchange: parallelizes the single-row-group test scan
        # AND establishes the doc_id clustering both aggregates below
        # reuse (hash on a subset of the grouping keys satisfies
        # ClusteredDistribution — no further exchange is inserted).
        # Partition count = the session's core count, NOT the old
        # literal 32 (this exchange is now load-bearing and must scale
        # with the cluster) and NOT count-less repartition(col) — that
        # form is AQE-coalescible BY BYTES, and A/B showed AQE folding
        # this small-but-CPU-dense gram stage onto too few cores
        # (1.86 → 2.66 s); an explicit count is respected.
        .repartition(
            spark.sparkContext.defaultParallelism, "doc_id"
        )
    )

    def grams(width: int):
        # positions 0 .. size(ws)-width, gram = ws[i..i+width-1]
        return F.transform(
            F.sequence(F.lit(0), F.size("ws") - width),
            lambda i: F.struct(
                F.lit(width).alias("width"),
                F.concat_ws(
                    " ", *[F.get(F.col("ws"), i + j) for j in range(width)]
                ).alias("gram"),
            ),
        )

    g = d.select(
        "doc_id",
        "n_chars",
        F.explode(
            F.concat(grams(2), grams(3), grams(5))
        ).alias("e"),
    ).select("doc_id", "n_chars", "e.width", "e.gram")
    counted = g.groupBy("doc_id", "n_chars", "width", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # top-1 as min(struct(-cnt, gram)): smallest -cnt = largest count,
    # then lexicographically smallest gram — the exact row_number
    # (count DESC, gram ASC) tie-break, with no window sort
    def top_struct(width: int):
        return F.min(
            F.when(
                F.col("width") == width,
                F.struct((-F.col("cnt")).alias("nc"), F.col("gram").alias("g")),
            )
        )

    stats = counted.groupBy("doc_id", "n_chars").agg(
        top_struct(2).alias("t2"),
        top_struct(3).alias("t3"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("width") == 5) & (F.col("cnt") >= 2),
                    F.col("cnt") * F.length("gram"),
                )
            ),
            F.lit(0),
        ).alias("dup_chars"),
    )
    f2c = (
        (-F.col("t2.nc")) * F.length("t2.g")
    ).cast("double") / F.col("n_chars")
    f3c = (
        (-F.col("t3.nc")) * F.length("t3.g")
    ).cast("double") / F.col("n_chars")
    f5c = F.col("dup_chars").cast("double") / F.col("n_chars")
    return stats.select(
        "doc_id",
        q6(f2c).alias("top2_frac"),
        q6(f3c).alias("top3_frac"),
        q6(f5c).alias("dup5_frac"),
        F.when((f2c <= _T2) & (f3c <= _T3) & (f5c <= _TD5), 1)
        .otherwise(0)
        .cast("int")
        .alias("keep"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# pii_redaction_scan
# ---------------------------------------------------------------------------

#: Patterns inside the Java-regex ∩ RE2 common dialect (no backrefs, no
#: lookaround) so both engines match identically.
_RE_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_RE_PHONE = "\\+1-555-[0-9]{4}"
_RE_IP = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


@query(
    "pii_redaction_scan",
    oracle=f"""
    WITH w AS (
        SELECT doc_id,
               substring(text, 1, 40) || ' contact user' || doc_id
               || '@example.com or mirror-user' || doc_id
               || '@example.org tel +1-555-'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               || ' from 10.' || (doc_id % 256) || '.' || (doc_id % 100)
               || '.' || ((doc_id * 7) % 256) || ' end' AS s
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(s, '{_RE_EMAIL}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(s, '{_RE_PHONE}')) AS BIGINT)
               AS n_phones,
           CAST(len(regexp_extract_all(s, '{_RE_IP}')) AS BIGINT) AS n_ips,
           regexp_replace(regexp_replace(regexp_replace(s,
               '{_RE_EMAIL}', '[EMAIL]', 'g'),
               '{_RE_PHONE}', '[PHONE]', 'g'),
               '{_RE_IP}', '[IP]', 'g') AS redacted
    FROM w ORDER BY doc_id
    """,
)
def pii_redaction_scan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction — the scrub pass every public-corpus
    release runs before training: count and replace emails, phone
    numbers, and private-range IPs with typed placeholders. The corpus
    is synthetic, so deterministic PII is injected per doc (two emails,
    one phone, one 10.x IP derived from doc_id) and both engines must
    find EXACTLY the injected set and produce byte-identical redacted
    text. Patterns live in the Java-regex ∩ RE2 common dialect.

    Scale shape: pure map-side regex chain over one scan — the same
    whole-stage-codegen shape as extractTextFromHTML; counts via
    regexp_extract_all size, no shuffle (ORDER BY is the harness
    canonicalizer)."""
    d = tables(spark, sf_dir)["documents"]
    s = F.concat(
        F.substring("text", 1, 40),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or mirror-user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.org tel +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        (F.col("doc_id") % 100).cast("string"),
        F.lit("."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
        F.lit(" end"),
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(s, _RE_EMAIL, "[EMAIL]"),
            _RE_PHONE,
            "[PHONE]",
        ),
        _RE_IP,
        "[IP]",
    )
    return (
        d.select(
            "doc_id",
            F.size(F.regexp_extract_all(s, F.lit(_RE_EMAIL), F.lit(0)))
            .cast("long")
            .alias("n_emails"),
            F.size(F.regexp_extract_all(s, F.lit(_RE_PHONE), F.lit(0)))
            .cast("long")
            .alias("n_phones"),
            F.size(F.regexp_extract_all(s, F.lit(_RE_IP), F.lit(0)))
            .cast("long")
            .alias("n_ips"),
            red.alias("redacted"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# minhash_estimate_calibration
# ---------------------------------------------------------------------------

_CAL_DOCS = 200  # dense-pair frame: C(200,2) = 19,900 pairs
_CAL_H = 16  # signature components


def _h60_sql(i: int, g: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('{i}:' || {g}), 1, 15)) AS BIGINT)"
    )


@query(
    "minhash_estimate_calibration",
    oracle=f"""
    WITH w AS (SELECT doc_id,
                      list_filter(string_split_regex(trim(text), '\\s+'),
                                  x -> length(x) > 0) AS ws
               FROM documents WHERE doc_id < {_CAL_DOCS}),
    sh AS (SELECT doc_id,
                  list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                 for i in range(1, len(ws) - 1)]) AS s
           FROM w WHERE len(ws) >= 3),
    ix AS (SELECT doc_id, unnest(s) AS g FROM sh),
    sig AS (
        SELECT doc_id,
               {", ".join(f"MIN({_h60_sql(i, 'g')}) AS h{i}"
                          for i in range(_CAL_H))}
        FROM ix GROUP BY doc_id
    ),
    dense AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ({" + ".join(f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END"
                            for i in range(_CAL_H))}) AS est_matches
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    ),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS DOUBLE) AS inter
        FROM ix a JOIN ix b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, len(s) AS sz FROM sh),
    exact AS (
        SELECT d.id_a, d.id_b, d.est_matches,
               COALESCE(i.inter, 0)
                   / (sa.sz + sb.sz - COALESCE(i.inter, 0)) AS jacc
        FROM dense d
        LEFT JOIN inter i ON d.id_a = i.id_a AND d.id_b = i.id_b
        JOIN sizes sa ON d.id_a = sa.doc_id
        JOIN sizes sb ON d.id_b = sb.doc_id
    )
    SELECT CAST(est_matches AS BIGINT) AS est_matches,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           FLOOR(AVG(jacc) * 1000000 + 0.5) / 1000000 AS mean_exact_jacc,
           FLOOR(MAX(jacc) * 1000000 + 0.5) / 1000000 AS max_exact_jacc
    FROM exact GROUP BY 1 ORDER BY 1
    """,
)
def minhash_estimate_calibration_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MinHash calibration audit: over a dense {_CAL_DOCS}-doc pair
    frame, compare the {_CAL_H}-component signature estimate
    (matching-minima count) against EXACT word-3-gram Jaccard, binned by
    the estimate — the curve that tells you whether a b×r LSH setting's
    S-curve assumptions hold on YOUR corpus (the sketch-quality
    measurement behind dedup_minhash_lsh's parameters). The signature
    uses the portable md5-prefix 60-bit hash so DuckDB reproduces the
    exact minima — this is the engine-portable twin of the production
    xxhash64 signature (same algorithm, slower hash), NOT a lookalike.

    Scale shape: the dense pair frame is deliberately capped (the POINT
    is a calibration table, constant-size output); signatures come from
    one explode + {_CAL_H}-way min agg; exact intersections ride the
    inverted-index discipline. The ~{_CAL_DOCS}² signature self-join is
    a broadcast of a {_CAL_DOCS}-row frame — constant, never
    data-sized."""
    docs = (
        tables(spark, sf_dir)["documents"]
        .filter(F.col("doc_id") < _CAL_DOCS)
    )
    sets = shingle_sets(docs, "doc_id", "text", 3).localCheckpoint(
        eager=False
    )
    ix = sets.select("id", F.explode("shingles").alias("g"))

    def h60(i: int):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{i}:"), F.col("g"))), 1, 15
            ),
            16,
            10,
        ).cast("long")

    sig = ix.groupBy("id").agg(
        *[F.min(h60(i)).alias(f"h{i}") for i in range(_CAL_H)]
    )
    est = None
    for i in range(_CAL_H):
        term = F.when(
            F.col(f"a.h{i}") == F.col(f"b.h{i}"), 1
        ).otherwise(0)
        est = term if est is None else est + term
    dense = (
        sig.alias("a")
        .join(
            F.broadcast(sig.alias("b")),
            F.col("a.id") < F.col("b.id"),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            est.alias("est_matches"),
        )
    )
    inter = (
        ix.alias("a")
        .join(
            ix.alias("b").hint("shuffle_hash"),
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("inter"))
    )
    sizes = sets.select("id", F.size("shingles").alias("sz"))
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("szb"))
    jacc = F.coalesce(F.col("inter"), F.lit(0.0)) / (
        F.col("sza") + F.col("szb") - F.coalesce(F.col("inter"), F.lit(0.0))
    )
    exact = (
        dense.join(inter, ["id_a", "id_b"], "left")
        .join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select("est_matches", jacc.alias("jacc"))
    )
    return (
        exact.groupBy(F.col("est_matches").cast("long").alias("est_matches"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            q6(F.avg("jacc")).alias("mean_exact_jacc"),
            q6(F.max("jacc")).alias("max_exact_jacc"),
        )
        .orderBy("est_matches")
    )
