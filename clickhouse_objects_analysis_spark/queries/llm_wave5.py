"""Curation wave 5: redaction, per-source throttling, length winsorization.

Three pipeline stages a 100 TB pretraining-data curation run needs between
dedup and packing:

- ``pii_scrub`` — denylist/PII pattern redaction (the regexp machinery of a
  real PII pass: email/phone patterns swap in for the demo denylist with no
  plan change; the testdata corpus is synthetic word-salad, so the
  denylist uses terms that actually occur).
- ``source_cap`` — per-source document cap (the "domain throttle" of
  crawl curation: no single domain may dominate the mixture), selection
  deterministic by content-independent hash so reruns keep identical docs.
- ``winsorize_doclen`` — clamp the document-length distribution at the
  exact P01/P99 quantiles (outlier damping before length-balanced
  packing).

All three are single-shuffle shapes: a narrow per-row map (regexp),
one window over the source partitioning, one global two-quantile
aggregate broadcast back. No Python UDFs — everything stays in
whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import query, tables

#: Denylist pattern — \b word-boundary semantics agree between Java regex
#: (Spark) and RE2 (DuckDB) for ASCII word chars.
_DENY = r"\b(customer|value|key)\b"


@query(
    "pii_scrub",
    oracle=r"""
    SELECT doc_id,
           CAST(length(regexp_extract_all(text, '\b(customer|value|key)\b'))
                AS BIGINT) AS n_hits,
           CAST(length(regexp_replace(text, '\b(customer|value|key)\b',
                                      '[REDACTED]', 'g')) AS BIGINT)
               AS clean_len,
           md5(regexp_replace(text, '\b(customer|value|key)\b',
                              '[REDACTED]', 'g')) AS clean_md5
    FROM documents
    ORDER BY doc_id
    """,
)
def pii_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern redaction over the corpus: count hits, emit the scrubbed
    text's length and digest (the digest proves byte-identical rewrites
    without hashing megabytes of text through the comparison harness).

    Scale shape: per-row regexp in whole-stage codegen, zero shuffles —
    the ideal 100 TB map stage. A real PII pass swaps the pattern for
    email/phone/SSN alternations and chains several regexp_replace calls;
    the plan is unchanged."""
    d = tables(spark, sf_dir)["documents"]
    clean = F.regexp_replace("text", _DENY, "[REDACTED]")
    return (
        d.select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit(_DENY), 0))
            .cast("long")
            .alias("n_hits"),
            F.length(clean).cast("long").alias("clean_len"),
            F.md5(clean).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


@query(
    "source_cap",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    SELECT doc_id, source, rn
    FROM ranked WHERE rn <= 15
    ORDER BY source, rn
    """,
)
def source_cap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (domain throttling): keep at most 15 docs
    per source, chosen by a deterministic content-independent hash order —
    a rerun, a resharded input, or a different engine keeps the SAME
    documents (md5 of the key, not rand()).

    Scale shape: one shuffle on source, one window, immediate filter —
    rows beyond the cap never leave the window stage. With millions of
    domains the partitioning is fine-grained; a single mega-domain is
    exactly the skew AQE's window path tolerates (the cap discards its
    tail anyway)."""
    d = tables(spark, sf_dir)["documents"]
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 15)
        .orderBy("source", "rn")
    )


@query(
    "winsorize_doclen",
    oracle="""
    WITH q AS (
        SELECT quantile_cont(n_chars, 0.01) AS p01,
               quantile_cont(n_chars, 0.99) AS p99
        FROM documents
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(ROUND(AVG(d.n_chars), 4) AS DOUBLE) AS mean_raw,
           CAST(ROUND(
               CAST(SUM(CAST(LEAST(GREATEST(d.n_chars, q.p01), q.p99)
                             AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*),
               4) AS DOUBLE) AS mean_winsorized
    FROM documents d, q
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def winsorize_doclen_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorize the length distribution: exact P01/P99 over the corpus,
    clamp, per-source means. n_chars is integral so its raw mean is exact
    in any order; the CLAMPED value is an interpolated-quantile double, so
    its sum goes through DECIMAL(38,6) before the one double division.

    Scale shape: the two quantiles are ONE global exact-percentile
    aggregate (at 100 TB swap in approx_percentile and re-oracle as
    rows-only — the plan shape is identical), broadcast back via a one-row
    cross join; then an ordinary per-source aggregate."""
    d = tables(spark, sf_dir)["documents"]
    q = d.agg(
        F.percentile("n_chars", F.array(F.lit(0.01), F.lit(0.99))).alias("__q")
    ).select(F.col("__q")[0].alias("p01"), F.col("__q")[1].alias("p99"))
    clamped = F.least(F.greatest(F.col("n_chars"), F.col("p01")), F.col("p99"))
    return (
        d.crossJoin(F.broadcast(q))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).cast("double").alias("mean_raw"),
            F.round(
                F.sum(clamped.cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1)),
                4,
            )
            .cast("double")
            .alias("mean_winsorized"),
        )
        .orderBy("source")
    )


@query(
    "decontaminate_exact_substring",
    oracle="""
    WITH evals AS (
        SELECT doc_id AS eval_id,
               substr(text, 21, 12) AS passage
        FROM documents
        WHERE doc_id % 97 = 0 AND length(text) >= 40
    ),
    hits AS (
        SELECT d.doc_id, e.eval_id
        FROM documents d JOIN evals e
          ON d.doc_id <> e.eval_id
         AND position(e.passage IN d.text) > 0
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_eval_hits,
           CAST(MIN(eval_id) AS BIGINT) AS first_eval_id
    FROM hits GROUP BY doc_id ORDER BY doc_id
    """,
)
def decontaminate_exact_substring_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring decontamination (the GPT-3/PaLM-style verbatim
    check, complementing the n-gram-overlap variant in llm_extras): flag
    training documents containing any eval passage verbatim. The eval
    side is a bounded benchmark set → broadcast; the train corpus streams
    through a BroadcastNestedLoop contains-join, which IS the
    scale-correct shape here: no join key exists, the broadcast side is
    ~kB-sized, and the 100 TB side is never shuffled. For eval sets too
    big to nested-loop, the n-gram variant (hash-join on shingles) is the
    documented escalation path."""
    d = tables(spark, sf_dir)["documents"]
    evals = d.filter(
        (F.col("doc_id") % 97 == 0) & (F.length("text") >= 40)
    ).select(
        F.col("doc_id").alias("eval_id"),
        # 12-char passages: the synthetic word-salad corpus has no long
        # verbatim repeats, so a realistic 50-gram passage would make this
        # check vacuously empty — short passages exercise the operator;
        # the passage length is a parameter in a real pipeline.
        F.substring("text", 21, 12).alias("passage"),
    )
    hits = d.join(
        F.broadcast(evals),
        (F.col("doc_id") != F.col("eval_id"))
        & (F.col("text").contains(F.col("passage"))),
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_eval_hits"),
            F.min("eval_id").alias("first_eval_id"),
        )
        .orderBy("doc_id")
    )


@query(
    "multi_search_any",
    oracle="""
    SELECT doc_id,
           CAST(CASE WHEN position('spark' IN text) > 0
                      OR position('vector' IN text) > 0
                      OR position('stream' IN text) > 0
                THEN 1 ELSE 0 END AS INT) AS has_any,
           CAST((CASE WHEN position('spark' IN text) > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN position('vector' IN text) > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN position('stream' IN text) > 0 THEN 1 ELSE 0 END)
                AS INT) AS n_terms
    FROM documents ORDER BY doc_id
    """,
)
def multi_search_any_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``multiSearchAny(text, ['spark','vector','stream'])``
    plus the per-term hit count (multiMatchAny family; generic function
    rule ClickHouseParser.py:15571). Plain substring containment — no
    regex engine — in whole-stage codegen; the term list is a literal
    (broadcast-free). The keyword-filter primitive of corpus triage."""
    d = tables(spark, sf_dir)["documents"]
    terms = ["spark", "vector", "stream"]
    flags = [
        F.when(F.col("text").contains(t), 1).otherwise(0) for t in terms
    ]
    n_terms = flags[0] + flags[1] + flags[2]
    return d.select(
        "doc_id",
        F.when(n_terms > 0, 1).otherwise(0).cast("int").alias("has_any"),
        n_terms.cast("int").alias("n_terms"),
    ).orderBy("doc_id")
