"""Third wave of LLM-training-pipeline operators: benchmark
decontamination, within-document repetition filtering (Gopher-style),
normalization-robust exact dedup, reproducible train/val/test splits,
mixture rebalancing to a uniform source mix, and per-label embedding
centroids.

These extend the reference's analytic surface the way a pretraining data
pipeline needs (north-star requirement in BASELINE.json); each is a
``queries()`` entry with a DuckDB oracle on the synthetic ``documents`` /
``embeddings`` tables.

Float-parity discipline (same contract as llm_extras): every ratio is a
single double division of integer aggregates (IEEE-deterministic across
engines), every rounded value is ROUND(x, 6) of such a quantity, and
rounding of raw floats uses the explicit floor(x*s + 0.5) rule so both
engines apply the identical half-up convention. Flags are emitted as INT
0/1, not BOOLEAN, so value hashing never depends on engine bool
representation.

Scale notes per query are in the docstrings; the common theme: one
map-side-combined aggregate per stage, broadcast for vocabulary-sized
sides, and Arrow-batched per-document loops (never per-row Python) where
expression-tree n-gram work would fall out of codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.dedup import shingle_sets
from ..operators.text import hash64
from .llm import _SHINGLE_CTE
from .registry import query, tables

#: DuckDB twin of operators.text.hash64 over an expression.
_HASH64 = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"

# Deterministic eval-set membership for decontamination: every 17th doc
# plays the role of the held-out benchmark.
_EVAL_MOD = 17


@query(
    "decontaminate_ngram_overlap",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
    ev AS (SELECT DISTINCT g FROM ex WHERE doc_id % {_EVAL_MOD} = 0),
    tr AS (SELECT doc_id, g FROM ex WHERE doc_id % {_EVAL_MOD} <> 0),
    st AS (SELECT tr.doc_id,
                  COUNT(*) AS n_shingles,
                  COUNT(ev.g) AS n_shared
           FROM tr LEFT JOIN ev ON tr.g = ev.g
           GROUP BY tr.doc_id)
    SELECT doc_id,
           CAST(n_shingles AS BIGINT) AS n_shingles,
           CAST(n_shared AS BIGINT) AS n_shared,
           ROUND(CAST(n_shared AS DOUBLE) / n_shingles, 6) AS overlap_ratio,
           CAST(CASE WHEN CAST(n_shared AS DOUBLE) / n_shingles >= 0.5
                THEN 1 ELSE 0 END AS INT) AS contaminated
    FROM st ORDER BY doc_id
    """,
)
def decontaminate_ngram_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the n-gram-overlap check every serious
    pretraining pipeline runs before training (flag training documents
    sharing word-trigrams with a held-out eval set). Eval membership is
    ``doc_id % 17 == 0``; a train doc is contaminated when >= 50% of its
    distinct trigrams appear anywhere in the eval set.

    Scale shape: the eval shingle vocabulary is benchmark-sized (eval sets
    are thousands of docs, not billions), so it broadcasts; the train side
    streams through a map-side LEFT join against that broadcast set and one
    combined groupBy(doc_id). No shuffle of document text — only the
    (doc_id, gram-hit) stream. At 100 TB the broadcast set is the only
    state each executor holds."""
    d = tables(spark, sf_dir)["documents"]
    # Checkpoint: both the eval-set branch and the train branch consume
    # the exploded shingle stream — without it the Arrow shingle pass
    # runs twice.
    ex = shingle_sets(d, "doc_id", "text").select(
        F.col("id").alias("doc_id"), F.explode("shingles").alias("g")
    ).localCheckpoint(eager=False)
    ev = (
        ex.filter(F.col("doc_id") % _EVAL_MOD == 0)
        .select("g")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    tr = ex.filter(F.col("doc_id") % _EVAL_MOD != 0)
    st = (
        tr.join(F.broadcast(ev), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__hit").alias("n_shared"),
        )
    )
    ratio = F.col("n_shared").cast("double") / F.col("n_shingles")
    return st.select(
        "doc_id",
        "n_shingles",
        "n_shared",
        F.round(ratio, 6).alias("overlap_ratio"),
        F.when(ratio >= 0.5, 1).otherwise(0).cast("int").alias("contaminated"),
    ).orderBy("doc_id")


@query(
    "repetition_ngram_filter",
    oracle="""
    WITH w AS (SELECT doc_id,
                      list_filter(string_split_regex(trim(text), '\\s+'),
                                  x -> length(x) > 0) AS ws
               FROM documents),
    g AS (SELECT doc_id,
                 [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                  for i in range(1, len(ws) - 1)] AS gs
          FROM w WHERE len(ws) >= 3),
    ex AS (SELECT doc_id, unnest(gs) AS g FROM g),
    cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM ex GROUP BY doc_id, g),
    st AS (SELECT doc_id,
                  CAST(SUM(c) AS BIGINT) AS total_ngrams,
                  CAST(COUNT(*) AS BIGINT) AS distinct_ngrams,
                  CAST(MAX(c) AS BIGINT) AS top_ngram_count
           FROM cnt GROUP BY doc_id)
    SELECT doc_id, total_ngrams, distinct_ngrams, top_ngram_count,
           ROUND(CAST(total_ngrams - distinct_ngrams AS DOUBLE)
                 / total_ngrams, 6) AS dup_frac,
           ROUND(CAST(top_ngram_count AS DOUBLE) / total_ngrams, 6)
               AS top_frac,
           CAST(CASE WHEN CAST(total_ngrams - distinct_ngrams AS DOUBLE)
                          / total_ngrams > 0.1
                THEN 1 ELSE 0 END AS INT) AS flagged
    FROM st ORDER BY doc_id
    """,
)
def repetition_ngram_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition filter — the Gopher-rules check that
    drops boilerplate/spam documents whose n-grams repeat (duplicate
    trigram fraction and top-trigram mass per doc; flagged when >10% of
    trigram occurrences are repeats).

    Scale shape: per-document work is Arrow-batched (one Counter pass per
    doc inside mapInPandas — the n-gram slice/concat expression form is
    CodegenFallback and measured ~40x slower on the shingle front in
    round 1, SCALE.md). Emits one 4-int row per document, so nothing
    document-sized ever shuffles; the derived ratios are plain codegen
    projections. Embarrassingly parallel at any scale."""
    import re

    ws_re = re.compile(r"\s+")

    def gen(batches):
        from collections import Counter

        for pdf in batches:
            rows = {"doc_id": [], "total_ngrams": [], "distinct_ngrams": [], "top_ngram_count": []}
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                ws = [w for w in ws_re.split((t or "").strip()) if w]
                if len(ws) < 3:
                    continue
                c = Counter(
                    " ".join(ws[j : j + 3]) for j in range(len(ws) - 2)
                )
                rows["doc_id"].append(i)
                rows["total_ngrams"].append(sum(c.values()))
                rows["distinct_ngrams"].append(len(c))
                rows["top_ngram_count"].append(max(c.values()))
            import pandas as pd

            yield pd.DataFrame(rows)

    d = tables(spark, sf_dir)["documents"].select("doc_id", "text")
    st = d.mapInPandas(
        gen,
        schema="doc_id long, total_ngrams long, distinct_ngrams long, "
        "top_ngram_count long",
    )
    dup_frac = (
        (F.col("total_ngrams") - F.col("distinct_ngrams")).cast("double")
        / F.col("total_ngrams")
    )
    return st.select(
        "doc_id",
        "total_ngrams",
        "distinct_ngrams",
        "top_ngram_count",
        F.round(dup_frac, 6).alias("dup_frac"),
        F.round(
            F.col("top_ngram_count").cast("double") / F.col("total_ngrams"), 6
        ).alias("top_frac"),
        F.when(dup_frac > 0.1, 1).otherwise(0).cast("int").alias("flagged"),
    ).orderBy("doc_id")


@query(
    "normalize_text_dedup",
    oracle=f"""
    WITH n AS (SELECT doc_id,
                      trim(regexp_replace(regexp_replace(lower(text),
                           '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))
                          AS norm
               FROM documents),
    h AS (SELECT doc_id, {_HASH64.format(expr='norm')} AS norm_hash FROM n),
    g AS (SELECT norm_hash,
                 MIN(doc_id) AS canonical_id,
                 COUNT(*) AS group_size
          FROM h GROUP BY norm_hash)
    SELECT h.doc_id, h.norm_hash, g.canonical_id,
           CAST(g.group_size AS BIGINT) AS group_size,
           CAST(CASE WHEN h.doc_id <> g.canonical_id THEN 1 ELSE 0 END
                AS INT) AS is_dup
    FROM h JOIN g USING (norm_hash)
    ORDER BY doc_id
    """,
)
def normalize_text_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-robust exact dedup — lowercase, strip non-alphanumeric,
    collapse whitespace, then hash-group (the standard pre-pass that
    catches near-identical documents differing only in case/punctuation,
    run before the more expensive MinHash stage).

    Scale shape: normalization and hashing are codegen string expressions
    evaluated ONCE per row; the only shuffle is one hash partition on the
    8-byte norm_hash with a partitioned window for canonical-id/size
    (the r5 sf1 sweep showed the previous groupBy + self-join shape
    re-running the regex normalization on a second lineage — the regex
    passes dominate this query, so compute-once halves it). Group sizes
    are duplicate-cluster sizes: bounded, no skew hazard."""
    from pyspark.sql import Window

    d = tables(spark, sf_dir)["documents"]
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", ""),
            r"\s+",
            " ",
        )
    )
    h = d.select("doc_id", hash64(norm).alias("norm_hash"))
    wh = Window.partitionBy("norm_hash")
    return (
        h.withColumn("canonical_id", F.min("doc_id").over(wh))
        .withColumn("group_size", F.count(F.lit(1)).over(wh))
        .select(
            "doc_id",
            "norm_hash",
            "canonical_id",
            "group_size",
            F.when(F.col("doc_id") != F.col("canonical_id"), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_dup"),
        )
        .orderBy("doc_id")
    )


@query(
    "train_val_test_split",
    oracle=f"""
    WITH s AS (SELECT source, n_chars,
                      {_HASH64.format(expr="CAST(doc_id AS VARCHAR) || ':split'")}
                          % 100 AS bucket
               FROM documents)
    SELECT source,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM s GROUP BY 1, 2 ORDER BY source, split
    """,
)
def train_val_test_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 train/val/test split — assignment is a pure
    function of doc_id (portable salted hash mod 100), so re-runs, engine
    swaps, and retried tasks all agree; reported as per-source split
    audit counts.

    Scale shape: the split column is a map-side codegen expression (no
    shuffle to assign); the audit aggregate is one map-side-combined
    groupBy over ~sources x 3 groups. Writing the actual split would add
    a partitionBy('split') sink with zero extra shuffle."""
    d = tables(spark, sf_dir)["documents"]
    bucket = F.pmod(
        hash64(F.concat(F.col("doc_id").cast("string"), F.lit(":split"))), 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select("source", "n_chars", split.alias("split"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("source", "split")
    )


@query(
    "mixture_rebalance_uniform",
    oracle=f"""
    WITH c AS (SELECT source, COUNT(*) AS n_total
               FROM documents GROUP BY source),
    m AS (SELECT MIN(n_total) AS min_n FROM c),
    r AS (SELECT c.source, c.n_total,
                 CAST(m.min_n AS DOUBLE) / c.n_total AS rate
          FROM c CROSS JOIN m),
    k AS (SELECT d.source, COUNT(*) AS n_kept
          FROM documents d JOIN r ON d.source = r.source
          WHERE {_HASH64.format(expr="CAST(doc_id AS VARCHAR) || ':mix'")}
                % 1000000 < r.rate * 1000000
          GROUP BY d.source)
    SELECT r.source AS source, CAST(r.n_total AS BIGINT) AS n_total,
           ROUND(r.rate, 6) AS rate,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
    FROM r LEFT JOIN k ON r.source = k.source
    ORDER BY r.source
    """,
)
def mixture_rebalance_uniform_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing — hash-downsample every source to the smallest
    source's size so the training mix is uniform across domains (the
    data-mixing step of corpus assembly, with data-dependent rates rather
    than the fixed per-stratum rates of stratified_sample_source).

    Scale shape: pass 1 is a map-side-combined per-source count (tiny
    result, broadcast back); pass 2 filters with a pure hash predicate
    against the broadcast rate table — keep/drop is decided map-side, no
    shuffle of document rows at all. The decision is a pure function of
    (doc_id, source), so stragglers/retries keep identical samples."""
    d = tables(spark, sf_dir)["documents"]
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    m = c.agg(F.min("n_total").alias("min_n"))
    r = (
        c.crossJoin(F.broadcast(m))
        .select(
            "source",
            "n_total",
            (F.col("min_n").cast("double") / F.col("n_total")).alias("rate"),
        )
    )
    h = F.pmod(
        hash64(F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))),
        1000000,
    )
    k = (
        d.join(F.broadcast(r), "source")
        .filter(h < F.col("rate") * 1000000)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        r.join(F.broadcast(k), "source", "left")
        .select(
            "source",
            "n_total",
            F.round("rate", 6).alias("rate"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
        .orderBy("source")
    )


@query(
    "char_entropy_quality",
    oracle="""
    WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
                FROM documents),
    cnt AS (SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS n
            FROM ch GROUP BY doc_id, c),
    agg AS (SELECT doc_id,
                   CAST(SUM(n) AS BIGINT) AS n_chars_total,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
                   list_sort(list(n)) AS ns
            FROM cnt GROUP BY doc_id)
    SELECT doc_id, n_chars_total, n_distinct_chars,
           ROUND(ln(n_chars_total)
                 - list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(ns, x -> x * ln(x))),
                       (a, b) -> a + b) / n_chars_total, 6) AS entropy,
           CAST(CASE WHEN ln(n_chars_total)
                          - list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                list_transform(ns, x -> x * ln(x))),
                                (a, b) -> a + b) / n_chars_total < 2.0
                THEN 1 ELSE 0 END AS INT) AS low_entropy
    FROM agg ORDER BY doc_id
    """,
)
def char_entropy_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality signal — the cheap "is this natural text
    or keyboard mash / base64 / repeated filler" filter (low entropy =
    repetitive junk, flagged below 2.0 nats).

    Float-exactness: H = ln(N) - (1/N) * sum(c_i * ln(c_i)) is computed by
    an EXPLICIT left fold over the numerically sorted count list on both
    engines (F.aggregate here, list_reduce in DuckDB), so the double
    additions happen in the identical order and the rounded values match
    bit-for-bit — a free-order SUM() over the per-char terms would differ
    in the last ulp between engines.

    Scale shape: one explode + map-side-combined (doc, char) count, one
    per-doc collect of a ~charset-sized list (bounded: distinct chars per
    doc, not doc length), then codegen-side fold. No Python, no UDF."""
    d = tables(spark, sf_dir)["documents"]
    cnt = (
        d.select("doc_id", F.explode(F.split("text", "")).alias("c"))
        .groupBy("doc_id", "c")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    agg = cnt.groupBy("doc_id").agg(
        F.sum("n").alias("n_chars_total"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.sort_array(F.collect_list("n")).alias("ns"),
    )
    ent = F.log(F.col("n_chars_total")) - F.aggregate(
        F.col("ns"),
        F.lit(0.0),
        lambda a, x: a + x.cast("double") * F.log(x.cast("double")),
    ) / F.col("n_chars_total")
    return agg.select(
        "doc_id",
        "n_chars_total",
        "n_distinct_chars",
        F.round(ent, 6).alias("entropy"),
        F.when(ent < 2.0, 1).otherwise(0).cast("int").alias("low_entropy"),
    ).orderBy("doc_id")


@query(
    "source_quality_report",
    oracle=f"""
    WITH h AS (SELECT source, n_chars,
                      {_HASH64.format(expr='text')} AS th
               FROM documents),
    dup AS (SELECT th, COUNT(*) AS c FROM h GROUP BY th),
    flags AS (SELECT h.source, h.n_chars,
                     CASE WHEN dup.c > 1 THEN 1 ELSE 0 END AS is_dup,
                     CASE WHEN h.n_chars < 100 THEN 1 ELSE 0 END AS is_short
              FROM h JOIN dup ON h.th = dup.th)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS mean_chars,
           CAST(SUM(is_dup) AS BIGINT) AS n_dup,
           ROUND(CAST(SUM(is_dup) AS DOUBLE) / COUNT(*), 6) AS dup_rate,
           CAST(SUM(is_short) AS BIGINT) AS n_short,
           ROUND(CAST(SUM(is_short) AS DOUBLE) / COUNT(*), 6) AS short_rate
    FROM flags GROUP BY source ORDER BY source
    """,
)
def source_quality_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health report — the dashboard query a data-curation
    team runs after ingest: volume, exact-duplicate rate (corpus-wide
    hash groups attributed back to each source), and short-document rate.

    Scale shape: duplicate detection shuffles only 8-byte text hashes
    (dedup_exact's contract); the dup-count table joins back on the same
    hash partitioning; the final per-source rollup is map-side combined
    over ~#sources groups. All ratios are single double divisions of
    exact integer aggregates."""
    d = tables(spark, sf_dir)["documents"]
    h = d.select("source", "n_chars", hash64(F.col("text")).alias("th"))
    dup = h.groupBy("th").agg(F.count(F.lit(1)).alias("c"))
    flags = h.join(dup, "th").select(
        "source",
        "n_chars",
        F.when(F.col("c") > 1, 1).otherwise(0).alias("is_dup"),
        F.when(F.col("n_chars") < 100, 1).otherwise(0).alias("is_short"),
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_chars"),
            F.sum("is_dup").alias("n_dup"),
            F.round(
                F.sum("is_dup").cast("double") / F.count(F.lit(1)), 6
            ).alias("dup_rate"),
            F.sum("is_short").alias("n_short"),
            F.round(
                F.sum("is_short").cast("double") / F.count(F.lit(1)), 6
            ).alias("short_rate"),
        )
        .orderBy("source")
    )


@query(
    "passage_chunking",
    oracle="""
    WITH w AS (SELECT doc_id,
                      list_filter(string_split_regex(trim(text), '\\s+'),
                                  x -> length(x) > 0) AS ws
               FROM documents),
    st AS (SELECT doc_id, ws, len(ws) AS n, unnest(range(0, len(ws), 24)) AS s
           FROM w WHERE len(ws) > 0)
    SELECT doc_id,
           CAST(s / 24 AS BIGINT) AS chunk_idx,
           CAST(least(s + 32, n) - s AS BIGINT) AS n_tokens_chunk,
           array_to_string(ws[s + 1 : least(s + 32, n)], ' ') AS chunk_text
    FROM st ORDER BY doc_id, chunk_idx
    """,
)
def passage_chunking_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage chunking — split each document into overlapping token
    windows (size 32, stride 24, 8-token overlap): the RAG-indexing /
    context-window prep step between cleaning and embedding. Chunk
    boundaries are pure functions of the token array, so chunk ids are
    stable across runs and engines.

    Scale shape: tokenize once, generate window starts with `sequence`
    and explode — all codegen array expressions, map-only until the
    terminal sort; output rows carry ~window-sized text instead of whole
    documents, which is what makes the downstream embed/dedup stages
    shuffle bounded units. A doc never needs to see another doc:
    embarrassingly parallel at any corpus size."""
    from ..operators.text import tokenize

    d = tables(spark, sf_dir)["documents"]
    toks = d.select(
        "doc_id", tokenize(F.col("text")).alias("ws")
    ).withColumn("n", F.size("ws"))
    st = toks.filter(F.col("n") > 0).select(
        "doc_id",
        "ws",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(24))
        ).alias("s"),
    )
    return st.select(
        "doc_id",
        (F.col("s") / 24).cast("long").alias("chunk_idx"),
        (
            F.least(F.col("s") + 32, F.col("n")) - F.col("s")
        ).cast("long").alias("n_tokens_chunk"),
        F.array_join(
            F.slice(
                F.col("ws"),
                F.col("s") + 1,
                F.least(F.lit(32), F.col("n") - F.col("s")),
            ),
            " ",
        ).alias("chunk_text"),
    ).orderBy("doc_id", "chunk_idx")


@query(
    "curation_pipeline_report",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    n AS (SELECT doc_id, source,
                 trim(regexp_replace(regexp_replace(lower(text),
                      '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')) AS norm
          FROM documents),
    hh AS (SELECT doc_id, source,
                  {_HASH64.format(expr='norm')} AS nh
           FROM n),
    canon AS (SELECT nh, MIN(doc_id) AS canonical FROM hh GROUP BY nh),
    dedup AS (SELECT hh.doc_id, hh.source,
                     CASE WHEN hh.doc_id = canon.canonical THEN 1 ELSE 0 END
                         AS is_canonical
              FROM hh JOIN canon ON hh.nh = canon.nh),
    wg AS (SELECT doc_id,
                  [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                   for i in range(1, len(ws) - 1)] AS gs
           FROM w WHERE len(ws) >= 3),
    gx AS (SELECT doc_id, unnest(gs) AS g FROM wg),
    gcnt AS (SELECT doc_id, g, COUNT(*) AS c FROM gx GROUP BY doc_id, g),
    rep AS (SELECT doc_id,
                   CASE WHEN CAST(SUM(c) - COUNT(*) AS DOUBLE) / SUM(c) > 0.1
                        THEN 0 ELSE 1 END AS rep_pass
            FROM gcnt GROUP BY doc_id),
    sx AS (SELECT doc_id, unnest(s) AS g FROM sh),
    ev AS (SELECT DISTINCT g FROM sx WHERE doc_id % {_EVAL_MOD} = 0),
    dec AS (SELECT sx.doc_id,
                   CASE WHEN CAST(COUNT(ev.g) AS DOUBLE) / COUNT(*) >= 0.5
                        THEN 0 ELSE 1 END AS decon_pass
            FROM sx LEFT JOIN ev ON sx.g = ev.g
            WHERE sx.doc_id % {_EVAL_MOD} <> 0
            GROUP BY sx.doc_id),
    flags AS (
        SELECT d.doc_id, d.source, d.is_canonical,
               COALESCE(rep.rep_pass, 1) AS rep_pass,
               CASE WHEN d.doc_id % {_EVAL_MOD} = 0 THEN 0
                    ELSE COALESCE(dec.decon_pass, 1) END AS decon_pass
        FROM dedup d
        LEFT JOIN rep ON d.doc_id = rep.doc_id
        LEFT JOIN dec ON d.doc_id = dec.doc_id)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(SUM(is_canonical) AS BIGINT) AS n_after_dedup,
           CAST(SUM(is_canonical * rep_pass) AS BIGINT) AS n_after_repetition,
           CAST(SUM(is_canonical * rep_pass * decon_pass) AS BIGINT)
               AS n_final,
           ROUND(CAST(SUM(is_canonical * rep_pass * decon_pass) AS DOUBLE)
                 / COUNT(*), 6) AS retention
    FROM flags GROUP BY source ORDER BY source
    """,
)
def curation_pipeline_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END curation funnel — the three cleaning stages composed the
    way a real pretraining pipeline runs them, reported as per-source
    survivor counts at each stage: raw → normalized-exact-dedup
    (canonical docs only) → repetition filter (dup-trigram fraction
    <= 0.1; under-3-word docs pass vacuously) → benchmark decontamination
    (eval docs and >= 50%-overlap train docs dropped).

    One DAG, evaluated as per-doc flag columns left-joined on doc_id and
    conditional integer sums per source — Catalyst sees the whole funnel
    and shares the documents scan across stages. Every stage keeps its
    standalone query's scale contract (hash-only dedup shuffle, Arrow
    Counter repetition, broadcast eval set); the composition adds only
    doc_id-keyed flag joins — skinny int rows, never text."""
    d = tables(spark, sf_dir)["documents"]
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", ""),
            r"\s+",
            " ",
        )
    )
    from pyspark.sql import Window

    hh = d.select("doc_id", "source", hash64(norm).alias("nh"))
    # window (not self-join) so the regex normalization evaluates once
    # per row — same fix as normalize_text_dedup, where the second
    # lineage's regex pass dominated the sf1 cost
    dedup = hh.withColumn(
        "canonical", F.min("doc_id").over(Window.partitionBy("nh"))
    ).select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") == F.col("canonical"), 1)
        .otherwise(0)
        .alias("is_canonical"),
    )

    rep = (
        repetition_ngram_filter_q(spark, sf_dir)
        .select(
            "doc_id",
            F.when(F.col("dup_frac") > 0.1, 0).otherwise(1).alias("rep_pass"),
        )
    )

    sx = shingle_sets(d, "doc_id", "text").select(
        F.col("id").alias("doc_id"), F.explode("shingles").alias("g")
    ).localCheckpoint(eager=False)
    ev = (
        sx.filter(F.col("doc_id") % _EVAL_MOD == 0)
        .select("g")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    dec = (
        sx.filter(F.col("doc_id") % _EVAL_MOD != 0)
        .join(F.broadcast(ev), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.count("__hit").alias("n_hit"),
        )
        .select(
            "doc_id",
            F.when(
                F.col("n_hit").cast("double") / F.col("n_sh") >= 0.5, 0
            )
            .otherwise(1)
            .alias("decon_pass"),
        )
    )

    flags = (
        dedup.join(rep, "doc_id", "left")
        .join(dec, "doc_id", "left")
        .select(
            "source",
            "is_canonical",
            F.coalesce("rep_pass", F.lit(1)).alias("rep_pass"),
            F.when(F.col("doc_id") % _EVAL_MOD == 0, 0)
            .otherwise(F.coalesce("decon_pass", F.lit(1)))
            .alias("decon_pass"),
        )
    )
    surv = F.col("is_canonical") * F.col("rep_pass") * F.col("decon_pass")
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.sum("is_canonical").alias("n_after_dedup"),
            F.sum(F.col("is_canonical") * F.col("rep_pass")).alias(
                "n_after_repetition"
            ),
            F.sum(surv).alias("n_final"),
            F.round(
                F.sum(surv).cast("double") / F.count(F.lit(1)), 6
            ).alias("retention"),
        )
        .orderBy("source")
    )


@query(
    "incremental_dedup_batch",
    oracle=f"""
    WITH h AS (SELECT doc_id, source,
                      {_HASH64.format(expr='text')} AS th
               FROM documents),
    base AS (SELECT DISTINCT th FROM h WHERE doc_id < 250),
    batch AS (SELECT doc_id, source, th FROM h WHERE doc_id >= 250),
    firsts AS (SELECT doc_id, source, th,
                      row_number() OVER (PARTITION BY th
                                         ORDER BY doc_id) AS rn
               FROM batch),
    flagged AS (SELECT f.doc_id, f.source,
                       CASE WHEN b.th IS NOT NULL THEN 0
                            WHEN f.rn > 1 THEN 0 ELSE 1 END AS is_new
                FROM firsts f LEFT JOIN base b ON f.th = b.th)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_batch,
           CAST(SUM(is_new) AS BIGINT) AS n_new_unique
    FROM flagged GROUP BY source ORDER BY source
    """,
)
def incremental_dedup_batch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL exact dedup — the ingest-time shape: an arriving batch
    (doc_id >= 250) is deduplicated against a PERSISTED hash index of the
    existing corpus (doc_id < 250) plus itself (first occurrence per hash
    wins), without ever rescanning old document text.

    This is the operation that makes dedup sustainable at 100 TB: the
    corpus is represented by its 8-byte hash index (persisted parquet,
    appended per ingest), so per-batch cost is O(batch) + a join against
    the index — not O(corpus). The index build here is idempotent
    (overwrite into scratch); a real deployment appends the batch's new
    hashes as the next ingest's index."""
    from ..sources.io import scratch_path

    d = tables(spark, sf_dir)["documents"]
    h = d.select("doc_id", "source", hash64(F.col("text")).alias("th"))
    sf_key = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    idx_path = scratch_path("dedup_index", sf_key, "hashes")
    # Index build (normally a prior ingest's output): distinct hashes of
    # the existing corpus, hash-only parquet.
    h.filter(F.col("doc_id") < 250).select("th").distinct().write.mode(
        "overwrite"
    ).parquet(idx_path)
    base = spark.read.parquet(idx_path)

    batch = h.filter(F.col("doc_id") >= 250)
    w = Window.partitionBy("th").orderBy("doc_id")
    firsts = batch.withColumn("rn", F.row_number().over(w))
    flagged = firsts.join(
        base.withColumn("__seen", F.lit(1)), "th", "left"
    ).select(
        "source",
        F.when(F.col("__seen").isNotNull(), 0)
        .when(F.col("rn") > 1, 0)
        .otherwise(1)
        .alias("is_new"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_batch"),
            F.sum("is_new").alias("n_new_unique"),
        )
        .orderBy("source")
    )


@query(
    "embedding_label_centroids",
    oracle="""
    WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
    ex AS (SELECT label, i AS pos,
                  CAST(floor(v[i + 1] * 1e6 + 0.5) AS BIGINT) AS qi
           FROM e, unnest(range(0, len(v))) AS t(i))
    SELECT CAST(label AS INT) AS label, CAST(pos AS INT) AS pos,
           ROUND(CAST(SUM(qi) AS DOUBLE) / COUNT(*) / 1e6, 6) AS centroid,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ex GROUP BY label, pos ORDER BY label, pos
    """,
)
def embedding_label_centroids_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids — the class-prototype computation
    behind IVF coarse quantizers, cluster-balance audits, and
    nearest-centroid labeling. Element-wise mean over a 64-dim vector
    column, grouped by label.

    Exactness: each float element is first quantized to micro-units with
    the explicit half-up rule (floor(x*1e6 + 0.5)), the per-(label, pos)
    sum is exact integer arithmetic — immune to partial-aggregation
    order, which is what broke naive float SUMs in round 1 — and one
    final double division + ROUND gives identical centroids on both
    engines.

    Scale shape: posexplode fans each vector into (label, pos, int) rows
    that partial-aggregate map-side, so the shuffle carries at most
    labels x dims combined rows per task regardless of corpus size."""
    e = tables(spark, sf_dir)["embeddings"]
    from ..operators.similarity import as_double

    ex = e.select(
        "label", F.posexplode(as_double(F.col("embedding"))).alias("pos", "x")
    ).select(
        "label",
        "pos",
        F.floor(F.col("x") * 1e6 + F.lit(0.5)).cast("long").alias("qi"),
    )
    return (
        ex.groupBy("label", "pos")
        .agg(F.sum("qi").alias("sq"), F.count(F.lit(1)).alias("n"))
        .select(
            F.col("label").cast("int").alias("label"),
            F.col("pos").cast("int").alias("pos"),
            F.round(F.col("sq").cast("double") / F.col("n") / 1e6, 6).alias(
                "centroid"
            ),
            "n",
        )
        .orderBy("label", "pos")
    )


@query(
    "mixture_temperature_sample",
    oracle=f"""
    WITH c AS (SELECT source, COUNT(*) AS n_total
               FROM documents GROUP BY source),
    m AS (SELECT MIN(n_total) AS min_n FROM c),
    r AS (SELECT c.source, c.n_total,
                 SQRT(CAST(m.min_n AS DOUBLE) / c.n_total) AS rate
          FROM c CROSS JOIN m),
    k AS (SELECT d.source, COUNT(*) AS n_kept
          FROM documents d JOIN r ON d.source = r.source
          WHERE {_HASH64.format(expr="CAST(doc_id AS VARCHAR) || ':temp'")}
                % 1000000 < CAST(FLOOR(r.rate * 1000000 + 0.5) AS BIGINT)
          GROUP BY d.source)
    SELECT r.source AS source, CAST(r.n_total AS BIGINT) AS n_total,
           ROUND(r.rate, 6) AS rate,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
    FROM r LEFT JOIN k ON r.source = k.source
    ORDER BY r.source
    """,
)
def mixture_temperature_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture sampling (α=0.5): per-source keep rate
    (min_n/n_s)^α interpolates between uniform rebalancing (α=1) and
    leaving the natural mix (α=0) — the standard multilingual/multi-domain
    smoothing step. α is fixed at 0.5 so the rate is a SQRT, which IEEE
    requires to be correctly rounded (generic pow is not — a 1-ulp
    divergence at a keep boundary would flip a document between engines);
    the rate is then quantized to the 1e-6 hash grid half-up on both
    sides, so the keep decision compares integers.

    Same scale shape as mixture_rebalance_uniform: one counting pass
    broadcast back, one map-side hash-predicate pass, no document
    shuffle."""
    d = tables(spark, sf_dir)["documents"]
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    m = c.agg(F.min("n_total").alias("min_n"))
    r = c.crossJoin(F.broadcast(m)).select(
        "source",
        "n_total",
        F.sqrt(F.col("min_n").cast("double") / F.col("n_total")).alias("rate"),
    )
    h = F.pmod(
        hash64(F.concat(F.col("doc_id").cast("string"), F.lit(":temp"))),
        1000000,
    )
    k = (
        d.join(F.broadcast(r), "source")
        .filter(h < F.floor(F.col("rate") * 1000000 + 0.5).cast("long"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        r.join(F.broadcast(k), "source", "left")
        .select(
            "source",
            F.col("n_total").cast("long").alias("n_total"),
            F.round("rate", 6).alias("rate"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
        .orderBy("source")
    )
