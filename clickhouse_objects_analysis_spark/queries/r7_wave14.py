"""Round-7 session-14 queries: RAKE keyword extraction, SCD Type-2
dimension merge, and the LATERAL VIEW SQL surface.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has none of these; RAKE extends the text-analysis charter
(keyword/phrase mining for corpus curation), SCD2 is the
slowly-changing-dimension merge every warehouse history table needs
(the batch cousin of streaming_upsert_sink), and LATERAL VIEW is the
Hive-heritage SQL spelling of ARRAY JOIN that Spark SQL parses
natively."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import query, tables

#: Minimal English stopword set for phrase splitting — RAKE's delimiter
#: vocabulary. Fixed and embedded so both engines split identically.
_STOPWORDS = (
    "the a an of and or in on to for with by at is are was were as it "
    "this that be from"
).split()

_STOP_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)


@query(
    "rake_keyword_extraction",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, g.w, g.pos,
               g.w IN ({_STOP_SQL}) AS is_stop
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(trim(text), '\\s+'),
                                 x -> length(x) > 0) AS ws
              FROM documents) d,
             (SELECT unnest(ws) AS w,
                     generate_subscripts(ws, 1) AS pos) AS g),
    nonstop AS (
        SELECT doc_id, w, pos,
               pos - row_number() OVER (PARTITION BY doc_id
                                        ORDER BY pos) AS grp
        FROM tok WHERE NOT is_stop),
    phr AS (
        SELECT doc_id, grp,
               string_agg(w, ' ' ORDER BY pos) AS phrase,
               CAST(COUNT(*) AS BIGINT) AS plen
        FROM nonstop GROUP BY doc_id, grp),
    occ AS (
        SELECT n.w, p.plen
        FROM nonstop n JOIN phr p
          ON n.doc_id = p.doc_id AND n.grp = p.grp),
    wscore AS (
        SELECT w,
               (CAST(SUM(plen) AS BIGINT) * 1000000000)
                   // CAST(COUNT(*) AS BIGINT) AS s_nano
        FROM occ GROUP BY w),
    pscore AS (
        SELECT p.phrase, ANY_VALUE(p.plen) AS n_words,
               CAST(SUM(ws.s_nano) AS BIGINT) AS score_nano
        FROM (SELECT DISTINCT phrase, plen FROM phr WHERE plen >= 2) p,
             unnest(string_split(p.phrase, ' ')) AS u(w)
        JOIN wscore ws ON u.w = ws.w
        GROUP BY p.phrase)
    SELECT phrase, CAST(n_words AS BIGINT) AS n_words, score_nano
    FROM pscore ORDER BY score_nano DESC, phrase LIMIT 15
    """,
)
def rake_keyword_extraction_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE (Rapid Automatic Keyword Extraction): split token streams
    into candidate phrases at stopwords, score each word by
    degree/frequency (degree = Σ lengths of phrases it appears in,
    self included), and rank DISTINCT multi-word phrases by the sum of
    their words' scores — the classic unsupervised keyphrase miner for
    corpus curation and vocab seeding.

    Float parity: there are NO floats — word scores quantize via exact
    integer division (deg·1e9) DIV freq, so the phrase score is an
    integer SUM (order-free), sidestepping the ordered-fold problem a
    double sum over phrase words would have. (At 100 TB deg·1e9 stays
    under 2^63 until a single word's degree exceeds ~9e9 occurrences;
    the div would then need decimal, noted here.) Scale shape: phrase
    islands via one (doc, pos) window; word scores are a
    vocabulary-sized table broadcast onto distinct phrases; the only
    corpus-wide shuffles are the island groupBy and the word-count
    groupBy, both map-side combinable."""
    d = tables(spark, sf_dir)["documents"]
    tok = d.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(F.trim("text"), r"\s+"), lambda x: F.length(x) > 0
            )
        ).alias("pos0", "w"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),  # 1-based like the oracle
        "w",
        F.col("w").isin(_STOPWORDS).alias("is_stop"),
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    nonstop = (
        tok.filter(~F.col("is_stop"))
        .withColumn("grp", F.col("pos") - F.row_number().over(wdoc))
        .localCheckpoint(eager=False)  # feeds phrases AND occurrences
    )
    phr = nonstop.groupBy("doc_id", "grp").agg(
        F.array_join(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos").alias("p"), F.col("w")))
            ).getField("w"),
            " ",
        ).alias("phrase"),
        F.count("*").cast("long").alias("plen"),
    )
    occ = nonstop.join(phr, ["doc_id", "grp"]).select("w", "plen")
    wscore = occ.groupBy("w").agg(
        F.expr(
            "CAST(sum(plen) AS BIGINT) * 1000000000 div count(*)"
        ).alias("s_nano")
    )
    cand = (
        phr.filter(F.col("plen") >= 2)
        .select("phrase", F.col("plen").alias("n_words"))
        .distinct()
    )
    words = cand.select(
        "phrase", "n_words", F.explode(F.split("phrase", " ")).alias("w")
    )
    return (
        words.join(F.broadcast(wscore), "w")
        .groupBy("phrase")
        .agg(
            F.first("n_words").cast("long").alias("n_words"),
            F.sum("s_nano").cast("long").alias("score_nano"),
        )
        .orderBy(F.desc("score_nano"), "phrase")
        .limit(15)
    )


@query(
    "scd2_dimension_merge",
    oracle="""
    WITH base AS (
        SELECT c_custkey,
               CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
               c_custkey % 10 = 0 AS changed
        FROM customer),
    hist AS (
        SELECT c_custkey AS custkey, acctbal_cents,
               '2024-01-01' AS valid_from,
               CASE WHEN changed THEN '2024-06-01' ELSE '9999-12-31' END
                   AS valid_to,
               NOT changed AS is_current
        FROM base
        UNION ALL
        SELECT c_custkey, acctbal_cents + 10000,
               '2024-06-01', '9999-12-31', TRUE
        FROM base WHERE changed)
    SELECT CAST(custkey AS BIGINT) AS custkey, acctbal_cents,
           valid_from, valid_to, is_current
    FROM hist ORDER BY custkey, valid_from
    """,
)
def scd2_dimension_merge_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 merge: an update batch (every
    custkey % 10 == 0 gains +100.00 balance, effective 2024-06-01)
    lands on the customer dimension — the old version is CLOSED
    (valid_to = effective date, is_current = false) and the new
    version opened, while untouched keys keep their open-ended row.
    This is the batch history-table merge (MERGE INTO ... WHEN MATCHED
    on a lake table) that pairs with streaming_upsert_sink's
    last-write-wins semantics.

    Plan shape: the update batch derives from the dimension here, so
    the merge is one projection + a filtered union — in production the
    batch is a separate (small) table broadcast onto the dimension,
    and only changed keys' rows rewrite (the copy-on-write discipline
    of operators/mutations.py). Balances are integer cents; dates are
    fixed literals — nothing floats."""
    c = tables(spark, sf_dir)["customer"]
    base = c.select(
        F.col("c_custkey").cast("long").alias("custkey"),
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
        .cast("long")
        .alias("acctbal_cents"),
        (F.col("c_custkey") % 10 == 0).alias("changed"),
    )
    closed_or_current = base.select(
        "custkey",
        "acctbal_cents",
        F.lit("2024-01-01").alias("valid_from"),
        F.when(F.col("changed"), F.lit("2024-06-01"))
        .otherwise(F.lit("9999-12-31"))
        .alias("valid_to"),
        (~F.col("changed")).alias("is_current"),
    )
    new_rows = base.filter("changed").select(
        "custkey",
        (F.col("acctbal_cents") + 10000).alias("acctbal_cents"),
        F.lit("2024-06-01").alias("valid_from"),
        F.lit("9999-12-31").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed_or_current.unionAll(new_rows).orderBy(
        "custkey", "valid_from"
    )


@query(
    "lateral_view_surface",
    oracle="""
    WITH tk AS (SELECT doc_id,
                       list_filter(string_split_regex(trim(text), '\\s+'),
                                   x -> length(x) > 0) AS ws
                FROM documents)
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_tokens,
           ws[1] AS first_token,
           CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct
    FROM tk WHERE len(ws) > 0 ORDER BY doc_id
    """,
)
def lateral_view_surface_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW posexplode — the HiveQL spelling of ARRAY JOIN
    that Spark SQL parses natively (the ClickHouse surface maps
    ARRAY JOIN → explode, queries/functions_surface.py; this locks
    the SQL-string route too): tokens explode with positions in pure
    SQL, then re-aggregate to per-doc counts, the position-1 token,
    and the distinct-token count. Catalyst compiles the lateral view
    to the same Generate node as DataFrame explode — one scan, no
    Python."""
    tables(spark, sf_dir)  # registers the temp views spark.sql reads
    return spark.sql(
        r"""
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               MAX(CASE WHEN pos = 0 THEN word END) AS first_token,
               CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct
        FROM documents
        LATERAL VIEW posexplode(
            filter(split(trim(text), '\\s+'), x -> length(x) > 0)
        ) t AS pos, word
        GROUP BY doc_id
        ORDER BY doc_id
        """
    )
