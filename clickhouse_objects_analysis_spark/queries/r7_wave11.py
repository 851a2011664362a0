"""Round-7 session-11 queries: bigram PMI collocations, rolling 7-day
active users, per-source weighted sampling, and a hand-built Bloom
semi-join prune.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has none of these; PMI extends the text-analysis charter
(collocation mining for tokenizer/vocab decisions), rolling actives is
the windowed-distinct surface, the stratified sampler composes the
wave-8 A-Res key with per-group top-k, and the Bloom prune demonstrates
the runtime-filter technique Spark's optimizer injects automatically at
scale — here built by hand from md5 bits so BOTH engines can replay the
exact filter, false positives included."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import query, tables


@query(
    "bigram_pmi_top",
    oracle="""
    WITH tk AS (SELECT doc_id,
                       list_filter(string_split_regex(trim(text), '\\s+'),
                                   x -> length(x) > 0) AS ws
                FROM documents),
    b2 AS (SELECT z[1] AS w1, z[2] AS w2
           FROM (SELECT unnest(list_zip(ws[1:len(ws) - 1], ws[2:len(ws)]))
                     AS z
                 FROM tk WHERE len(ws) >= 2)),
    uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT unnest(ws) AS w FROM tk) GROUP BY w),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
    big AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM b2 GROUP BY w1, w2),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM b2),
    pmi AS (
        SELECT b.w1, b.w2, b.c12,
               FLOOR((ln(b.c12) + 2 * ln(t.n) - ln(mm.m)
                      - ln(u1.c) - ln(u2.c)) * 1000000 + 0.5) / 1000000
                   AS pmi
        FROM big b
        JOIN uni u1 ON b.w1 = u1.w
        JOIN uni u2 ON b.w2 = u2.w
        CROSS JOIN tot t CROSS JOIN m mm
        WHERE b.c12 >= 5)
    SELECT w1, w2, c12, pmi FROM pmi
    ORDER BY pmi DESC, w1, w2 LIMIT 20
    """,
)
def bigram_pmi_top_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations by pointwise mutual information,
    PMI = ln(p(w1,w2) / (p(w1)p(w2))) with p from corpus counts and a
    c12 ≥ 5 noise floor — the collocation miner behind tokenizer merge
    decisions and multi-word-expression vocab entries (high PMI = the
    pair co-occurs far above chance, e.g. named entities).

    Float parity: PMI is expanded to ±ln of five INTEGER counts summed
    in one fixed expression (never a product that could overflow long
    at corpus scale), quantized with the floor form. Scale shape:
    bigrams form map-side from token-array slices; the unigram table
    is vocabulary-sized → broadcast onto the bigram-count stream;
    corpus totals are 1-row broadcasts. The only big shuffle is the
    (w1, w2) count — map-side combined."""
    d = tables(spark, sf_dir)["documents"]
    tk = d.select(
        "doc_id",
        F.filter(
            F.split(F.trim("text"), r"\s+"), lambda x: F.length(x) > 0
        ).alias("ws"),
    )
    n = F.size("ws")
    b2 = (
        tk.filter(n >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("ws", 1, n - 1).alias("w1"),
                    F.slice("ws", 2, n - 1).alias("w2"),
                )
            ).alias("z")
        )
        .select(F.col("z.w1").alias("w1"), F.col("z.w2").alias("w2"))
        .localCheckpoint(eager=False)  # feeds big AND m
    )
    uni = (
        tk.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)  # probed twice + total
    )
    tot = uni.agg(F.sum("c").cast("long").alias("n"))
    big = b2.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    m = b2.agg(F.count(F.lit(1)).cast("long").alias("m"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    pmi = (
        F.log("c12")
        + 2 * F.log("n")
        - F.log("m")
        - F.log("c1")
        - F.log("c2")
    )
    return (
        big.filter(F.col("c12") >= 5)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(m))
        .select(
            "w1",
            "w2",
            "c12",
            (F.floor(pmi * 1000000 + F.lit(0.5)) / 1000000).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(20)
    )


@query(
    "rolling_7d_active_users",
    oracle="""
    WITH triples AS (
        SELECT DISTINCT event_type,
               datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
               user_id
        FROM events)
    SELECT DISTINCT event_type, CAST(d AS BIGINT) AS d,
           CAST(COUNT(DISTINCT user_id) OVER (
               PARTITION BY event_type ORDER BY d
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS wau
    FROM triples ORDER BY event_type, d
    """,
)
def rolling_7d_active_users_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU-by-day) per event type — the
    windowed DISTINCT aggregate with RANGE-frame semantics (a gap day
    shrinks the window). Spark has no distinct-over-window, and the
    naive rewrite (collect_set over a sliding frame) REBUILDS the set
    per row — O(rows x frame) inside at most |event_type| window
    partitions, which this round's sf10 sweep caught grinding a single
    task for minutes. The linear rewrite used here: each presence day
    (type, dp, user) CONTRIBUTES to output days dp..dp+6 (a 7x
    map-side explode), distinct over the contributions collapses a
    user's overlapping presences, one count per (type, day), and a
    semi-join keeps only days that really occur (preserving the RANGE
    frame's gap semantics exactly). Every step is a plain shuffle —
    no per-row set state anywhere. DuckDB runs its native windowed
    COUNT(DISTINCT) over the raw triples, so a contribution-window
    mistake cannot hash-match."""
    ev = tables(spark, sf_dir)["events"]
    triples = ev.select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d"),
        "user_id",
    ).distinct()
    contrib = (
        triples.select(
            "event_type",
            F.explode(
                F.sequence(F.col("d"), F.col("d") + 6)
            ).alias("d_out"),
            "user_id",
        )
        .distinct()
    )
    # contrib is already distinct on (type, day, user): a plain count
    # IS the distinct-user count — no countDistinct expand needed.
    counts = contrib.groupBy("event_type", "d_out").agg(
        F.count("*").cast("long").alias("wau")
    )
    real_days = triples.select("event_type", F.col("d").alias("d_out")).distinct()
    return (
        counts.join(real_days, ["event_type", "d_out"], "left_semi")
        .select(
            "event_type",
            F.col("d_out").cast("long").alias("d"),
            "wau",
        )
        .orderBy("event_type", "d")
    )


@query(
    "stratified_weighted_sample",
    oracle="""
    WITH keyed AS (
        SELECT source, doc_id, n_chars,
               CAST(FLOOR(
                   pow(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                            AS BIGINT) / 1152921504606846976.0,
                       1.0 / n_chars) * 1e9 + 0.5) AS BIGINT) AS key_nano
        FROM documents WHERE n_chars > 0),
    ranked AS (
        SELECT source, doc_id, n_chars, key_nano,
               row_number() OVER (PARTITION BY source
                                  ORDER BY key_nano DESC, doc_id) AS rk
        FROM keyed)
    SELECT source, CAST(rk AS BIGINT) AS rk,
           CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_chars AS BIGINT) AS n_chars, key_nano
    FROM ranked WHERE rk <= 3 ORDER BY source, rk
    """,
)
def stratified_weighted_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified weighted sampling: the wave-8 Efraimidis–Spirakis
    A-Res key (deterministic md5 uniform, key u^(1/n_chars)) ranked
    WITHIN each source — 3 quality-weighted picks per stratum, the
    per-domain variant a mixture pipeline uses so small sources are
    not drowned by the global sample. One window per stratum over
    per-row pure keys; at 100 TB this is per-partition top-3 per
    source then a |sources|×3 merge — no global sort, corpus never
    shuffles beyond the source key."""
    d = tables(spark, sf_dir)["documents"]
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long") / F.lit(1152921504606846976.0)
    key_nano = F.floor(
        F.pow(u, F.lit(1.0) / F.col("n_chars")) * 1e9 + F.lit(0.5)
    ).cast("long")
    w = Window.partitionBy("source").orderBy(F.desc("key_nano"), "doc_id")
    return (
        d.filter(F.col("n_chars") > 0)
        .select(
            "source",
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_chars").cast("long").alias("n_chars"),
            key_nano.alias("key_nano"),
        )
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("source", "rk", "doc_id", "n_chars", "key_nano")
        .orderBy("source", "rk")
    )


_BLOOM_BITS = 65536  # 2^16 positions, 32-bit words -> 2048-entry table


@query(
    "bloom_semijoin_prune",
    oracle=f"""
    WITH keys AS (SELECT DISTINCT o_orderkey AS k FROM orders
                  WHERE o_orderpriority = '1-URGENT'),
    kb AS (SELECT k,
                  (('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT)
                      % {_BLOOM_BITS} AS p1,
                  (('0x' || substr(md5(CAST(k AS VARCHAR)), 9, 8))::BIGINT)
                      % {_BLOOM_BITS} AS p2
           FROM keys),
    bloom AS (SELECT p // 32 AS word, bit_or(1::BIGINT << (p % 32)) AS bits
              FROM (SELECT p1 AS p FROM kb UNION ALL SELECT p2 FROM kb)
              GROUP BY p // 32),
    probe AS (SELECT l_orderkey,
                     (('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))::BIGINT)
                         % {_BLOOM_BITS} AS p1,
                     (('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 9, 8))::BIGINT)
                         % {_BLOOM_BITS} AS p2
              FROM lineitem),
    passed AS (
        SELECT pr.l_orderkey
        FROM probe pr
        JOIN bloom b1 ON b1.word = pr.p1 // 32
        JOIN bloom b2 ON b2.word = pr.p2 // 32
        WHERE (b1.bits & (1::BIGINT << (pr.p1 % 32))) <> 0
          AND (b2.bits & (1::BIGINT << (pr.p2 % 32))) <> 0),
    truth AS (SELECT l_orderkey FROM lineitem
              WHERE l_orderkey IN (SELECT k FROM keys))
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM keys)   AS n_keys,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM passed) AS n_bloom_pass,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM truth)  AS n_true,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM passed)
           - (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_false_pos
    """,
)
def bloom_semijoin_prune_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning, built by hand so both engines
    replay the EXACT filter: urgent-order keys hash to two md5-derived
    positions in a 65536-bit filter (stored as 2048 32-bit words built
    with bit_or); the lineitem probe passes when both bits are set.
    Reported: keys inserted, probe passes, true matches, and the
    false-positive overshoot — the quantity that decides whether the
    prune pays for itself before the exact join.

    This is the runtime-filter technique Spark's optimizer injects
    automatically (spark.sql.optimizer.runtime.bloomFilter.enabled) on
    selective joins; building it manually makes the FP arithmetic
    oracle-checkable (bloom_filter_agg itself is not SQL-exposed).
    Scale shape: the filter table is ≤ 2048 rows regardless of key
    count → broadcast to the probe side, which streams map-side; the
    exact semi-join runs only for the truth count. Every number is an
    integer; md5 bit positions are engine-identical by construction."""
    o = tables(spark, sf_dir)["orders"]
    li = tables(spark, sf_dir)["lineitem"]

    def positions(col):
        h = F.md5(col.cast("string"))
        p1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _BLOOM_BITS
        p2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long") % _BLOOM_BITS
        return p1, p2

    keys = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
        .localCheckpoint(eager=False)  # feeds bloom build AND truth join
    )
    kp1, kp2 = positions(F.col("k"))
    kb = keys.select(kp1.alias("p")).unionAll(keys.select(kp2.alias("p")))
    # F.shiftleft needs a LITERAL bit count, so the dynamic bit value is
    # 2^(p%32) via pow — exact in double for exponents <= 31, cast long.
    bit_of = lambda p: F.pow(F.lit(2.0), p % 32).cast("long")  # noqa: E731
    bloom = kb.groupBy((F.col("p") / 32).cast("long").alias("word")).agg(
        F.bit_or(bit_of(F.col("p"))).alias("bits")
    )
    lp1, lp2 = positions(F.col("l_orderkey"))
    probe = li.select(
        "l_orderkey", lp1.alias("p1"), lp2.alias("p2")
    )
    b1 = bloom.select(F.col("word").alias("w1"), F.col("bits").alias("bits1"))
    b2 = bloom.select(F.col("word").alias("w2"), F.col("bits").alias("bits2"))
    # ONE pass over lineitem computes BOTH counts (r14, guide §2.4): the
    # bloom lookups become LEFT broadcast joins (a probe word absent from
    # the 2048-row filter table means its bit is unset — the old INNER
    # join dropped the row, the flag form scores it false), and the truth
    # semi-join becomes a LEFT join flag against the distinct urgent-key
    # frame (distinct ⇒ no fanout). The old shape scanned lineitem twice
    # (bloom-probe pass + exact semi-join pass) and ran three separate
    # count jobs; this runs one scan, three broadcast joins, one agg.
    flags = (
        probe.join(
            F.broadcast(b1),
            (F.col("p1") / 32).cast("long") == F.col("w1"),
            "left",
        )
        .join(
            F.broadcast(b2),
            (F.col("p2") / 32).cast("long") == F.col("w2"),
            "left",
        )
        .join(
            F.broadcast(keys),
            F.col("l_orderkey") == F.col("k"),
            "left",
        )
        .select(
            (
                F.col("bits1").isNotNull()
                & (F.col("bits1").bitwiseAND(bit_of(F.col("p1"))) != 0)
                & F.col("bits2").isNotNull()
                & (F.col("bits2").bitwiseAND(bit_of(F.col("p2"))) != 0)
            ).alias("bloom_pass"),
            F.col("k").isNotNull().alias("is_true"),
        )
    )
    counts = flags.agg(
        F.sum(F.col("bloom_pass").cast("long")).cast("long").alias("n_bloom_pass"),
        F.sum(F.col("is_true").cast("long")).cast("long").alias("n_true"),
    )
    n_keys = keys.agg(F.count("*").cast("long").alias("n_keys"))
    return n_keys.crossJoin(counts).select(
        "n_keys",
        "n_bloom_pass",
        "n_true",
        (F.col("n_bloom_pass") - F.col("n_true")).alias("n_false_pos"),
    )
