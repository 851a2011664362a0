"""Round-7 session-28 queries: binary-payload dedup and the
top-k-plus-OTHER rollup.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has neither; binary dedup is the multimodal twin of
dedup_exact (hash the OPAQUE payload column, not text), and
top-k+OTHER is the reporting rollup every dashboard table uses so the
long tail stays visible without unbounded rows."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.multimodal import encode_ppm_payload
from .registry import query, tables


@query(
    "multimodal_binary_dedup",
    oracle="""
    WITH g AS (
        SELECT octet_length(encode(text)) AS lenkey,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM documents GROUP BY 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS distinct_payloads,
           CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS dup_groups,
           CAST(SUM(CASE WHEN n_copies > 1 THEN n_copies ELSE 0 END)
                AS BIGINT) AS rows_in_dup_groups,
           CAST(MAX(n_copies) AS BIGINT) AS largest_group
    FROM g
    """,
)
def multimodal_binary_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over OPAQUE binary payloads: md5 the synthesized P6
    PPM images (a true binary column) and group on the digest — the
    multimodal twin of dedup_exact, and the first registry hash over
    BinaryType rather than text. One 16-byte-digest shuffle regardless
    of payload size — the property that makes binary dedup viable on
    image/audio lakes where payloads are MBs.

    Oracle cross-check: the synthesized payload is fully determined by
    the text's utf-8 byte length (encode_ppm_payload derives w, h, and
    the fill from it), so payload-digest groups must equal byte-length
    groups — the oracle counts those directly, and any md5/encoding
    divergence breaks the match."""
    d = tables(spark, sf_dir)["documents"]
    ppm = encode_ppm_payload(d, "doc_id", "text")
    g = ppm.groupBy(F.md5("payload").alias("digest")).agg(
        F.count("*").cast("long").alias("n_copies")
    )
    dup = F.col("n_copies") > 1
    return g.agg(
        F.count("*").cast("long").alias("distinct_payloads"),
        F.sum(dup.cast("long")).cast("long").alias("dup_groups"),
        F.sum(F.when(dup, F.col("n_copies")).otherwise(0))
        .cast("long")
        .alias("rows_in_dup_groups"),
        F.max("n_copies").cast("long").alias("largest_group"),
    )


@query(
    "topk_plus_other_rollup",
    oracle="""
    WITH rev AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2),
    ranked AS (
        SELECT region, nation, cents,
               row_number() OVER (PARTITION BY region
                                  ORDER BY cents DESC, nation) AS rk
        FROM rev)
    SELECT region,
           CASE WHEN rk <= 3 THEN nation ELSE 'OTHER' END AS label,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM ranked
    GROUP BY region, CASE WHEN rk <= 3 THEN nation ELSE 'OTHER' END
    ORDER BY region, cents DESC, label
    """,
)
def topk_plus_other_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 nations by revenue per region with everything else rolled
    into one OTHER row — the reporting pattern that keeps dashboard
    tables bounded while conserving the total (Σ cents per region is
    unchanged by the rollup, asserted in tests). The rank window runs
    over the (region, nation) AGGREGATE — 25 rows — never raw orders;
    revenue is integer cents end-to-end."""
    t = tables(spark, sf_dir)
    rev = (
        t["orders"]
        .join(
            t["customer"].select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"].select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).cast("long").alias("cents")
        )
    )
    w = Window.partitionBy("region").orderBy(F.desc("cents"), "nation")
    ranked = rev.withColumn("rk", F.row_number().over(w))
    label = F.when(F.col("rk") <= 3, F.col("nation")).otherwise(
        F.lit("OTHER")
    )
    return (
        ranked.groupBy("region", label.alias("label"))
        .agg(
            F.sum("cents").cast("long").alias("cents"),
            F.count("*").cast("long").alias("n_nations"),
        )
        .orderBy("region", F.desc("cents"), "label")
    )
