"""Round-7 session-25 query: item-item co-purchase similarity.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has no recommender surface; this is the classic item-item
collaborative-filtering primitive ("customers who bought X also
bought Y") over the order baskets — cosine over binary
customer-purchase vectors, computed from co-occurrence counts with the
same inverted-index discipline as the dedup stack."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import query, tables


@query(
    "copurchase_item_similarity",
    oracle="""
    WITH cp AS (
        SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    pc AS (SELECT part, CAST(COUNT(*) AS BIGINT) AS n_cust
           FROM cp GROUP BY part),
    co AS (SELECT a.part AS pa, b.part AS pb,
                  CAST(COUNT(*) AS BIGINT) AS c_ab
           FROM cp a JOIN cp b
             ON a.cust = b.cust AND a.part < b.part
           GROUP BY 1, 2 HAVING COUNT(*) >= 3),
    sc AS (SELECT co.pa, co.pb, co.c_ab, x.n_cust AS n_a, y.n_cust AS n_b,
                  FLOOR(co.c_ab / sqrt(CAST(x.n_cust AS DOUBLE) * y.n_cust)
                        * 1000000 + 0.5) / 1000000 AS cosine
           FROM co JOIN pc x ON co.pa = x.part
                   JOIN pc y ON co.pb = y.part)
    SELECT CAST(pa AS BIGINT) AS pa, CAST(pb AS BIGINT) AS pb,
           c_ab, n_a, n_b, cosine
    FROM sc ORDER BY cosine DESC, pa, pb LIMIT 20
    """,
)
def copurchase_item_similarity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-purchase similarity ("bought X also bought Y"):
    cosine between parts' binary customer vectors,
    c_ab / sqrt(n_a · n_b), from distinct (customer, part) pairs with
    a c_ab ≥ 3 support floor — the collaborative-filtering primitive
    behind every co-purchase carousel.

    Scale shape: the same inverted-index discipline as the dedup
    stack — the customer is the 'shingle': the pair stream is
    Σ_cust C(basket, 2), bounded by basket sizes, never all item
    pairs; per-item customer counts are an item-cardinality table
    broadcast onto the surviving pairs; at whale-customer skew, cap
    basket size (max_df semantics) exactly as ngram_jaccard documents.
    The cosine is one floor-quantized expression over three exact
    integers."""
    t = tables(spark, sf_dir)
    cp = (
        t["lineitem"]
        .select("l_orderkey", F.col("l_partkey").alias("part"))
        .join(
            t["orders"].select("o_orderkey", F.col("o_custkey").alias("cust")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("cust", "part")
        .distinct()
        .localCheckpoint(eager=False)  # feeds counts AND the pair join
    )
    pc = cp.groupBy("part").agg(F.count("*").cast("long").alias("n_cust"))
    a = cp.select(F.col("cust"), F.col("part").alias("pa"))
    b = cp.select(F.col("cust"), F.col("part").alias("pb"))
    co = (
        a.join(b, "cust")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= 3)
    )
    x = pc.select(F.col("part").alias("pa"), F.col("n_cust").alias("n_a"))
    y = pc.select(F.col("part").alias("pb"), F.col("n_cust").alias("n_b"))
    cosine = F.col("c_ab") / F.sqrt(
        F.col("n_a").cast("double") * F.col("n_b")
    )
    return (
        co.join(F.broadcast(x), "pa")
        .join(F.broadcast(y), "pb")
        .select(
            F.col("pa").cast("long").alias("pa"),
            F.col("pb").cast("long").alias("pb"),
            "c_ab",
            "n_a",
            "n_b",
            (F.floor(cosine * 1000000 + F.lit(0.5)) / 1000000).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), "pa", "pb")
        .limit(20)
    )
