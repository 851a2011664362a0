"""Round-8 query wave 16: personalized PageRank over the co-purchase
graph in exact integer-nano arithmetic — "what products sit closest to
this seed category in basket space", the recommendation primitive on
top of the graph stack (PageRank on the lineage DAG already exists;
this is the seeded, engine-exact variant at data scale).

Reference parity note: no recommendation surface in the reference;
extends the graph charter (SURVEY §7) alongside PageRank, k-core,
triangles, and label propagation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.graph import personalized_pagerank
from .registry import query, tables

_ROUNDS = 3


def _ppr_round_cte(i: int) -> str:
    return (
        f"s{i} AS MATERIALIZED (SELECT a.m AS n, "
        f"CAST(SUM(r.r // d.deg) AS BIGINT) AS inflow "
        f"FROM adj a JOIN r{i - 1} r ON a.n = r.n "
        f"JOIN deg d ON d.n = a.n GROUP BY a.m),\n"
        f"    r{i} AS MATERIALIZED (SELECT nd.n, "
        f"CAST((15 * COALESCE(b.base, 0) + 85 * COALESCE(s.inflow, 0)) "
        f"// 100 AS BIGINT) AS r "
        f"FROM deg nd LEFT JOIN s{i} s ON s.n = nd.n "
        f"LEFT JOIN base b ON b.n = nd.n)"
    )


_JOINER = ",\n    "


@query(
    "personalized_pagerank_copurchase",
    oracle=f"""
    WITH edges AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey AND a.l_orderkey % 2 = 0
    ),
    adj AS MATERIALIZED (
        SELECT u AS n, v AS m FROM edges
        UNION ALL SELECT v, u FROM edges
    ),
    deg AS MATERIALIZED (
        SELECT n, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY n
    ),
    seeds AS (SELECT n FROM deg WHERE n % 50 = 0),
    base AS (
        SELECT d.n,
               CAST(1000000000 // greatest(
                   (SELECT COUNT(*) FROM seeds), 1) AS BIGINT) AS base
        FROM deg d WHERE d.n % 50 = 0
    ),
    r0 AS MATERIALIZED (
        SELECT d.n, CAST(COALESCE(b.base, 0) AS BIGINT) AS r
        FROM deg d LEFT JOIN base b ON b.n = d.n
    ),
    {_JOINER.join(_ppr_round_cte(i) for i in range(1, _ROUNDS + 1))}
    SELECT d.n AS node, d.deg, r.r AS rank_nano
    FROM deg d JOIN r{_ROUNDS} r ON r.n = d.n
    WHERE r.r > 0
    ORDER BY rank_nano DESC, node LIMIT 20
    """,
)
def personalized_pagerank_copurchase_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Seeded PageRank (seeds = every 50th part) over order-basket
    co-occurrence, 3 rounds, integer-nano ranks (operators/graph.py
    personalized_pagerank): each round ships floor(rank/degree) along
    edges and re-ranks (15·base + 85·inflow)//100 — pure integer
    division, so both engines land on identical nanos with no float
    accumulation order to diverge. Top-20 by rank. The oracle unrolls
    the same three rounds. Scale shape = the LPA loop: E-sized join +
    node-sized state per round."""
    li = (
        tables(spark, sf_dir)["lineitem"]
        .filter(F.col("l_orderkey") % 2 == 0)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("id_a"),
            F.col("b.l_partkey").alias("id_b"),
        )
    )
    ranks = personalized_pagerank(
        edges, "id_a", "id_b", F.col("n") % 50 == 0, rounds=_ROUNDS
    )
    return (
        ranks.filter(F.col("rank_nano") > 0)
        .select(F.col("n").alias("node"), "deg", "rank_nano")
        .orderBy(F.desc("rank_nano"), F.asc("node"))
        .limit(20)
    )
