"""Round-8 query wave 8: label propagation community detection (LPA)
over the co-purchase graph — the classic "what product families emerge
from order baskets" clustering, and the frequency-vote counterpart to
the min-label connected-components family the dedup stack already has.

Reference parity note: no community surface in the reference repo;
extends the graph charter (SURVEY §7) alongside PageRank, k-core,
triangles, and connected components.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.graph import label_propagation
from .registry import query, tables

_ROUNDS = 3
_JOINER = ",\n    "


def _lpa_round_cte(i: int) -> str:
    """One synchronous LPA round: neighbor-label votes, then the
    deterministic top-1 (count DESC, label ASC) per node. MATERIALIZED
    for the same reason as the k-core peel chain — each round reads the
    previous one's output twice."""
    return (
        f"v{i} AS MATERIALIZED (SELECT a.n, l.lbl, COUNT(*) AS c "
        f"FROM adj a JOIN l{i - 1} l ON a.m = l.n GROUP BY a.n, l.lbl),\n"
        f"    l{i} AS MATERIALIZED (SELECT n, lbl FROM ("
        f"SELECT n, lbl, ROW_NUMBER() OVER (PARTITION BY n "
        f"ORDER BY c DESC, lbl) AS rn FROM v{i}) WHERE rn = 1)"
    )


@query(
    "label_propagation_communities",
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
    l0 AS MATERIALIZED (SELECT DISTINCT n, n AS lbl FROM adj),
    {_JOINER.join(_lpa_round_cte(i) for i in range(1, _ROUNDS + 1))},
    comm AS (
        SELECT lbl, COUNT(*) AS size FROM l{_ROUNDS} GROUP BY lbl
    )
    SELECT CAST(size AS BIGINT) AS size,
           CAST(COUNT(*) AS BIGINT) AS n_communities,
           CAST(SUM(lbl) AS BIGINT) AS sum_labels
    FROM comm GROUP BY size ORDER BY size
    """,
)
def label_propagation_communities_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Product communities from order baskets: parts co-occurring in an
    order are edges; 3 synchronous LPA rounds (operators/graph.py
    label_propagation — deterministic frequency vote, ties to the
    smallest label); output is the community-size histogram with a
    label-sum checksum, so the engines agree only if every node's final
    label matches. The oracle unrolls the same three rounds in CTEs.

    Scale shape: basket pair fan-out is C(items_per_order, 2) — bounded
    per order, linear overall; the LPA rounds are a constant number of
    E-sized joins with node-sized state (the k-core loop discipline).
    """
    li = (
        tables(spark, sf_dir)["lineitem"]
        .filter(F.col("l_orderkey") % 2 == 0)  # half the baskets: the
        # operator exercise is identical, the bench constant halves
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
    labels = label_propagation(edges, "id_a", "id_b", rounds=_ROUNDS)
    comm = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("size"))
    return (
        comm.groupBy("size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_communities"),
            F.sum("lbl").cast("long").alias("sum_labels"),
        )
        .select(F.col("size").cast("long").alias("size"), "n_communities", "sum_labels")
        .orderBy("size")
    )
