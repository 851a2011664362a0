"""Round-7 session-20 queries: the data-quality audit trio — snapshot
diff, referential integrity, functional dependencies.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) audits view DEPENDENCIES; these audit the DATA the views
read — the reconciliation (what changed between snapshots), integrity
(do foreign keys resolve), and dependency (does A determine B) checks
a warehouse runs before trusting a refresh."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import query, tables


@query(
    "snapshot_diff_report",
    oracle="""
    WITH newv AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 11 = 5
                    THEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                         + 500
                    ELSE CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
               END AS cents,
               o_orderpriority
        FROM orders WHERE NOT (o_orderkey % 13 = 2)),
    oldv AS (SELECT o_orderkey,
                    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                    o_orderpriority
             FROM orders),
    j AS (SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS k,
                 o.cents AS oc, n.cents AS nc,
                 o.o_orderkey IS NULL AS added,
                 n.o_orderkey IS NULL AS removed
          FROM oldv o FULL JOIN newv n ON o.o_orderkey = n.o_orderkey)
    SELECT CAST(SUM(CASE WHEN added THEN 1 ELSE 0 END) AS BIGINT)
               AS n_added,
           CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed,
           CAST(SUM(CASE WHEN NOT added AND NOT removed AND oc <> nc
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           CAST(SUM(CASE WHEN NOT added AND NOT removed AND oc = nc
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
           CAST(SUM(CASE WHEN NOT added AND NOT removed
                    THEN ABS(nc - oc) ELSE 0 END) AS BIGINT)
               AS total_cents_drift
    FROM j
    """,
)
def snapshot_diff_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: diff two versions of the orders table
    (the 'new' snapshot deterministically drops keys ≡2 mod 13 and
    bumps cents on keys ≡5 mod 11) into added / removed / changed /
    unchanged counts plus the absolute value drift — the refresh
    acceptance report run before a downstream table trusts an upstream
    reload. One full outer join on the key; every figure is an exact
    integer. At 100 TB: the join shuffles both snapshots once on the
    key — the same cost as the reload's own write, and partition-local
    if both snapshots share a bucketed layout."""
    o = tables(spark, sf_dir)["orders"]
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    oldv = o.select(F.col("o_orderkey").alias("k"), cents.alias("oc"))
    newv = (
        o.filter(~(F.col("o_orderkey") % 13 == 2))
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(F.col("o_orderkey") % 11 == 5, cents + 500)
            .otherwise(cents)
            .alias("nc"),
        )
    )
    j = oldv.join(newv, "k", "full_outer").select(
        F.col("oc").isNull().alias("added"),
        F.col("nc").isNull().alias("removed"),
        "oc",
        "nc",
    )
    both = ~F.col("added") & ~F.col("removed")
    return j.agg(
        F.sum(F.col("added").cast("long")).cast("long").alias("n_added"),
        F.sum(F.col("removed").cast("long")).cast("long").alias("n_removed"),
        F.sum((both & (F.col("oc") != F.col("nc"))).cast("long"))
        .cast("long")
        .alias("n_changed"),
        F.sum((both & (F.col("oc") == F.col("nc"))).cast("long"))
        .cast("long")
        .alias("n_unchanged"),
        F.sum(F.when(both, F.abs(F.col("nc") - F.col("oc"))).otherwise(0))
        .cast("long")
        .alias("total_cents_drift"),
    )


@query(
    "referential_integrity_audit",
    oracle="""
    SELECT 'lineitem.l_orderkey -> orders' AS fk,
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_rows,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'lineitem.l_partkey -> part',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))
    ORDER BY fk
    """,
)
def referential_integrity_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for four foreign-key
    relationships (fact→dim anti-joins) — the load-time gate that
    catches a partial dimension reload before every downstream join
    silently drops rows. Each check is one LEFT ANTI join; dimension
    sides broadcast (or AQE decides at the customer/orders scale), the
    fact side is never shuffled twice because each relationship scans
    independently — at 100 TB run the audits as one pass per fact
    table with multiple dim probes if scan cost dominates."""
    t = tables(spark, sf_dir)
    checks = [
        ("lineitem.l_orderkey -> orders", t["lineitem"], "l_orderkey",
         t["orders"], "o_orderkey"),
        ("orders.o_custkey -> customer", t["orders"], "o_custkey",
         t["customer"], "c_custkey"),
        ("customer.c_nationkey -> nation", t["customer"], "c_nationkey",
         t["nation"], "n_nationkey"),
        ("lineitem.l_partkey -> part", t["lineitem"], "l_partkey",
         t["part"], "p_partkey"),
    ]
    outs = []
    for name, fact, fk, dim, pk in checks:
        orphans = fact.join(
            dim.select(pk), fact[fk] == dim[pk], "left_anti"
        ).agg(F.count("*").cast("long").alias("n_orphans"))
        total = fact.agg(F.count("*").cast("long").alias("n_rows"))
        outs.append(
            total.crossJoin(orphans).select(
                F.lit(name).alias("fk"), "n_rows", "n_orphans"
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res.orderBy("fk")


@query(
    "functional_dependency_audit",
    oracle="""
    SELECT 'orders: o_orderkey -> o_custkey' AS fd,
           CAST((SELECT COUNT(*) FROM (
                SELECT o_orderkey FROM orders
                GROUP BY o_orderkey HAVING COUNT(DISTINCT o_custkey) > 1))
                AS BIGINT) AS n_violating_keys
    UNION ALL
    SELECT 'lineitem: (l_orderkey,l_linenumber) unique',
           (SELECT COUNT(*) FROM (
                SELECT l_orderkey, l_linenumber FROM lineitem
                GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1))
    UNION ALL
    SELECT 'nation: n_nationkey -> n_regionkey',
           (SELECT COUNT(*) FROM (
                SELECT n_nationkey FROM nation
                GROUP BY n_nationkey HAVING COUNT(DISTINCT n_regionkey) > 1))
    UNION ALL
    SELECT 'events: user_id -> event_type (expected violated)',
           (SELECT COUNT(*) FROM (
                SELECT user_id FROM events
                GROUP BY user_id HAVING COUNT(DISTINCT event_type) > 1))
    ORDER BY fd
    """,
)
def functional_dependency_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit: for each candidate rule 'A
    determines B' (or 'A is unique'), the number of left-hand-side
    keys with more than one right-hand value — schema assumptions
    (natural keys, denormalization invariants) made measurable. The
    fourth rule is a deliberately FALSE dependency (users emit many
    event types), so the audit demonstrably reports violations rather
    than rubber-stamping — and writing it surfaced a real testdata
    property: the synthetic lineitem's (l_orderkey, l_linenumber) is
    NOT unique (unlike real TPC-H), which the audit reports instead of
    assuming. Each rule is one map-side-combinable
    groupBy + HAVING; nothing leaves the aggregate but violating-key
    counts."""
    t = tables(spark, sf_dir)
    rules = [
        (
            "orders: o_orderkey -> o_custkey",
            t["orders"].groupBy("o_orderkey").agg(
                F.countDistinct("o_custkey").alias("nv")
            ),
        ),
        (
            "lineitem: (l_orderkey,l_linenumber) unique",
            t["lineitem"].groupBy("l_orderkey", "l_linenumber").agg(
                F.count("*").alias("nv")
            ),
        ),
        (
            "nation: n_nationkey -> n_regionkey",
            t["nation"].groupBy("n_nationkey").agg(
                F.countDistinct("n_regionkey").alias("nv")
            ),
        ),
        (
            "events: user_id -> event_type (expected violated)",
            t["events"].groupBy("user_id").agg(
                F.countDistinct("event_type").alias("nv")
            ),
        ),
    ]
    outs = [
        g.filter(F.col("nv") > 1)
        .agg(F.count("*").cast("long").alias("n_violating_keys"))
        .select(F.lit(name).alias("fd"), "n_violating_keys")
        for name, g in rules
    ]
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res.orderBy("fd")
