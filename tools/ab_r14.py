#!/usr/bin/env python
"""Same-session alternating A/B for the r14 rewrites: the OLD (r13/HEAD)
implementations are inlined below and timed against the NEW package
implementations in ONE session, alternating runs, so host drift and JIT
state cancel instead of swamping the effect.

Usage: python tools/ab_r14.py [gopher|boiler|ppr ...] [--rounds N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from clickhouse_objects_analysis_spark.queries import QUERIES  # noqa: E402
from clickhouse_objects_analysis_spark.queries.registry import (  # noqa: E402
    q6,
    tables,
)
from clickhouse_objects_analysis_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_T2, _T3, _TD5 = 0.20, 0.18, 0.90
_NGRAM, _MIN_DF = 5, 3


def gopher_old(spark, sf_dir):
    d = (
        tables(spark, sf_dir)["documents"]
        .select(
            "doc_id",
            F.length("text").alias("n_chars"),
            F.filter(
                F.split(F.trim(F.col("text")), r"\s+"),
                lambda x: F.length(x) > 0,
            ).alias("ws"),
        )
        .filter(F.size("ws") >= 5)
        .repartition(32, "doc_id")
    )
    tok = d.select("doc_id", "n_chars", F.posexplode("ws").alias("pos", "w"))
    wd = Window.partitionBy("doc_id").orderBy("pos")
    g = tok.select(
        "doc_id",
        "n_chars",
        F.concat_ws(" ", "w", F.lead("w", 1).over(wd)).alias("g2"),
        F.lead("w", 1).over(wd).isNotNull().alias("f2"),
        F.concat_ws(
            " ", "w", F.lead("w", 1).over(wd), F.lead("w", 2).over(wd)
        ).alias("g3"),
        F.lead("w", 2).over(wd).isNotNull().alias("f3"),
        F.concat_ws(
            " ",
            "w",
            F.lead("w", 1).over(wd),
            F.lead("w", 2).over(wd),
            F.lead("w", 3).over(wd),
            F.lead("w", 4).over(wd),
        ).alias("g5"),
        F.lead("w", 4).over(wd).isNotNull().alias("f5"),
    ).localCheckpoint(eager=False)

    def top_frac(gcol, fcol):
        cnts = (
            g.filter(F.col(fcol))
            .groupBy("doc_id", gcol)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w1 = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.col(gcol))
        return (
            cnts.withColumn("rn", F.row_number().over(w1))
            .filter(F.col("rn") == 1)
            .select(
                "doc_id", (F.col("cnt") * F.length(gcol)).alias("top_chars")
            )
        )

    top2 = top_frac("g2", "f2")
    top3 = top_frac("g3", "f3")
    dup5 = (
        g.filter("f5")
        .groupBy("doc_id", "g5")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("cnt") >= 2, F.col("cnt") * F.length("g5"))
                ),
                F.lit(0),
            ).alias("dup_chars")
        )
    )
    base = d.select("doc_id", "n_chars")
    f2c = F.col("top_chars_2").cast("double") / F.col("n_chars")
    f3c = F.col("top_chars_3").cast("double") / F.col("n_chars")
    f5c = F.col("dup_chars").cast("double") / F.col("n_chars")
    return (
        base.join(top2.withColumnRenamed("top_chars", "top_chars_2"), "doc_id")
        .join(top3.withColumnRenamed("top_chars", "top_chars_3"), "doc_id")
        .join(dup5, "doc_id")
        .select(
            "doc_id",
            q6(f2c).alias("top2_frac"),
            q6(f3c).alias("top3_frac"),
            q6(f5c).alias("dup5_frac"),
            F.when((f2c <= _T2) & (f3c <= _T3) & (f5c <= _TD5), 1)
            .otherwise(0)
            .cast("int")
            .alias("keep"),
        )
        .orderBy("doc_id")
    )


def boiler_old(spark, sf_dir):
    ngram, min_df = _NGRAM, _MIN_DF
    df = tables(spark, sf_dir)["documents"]
    d = df.select(F.col("doc_id"), F.col("text"))
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    sh = tok.select(
        "doc_id",
        "pos",
        F.concat_ws(
            " ", "w", *[F.lead("w", i).over(wd) for i in range(1, ngram)]
        ).alias("s"),
        F.lead("w", ngram - 1).over(wd).isNotNull().alias("is_full"),
    )
    occurrences = sh.filter("is_full")
    frequent = (
        occurrences.groupBy("s")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("s")
    )
    covered = (
        occurrences.join(frequent, "s")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (ngram - 1))
            ).alias("cpos"),
        )
        .distinct()
    )
    kept = tok.join(
        covered,
        (tok["doc_id"] == covered["doc_id"]) & (tok["pos"] == covered["cpos"]),
        "left_anti",
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "w"))),
                lambda st: st["w"],
            ),
            " ",
        ).alias("scrubbed"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    orig = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_orig")
    )
    return (
        orig.join(rebuilt, "doc_id", "left")
        .select(
            F.col("doc_id"),
            F.coalesce(F.col("scrubbed"), F.lit("")).alias("scrubbed_text"),
            (F.col("n_orig") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
        .orderBy("doc_id")
    )


def ppr_old(spark, sf_dir):
    """OLD personalized_pagerank small-arm storage (persist kept through
    the loop) driving the same copurchase query front."""
    from clickhouse_objects_analysis_spark.operators import graph as G

    li = (
        tables(spark, sf_dir)["lineitem"]
        .filter(F.col("l_orderkey") % 2 == 0)
        .select("l_orderkey", "l_partkey")
    )
    ea, eb = li.alias("a"), li.alias("b")
    edges = (
        ea.join(eb, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("id_a"),
            F.col("b.l_partkey").alias("id_b"),
        )
    )
    src, dst, seed_pred, rounds = (
        "id_a",
        "id_b",
        F.col("n") % 50 == 0,
        3,
    )
    a, b = F.col(src).cast("long"), F.col(dst).cast("long")
    canon = (
        edges.select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = (
        canon.select(F.col("u").alias("n"), F.col("v").alias("m"))
        .unionAll(canon.select(F.col("v").alias("n"), F.col("u").alias("m")))
        .persist()
    )
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    nodes = deg.select("n", "deg").localCheckpoint(eager=True)
    n_nodes = nodes.count()
    big = n_nodes > G._BROADCAST_NODES_GATE
    if big:
        raise RuntimeError("A/B expects the small arm at sf0.1")
    adj_deg = adj.join(F.broadcast(nodes), "n")
    seeds = nodes.filter(seed_pred).select("n")
    n_seeds = seeds.count()
    base_nano = 1_000_000_000 // max(n_seeds, 1)
    base = nodes.join(seeds, "n", "left_semi").select(
        "n", F.lit(base_nano).alias("base")
    )
    ranks = nodes.join(base, "n", "left").select(
        "n", F.coalesce(F.col("base"), F.lit(0)).alias("r")
    )
    for _ in range(rounds):
        share = adj_deg.join(ranks, "n").select(
            "m", F.expr("r div deg").alias("s")
        )
        inflow = share.groupBy(F.col("m").alias("n")).agg(
            F.sum("s").cast("long").alias("inflow")
        )
        ranks = (
            nodes.join(inflow, "n", "left")
            .join(base, "n", "left")
            .select(
                "n",
                F.expr(
                    "(15 * coalesce(base, 0L) + 85 * coalesce(inflow, 0L))"
                    " div 100"
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    out = nodes.join(ranks, "n").select(
        "n", "deg", F.col("r").alias("rank_nano")
    )
    adj.unpersist(blocking=False)
    return (
        out.filter(F.col("rank_nano") > 0)
        .select(F.col("n").alias("node"), "deg", "rank_nano")
        .orderBy(F.desc("rank_nano"), F.asc("node"))
        .limit(20)
    )


def ppr_lazy(spark, sf_dir):
    """CANDIDATE small-arm variant: per-round rank checkpoints LAZY, one
    materializing action after the loop — collapses `rounds` job
    dispatches into one."""
    li = (
        tables(spark, sf_dir)["lineitem"]
        .filter(F.col("l_orderkey") % 2 == 0)
        .select("l_orderkey", "l_partkey")
    )
    ea, eb = li.alias("a"), li.alias("b")
    edges = (
        ea.join(eb, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("id_a"),
            F.col("b.l_partkey").alias("id_b"),
        )
    )
    seed_pred, rounds = F.col("n") % 50 == 0, 3
    a, b = F.col("id_a").cast("long"), F.col("id_b").cast("long")
    canon = (
        edges.select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = (
        canon.select(F.col("u").alias("n"), F.col("v").alias("m"))
        .unionAll(canon.select(F.col("v").alias("n"), F.col("u").alias("m")))
        .persist()
    )
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    nodes = deg.select("n", "deg").localCheckpoint(eager=True)
    nodes.count()
    adj_deg = adj.join(F.broadcast(nodes), "n")
    seeds = nodes.filter(seed_pred).select("n")
    n_seeds = seeds.count()
    base_nano = 1_000_000_000 // max(n_seeds, 1)
    base = nodes.join(seeds, "n", "left_semi").select(
        "n", F.lit(base_nano).alias("base")
    )
    ranks = nodes.join(base, "n", "left").select(
        "n", F.coalesce(F.col("base"), F.lit(0)).alias("r")
    )
    for _ in range(rounds):
        share = adj_deg.join(ranks, "n").select(
            "m", F.expr("r div deg").alias("s")
        )
        inflow = share.groupBy(F.col("m").alias("n")).agg(
            F.sum("s").cast("long").alias("inflow")
        )
        ranks = (
            nodes.join(inflow, "n", "left")
            .join(base, "n", "left")
            .select(
                "n",
                F.expr(
                    "(15 * coalesce(base, 0L) + 85 * coalesce(inflow, 0L))"
                    " div 100"
                ).alias("r"),
            )
            .localCheckpoint(eager=False)  # LAZY per-round state
        )
    out = (
        nodes.join(ranks, "n")
        .select("n", "deg", F.col("r").alias("rank_nano"))
        .localCheckpoint(eager=True)  # ONE materializing action
    )
    adj.unpersist(blocking=False)
    return (
        out.filter(F.col("rank_nano") > 0)
        .select(F.col("n").alias("node"), "deg", "rank_nano")
        .orderBy(F.desc("rank_nano"), F.asc("node"))
        .limit(20)
    )


def lpa_eager(spark, sf_dir):
    """OLD (r13) LPA small arm: EAGER per-round label checkpoints —
    driving the same communities query front."""
    li = (
        tables(spark, sf_dir)["lineitem"]
        .filter(F.col("l_orderkey") % 2 == 0)
        .select("l_orderkey", "l_partkey")
    )
    ea, eb = li.alias("a"), li.alias("b")
    edges = (
        ea.join(eb, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("id_a"),
            F.col("b.l_partkey").alias("id_b"),
        )
    )
    rounds = 3
    a, b = F.col("id_a").cast("long"), F.col("id_b").cast("long")
    canon = (
        edges.select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = (
        canon.select(F.col("u").alias("n"), F.col("v").alias("m"))
        .unionAll(canon.select(F.col("v").alias("n"), F.col("u").alias("m")))
        .localCheckpoint(eager=True)
    )
    labels = (
        adj.select("n")
        .distinct()
        .withColumn("lbl", F.col("n"))
        .localCheckpoint(eager=True)
    )
    labels.count()
    for _ in range(rounds):
        rhs = labels.select(F.col("n").alias("m"), "lbl")
        votes = (
            adj.join(rhs, "m")
            .groupBy("n", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        top = votes.groupBy("n").agg(
            F.max(F.struct(F.col("c"), (-F.col("lbl")).alias("nl"))).alias(
                "t"
            )
        )
        labels = top.select(
            "n", (-F.col("t.nl")).alias("lbl")
        ).localCheckpoint(eager=True)
    comm = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("size"))
    return (
        comm.groupBy("size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_communities"),
            F.sum("lbl").cast("long").alias("sum_labels"),
        )
        .select(
            F.col("size").cast("long").alias("size"),
            "n_communities",
            "sum_labels",
        )
        .orderBy("size")
    )


PAIRS = {
    "gopher": (gopher_old, "gopher_repetition_rules"),
    "boiler": (boiler_old, "boilerplate_span_scrub"),
    "ppr": (ppr_old, "personalized_pagerank_copurchase"),
    # old slot = CANDIDATE lazy variant, new slot = shipped package code
    "pprlazy": (ppr_lazy, "personalized_pagerank_copurchase"),
    "lpalazy": (lpa_eager, "label_propagation_communities"),
}


def main() -> None:
    args = sys.argv[1:]
    rounds = 4
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    which = args or list(PAIRS)
    spark = get_spark("ab-r14")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    out = {}
    for name in which:
        old_fn, qname = PAIRS[name]
        olds, news = [], []
        for _ in range(rounds):
            t0 = time.perf_counter()
            old_fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            olds.append(round(time.perf_counter() - t0, 3))
            t0 = time.perf_counter()
            QUERIES[qname](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            news.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "old": olds,
            "new": news,
            "old_min": min(olds),
            "new_min": min(news),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
