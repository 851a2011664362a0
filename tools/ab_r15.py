#!/usr/bin/env python
"""Same-session alternating A/B for the r15 optimization round: the OLD
(pre-r15) implementations inlined here next to the NEW package ones,
timed alternating old/new/old/new in ONE session so host drift and JIT
state cancel (the r14 measurement discipline, OPTIMIZATION_r14.md).

Each candidate shipped into the package only after (a) the A/B was
green with the candidate inlined here and (b) result equality held
(--check); the final package-vs-old numbers quoted in
OPTIMIZATION_r15.md come from re-running this tool after the swap.

Usage: python tools/ab_r15.py [boilerplate|substr|qew|wm|qiw ...]
       [--rounds N] [--check]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from clickhouse_objects_analysis_spark.operators.dist_rank import (  # noqa: E402
    dist_cumsum,
)
from clickhouse_objects_analysis_spark.queries import QUERIES  # noqa: E402
from clickhouse_objects_analysis_spark.queries.registry import tables  # noqa: E402
from clickhouse_objects_analysis_spark.session import (  # noqa: E402
    get_spark,
    widen_scan,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# --- OLD boilerplate_span_scrub (r14 shape: struct<pos,s> grams,
# count_distinct over gram strings) -------------------------------------


def boilerplate_old(spark, sf_dir, ngram=5, min_df=3):
    d = tables(spark, sf_dir)["documents"].select("doc_id", "text")
    base = d.select("doc_id", F.split("text", " ").alias("ws"))
    empty = F.array().cast("array<struct<pos:int,s:string>>")
    grams = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ws") >= ngram,
                F.transform(
                    F.sequence(F.lit(0), F.size("ws") - ngram),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.concat_ws(
                            " ",
                            *[
                                F.get(F.col("ws"), i + j)
                                for j in range(ngram)
                            ],
                        ).alias("s"),
                    ),
                ),
            ).otherwise(empty)
        ).alias("g"),
    ).select("doc_id", "g.pos", "g.s")
    frequent = (
        grams.groupBy("s")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("s")
    )
    hit_pos = (
        grams.join(frequent, "s")
        .groupBy("doc_id")
        .agg(F.collect_list("pos").alias("hits"))
    )
    covered = F.array_distinct(
        F.flatten(
            F.transform("hits", lambda p: F.sequence(p, p + (ngram - 1)))
        )
    )
    joined = base.join(hit_pos, "doc_id", "left").withColumn(
        "cov", F.coalesce(covered, F.array().cast("array<int>"))
    )
    kept = F.filter("ws", lambda x, i: ~F.array_contains(F.col("cov"), i))
    return joined.select(
        F.col("doc_id"),
        F.concat_ws(" ", kept).alias("scrubbed_text"),
        (F.size("ws") - F.size(kept)).cast("long").alias("n_removed"),
    ).orderBy("doc_id")


# --- OLD substring_dup_spans (md5 hex keys, count_distinct) ------------

_WIN = 40


def substr_old(spark, sf_dir):
    d = widen_scan(tables(spark, sf_dir)["documents"]).filter(
        F.length("text") >= _WIN
    )
    w = d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.length("text") - _WIN + 1)
        ).alias("i"),
        "text",
    ).select(
        "doc_id",
        F.md5(F.substring(F.col("text"), F.col("i"), _WIN)).alias("h"),
    )
    dup = (
        w.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= 2)
        .select("h", F.lit(1).alias("is_dup"))
    )
    per = (
        w.join(dup, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_windows"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
            .cast("long")
            .alias("dup_windows"),
        )
    )
    return per.select(
        "doc_id",
        "total_windows",
        "dup_windows",
        F.round(
            F.col("dup_windows").cast("double") / F.col("total_windows"), 6
        ).alias("dup_ratio"),
    ).orderBy("doc_id")


# --- OLD quantile family (full dist_cumsum over the near-unique price
# histogram) -------------------------------------------------------------


def qew_old(spark, sf_dir):
    li = tables(spark, sf_dir)["lineitem"]
    h = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
        F.col("l_quantity").cast("long").alias("w"),
    ).groupBy("l_returnflag", "y").agg(F.sum("w").alias("w"))
    h = dist_cumsum(h, "y", ["w"], keys=["l_returnflag"])
    tot = h.groupBy("l_returnflag").agg(F.sum("w").alias("tw"))
    c = h.join(F.broadcast(tot), "l_returnflag").select(
        "l_returnflag", "y", F.col("cum_w").alias("cw"), "tw"
    )
    return (
        c.groupBy("l_returnflag")
        .agg(
            F.min(F.when(4 * F.col("cw") >= F.col("tw"), F.col("y")))
            .cast("long")
            .alias("p25_cents"),
            F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("y")))
            .cast("long")
            .alias("p50_cents"),
            F.min(F.when(4 * F.col("cw") >= 3 * F.col("tw"), F.col("y")))
            .cast("long")
            .alias("p75_cents"),
        )
        .orderBy("l_returnflag")
    )


def wm_old(spark, sf_dir):
    li = tables(spark, sf_dir)["lineitem"]
    h = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("w")
    )
    h = dist_cumsum(h, "l_extendedprice", ["w"], keys=["l_returnflag"])
    tot = h.groupBy("l_returnflag").agg(F.sum("w").alias("total"))
    return (
        h.join(F.broadcast(tot), "l_returnflag")
        .filter(2 * F.col("cum_w") >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("weighted_median"))
        .orderBy("l_returnflag")
    )


def qiw_old(spark, sf_dir):
    li = tables(spark, sf_dir)["lineitem"]
    h = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
        F.col("l_quantity").cast("long").alias("w"),
    ).groupBy("l_returnflag", "y").agg(F.sum("w").alias("w"))
    h = dist_cumsum(h, "y", ["w"], keys=["l_returnflag"])
    tot = h.groupBy("l_returnflag").agg(F.sum("w").alias("tw"))
    c = h.join(F.broadcast(tot), "l_returnflag")
    lo = c.groupBy("l_returnflag").agg(
        F.max(
            F.when(2 * F.col("cum_w") <= F.col("tw"), F.col("y"))
        ).alias("y_lo"),
        F.min(
            F.when(2 * F.col("cum_w") >= F.col("tw"), F.col("y"))
        ).alias("y_hi"),
        F.max(
            F.when(2 * F.col("cum_w") <= F.col("tw"), F.col("cum_w"))
        ).alias("cw_lo"),
        F.max("tw").alias("tw"),
    )
    med = (
        F.when(F.col("y_lo").isNull(), F.col("y_hi").cast("double"))
        .when(
            (2 * F.col("cw_lo") == F.col("tw"))
            & F.col("y_hi").isNotNull()
            & (F.col("y_hi") > F.col("y_lo")),
            (F.col("y_lo") + F.col("y_hi")) / F.lit(2.0),
        )
        .otherwise(F.col("y_hi").cast("double"))
    )
    return lo.select(
        "l_returnflag",
        F.round(med / F.lit(100.0), 4).cast("double").alias("median_interp"),
    ).orderBy("l_returnflag")


# --- OLD batch-2: row_number top-1 windows (the gopher min-struct hunt)


def ft_old(spark, sf_dir):
    ev = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ft = (
        ev.select(
            "user_id", "event_type", "ts", F.row_number().over(w).alias("rk")
        )
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("first_touch"),
            F.col("ts").alias("t0"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pt")
    )
    conv = (
        ft.join(
            purchases,
            (F.col("user_id") == F.col("pu")) & (F.col("pt") > F.col("t0")),
        )
        .select("user_id", "first_touch")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    rate = F.col("n_converted").cast("double") / F.col("n_users")
    return (
        ft.join(conv, ["user_id", "first_touch"], "left")
        .groupBy("first_touch")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.count("converted").cast("long").alias("n_converted"),
        )
        .select(
            "first_touch",
            "n_users",
            "n_converted",
            (F.floor(rate * 10000 + F.lit(0.5)) / 10000).alias(
                "conversion_rate"
            ),
        )
        .orderBy("first_touch")
    )


def abp_old(spark, sf_dir):
    from clickhouse_objects_analysis_spark.queries.r7_wave27 import (
        _Z_A,
        _Z_B,
    )

    ev = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ft = (
        ev.select(
            "user_id", "event_type", "ts", F.row_number().over(w).alias("rk")
        )
        .filter(
            (F.col("rk") == 1) & F.col("event_type").isin("view", "click")
        )
        .select(
            "user_id",
            F.col("event_type").alias("arm"),
            F.col("ts").alias("t0"),
        )
    )
    conv = (
        ft.join(
            ev.filter(F.col("event_type") == "purchase").select(
                F.col("user_id").alias("cu"), F.col("ts").alias("ct")
            ),
            (F.col("user_id") == F.col("cu"))
            & (F.col("ct") > F.col("t0"))
            & (
                F.unix_micros("ct") - F.unix_micros("t0")
                <= 259200000000
            ),
        )
        .select("user_id")
        .distinct()
        .withColumn("cv", F.lit(1))
    )
    arms = (
        ft.join(conv, "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.count("cv").cast("long").alias("n_conv"),
        )
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "view", F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("arm") == "view", F.col("n_conv"))).alias("c1"),
        F.max(F.when(F.col("arm") == "click", F.col("n_users"))).alias("n2"),
        F.max(F.when(F.col("arm") == "click", F.col("n_conv"))).alias("c2"),
    )
    p1 = F.col("c1").cast("double") / F.col("n1")
    p2 = F.col("c2").cast("double") / F.col("n2")
    z = F.lit(_Z_A) + F.lit(_Z_B)
    return wide.select(
        F.col("n1").cast("long").alias("n_view"),
        F.col("c1").cast("long").alias("conv_view"),
        F.col("n2").cast("long").alias("n_click"),
        F.col("c2").cast("long").alias("conv_click"),
        (F.floor(p1 * 10000 + F.lit(0.5)) / 10000).alias("p_view"),
        (F.floor(p2 * 10000 + F.lit(0.5)) / 10000).alias("p_click"),
        F.ceil(
            z * z * (p1 * (1 - p1) + p2 * (1 - p2)) / ((p1 - p2) * (p1 - p2))
        )
        .cast("long")
        .alias("n_per_arm"),
    )


def frr_old(spark, sf_dir):
    o = tables(spark, sf_dir)["orders"]
    v1 = o.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", F.lit(1).alias("ver")
    )
    v2 = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
        F.lit(2).alias("ver"),
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.col("ver").desc())
    final = (
        v1.unionByName(v2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        final.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(38,6)")), 2)
            .cast("double")
            .alias("total"),
        )
        .orderBy("o_orderstatus")
    )


def anyjoin_old(spark, sf_dir):
    t = tables(spark, sf_dir)
    orders = t["orders"].select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderkey").alias("first_orderkey"),
        F.col("o_orderdate").alias("first_orderdate"),
    )
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("first_orderdate"), F.col("first_orderkey")
    )
    deduped = (
        orders.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    res = t["customer"].join(deduped, on=["c_custkey"], how="left")
    return res.select(
        "c_custkey", "first_orderkey", "first_orderdate"
    ).orderBy("c_custkey")


OLD = {
    "boilerplate": ("boilerplate_span_scrub", boilerplate_old),
    "substr": ("substring_dup_spans", substr_old),
    "qew": ("quantiles_exact_weighted", qew_old),
    "wm": ("weighted_median", wm_old),
    "qiw": ("quantile_interpolated_weighted", qiw_old),
    "ft": ("first_touch_attribution", ft_old),
    "abp": ("ab_test_power_analysis", abp_old),
    "frr": ("final_replacing_read", frr_old),
    "anyjoin": ("any_join", anyjoin_old),
}


def main() -> None:
    args = sys.argv[1:]
    rounds = 4
    check = False
    if "--check" in args:
        check = True
        args.remove("--check")
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1])
        args = args[: i] + args[i + 2 :]
    names = args or list(OLD)
    if check:
        spark = get_spark("ab-r15-check")
        spark.sparkContext.setLogLevel("ERROR")
        for short in names:
            qname, old_fn = OLD[short]
            old = old_fn(spark, SF_DIR).toPandas()
            new = QUERIES[qname](spark, SF_DIR).toPandas()
            same_cols = list(old.columns) == list(new.columns)
            same = same_cols and len(old) == len(new) and old.equals(new)
            print(
                f"{qname}: cols_eq={same_cols} rows={len(old)}/{len(new)} "
                f"EQUAL={same}"
            )
            if not same and same_cols and len(old) == len(new):
                diff = (old != new) & ~(old.isna() & new.isna())
                bad = diff.any(axis=1)
                print(old[bad].head(5))
                print(new[bad].head(5))
        return
    spark = get_spark("ab-r15")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    for short in names:
        qname, old_fn = OLD[short]
        new_fn = QUERIES[qname]
        olds, news = [], []
        for r in range(rounds):
            for label, fn, out in (
                ("old", old_fn, olds),
                ("new", new_fn, news),
            ):
                spark.sparkContext.setJobDescription(f"{short}-{label}-{r}")
                t0 = time.time()
                fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                out.append(round(time.time() - t0, 3))
        print(
            f"{qname}: old={olds} new={news} "
            f"min {min(olds):.2f}->{min(news):.2f}"
        )


if __name__ == "__main__":
    main()
