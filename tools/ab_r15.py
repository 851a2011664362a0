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


OLD = {
    "boilerplate": ("boilerplate_span_scrub", boilerplate_old),
    "substr": ("substring_dup_spans", substr_old),
    "qew": ("quantiles_exact_weighted", qew_old),
    "wm": ("weighted_median", wm_old),
    "qiw": ("quantile_interpolated_weighted", qiw_old),
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
