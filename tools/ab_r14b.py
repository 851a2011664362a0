#!/usr/bin/env python
"""Same-session alternating A/B for the r14 continuation batch: OLD
(pre-edit) implementations inlined next to the NEW package ones, timed
alternating old/new/old/new in ONE session so host drift and JIT state
cancel (the r14 measurement discipline — OPTIMIZATION_r14.md).

Usage: python tools/ab_r14b.py [base58|bloom|overlap ...] [--rounds N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from clickhouse_objects_analysis_spark.functions.ch import (  # noqa: E402
    _B58,
    _D38,
    _dec_div,
)
from clickhouse_objects_analysis_spark.operators.text import (  # noqa: E402
    shingles,
    tokenize,
)
from clickhouse_objects_analysis_spark.queries import QUERIES  # noqa: E402
from clickhouse_objects_analysis_spark.queries.registry import tables  # noqa: E402
from clickhouse_objects_analysis_spark.session import (  # noqa: E402
    get_spark,
    widen_scan,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _old_base58_encode(c):
    alpha = F.array(*[F.lit(ch) for ch in _B58])
    v = F.aggregate(
        F.sequence(F.lit(1), F.length(c)),
        F.lit(0).cast(_D38),
        lambda acc, i: acc * 256 + F.ascii(F.substring(c, i, 1)),
    )
    parts = [
        F.when(
            v >= F.lit(58**k).cast(_D38),
            F.element_at(
                alpha, F.pmod(_dec_div(v, 58**k), 58).cast("int") + 1
            ),
        ).otherwise(F.lit(""))
        for k in range(10, -1, -1)
    ]
    ones = F.repeat(
        F.lit("1"),
        F.length(F.regexp_extract(c, "^\x00*", 0)).cast("int"),
    )
    return (
        F.when(F.length(c) == 0, F.lit(""))
        .when(~c.rlike("^[\x00-\x7f]*$"), F.lit(None).cast("string"))
        .when(F.length(c) <= 8, F.concat(ones, F.concat(*parts)))
    )


def base58_old(spark, sf_dir):
    ev = tables(spark, sf_dir)["events"].filter(F.col("event_id") % 20 == 3)
    s = F.substring("event_type", 1, 8)
    b58 = _old_base58_encode(s)
    return ev.select(
        F.col("event_id").cast("long").alias("eid"),
        s.alias("s"),
        b58.alias("b58"),
        F.length(b58).cast("long").alias("b58_len"),
    ).orderBy("eid")


_BLOOM_BITS = 65536


def bloom_old(spark, sf_dir):
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
        .localCheckpoint(eager=False)
    )
    kp1, kp2 = positions(F.col("k"))
    kb = keys.select(kp1.alias("p")).unionAll(keys.select(kp2.alias("p")))
    bit_of = lambda p: F.pow(F.lit(2.0), p % 32).cast("long")  # noqa: E731
    bloom = kb.groupBy((F.col("p") / 32).cast("long").alias("word")).agg(
        F.bit_or(bit_of(F.col("p"))).alias("bits")
    )
    lp1, lp2 = positions(F.col("l_orderkey"))
    probe = li.select("l_orderkey", lp1.alias("p1"), lp2.alias("p2"))
    b1 = bloom.select(F.col("word").alias("w1"), F.col("bits").alias("bits1"))
    b2 = bloom.select(F.col("word").alias("w2"), F.col("bits").alias("bits2"))
    passed = (
        probe.join(
            F.broadcast(b1), (F.col("p1") / 32).cast("long") == F.col("w1")
        )
        .join(F.broadcast(b2), (F.col("p2") / 32).cast("long") == F.col("w2"))
        .filter(
            (F.col("bits1").bitwiseAND(bit_of(F.col("p1"))) != 0)
            & (F.col("bits2").bitwiseAND(bit_of(F.col("p2"))) != 0)
        )
        .select("l_orderkey")
    )
    truth = li.join(
        keys, li["l_orderkey"] == keys["k"], "left_semi"
    ).select("l_orderkey")
    n_keys = keys.agg(F.count("*").cast("long").alias("n_keys"))
    n_pass = passed.agg(F.count("*").cast("long").alias("n_bloom_pass"))
    n_true = truth.agg(F.count("*").cast("long").alias("n_true"))
    return (
        n_keys.crossJoin(n_pass)
        .crossJoin(n_true)
        .select(
            "n_keys",
            "n_bloom_pass",
            "n_true",
            (F.col("n_bloom_pass") - F.col("n_true")).alias("n_false_pos"),
        )
    )


def overlap_old(spark, sf_dir):
    d = widen_scan(tables(spark, sf_dir)["documents"])
    g = (
        d.select(
            "source",
            F.explode(shingles(tokenize(F.col("text")), 3)).alias("g"),
        )
        .distinct()
    )
    sz = g.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = g.select(F.col("source").alias("src_a"), "g")
    b = g.select(F.col("source").alias("src_b"), "g")
    px = (
        a.join(b, "g")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    sa = sz.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    j = (
        px.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")),
                6,
            ).cast("double"),
        )
        .filter(
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter"))
            >= 0.01
        )
    )
    return j.select("src_a", "src_b", "inter", "jaccard").orderBy(
        "src_a", "src_b"
    )


OLD = {
    "base58": ("base58_roundtrip", base58_old),
    "bloom": ("bloom_semijoin_prune", bloom_old),
    "overlap": ("source_overlap_matrix", overlap_old),
}


def main() -> None:
    args = sys.argv[1:]
    rounds = 4
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    names = args or list(OLD)
    spark = get_spark("ab-r14b")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup
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
