"""Synthesize a 10x-scaled dataset (~sf1) from sf0.1 for the scaling
bench (VERDICT r3 item 6) — testdata tops out at sf0.1 and is read-only,
so the scaled copy lives in .scratch/sf1/.

Construction: 10 key-offset shards of every fact table, joins kept
consistent by offsetting every key column by shard * 10_000_000.
Similarity inputs are decorrelated across shards so pair queries scale
like real corpora instead of degenerating into cross-shard self-matches:

- documents.text is word-salted per shard (every word gets a _s<k>
  suffix; per-doc token counts, lengths and within-shard dup structure
  are preserved — the same trick as SCALE.md's replication experiment).
- embeddings.embedding is circularly rotated by shard (norms and the
  within-shard cosine distribution are preserved; cross-shard cosines
  land in the random-background regime).

Dimensions (region, nation) are NOT replicated — at every real scale
factor they are fixed-size broadcast sides.

Usage: python tools/make_scaled_sf.py [n_shards] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from clickhouse_objects_analysis_spark.session import get_spark, load_tables  # noqa: E402

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000

#: table -> columns to offset per shard
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
PASSTHROUGH = ["region", "nation"]


def main() -> None:
    n_shards = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".scratch", "sf1")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("make-scaled-sf")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, SRC)

    for name in PASSTHROUGH:
        t[name].write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
        print(f"{name}: copied")

    for name, keys in KEYED.items():
        base = t[name]
        shards = []
        for k in range(n_shards):
            s = base
            for col in keys:
                s = s.withColumn(col, F.col(col) + F.lit(k * OFF))
            if name == "documents":
                s = s.withColumn(
                    "text", F.regexp_replace("text", r"(\w+)", rf"$1_s{k}")
                )
            if name == "embeddings":
                d = 64
                r = k % d
                rotated = F.concat(
                    F.slice("embedding", r + 1, d - r),
                    F.slice("embedding", 1, r),
                )
                # beyond d shards the rotation aliases (shard k and k+d
                # would carry IDENTICAL vectors -> bogus cross-shard
                # near-dup pairs); negate odd rotation cycles — a global
                # sign flip preserves within-shard pairwise cosines while
                # pushing the aliased twin to cosine -1
                if (k // d) % 2 == 1:
                    rotated = F.transform(rotated, lambda x: -x)
                s = s.withColumn("embedding", rotated)
            shards.append(s)
        out = shards[0]
        for s in shards[1:]:
            out = out.unionAll(s)
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
        print(f"{name}: x{n_shards}")


if __name__ == "__main__":
    main()
