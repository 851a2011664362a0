"""Round-8 query wave 5: base58 round-trip (the last promotable codec
name, as pure Catalyst bignum arithmetic) and the hashing-trick
bag-of-words vectorizer (the classic fixed-width featurizer an ML data
pipeline runs before any model sees a token).

Reference parity note: neither exists in the reference repo; base58
completes the translation-table codec family (base64 mapped long ago),
feature hashing extends the LLM-data charter (SURVEY §7).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.ch import ch_expr
from .registry import query, tables

_TWO64 = "18446744073709551616"

# Base58 value math in DuckDB HUGEINT; the alphabet indexing mirrors
# the Spark builder (functions/ch.py _base58_encode) digit for digit.
_B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
_B58_DIGITS = " || ".join(
    f"""CASE WHEN v >= {58**k}::HUGEINT {"OR TRUE" if k == 0 else ""}
         THEN substring('{_B58}',
                        CAST((v // {58**k}::HUGEINT) % 58 AS INT) + 1, 1)
         ELSE '' END"""
    for k in range(10, -1, -1)
)


@query(
    "base58_roundtrip",
    oracle=f"""
    WITH src AS (
        SELECT event_id,
               substring(event_type, 1, 8) AS s
        FROM events WHERE event_id % 20 = 3
    ),
    val AS (
        SELECT event_id, s,
               list_reduce(
                   list_prepend(0::HUGEINT,
                       list_transform(generate_series(1, length(s)),
                           i -> ascii(substring(s, i, 1))::HUGEINT)),
                   (acc, b) -> acc * 256 + b) AS v
        FROM src
    )
    SELECT event_id::BIGINT AS eid, s,
           ({_B58_DIGITS}) AS b58,
           length(({_B58_DIGITS})) AS b58_len
    FROM val ORDER BY eid
    """,
)
def base58_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """base58Encode as pure Catalyst DECIMAL(38,0) bignum arithmetic
    (functions/ch.py: byte-fold to a u64 value, 11 fixed digit
    positions, exact floor-divide via pmod subtraction — a plain
    decimal divide rounds HALF_UP and would corrupt digits); the
    DuckDB twin replays the same math in HUGEINT. base58Decode is
    checked as a round-trip invariant in the unit tests (decode ∘
    encode = id over the probe corpus) — the oracle here pins the
    encoder's exact digits. Everything is whole-stage-codegen
    JVM-side: no UDF in either direction."""
    ev = tables(spark, sf_dir)["events"].filter(F.col("event_id") % 20 == 3)
    s = F.substring("event_type", 1, 8)
    b58 = ch_expr("base58Encode", s)
    return ev.select(
        F.col("event_id").cast("long").alias("eid"),
        s.alias("s"),
        b58.alias("b58"),
        F.length(b58).cast("long").alias("b58_len"),
    ).orderBy("eid")


@query(
    "feature_hashing_vectorizer",
    oracle="""
    WITH tk AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE doc_id % 23 = 1
    ),
    b AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 64
                   AS bucket
        FROM tk
    ),
    pb AS (
        SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS c
        FROM b GROUP BY doc_id, bucket
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
           CAST(SUM(c * c) AS BIGINT) AS sq_norm,
           array_to_string(
               list_transform(
                   list_sort(list(bucket * 1000000 + c)),
                   e -> concat(e // 1000000, ':', e % 1000000)), ',')
               AS vec
    FROM pb GROUP BY doc_id ORDER BY doc_id
    """,
)
def feature_hashing_vectorizer_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hashing-trick bag-of-words (HashingTF / feature hashing): tokens
    hash into 64 fixed buckets (md5-prefix integer — the registry's
    engine-portable hash idiom), per-document sparse vectors rendered
    as sorted bucket:count entries plus the exact squared L2 norm.
    Fixed-width featurization with NO vocabulary state is what makes
    this the 100 TB featurizer: no fit pass, no dictionary broadcast,
    just map-side hashing and one (doc, bucket) aggregation. The
    entry-sort packs (bucket, count) into one integer so the sorted
    order is engine-identical without a struct comparator."""
    d = tables(spark, sf_dir)["documents"].filter(F.col("doc_id") % 23 == 1)
    tk = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    bucket = (
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long") % 64
    )
    pb = tk.select("doc_id", bucket.alias("bucket")).groupBy(
        "doc_id", "bucket"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    packed = F.sort_array(
        F.collect_list(F.col("bucket") * 1000000 + F.col("c"))
    )
    vec = F.array_join(
        F.transform(
            packed,
            lambda e: F.concat(
                (e / 1000000).cast("long").cast("string"),
                F.lit(":"),
                F.pmod(e, 1000000).cast("string"),
            ),
        ),
        ",",
    )
    return (
        pb.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_buckets_used"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("sq_norm"),
            vec.alias("vec"),
        )
        .orderBy("doc_id")
    )
