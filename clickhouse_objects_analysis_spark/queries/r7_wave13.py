"""Round-7 session-13 queries: embedding centroid drift, table
profiling, and the URL percent/form encoding surface.

Reference parity note: the reference repo (a ClickHouse lineage
extractor) has none of these; centroid drift is the embedding-space
distribution-shift monitor (the dense sibling of psi_drift), the
profile query is the SUMMARIZE/DESCRIBE-style data-quality sweep every
warehouse runs before trusting a table, and the URL surface locks the
CH percent-vs-form encoding split (encodeURLComponent = %20,
encodeURLFormComponent = '+') after fixing the form-biased percent
mapping."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.ch import ch_expr
from .registry import query, tables


@query(
    "embedding_centroid_drift",
    oracle="""
    WITH q AS (
        SELECT vec_id, label, vec_id % 2 AS half,
               list_transform(embedding::DOUBLE[],
                              x -> CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT))
                   AS v
        FROM embeddings),
    dims AS (
        SELECT label, half, g.i AS dim, CAST(SUM(g.x) AS BIGINT) AS s
        FROM q, (SELECT unnest(v) AS x,
                        generate_subscripts(v, 1) AS i) AS g
        GROUP BY label, half, g.i),
    mat AS (
        SELECT a.label, a.dim,
               CAST(a.s AS DOUBLE) AS s0, CAST(b.s AS DOUBLE) AS s1
        FROM (SELECT * FROM dims WHERE half = 0) a
        JOIN (SELECT * FROM dims WHERE half = 1) b
          ON a.label = b.label AND a.dim = b.dim),
    agg AS (
        SELECT label,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(s0 * s1 ORDER BY dim)), (x, y) -> x + y) AS dot,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(s0 * s0 ORDER BY dim)), (x, y) -> x + y) AS n0,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(s1 * s1 ORDER BY dim)), (x, y) -> x + y) AS n1
        FROM mat GROUP BY label)
    SELECT CAST(label AS BIGINT) AS label,
           FLOOR(dot / sqrt(n0) / sqrt(n1) * 1e9 + 0.5) / 1e9
               AS centroid_cos
    FROM agg ORDER BY label
    """,
)
def embedding_centroid_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding distribution drift per label: cosine between the
    centroid of the even-id half and the odd-id half of each label's
    vectors — the dense-space shift monitor (cos ≈ 1 means the two
    snapshots agree; a drop flags drift the scalar psi_drift cannot
    see). Centroid direction is invariant to the 1/n scaling, so the
    un-normalized dimension SUMS stand in for the means.

    Float parity: vector components quantize to integer micro-units
    per dimension BEFORE summing, so the 64 per-dimension sums are
    exact integers under any row order; the cosine folds those sums
    in dimension order on both engines (left fold here, sort_array
    fold there) and quantizes at 1e-9. Scale shape: one
    explode+groupBy over (label, half, dim) — 64× row fan-out
    map-side, combinable partials, output bounded by
    |labels|×2×64 regardless of corpus size."""
    e = tables(spark, sf_dir)["embeddings"]
    q = e.select(
        F.col("label").cast("long").alias("label"),
        (F.col("vec_id") % 2).cast("long").alias("half"),
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000000 + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("v"),
    )
    dims = (
        q.select("label", "half", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "half", "dim")
        .agg(F.sum("x").cast("long").alias("s"))
    )
    a = dims.filter(F.col("half") == 0).select(
        "label", "dim", F.col("s").cast("double").alias("s0")
    )
    b = dims.filter(F.col("half") == 1).select(
        "label", "dim", F.col("s").cast("double").alias("s1")
    )
    mat = a.join(b, ["label", "dim"])
    fold = lambda col: F.aggregate(  # noqa: E731
        F.array_sort(
            F.collect_list(F.struct(F.col("dim").alias("d"), col.alias("p")))
        ),
        F.lit(0.0),
        lambda acc, s: acc + s["p"],
    )
    agg = mat.groupBy("label").agg(
        fold(F.col("s0") * F.col("s1")).alias("dot"),
        fold(F.col("s0") * F.col("s0")).alias("n0"),
        fold(F.col("s1") * F.col("s1")).alias("n1"),
    )
    cos = F.col("dot") / F.sqrt("n0") / F.sqrt("n1")
    return agg.select(
        "label",
        (F.floor(cos * 1e9 + F.lit(0.5)) / 1e9).alias("centroid_cos"),
    ).orderBy("label")


@query(
    "table_profile_orders",
    oracle="""
    SELECT 'o_custkey' AS col,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(o_custkey) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_str,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', COUNT(*), COUNT(o_orderdate),
           COUNT(DISTINCT o_orderdate),
           CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    ORDER BY col
    """,
)
def table_profile_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (DESCRIBE/SUMMARIZE-style data-quality sweep):
    per column — row count, non-null count, exact distinct count, and
    min/max rendered to strings so heterogeneous column types share
    one output schema. The Spark side computes ALL columns' stats in
    ONE aggregate pass (every profile statistic is a partial-aggregate
    expression over the same scan — no per-column rescan) and unpivots
    the single stats row; the oracle re-derives each column
    independently, so a cross-wired stat cannot hash-match. At 100 TB
    the one-pass shape is the difference between a profile costing one
    scan and costing |columns| scans."""
    o = tables(spark, sf_dir)["orders"]
    cols = ["o_custkey", "o_orderdate", "o_orderpriority", "o_orderstatus"]
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").cast("long").alias(f"{c}__n"),
            F.count(c).cast("long").alias(f"{c}__nn"),
            F.countDistinct(c).cast("long").alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = o.agg(*aggs)
    rows = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(f"{c}__n").alias("n"),
                        F.col(f"{c}__nn").alias("n_nonnull"),
                        F.col(f"{c}__nd").alias("n_distinct"),
                        F.col(f"{c}__min").alias("min_str"),
                        F.col(f"{c}__max").alias("max_str"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return rows.select("p.*").orderBy("col")


@query(
    "ch_url_form_surface",
    oracle="""
    WITH inp AS (
        SELECT event_type,
               'q=' || event_type || ' & ' || CAST(user_id AS VARCHAR)
                   AS raw
        FROM events WHERE event_id % 50 = 7)
    SELECT raw,
           replace(replace(replace(raw, '&', '%26'), '=', '%3D'),
                   ' ', '%20') AS enc_percent,
           replace(replace(replace(raw, '&', '%26'), '=', '%3D'),
                   ' ', '+') AS enc_form,
           TRUE AS rt_percent, TRUE AS rt_form
    FROM inp ORDER BY raw
    """,
)
def ch_url_form_surface_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL encoding surface after the percent/form split fix:
    `encodeURLComponent` must percent-encode spaces (%20) while
    `encodeURLFormComponent` uses '+' (the Java URLEncoder behavior) —
    previously the percent name carried form semantics (the same
    fidelity class as the round-6 cutQueryString fragment bug). The
    oracle derives both encodings by explicit character substitution
    over the data-built input (alphabet [a-z0-9 =&], so the
    substitutions are exhaustive), and both decode functions must
    round-trip their own encoding (booleans asserted TRUE in the
    oracle itself)."""
    ev = tables(spark, sf_dir)["events"]
    inp = ev.filter(F.col("event_id") % 50 == 7).select(
        F.concat(
            F.lit("q="),
            F.col("event_type"),
            F.lit(" & "),
            F.col("user_id").cast("string"),
        ).alias("raw")
    )
    enc_p = ch_expr("encodeURLComponent", F.col("raw"))
    enc_f = ch_expr("encodeURLFormComponent", F.col("raw"))
    return inp.select(
        "raw",
        enc_p.alias("enc_percent"),
        enc_f.alias("enc_form"),
        (ch_expr("decodeURLComponent", enc_p) == F.col("raw")).alias(
            "rt_percent"
        ),
        (ch_expr("decodeURLFormComponent", enc_f) == F.col("raw")).alias(
            "rt_form"
        ),
    ).orderBy("raw")
