"""Round-8 query wave 12: BPE tokenizer APPLICATION — encoding a corpus
with a fixed merge table (the serving-side half of bpe_merge_training,
which only fits the table). Applying BPE = for each merge rule in
priority order, fuse every adjacent occurrence of the pair — on a
space-separated symbol stream that is literally one ordered string
replace per rule, so a literal merge table unrolls to a chain of
regexp-free replaces that any engine replays byte-identically.

Reference parity note: no tokenizer surface in the reference; extends
the LLM-data charter (SURVEY §7) next to bpe_merge_training and the
token-statistics family.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ..functions.ch import ch_expr
from .registry import query, tables

#: Fixed merge table in priority order (common-English pairs). The
#: point is application semantics, not table provenance — training
#: lives in bpe_merge_training.
_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("in", "g"), ("an", "d"), ("o", "r"),
]


def _spread_sql(col: str) -> str:
    """Word stream → space-separated symbols with '|' word fences."""
    return (
        f"trim(regexp_replace(replace(lower({col}), ' ', ' | '), "
        f"'(.)', '\\1 ', 'g'))"
    )


def _apply_merges_sql(expr: str) -> str:
    for a, b in _MERGES:
        expr = f"replace({expr}, '{a} {b}', '{a}{b}')"
    return expr


def _spread_spark(c: Column) -> Column:
    return F.trim(
        F.regexp_replace(
            F.replace(F.lower(c), F.lit(" "), F.lit(" | ")), "(.)", "$1 "
        )
    )


def _apply_merges_spark(c: Column) -> Column:
    for a, b in _MERGES:
        c = F.replace(c, F.lit(f"{a} {b}"), F.lit(f"{a}{b}"))
    return c


@query(
    "bpe_encode_apply",
    oracle=f"""
    WITH enc AS (
        SELECT doc_id,
               {_apply_merges_sql(_spread_sql("text"))} AS s
        FROM documents WHERE doc_id % 21 = 2
    ),
    tok AS (
        SELECT doc_id, unnest(string_split(s, ' ')) AS t FROM enc
    ),
    ft AS (SELECT doc_id, t FROM tok WHERE t <> '|' AND t <> '')
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT t) AS BIGINT) AS n_types,
           CAST(SUM(length(t)) AS BIGINT) AS n_chars,
           CAST(SUM(CASE WHEN length(t) > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_merged
    FROM ft GROUP BY doc_id ORDER BY doc_id
    """,
)
def bpe_encode_apply_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode documents with a 10-rule BPE merge table: lowercase, fence
    words with '|', spread to a space-separated character stream, then
    fuse pairs rule-by-rule in priority order (each rule one engine-
    builtin replace — no UDF, no per-row loop). Output per document:
    token count, distinct types, character mass, and how many tokens
    are genuine merges. 100 TB: pure map-side string work plus one
    (doc, token) aggregation; the merge table is a plan literal, so
    there is no vocabulary broadcast at all."""
    d = tables(spark, sf_dir)["documents"].filter(F.col("doc_id") % 21 == 2)
    enc = d.select(
        "doc_id", _apply_merges_spark(_spread_spark(F.col("text"))).alias("s")
    )
    tok = enc.select(
        "doc_id", F.explode(F.split("s", " ")).alias("t")
    ).filter((F.col("t") != "|") & (F.col("t") != ""))
    return (
        tok.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.countDistinct("t").cast("long").alias("n_types"),
            F.sum(F.length("t")).cast("long").alias("n_chars"),
            F.sum((F.length("t") > 1).cast("long"))
            .cast("long")
            .alias("n_merged"),
        )
        .orderBy("doc_id")
    )


@query(
    "ch_r8_function_surface_4",
    oracle="""
    SELECT event_id::BIGINT AS eid,
           CAST(datediff('day', DATE '0001-01-01', CAST(ts AS DATE))
                + 366 AS BIGINT) AS days0,
           CAST(DATE '0001-01-01'
                + CAST(datediff('day', DATE '0001-01-01',
                                CAST(ts AS DATE)) AS INT)
                AS VARCHAR) AS rt_date,
           CAST(date_diff('hour', date_trunc('day', ts), ts)
                AS BIGINT) AS hod
    FROM events WHERE event_id % 31 = 6 ORDER BY eid
    """,
)
def ch_r8_function_surface_4_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 date additions: toDaysSinceYearZero (proleptic day count
    with the 366-day year zero), fromDaysSinceYearZero round-trip, and
    the timestampDiff alias. The oracle replays the day arithmetic from
    DuckDB's proleptic calendar."""
    ev = tables(spark, sf_dir)["events"].filter(F.col("event_id") % 31 == 6)
    d = F.to_date("ts")
    days0 = ch_expr("toDaysSinceYearZero", d)
    return ev.select(
        F.col("event_id").cast("long").alias("eid"),
        days0.cast("long").alias("days0"),
        ch_expr("fromDaysSinceYearZero", days0)
        .cast("string")
        .alias("rt_date"),
        ch_expr("timestampDiff", "HOUR", F.date_trunc("day", "ts"), F.col("ts"))
        .cast("long")
        .alias("hod"),
    ).orderBy("eid")
