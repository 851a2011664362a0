"""Round-8 query wave 4: URL canonicalization dedup — the web-corpus
ingestion primitive (crawl frontiers and CommonCrawl-style pipelines
dedup on canonical URL before ever fetching/tokenizing a byte).

Reference parity note: the reference repo has no web surface; this
extends the LLM-data-pipeline charter (SURVEY §7) alongside the
registry's html_text_extraction and the CH URL-function family
(functions/ch.py domain/path/queryString names).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import query, tables

# Shared construction: a deliberately messy raw URL per event — scheme
# and host case noise, optional www., trailing-slash variants, tracking
# params in shuffled order, optional fragment. Both engines build the
# SAME raw string from the same columns, then canonicalize it with
# their own string machinery; parity proves the two canonicalizers
# agree on every variant.
_RAW_SQL = """
    concat(CASE WHEN event_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END,
           '://',
           CASE WHEN event_id % 3 = 0
                THEN concat('WWW.Shop', user_id % 5, '.Example.COM')
                ELSE concat('shop', user_id % 5, '.example.com') END,
           '/p/', event_id % 40,
           CASE WHEN event_id % 4 = 0 THEN '/' ELSE '' END,
           '?',
           CASE event_id % 3
                WHEN 0 THEN concat('utm_source=news&id=', event_id % 10,
                                   '&ref=partner')
                WHEN 1 THEN concat('id=', event_id % 10,
                                   '&utm_campaign=x')
                ELSE concat('sort=price&id=', event_id % 10) END,
           CASE WHEN event_id % 5 = 0
                THEN concat('#sec', event_id % 3) ELSE '' END)
"""


@query(
    "url_canonicalize_dedup",
    oracle=f"""
    WITH raw AS (
        SELECT event_id, {_RAW_SQL} AS url FROM events
    ),
    parts AS (
        SELECT event_id, url,
               lower(regexp_extract(url, '^[a-zA-Z]+://([^/?#]+)', 1))
                   AS host,
               regexp_extract(url, '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1)
                   AS path,
               regexp_extract(url, '\\?([^#]*)', 1) AS qs
        FROM raw
    ),
    canon AS (
        SELECT event_id, url,
               concat(
                   'https://',
                   regexp_replace(host, '^www\\.', ''),
                   CASE WHEN regexp_replace(path, '/+$', '') = ''
                        THEN '/'
                        ELSE regexp_replace(path, '/+$', '') END,
                   CASE WHEN len(plist) > 0
                        THEN concat('?', array_to_string(plist, '&'))
                        ELSE '' END) AS curl
        FROM (
            SELECT *,
                   list_sort(list_filter(string_split(qs, '&'),
                       p -> p != '' AND NOT p LIKE 'utm\\_%' ESCAPE '\\'
                            AND NOT p LIKE 'ref=%')) AS plist
            FROM parts)
    )
    SELECT curl AS canonical_url,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_variants,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(event_id) AS BIGINT) AS first_event
    FROM canon
    GROUP BY curl ORDER BY curl
    """,
)
def url_canonicalize_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup — scheme/host lowercasing, www-stripping,
    fragment drop, tracking-param removal (utm_*, ref), param
    reordering, and trailing-slash normalization, then a hash-groupBy
    on the canonical form. The collapse ratio (n_raw_variants per
    canonical URL) is the crawl-dedup win this buys before any content
    fetch. Scale shape: canonicalization is pure map-side string work
    (whole-stage codegen, no UDF); the dedup is one hash aggregation on
    the canonical string — the same shuffle profile as exact text
    dedup. Both engines parse with the same regexes (host/path/query
    extraction), so parity checks the canonicalizer itself, not an
    engine's URL library."""
    ev = tables(spark, sf_dir)["events"]
    raw = ev.select("event_id", F.expr(_RAW_SQL).alias("url"))
    host = F.lower(F.regexp_extract("url", "^[a-zA-Z]+://([^/?#]+)", 1))
    path = F.regexp_extract("url", "^[a-zA-Z]+://[^/?#]+([^?#]*)", 1)
    qs = F.regexp_extract("url", r"\?([^#]*)", 1)
    plist = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "")
            & ~p.startswith("utm_")
            & ~p.startswith("ref="),
        )
    )
    stripped = F.regexp_replace(path, "/+$", "")
    curl = F.concat(
        F.lit("https://"),
        F.regexp_replace(host, r"^www\.", ""),
        F.when(stripped == "", F.lit("/")).otherwise(stripped),
        F.when(
            F.size(plist) > 0,
            F.concat(F.lit("?"), F.array_join(plist, "&")),
        ).otherwise(F.lit("")),
    )
    return (
        raw.select("event_id", "url", curl.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.countDistinct("url").cast("long").alias("n_raw_variants"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("event_id").cast("long").alias("first_event"),
        )
        .orderBy("canonical_url")
    )
