"""Round-8 query wave 11: effective-TLD domain extraction — the
firstSignificantSubdomain / cutToFirstSignificantSubdomain pair every
web-corpus ingest uses to group documents by site (the canonical-URL
dedup's natural partner: dedup within site, mixture-balance across
sites).

Reference parity note: completes the ClickHouse URL-function family
minus the *Custom public-suffix-list variants (documented exclusions).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.ch import ch_expr
from .registry import query, tables


@query(
    "url_significant_domain",
    oracle="""
    WITH e AS (
        SELECT event_id,
               concat(
                   'https://',
                   CASE WHEN user_id % 5 = 0 THEN ''
                        ELSE concat('s', user_id % 3, '.') END,
                   'brand', event_id % 7, '.',
                   CASE event_id % 4 WHEN 0 THEN 'com'
                                     WHEN 1 THEN 'com.tr'
                                     WHEN 2 THEN 'net'
                                     ELSE 'co.uk' END,
                   '/x?p=', event_id % 3) AS url
        FROM events WHERE event_id % 19 = 4
    ),
    h AS (
        SELECT event_id, url,
               regexp_extract(url, 'https?://([^/:]+)', 1) AS host
        FROM e
    ),
    sp AS (
        SELECT event_id, url, host,
               string_split(host, '.') AS ls,
               len(string_split(host, '.')) AS n
        FROM h
    ),
    ix AS (
        SELECT *,
               CASE WHEN n >= 3 AND
                         list_contains(['com','net','org','co'], ls[n - 1])
                    THEN n - 2 ELSE n - 1 END AS idx
        FROM sp
    )
    SELECT event_id::BIGINT AS eid,
           CASE WHEN n >= 2 THEN ls[idx] ELSE host END AS fss,
           CASE WHEN n >= 2 THEN array_to_string(ls[idx:n], '.')
                ELSE host END AS cut_dom,
           ls[n] AS tld
    FROM ix ORDER BY eid
    """,
)
def url_significant_domain_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """firstSignificantSubdomain / cutToFirstSignificantSubdomain /
    topLevelDomain over synthesized hosts covering all four rule paths:
    plain .com/.net, compound com.tr / co.uk (the second-from-last
    label in the significant set shifts the boundary left), and
    sub-domain-less two-label hosts. The DuckDB twin replays the label
    indexing on split arrays. Map-side string slicing only."""
    ev = tables(spark, sf_dir)["events"].filter(F.col("event_id") % 19 == 4)
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("user_id") % 5 == 0, F.lit("")).otherwise(
            F.concat(F.lit("s"), (F.col("user_id") % 3).cast("string"), F.lit("."))
        ),
        F.lit("brand"),
        (F.col("event_id") % 7).cast("string"),
        F.lit("."),
        F.element_at(
            F.array(F.lit("com"), F.lit("com.tr"), F.lit("net"), F.lit("co.uk")),
            (F.col("event_id") % 4).cast("int") + 1,
        ),
        F.lit("/x?p="),
        (F.col("event_id") % 3).cast("string"),
    )
    return ev.select(
        F.col("event_id").cast("long").alias("eid"),
        ch_expr("firstSignificantSubdomain", url).alias("fss"),
        ch_expr("cutToFirstSignificantSubdomain", url).alias("cut_dom"),
        ch_expr("topLevelDomain", url).alias("tld"),
    ).orderBy("eid")
