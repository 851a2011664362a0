"""Round-10 query wave 5: surface coverage for the names promoted out of
the unsupported catalog this round — Unicode normalization forms
NFD/NFKC/NFKD (unicodedata tables, Arrow-batched; the old "ICU
normalization" reason was stale, the tables ship in the stdlib) and
``stem('en', word)`` (from-scratch Porter 1980, functions/porter.py).

Oracle style: the DuckDB twin CONSTRUCTS every expected value from the
same driving columns — stems via the same word→stem table the Porter
vector test pins (tests/test_r10_wave5_functions.py), normalization
outputs via chr()-composed codepoint sequences — so the check derives
both sides independently rather than replaying one engine's output.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.ch import ch_expr
from .registry import query, tables

#: (word, canonical Porter stem) — the stems are fixed by the published
#: algorithm and independently pinned by the vector test.
_STEMS = [
    ("relational", "relat"),
    ("conditional", "condit"),
    ("operator", "oper"),
    ("hopefulness", "hope"),
    ("electrical", "electr"),
    ("adjustable", "adjust"),
    ("replacement", "replac"),
    ("motoring", "motor"),
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("formalize", "formal"),
    ("decisiveness", "decis"),
]


def _case_sql(expr: str, pairs: list[tuple[str, str]], pick: int) -> str:
    arms = "\n".join(
        f"WHEN {i} THEN '{w if pick == 0 else s}'"
        for i, (w, s) in enumerate(pairs)
    )
    return f"CASE {expr}\n{arms}\nEND"


@query(
    "ch_r10_function_surface",
    oracle=f"""
    SELECT CAST(event_id AS BIGINT) AS eid,
           {_case_sql('(event_id // 20) % 12', _STEMS, 0)} AS word,
           {_case_sql('(event_id // 20) % 12', _STEMS, 1)} AS stemmed,
           concat('cafe', chr(769), '-', event_type, '-A', chr(778))
               AS nfd,
           concat('file-', event_type, '-2x') AS nfkc,
           concat('1', chr(8260), '2-', event_type, '-e', chr(769))
               AS nfkd
    FROM events WHERE event_id % 20 = 3 ORDER BY eid
    """,
)
def ch_r10_function_surface_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-10 promoted names end-to-end: stem('en', ·) over a rotating
    vocabulary column (Porter 1980, exact on the canonical vectors), and
    normalizeUTF8NFD / NFKC / NFKD over constructed inputs exercising
    the interesting normalization classes — precomposed é/Å decompose
    under NFD (U+0301 / U+030A combining marks), the ﬁ ligature U+FB01
    and superscript ² U+00B2 fold compatibly under NFKC, and the vulgar
    fraction ½ U+00BD expands to 1⁄2 (U+2044) under NFKD. The oracle
    builds each expected string from chr() codepoints, so both engines
    derive the outputs independently.

    Scale shape: per-row Arrow-batched string kernels over a pushed-down
    filtered scan — the normalization/stemming cost is the per-byte
    kernel, no shuffle at all (ORDER BY is the test harness's
    canonicalizer, not part of the operator)."""
    ev = tables(spark, sf_dir)["events"].filter(
        F.col("event_id") % 20 == 3
    )
    eid = F.col("event_id")
    # index on eid DIV 20, not eid: the surviving ids are ≡3 (mod 20),
    # and gcd(20, 12) = 4 would alias eid % 12 onto {3, 7, 11} — only
    # 3 of the 12 vectors would ever run (review finding); DIV 20 makes
    # the filtered stream's indices consecutive, rotating through all 12
    word = F.element_at(
        F.array(*[F.lit(w) for w, _ in _STEMS]),
        (F.expr("event_id DIV 20") % 12 + 1).cast("int"),
    )
    return ev.select(
        eid.cast("long").alias("eid"),
        word.alias("word"),
        ch_expr("stem", "en", word).alias("stemmed"),
        ch_expr(
            "normalizeUTF8NFD",
            F.concat(F.lit("café-"), F.col("event_type"),
                     F.lit("-Å")),
        ).alias("nfd"),
        ch_expr(
            "normalizeUTF8NFKC",
            F.concat(F.lit("ﬁle-"), F.col("event_type"),
                     F.lit("-²x")),
        ).alias("nfkc"),
        ch_expr(
            "normalizeUTF8NFKD",
            F.concat(F.lit("½-"), F.col("event_type"),
                     F.lit("-é")),
        ).alias("nfkd"),
    ).orderBy("eid")
