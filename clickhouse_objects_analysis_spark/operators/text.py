"""Text-analysis primitives for the LLM-data-pipeline surface: portable
hashing, tokenization, shingling, language-ID, quality scoring, document
fingerprinting.

Everything is built from JVM-side built-ins (md5 / conv / higher-order
array functions) — no Python UDFs — so the hot path stays inside
whole-stage codegen and is bit-reproducible in ANSI SQL engines (the
DuckDB oracles replicate the same arithmetic).

Portability contract for hashes: ``hash64(s)`` = first 15 hex digits of
md5(s) parsed base-16 (60 bits, always fits signed int64). Any engine with
md5 + hex parsing reproduces it exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column

#: Modulus for rolling hashes — largest prime < 2^30, so `acc * 131 + c`
#: stays far below 2^63 (ANSI-mode overflow-safe).
ROLLING_MOD = 1_073_741_789
ROLLING_BASE = 131

#: Tiny per-language stopword lists for the voting heuristic.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "fr": ("le", "la", "les", "et", "est", "un"),
    "es": ("el", "la", "los", "y", "es", "un"),
}


def hash64(col: Column) -> Column:
    """Deterministic, engine-portable 60-bit hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokenize(text: Column) -> Column:
    """Whitespace tokenization; empty tokens dropped."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda w: F.length(w) > 0)


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish token stream: alnum runs and single punctuation marks, the
    shape subword tokenizers produce pre-merges."""
    return F.regexp_extract_all(F.lower(text), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), 0)


def shingles(words: Column, k: int) -> Column:
    """Word ``k``-grams (space-joined), distinct. Documents shorter than
    ``k`` words yield an empty set."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(words, i, k)),
    )
    return F.when(F.size(words) >= k, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def rolling_fingerprint(text: Column) -> Column:
    """Karp–Rabin polynomial rolling hash over the character codepoints:
    ``acc = (acc*131 + codepoint) mod (2^30-ish prime)``. One number per
    document; stable across engines (same char order, same modulus)."""
    codepoints = F.transform(
        F.sequence(F.lit(1), F.length(text)),
        lambda i: F.ascii(F.substr(text, i, F.lit(1))).cast("long"),
    )
    return F.aggregate(
        codepoints,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLLING_BASE + c) % ROLLING_MOD,
    )


def stopword_ratio(words: Column, stopwords: Sequence[str]) -> Column:
    """Fraction of tokens that are stopwords."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    return hits / F.greatest(F.size(words), F.lit(1))


def _stopword_hits(words: Column, stopwords: Sequence[str]) -> Column:
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(words, lambda w: F.array_contains(sw, w)))


def lang_scores(words: Column) -> dict[str, Column]:
    """Stopword-voting score per language (n-gram-heuristic family)."""
    return {
        lang: _stopword_hits(words, sw) for lang, sw in LANG_STOPWORDS.items()
    }


def predict_lang(words: Column) -> Column:
    """argmax over lang_scores with deterministic tie-break: ties resolve
    in LANG_STOPWORDS insertion order (en first), all-zero → 'und'."""
    scores = lang_scores(words)
    langs = list(scores)
    best_lang, best_score = F.lit(langs[0]), scores[langs[0]]
    for lang in langs[1:]:
        s = scores[lang]
        cond = s > best_score  # strict: earlier languages win ties
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best_lang).otherwise(F.lit("und"))


def predict_lang_table(
    df, id_col: str, text_col: str
):
    """Table-level language-ID: same votes and tie-break as predict_lang,
    but computed as explode → conditional sums (whole-stage codegen +
    map-side combine) instead of per-word interpreted array filters. Docs
    with no tokens come back 'und' via the left join."""
    import pyspark.sql.functions as F  # noqa: F811 — keep local symmetry

    words = df.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("w")
    )
    hits = words.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.col("w").isin(*sw), 1).otherwise(0)).alias(
                f"__{lang}"
            )
            for lang, sw in LANG_STOPWORDS.items()
        ]
    )
    langs = list(LANG_STOPWORDS)
    best_lang = F.lit(langs[0])
    best_score = F.col(f"__{langs[0]}")
    for lang in langs[1:]:
        s = F.col(f"__{lang}")
        cond = s > best_score  # strict: earlier languages win ties
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, s).otherwise(best_score)
    predicted = F.when(best_score > 0, best_lang).otherwise(F.lit("und"))
    scored = hits.select(id_col, predicted.alias("predicted_lang"))
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("predicted_lang", F.lit("und")).alias("predicted_lang"),
        )
    )


def rolling_fingerprints(df, id_col: str, text_col: str):
    """Arrow-batched twin of rolling_fingerprint: the same
    ``acc = (acc*131 + codepoint) mod p`` fold, run as a Python loop per
    document instead of an interpreted expression per character (the
    expression form pays per-char lambda interpretation — ~3s for 5k
    docs; this is ~10×). Empty/NULL text → 0, matching the column form's
    guard."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            out = []
            for t in pdf[text_col]:
                acc = 0
                for ch in t or "":
                    acc = (acc * ROLLING_BASE + ord(ch)) % ROLLING_MOD
                out.append(acc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "fingerprint": pd.Series(out, dtype="int64"),
                }
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), text_col
    ).mapInPandas(gen, schema=f"{id_col} long, fingerprint long")


def quality_features_table(df, id_col: str, text_col: str):
    """Table-level quality features: same arithmetic as quality_features,
    but the per-token work runs as explode → conditional aggregates
    (whole-stage codegen + map-side combine) instead of interpreted
    higher-order array lambdas — HOFs are CodegenFallback and made
    text_quality the slowest bench query in round 1 (14.3 s at sf0.1).
    Scalar features (char count, punctuation count) stay per-row built-ins;
    only token stats take the explode+agg path. Docs with zero tokens get
    n_words=0 via the left join, matching the column form's guards."""
    text = F.col(text_col)
    base = df.select(
        F.col(id_col),
        F.length(text).alias("n_chars"),
        F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", "")).alias("__punct"),
    )
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.trim(text), r"\s+")).alias("w")
    ).filter(F.length("w") > 0)
    sw = LANG_STOPWORDS["en"]
    agg = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.count_distinct("w").alias("__nd"),
        F.sum(F.when(F.col("w").isin(*sw), 1).otherwise(0)).alias("__sw"),
    )
    j = (
        base.join(agg, id_col, "left")
        .na.fill(0, ["__n", "__nd", "__sw"])
    )
    n = F.greatest(F.col("__n"), F.lit(1))
    return j.select(
        F.col(id_col),
        F.col("__n").cast("long").alias("n_words"),
        F.col("n_chars").cast("long").alias("n_chars"),
        ((F.col("n_chars") - (F.col("__n") - 1)) / n).alias("mean_word_len"),
        (F.col("__nd") / n).alias("distinct_ratio"),
        (F.col("__punct") / F.greatest(F.col("n_chars"), F.lit(1))).alias(
            "punct_ratio"
        ),
        (F.col("__sw") / n).alias("stopword_ratio"),
    )


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword / repetition features used by the
    quality score. All ratios in [0,1], rounded by the caller."""
    words = tokenize(text)
    n_words = F.size(words)
    n_chars = F.length(text)
    distinct_ratio = F.size(F.array_distinct(words)) / F.greatest(
        n_words, F.lit(1)
    )
    punct = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
    return {
        "n_words": n_words.cast("long"),
        "n_chars": n_chars.cast("long"),
        "mean_word_len": (n_chars - (n_words - 1)) / F.greatest(n_words, F.lit(1)),
        "distinct_ratio": distinct_ratio,
        "punct_ratio": punct / F.greatest(n_chars, F.lit(1)),
        "stopword_ratio": stopword_ratio(words, LANG_STOPWORDS["en"]),
    }


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: rewards mid-length docs and
    lexical diversity, penalizes punctuation soup — the standard pre-train
    filter shape (C4/Gopher-style rules, simplified)."""
    f = quality_features(text)
    length_term = F.least(f["n_words"] / F.lit(100.0), F.lit(1.0))
    return (
        F.lit(0.4) * length_term
        + F.lit(0.4) * f["distinct_ratio"]
        + F.lit(0.2) * (1 - F.least(f["punct_ratio"] * 10, F.lit(1.0)))
    )


# ---------------------------------------------------------------------------
# String-distance kernels (Jaro / Jaro-Winkler / full Damerau-Levenshtein)
# ---------------------------------------------------------------------------
# Catalyst has levenshtein() built in but nothing for these three; the
# per-pair DP/matching loops are exactly the "dense per-doc loops where
# Catalyst expressions can't go" case of the Python-boundary policy
# (SCALE.md) — Arrow-batched pandas UDFs, never row-at-a-time SQL UDFs.
# Pure-python reference algorithms, deterministic, no state.


def _jaro_py(a: str, b: str) -> float:
    """Standard Jaro: both-empty → 1.0, one-empty → 0.0 (DuckDB returns
    0.0 for both-empty — keep empty strings out of oracled queries)."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    b_used = [False] * lb
    matches_a = []
    for i, ca in enumerate(a):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_used[j] and b[j] == ca:
                b_used[j] = True
                matches_a.append(ca)
                break
    m = len(matches_a)
    if m == 0:
        return 0.0
    matches_b = [b[j] for j in range(lb) if b_used[j]]
    # transpositions as INTEGER half (t//2) — the RapidFuzz/DuckDB
    # convention (an odd mismatch count happens when lengths differ);
    # fractional halving gives a different value on ~20% of random
    # pairs and would break the cross-engine oracle
    t = sum(ca != cb for ca, cb in zip(matches_a, matches_b)) // 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def _jaro_winkler_py(a: str, b: str, p: float = 0.1) -> float:
    """Winkler prefix boost gated at jaro > 0.7 (the standard
    boost_threshold, also what DuckDB applies)."""
    j = _jaro_py(a, b)
    if j <= 0.7:
        return j
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca != cb:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


def _damerau_py(a: str, b: str) -> int:
    """FULL Damerau-Levenshtein (Lowrance-Wagner, unrestricted — the
    variant DuckDB ships: DL('CA','ABC') = 2, not OSA's 3)."""
    la, lb = len(a), len(b)
    inf = la + lb
    da: dict[str, int] = {}
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = inf
    for i in range(la + 1):
        d[i + 1][0] = inf
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = inf
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            ell = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][ell] + (i - k - 1) + 1 + (j - ell - 1),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def jaro_similarity(a: Column, b: Column) -> Column:
    @F.pandas_udf("double")
    def k(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return pd.Series(
            [_jaro_py(x or "", y or "") for x, y in zip(s1, s2)]
        )

    return k(a, b)


def jaro_winkler_similarity(a: Column, b: Column) -> Column:
    @F.pandas_udf("double")
    def k(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return pd.Series(
            [_jaro_winkler_py(x or "", y or "") for x, y in zip(s1, s2)]
        )

    return k(a, b)


def damerau_levenshtein(a: Column, b: Column) -> Column:
    @F.pandas_udf("long")
    def k(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return pd.Series(
            [_damerau_py(x or "", y or "") for x, y in zip(s1, s2)]
        )

    return k(a, b)
