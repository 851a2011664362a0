"""Distributed BPE tokenizer training (byte-pair-encoding merge
learning) — the training-side complement of operators/text.py's
``bpe_ish_tokens`` (which only *counts* tokens with a fixed regex).

Classic Sennrich-style BPE over the word vocabulary: the corpus is
collapsed ONCE to (distinct word, frequency) — at 100 TB the vocab is
bounded by distinct-word count (~10⁸ rows, each a few tokens), orders of
magnitude smaller than the corpus, and that collapse is an ordinary
map-side-combined hash aggregate. Each merge round then runs entirely
over the vocab:

  1. adjacent-pair counts: explode each word's token list to (left,
     right) pairs weighted by word frequency — map-side combined, one
     small shuffle on the pair key;
  2. top-1 pair by (count DESC, pair ASC) — a 1-row collect;
  3. greedy left-to-right merge application — a narrow per-row fold
     (``aggregate`` higher-order function), no shuffle.

The whole trajectory is integer counts + lexicographic tie-breaks, so
it is bit-reproducible cross-engine; the DuckDB oracle hand-unrolls the
same rounds (kmeans_clusters precedent). A production 30k-merge train
would batch non-interacting top-N merges per round (SentencePiece-style)
instead of one driver round-trip per merge; the per-round dataflow — the
part that must scale — is identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _merge_fold_expr(a: str, b: str) -> str:
    """Greedy left-to-right application of merge (a, b) to the
    space-joined token string column ``t``: fold tokens 2..n starting
    from token 1; gluing ``b`` directly onto an accumulator that ends
    with token ``a`` performs the merge. replace()-style rewrites can't
    express this — adjacent occurrences share the boundary space and the
    scan must consume its own output greedily (verified by the
    'a a a' → 'aa a' fixture in tests)."""
    return (
        "aggregate(slice(split(t, ' '), 2, greatest(size(split(t, ' ')) - 1, 0)), "
        "element_at(split(t, ' '), 1), "
        f"(acc, x) -> CASE WHEN x = '{b}' AND (acc = '{a}' "
        f"OR endswith(acc, ' {a}')) "
        f"THEN acc || '{b}' ELSE acc || ' ' || x END)"
    )


def word_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(t, freq): distinct lowercase alphabetic words as space-joined
    character sequences with corpus frequencies — BPE's working set."""
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w")
        )
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return words.select(
        F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("t"), "freq"
    )


# Pair explode: one (left, right) row per adjacent token pair, weighted
# by word frequency. sequence(1, 0) DESCENDS in Spark, so the
# single-token case is guarded explicitly.
_PAIRS_EXPR = (
    "CASE WHEN size(split(t, ' ')) < 2 THEN array() "
    "ELSE transform(sequence(1, size(split(t, ' ')) - 1), "
    "i -> struct(element_at(split(t, ' '), i) AS a, "
    "element_at(split(t, ' '), i + 1) AS b)) END"
)


#: Driver replay gate for bpe_train: below this distinct-word count
#: the merge rounds run on the driver (the graph-loop gate
#: discipline); 500k words × a few tokens collect to ~20 MB.
_BPE_DRIVER_GATE = 500_000


def _driver_bpe_train(
    spark: SparkSession, words: list, merges: int
) -> DataFrame:
    """Driver replay of the distributed rounds: adjacent-pair counts
    weighted by word frequency, top-1 by (count DESC, pair ASC),
    greedy left-to-right merge fold — the same integers, the same
    trajectory."""
    vocab = [(list(t), f) for t, f in words]
    rows = []
    for r in range(1, merges + 1):
        cnts: dict = {}
        for toks, f in vocab:
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                cnts[p] = cnts.get(p, 0) + f
        if not cnts:
            break
        (a, b), cnt = min(
            cnts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        rows.append((r, a, b, a + b, cnt))
        if r < merges:
            new = []
            for toks, f in vocab:
                out = [toks[0]]
                for x in toks[1:]:
                    if x == b and out[-1] == a:
                        out[-1] = a + b
                    else:
                        out.append(x)
                new.append((out, f))
            vocab = new
    return spark.createDataFrame(
        rows,
        "merge_rank long, left_tok string, right_tok string, "
        "merged string, pair_count long",
    ).orderBy("merge_rank")


def bpe_train(
    spark: SparkSession, docs: DataFrame, text_col: str, merges: int = 8
) -> DataFrame:
    """Learn ``merges`` BPE merges; returns the trained merge table
    (merge_rank, left_tok, right_tok, merged, pair_count) — the artifact
    a tokenizer loads. Stops early if the vocab runs out of pairs."""
    # persist(), not localCheckpoint(): caching keeps the per-round fold
    # lineage one level deep while staying inside whole-stage codegen —
    # the RDD conversion a checkpoint forces measured ~2 s per round on
    # this tiny working set, pure overhead here (no exchange-reuse pin
    # needed: each round is a single linear job).
    vocab = word_vocab(docs, text_col).persist()
    # Sub-gate vocabularies replay the EXACT greedy trajectory on the
    # driver (identical integer counts, identical (count DESC, pair
    # ASC) tie-breaks, identical left-to-right fold — pinned by an
    # equivalence test): merges rounds of top-1 collects over a
    # 31-row vocab (the sf0.1 corpus) were 2.1 s of pure scheduling.
    # A real 100 TB vocab (~1e8 distinct words) stays distributed.
    if vocab.count() <= _BPE_DRIVER_GATE:
        collected = [
            (r["t"].split(" "), r["freq"]) for r in vocab.collect()
        ]
        vocab.unpersist()
        return _driver_bpe_train(spark, collected, merges)
    prev = None
    rows = []
    for r in range(1, merges + 1):
        top = (
            vocab.select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        # the collect above materialized `vocab`'s cache, so the previous
        # round's cache (its only lineage parent) is now droppable
        if prev is not None:
            prev.unpersist()
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], top[0]["cnt"]
        rows.append((r, a, b, a + b, cnt))
        if r < merges:
            prev = vocab
            vocab = prev.select(
                F.expr(_merge_fold_expr(a, b)).alias("t"), "freq"
            ).persist()
    vocab.unpersist()
    return spark.createDataFrame(
        rows,
        "merge_rank long, left_tok string, right_tok string, "
        "merged string, pair_count long",
    ).orderBy("merge_rank")


def bpe_oracle_sql(merges: int = 8) -> str:
    """DuckDB twin: the same rounds hand-unrolled as a CTE chain (the
    kmeans_clusters oracle pattern). list_reduce reproduces the greedy
    fold exactly — same init (first token), same boundary test."""
    parts = [
        """w0 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
            SELECT unnest(list_filter(
                string_split_regex(lower(text), '\\s+'),
                x -> regexp_matches(x, '^[a-z]+$'))) AS w
            FROM documents) GROUP BY w),
    v0 AS (SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS t, freq
           FROM w0)"""
    ]
    for r in range(1, merges + 1):
        parts.append(f"""p{r} AS (
        SELECT tk[i] AS a, tk[i + 1] AS b,
               CAST(SUM(freq) AS BIGINT) AS cnt
        FROM (SELECT unnest(range(1, len(string_split(t, ' ')))) AS i,
                     string_split(t, ' ') AS tk, freq
              FROM v{r - 1})
        GROUP BY 1, 2),
    b{r} AS (SELECT a AS ma, b AS mb, cnt FROM p{r}
             ORDER BY cnt DESC, a, b LIMIT 1),
    v{r} AS (SELECT list_reduce(string_split(t, ' '),
                 (acc, x) -> CASE WHEN x = mb AND (acc = ma
                                  OR ends_with(acc, ' ' || ma))
                             THEN acc || mb
                             ELSE acc || ' ' || x END) AS t, freq
             FROM v{r - 1}, b{r})""")
    selects = [
        f"SELECT CAST({r} AS BIGINT) AS merge_rank, ma AS left_tok, "
        f"mb AS right_tok, ma || mb AS merged, cnt AS pair_count "
        f"FROM b{r}"
        for r in range(1, merges + 1)
    ]
    return (
        "WITH "
        + ",\n    ".join(parts)
        + "\n    SELECT * FROM ("
        + " UNION ALL ".join(selects)
        + ") ORDER BY merge_rank"
    )
