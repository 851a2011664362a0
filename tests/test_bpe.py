"""BPE merge-training unit checks (operators/bpe.py): the greedy fold's
overlap/boundary behavior, early-stop, and vocab construction."""

from __future__ import annotations

import pyspark.sql.functions as F

from clickhouse_objects_analysis_spark.operators.bpe import (
    _merge_fold_expr,
    bpe_train,
    word_vocab,
)


def test_merge_fold_greedy_overlaps(spark):
    df = spark.createDataFrame(
        [("a a a",), ("b a a b a",), ("a",), ("x y",)], "t string"
    )
    got = [r[0] for r in df.select(F.expr(_merge_fold_expr("a", "a"))).collect()]
    # 'a a a' merges greedily left-to-right to 'aa a' (never 'a aa'),
    # and the freshly formed 'aa' does not re-merge with the next 'a'.
    assert got == ["aa a", "b aa b a", "a", "x y"]


def test_merge_fold_adjacent_pairs(spark):
    # consecutive non-overlapping occurrences both merge — the case a
    # string replace() on the space-joined form gets wrong (shared
    # boundary space).
    df = spark.createDataFrame([("x a b a b",)], "t string")
    got = df.select(F.expr(_merge_fold_expr("a", "b"))).collect()[0][0]
    assert got == "x ab ab"


def test_word_vocab_filters_and_counts(spark):
    docs = spark.createDataFrame(
        [(1, "The cat the cat!"), (2, "cat 42 dog")], "doc_id long, text string"
    )
    rows = {r["t"]: r["freq"] for r in word_vocab(docs, "text").collect()}
    # 'the' twice, 'cat' twice (the '!' form and '42' are filtered out)
    assert rows == {"t h e": 2, "c a t": 2, "d o g": 1}


def test_bpe_train_learns_expected_first_merge(spark):
    docs = spark.createDataFrame(
        [(1, "low low low lower lower newest newest")],
        "doc_id long, text string",
    )
    out = bpe_train(spark, docs, "text", merges=3).collect()
    assert [r["merge_rank"] for r in out] == [1, 2, 3]
    # most frequent pair: 'l o' and 'o w' both appear 5x; 'e w' 4x... the
    # lexicographic tie-break picks ('e', 'w')? no — counts first:
    # l-o = 5, o-w = 5, w-e = 4, ... tie at 5 → 'l o' < 'o w'
    assert (out[0]["left_tok"], out[0]["right_tok"]) == ("l", "o")
    assert out[0]["pair_count"] == 5
    # after merging 'lo', the top pair is ('lo', 'w') at 5
    assert (out[1]["left_tok"], out[1]["right_tok"]) == ("lo", "w")


def test_bpe_train_early_stop_on_exhausted_vocab(spark):
    docs = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    # 'a b' and 'c d' are the only pairs; after 2 merges every word is a
    # single token and training stops early.
    out = bpe_train(spark, docs, "text", merges=10).collect()
    assert len(out) == 2


def test_bpe_driver_gate_matches_distributed(spark, monkeypatch):
    """r13: the driver BPE replay must reproduce the distributed merge
    trajectory exactly (same integers, same tie-breaks, same greedy
    fold) — forced by dropping the gate."""
    from clickhouse_objects_analysis_spark.operators import bpe as B

    docs = spark.createDataFrame(
        [("low lower lowest low low newest newer new",),
         ("wide wider widest new newest lower low",)],
        ["text"],
    )

    def rows():
        return [
            tuple(r)
            for r in B.bpe_train(spark, docs, "text", merges=6).collect()
        ]

    via_driver = rows()
    monkeypatch.setattr(B, "_BPE_DRIVER_GATE", -1)
    assert rows() == via_driver
    assert len(via_driver) == 6
