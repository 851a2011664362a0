"""Round-7 wave-6 behavior tests: each new operator checked against an
independent pure-Python reference over the sf0.001 testdata — a third
implementation besides Spark and the DuckDB oracle, so a shared
misreading of the spec in the query+oracle pair cannot hide."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

from clickhouse_objects_analysis_spark.queries.r7_wave6 import (
    bigram_lm_cross_entropy_q,
    containment_overlap_pairs_q,
    hard_negative_mining_q,
)

SF_SMALL = "/root/testdata/sf0.001"
_WS = re.compile(r"\s+")


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMALL}/documents.parquet")


def test_bigram_cross_entropy_matches_python_reference(spark):
    got = {
        r["doc_id"]: (r["n_bigrams"], r["mean_nll"])
        for r in bigram_lm_cross_entropy_q(spark, SF_SMALL).collect()
    }
    d = _docs()
    toks = {r.doc_id: r.text.split(" ") for r in d.itertuples()}
    vocab = {w for ws in toks.values() for w in ws}
    c1: dict[str, int] = {}
    c12: dict[tuple[str, str], int] = {}
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            c1[a] = c1.get(a, 0) + 1
            c12[(a, b)] = c12.get((a, b), 0) + 1
    v = len(vocab)
    expected_docs = 0
    for doc_id, ws in toks.items():
        if len(ws) < 2:
            continue
        expected_docs += 1
        pairs = list(zip(ws, ws[1:]))
        nll = sum(
            math.log(c1[a] + v) - math.log(c12[(a, b)] + 1) for a, b in pairs
        ) / len(pairs)
        n_big, got_nll = got[doc_id]
        assert n_big == len(pairs), doc_id
        assert abs(got_nll - nll) < 1e-6, (doc_id, got_nll, nll)
        # add-one smoothed probability of a SEEN bigram is < 1 → NLL > 0
        assert got_nll > 0.0
    assert len(got) == expected_docs


def test_hard_negative_mining_matches_numpy_reference(spark):
    rows = hard_negative_mining_q(spark, SF_SMALL).collect()
    e = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    vecs = np.stack(e.embedding.to_numpy()).astype(np.float64)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    labels = e.label.to_numpy()
    ids = e.vec_id.to_numpy()
    expected: dict[int, list[tuple[int, int, float]]] = {}
    for qpos in np.flatnonzero(ids < 10):
        cos = vecs @ vecs[qpos]
        cos = np.floor(cos * 1e9 + 0.5) / 1e9  # the query's tie-grid
        mask = labels != labels[qpos]
        order = sorted(
            ((float(-cos[i]), int(ids[i])) for i in np.flatnonzero(mask))
        )[:5]
        expected[int(ids[qpos])] = [
            (cid, int(labels[np.flatnonzero(ids == cid)[0]]), -negc)
            for negc, cid in order
        ]
    got: dict[int, list] = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(r)
    assert set(got) == set(expected)
    for qid, exp in expected.items():
        grows = sorted(got[qid], key=lambda r: r["rank"])
        assert [r["corpus_id"] for r in grows] == [c for c, _, _ in exp], qid
        for r, (_, lab, cos) in zip(grows, exp):
            assert r["neg_label"] == lab
            assert r["neg_label"] != labels[ids == qid][0]
            assert abs(r["cos"] - round(cos, 4)) < 2e-4, (qid, r["cos"], cos)


def test_containment_matches_bruteforce_sets(spark):
    got = {
        (r["contained_id"], r["container_id"]): r["containment"]
        for r in containment_overlap_pairs_q(spark, SF_SMALL).collect()
    }
    shingles: dict[int, set[str]] = {}
    for r in _docs().itertuples():
        ws = [w for w in _WS.split((r.text or "").strip()) if w]
        if len(ws) >= 3:
            shingles[r.doc_id] = {
                " ".join(ws[j : j + 3]) for j in range(len(ws) - 2)
            }
    expected = {}
    items = sorted(shingles.items())
    for i, (ida, sa) in enumerate(items):
        for idb, sb in items[i + 1 :]:
            inter = len(sa & sb)
            if inter and inter / len(sa) >= 0.6:
                expected[(ida, idb)] = round(inter / len(sa), 4)
            if inter and inter / len(sb) >= 0.6:
                expected[(idb, ida)] = round(inter / len(sb), 4)
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert abs(got[k] - v) < 5e-5, (k, got[k], v)
    # directional: every pair is contained-in-container, C ∈ (0, 1]
    for (_, _), c in got.items():
        assert 0.6 <= c <= 1.0
