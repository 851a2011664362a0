"""Round-7 wave-15 behavior tests: char-gram Jaccard vs brute-force
sets, k-anonymity vs pandas group sizes, label outliers vs numpy."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from clickhouse_objects_analysis_spark.queries.r7_wave15 import (
    char_ngram_jaccard_pairs_q,
    embedding_label_outliers_q,
    k_anonymity_audit_q,
)

SF_SMALL = "/root/testdata/sf0.001"


def test_char_jaccard_matches_bruteforce(spark):
    got = {
        (r["id_a"], r["id_b"]): r["jacc"]
        for r in char_ngram_jaccard_pairs_q(spark, SF_SMALL).collect()
    }
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    sets: dict[int, set[str]] = {}
    for r in d.itertuples():
        t = r.text or ""
        if len(t) >= 5:
            sets[r.doc_id] = {t[i : i + 5] for i in range(len(t) - 4)}
    # replicate the df-cap: grams in more than 200 docs don't vote
    df_count: dict[str, int] = {}
    for s in sets.values():
        for g in s:
            df_count[g] = df_count.get(g, 0) + 1
    capped = {g for g, c in df_count.items() if c > 200}
    expected = {}
    items = sorted(sets.items())
    for i, (ia, sa) in enumerate(items):
        for ib, sb in items[i + 1 :]:
            inter = len((sa & sb) - capped)
            if not inter:
                continue
            j = inter / (len(sa) + len(sb) - inter)
            if j >= 0.5:
                expected[(ia, ib)] = round(j, 4)
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert abs(got[k] - v) < 5e-5


def test_k_anonymity_matches_pandas(spark):
    got = {r["k"]: r.asDict() for r in k_anonymity_audit_q(spark, SF_SMALL).collect()}
    c = pd.read_parquet(f"{SF_SMALL}/customer.parquet")
    sizes = c.groupby(["c_nationkey", "c_mktsegment"]).size()
    for k in (2, 5, 10):
        below = sizes[sizes < k]
        g = got[k]
        assert g["groups_below_k"] == len(below)
        assert g["rows_at_risk"] == int(below.sum())
        assert g["min_group"] == int(sizes.min())
        assert g["n_groups"] == len(sizes)
    # monotone: raising k can only expose more groups
    assert (
        got[2]["groups_below_k"]
        <= got[5]["groups_below_k"]
        <= got[10]["groups_below_k"]
    )


def test_label_outliers_match_numpy(spark):
    got = [r.asDict() for r in embedding_label_outliers_q(spark, SF_SMALL).collect()]
    e = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    vecs = np.stack(e.embedding.to_numpy()).astype(np.float64)
    micro = np.floor(vecs * 1e6 + 0.5)
    labels = e.label.to_numpy()
    ids = e.vec_id.to_numpy()
    expected = []
    for lab in sorted(set(int(x) for x in labels)):
        mask = labels == lab
        c = micro[mask].sum(axis=0)
        cos = vecs[mask] @ c / (
            np.linalg.norm(vecs[mask], axis=1) * np.linalg.norm(c)
        )
        cosq = np.floor(cos * 1e9 + 0.5) / 1e9
        order = sorted(zip(cosq, ids[mask]))[:2]
        expected += [
            (lab, rk + 1, int(vid)) for rk, (_, vid) in enumerate(order)
        ]
    assert [(r["label"], r["rk"], r["vec_id"]) for r in got] == expected
    for r in got:
        assert -1.0 <= r["cos"] <= 1.0
        # an outlier is below its label's typical alignment by definition
        assert not math.isnan(r["cos"])
