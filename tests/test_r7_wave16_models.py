"""Round-7 wave-16 behavior tests: kNN eval vs sklearn-free Python
metrics, cluster histogram invariants, ship latency vs pandas."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from clickhouse_objects_analysis_spark.queries.r7_wave16 import (
    dup_cluster_size_histogram_q,
    knn_eval_metrics_q,
    ship_latency_by_priority_q,
)

SF_SMALL = "/root/testdata/sf0.001"


def test_knn_eval_matches_python_metrics(spark):
    got = {r["label"]: r.asDict() for r in knn_eval_metrics_q(spark, SF_SMALL).collect()}
    e = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    vecs = np.stack(e.embedding.to_numpy()).astype(np.float64)
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    ids = e.vec_id.to_numpy()
    labels = e.label.to_numpy()
    qm, cm = ids < 100, ids >= 100
    cos = vecs[qm] @ vecs[cm].T
    cosq = np.floor(cos * 1e9 + 0.5) / 1e9
    preds = {}
    cids, clabs = ids[cm], labels[cm]
    for row, qid, tl in zip(cosq, ids[qm], labels[qm]):
        order = sorted(zip(-row, cids))[:10]
        votes: dict[int, int] = {}
        for _, cid in order:
            lab = int(clabs[cids == cid][0])
            votes[lab] = votes.get(lab, 0) + 1
        pred = max(votes, key=lambda k: (votes[k], -k))
        preds[int(qid)] = (int(tl), pred)
    pairs = list(preds.values())
    label_set = {t for t, _ in pairs} | {p for _, p in pairs}
    assert set(got) == label_set
    for lab in label_set:
        tp = sum(1 for t, p in pairs if t == lab and p == lab)
        fp = sum(1 for t, p in pairs if t != lab and p == lab)
        fn = sum(1 for t, p in pairs if t == lab and p != lab)
        g = got[lab]
        assert (g["tp"], g["fp"], g["fn"]) == (tp, fp, fn), lab
        if tp + fp:
            assert abs(g["precision_"] - math.floor(tp / (tp + fp) * 1e4 + 0.5) / 1e4) < 1e-9
        else:
            assert g["precision_"] == 0.0
        if tp + fn:
            assert abs(g["recall_"] - math.floor(tp / (tp + fn) * 1e4 + 0.5) / 1e4) < 1e-9
    # micro consistency: sum(tp)+sum(fn) == number of eval queries
    assert sum(g["tp"] + g["fn"] for g in got.values()) == len(pairs)


def test_cluster_histogram_accounts_for_every_doc(spark):
    rows = [r.asDict() for r in dup_cluster_size_histogram_q(spark, SF_SMALL).collect()]
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == len(d)  # total mass conserved
    for r in rows:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
        assert r["removable_docs"] == r["n_docs"] - r["n_clusters"]
    sizes = [r["cluster_size"] for r in rows]
    assert sizes == sorted(sizes) and sizes[0] == 1  # singletons exist
    # yield estimate equals docs minus clusters
    total_removable = sum(r["removable_docs"] for r in rows)
    total_clusters = sum(r["n_clusters"] for r in rows)
    assert total_removable == len(d) - total_clusters


def test_ship_latency_matches_pandas(spark):
    got = {r["o_orderpriority"]: r.asDict() for r in ship_latency_by_priority_q(spark, SF_SMALL).collect()}
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    days = (
        pd.to_datetime(j.l_shipdate) - pd.to_datetime(j.o_orderdate)
    ).dt.days.astype(float)
    j = j.assign(days=days)
    for pri, grp in j.groupby("o_orderpriority"):
        g = got[pri]
        assert g["n"] == len(grp)
        assert abs(g["p50_days"] - round(float(np.quantile(grp.days, 0.5)), 4)) < 1e-9
        assert abs(g["p90_days"] - round(float(np.quantile(grp.days, 0.9)), 4)) < 2e-4
        assert g["max_days"] == int(grp.days.max())
