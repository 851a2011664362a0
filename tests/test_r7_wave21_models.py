"""Round-7 wave-21 behavior tests: method overlap vs brute-force pair
sets, bootstrap vs a hashlib replay + statistical sanity."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd

from clickhouse_objects_analysis_spark.queries.r7_wave21 import (
    _POIS,
    bootstrap_mean_ci_q,
    dedup_method_overlap_q,
)

SF_SMALL = "/root/testdata/sf0.001"
_WS = re.compile(r"\s+")


def _pair_sets(d: pd.DataFrame):
    word_sets, char_sets = {}, {}
    for r in d.itertuples():
        t = r.text or ""
        ws = [w for w in _WS.split(t.strip()) if w]
        if len(ws) >= 3:
            word_sets[r.doc_id] = {
                " ".join(ws[j : j + 3]) for j in range(len(ws) - 2)
            }
        if len(t) >= 5:
            char_sets[r.doc_id] = {t[i : i + 5] for i in range(len(t) - 4)}
    dfc: dict[str, int] = {}
    for s in char_sets.values():
        for g in s:
            dfc[g] = dfc.get(g, 0) + 1
    capped = {g for g, c in dfc.items() if c > 200}

    def pairs(sets, cap=None):
        out = set()
        items = sorted(sets.items())
        for i, (ia, sa) in enumerate(items):
            for ib, sb in items[i + 1 :]:
                inter = len((sa & sb) - cap) if cap else len(sa & sb)
                if inter and inter / (len(sa) + len(sb) - inter) >= 0.5:
                    out.add((ia, ib))
        return out

    return pairs(word_sets), pairs(char_sets, capped)


def test_method_overlap_matches_bruteforce(spark):
    row = dedup_method_overlap_q(spark, SF_SMALL).collect()[0]
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    wp, cp = _pair_sets(d)
    assert row["word_only"] == len(wp - cp)
    assert row["char_only"] == len(cp - wp)
    assert row["both_methods"] == len(wp & cp)
    union = len(wp | cp)
    assert abs(
        row["pair_jaccard"] - math.floor(len(wp & cp) / union * 1e4 + 0.5) / 1e4
    ) < 1e-9


def test_bootstrap_matches_hashlib_replay(spark):
    row = bootstrap_mean_ci_q(spark, SF_SMALL).collect()[0]
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")

    def qscore(t):
        ws = [w for w in _WS.split(t.strip()) if w]
        nw, nc = len(ws), len(t)
        punct = len(re.sub(r"[a-zA-Z0-9\s]", "", t))
        q = (
            0.4 * min(nw / 100.0, 1.0)
            + 0.4 * len(set(ws)) / max(nw, 1)
            + 0.2 * (1 - min(punct / max(nc, 1) * 10, 1.0))
        )
        return math.floor(q * 1e6 + 0.5)

    qm = {r.doc_id: qscore(r.text) for r in d.itertuples()}
    assert row["n_docs"] == len(qm)
    mean_q = math.floor(sum(qm.values()) / len(qm) + 0.5) / 1e6
    assert abs(row["mean_q"] - mean_q) < 1e-9
    means = []
    for b in range(1, 33):
        sw = swq = 0
        for doc, q in qm.items():
            h = int(
                hashlib.md5(f"{doc}:{b}".encode()).hexdigest()[:15], 16
            )
            u = h / 1152921504606846976.0
            w = 8
            for k, t in enumerate(_POIS):
                if u < t:
                    w = k
                    break
            sw += w
            swq += w * q
        means.append(swq / sw)
    lo, hi = np.quantile(means, [0.025, 0.975], method="linear")
    assert abs(row["ci_lo"] - math.floor(lo + 0.5) / 1e6) < 2e-6
    assert abs(row["ci_hi"] - math.floor(hi + 0.5) / 1e6) < 2e-6
    # the interval is a real interval around the point estimate
    assert row["ci_lo"] <= row["mean_q"] <= row["ci_hi"]
    assert row["ci_hi"] - row["ci_lo"] < 0.1  # n=500 -> tight CI
