"""Round-7 wave-8 behavior tests: Holt–Winters against a hand-rolled
reference recurrence on synthetic seasonal data, the weighted reservoir
against its selection-probability law, Flesch against direct counting."""

from __future__ import annotations


import functools
import hashlib
import math
import operator as op
import re

import pandas as pd

from clickhouse_objects_analysis_spark.operators.timeseries import (
    holt_winters_additive,
)
from clickhouse_objects_analysis_spark.queries.r7_wave8 import (
    flesch_reading_ease_q,
    weighted_reservoir_sample_q,
)

SF_SMALL = "/root/testdata/sf0.001"


def _hw_ref(y, p=7, a=0.5, b_=0.3, g=0.2):
    m1 = functools.reduce(op.add, y[0:p]) / p
    m2 = functools.reduce(op.add, y[p : 2 * p]) / p
    l, b = m1, (m2 - m1) / p
    s = [y[j] - m1 for j in range(p)]
    for t in range(p, len(y)):
        idx = t % p
        l_new = a * (y[t] - s[idx]) + (1 - a) * (l + b)
        b = b_ * (l_new - l) + (1 - b_) * b
        s[idx] = g * (y[t] - l_new) + (1 - g) * s[idx]
        l = l_new
    nxt = s[len(y) % p]
    return round(l, 4), round(b, 4), round(nxt, 4), round(l + b + nxt, 4)


def test_holt_winters_matches_reference_on_synthetic_seasonal(spark):
    # trend 2/day + weekly season + deterministic jitter, 3 series
    rows = []
    series = {}
    for sid in ("a", "b", "c"):
        base = {"a": 10.0, "b": 50.0, "c": 0.0}[sid]
        y = [
            base
            + 2.0 * t
            + [5, -3, 0, 8, -6, 1, -5][t % 7]
            + ((t * 7919 + ord(sid)) % 13) * 0.25
            for t in range(23)
        ]
        series[sid] = y
        rows += [(sid, t, v) for t, v in enumerate(y)]
    df = spark.createDataFrame(rows, "sid string, t long, v double")
    got = {
        r["sid"]: (r["level"], r["trend"], r["season_next"], r["fc_1"])
        for r in holt_winters_additive(df, "sid", "t", "v").collect()
    }
    for sid, y in series.items():
        assert got[sid] == _hw_ref(y), sid
    # the learned trend should sit near the true 2/day slope
    for sid in series:
        assert 0.5 < got[sid][1] < 3.5


def test_holt_winters_drops_short_series(spark):
    rows = [("short", t, float(t)) for t in range(13)] + [
        ("ok", t, float(t)) for t in range(14)
    ]
    df = spark.createDataFrame(rows, "sid string, t long, v double")
    got = {r["sid"] for r in holt_winters_additive(df, "sid", "t", "v").collect()}
    assert got == {"ok"}


def test_weighted_reservoir_matches_python_and_respects_weights(spark):
    got = [r.asDict() for r in weighted_reservoir_sample_q(spark, SF_SMALL).collect()]
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    keyed = []
    for r in d.itertuples():
        if r.n_chars <= 0:
            continue
        h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:15], 16)
        u = h / 1152921504606846976.0
        kn = math.floor(u ** (1.0 / r.n_chars) * 1e9 + 0.5)
        keyed.append((kn, r.doc_id, r.n_chars))
    top = sorted(keyed, key=lambda t: (-t[0], t[1]))[:10]
    assert [(r["key_nano"], r["doc_id"], r["n_chars"]) for r in got] == top
    # weighting sanity: the winners' mean weight must exceed the corpus
    # mean (heavier docs get keys nearer 1)
    assert pd.Series([w for _, _, w in top]).mean() > d.n_chars.mean()


def test_flesch_matches_direct_counts(spark):
    got = {
        r["doc_id"]: r.asDict()
        for r in flesch_reading_ease_q(spark, SF_SMALL).collect()
    }
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    for r in d.itertuples():
        w = len([x for x in re.split(r"\s+", r.text.strip()) if x])
        if w == 0:
            assert r.doc_id not in got
            continue
        s = max(len(re.findall(r"[.!?]+", r.text)), 1)
        y = len(re.findall(r"[aeiouy]+", r.text.lower()))
        g = got[r.doc_id]
        assert (g["n_words"], g["n_sentences"], g["n_syllables"]) == (w, s, y)
        # the query quantizes via floor(v*1e4+0.5)/1e4 (repr-independent,
        # unlike round) — the reference replays the identical arithmetic
        r4 = lambda v: math.floor(v * 10000 + 0.5) / 10000  # noqa: E731
        assert abs(g["flesch"] - r4(206.835 - 1.015 * (w / s) - 84.6 * (y / w))) < 1e-9
        assert abs(g["fk_grade"] - r4(0.39 * (w / s) + 11.8 * (y / w) - 15.59)) < 1e-9
