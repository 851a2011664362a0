"""Round-7 wave-11 behavior tests: PMI vs a Python count replay, WAU vs
a pandas sliding set, the stratified sampler's per-stratum law, and the
Bloom filter vs a bit-exact hashlib replay."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from clickhouse_objects_analysis_spark.queries.r7_wave11 import (
    bigram_pmi_top_q,
    bloom_semijoin_prune_q,
    rolling_7d_active_users_q,
    stratified_weighted_sample_q,
)

SF_SMALL = "/root/testdata/sf0.001"


def test_bigram_pmi_matches_python_counts(spark):
    got = [r.asDict() for r in bigram_pmi_top_q(spark, SF_SMALL).collect()]
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    m = 0
    for t in d.text:
        ws = t.strip().split()
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            m += 1
    n = sum(uni.values())
    scored = [
        (
            math.floor(
                (
                    math.log(c12)
                    + 2 * math.log(n)
                    - math.log(m)
                    - math.log(uni[w1])
                    - math.log(uni[w2])
                )
                * 1e6
                + 0.5
            )
            / 1e6,
            w1,
            w2,
            c12,
        )
        for (w1, w2), c12 in big.items()
        if c12 >= 5
    ]
    top = sorted(scored, key=lambda t: (-t[0], t[1], t[2]))[:20]
    assert [(r["pmi"], r["w1"], r["w2"], r["c12"]) for r in got] == top
    # PMI of an above-chance collocation is positive; the floor must
    # keep ordering intact
    assert got[0]["pmi"] >= got[-1]["pmi"]


def test_rolling_wau_matches_pandas_sets(spark):
    got = {
        (r["event_type"], r["d"]): r["wau"]
        for r in rolling_7d_active_users_q(spark, SF_SMALL).collect()
    }
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["d"] = (
        pd.to_datetime(ev.ts).dt.normalize() - pd.Timestamp("2024-01-01")
    ).dt.days
    expected = {}
    for (et, day), _ in ev.groupby(["event_type", "d"]):
        users = set(
            ev[(ev.event_type == et) & (ev.d >= day - 6) & (ev.d <= day)].user_id
        )
        expected[(et, day)] = len(users)
    assert got == expected


def test_stratified_sample_is_per_source_top3(spark):
    got = [r.asDict() for r in stratified_weighted_sample_q(spark, SF_SMALL).collect()]
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    by_src: dict[str, list] = {}
    for r in d.itertuples():
        if r.n_chars <= 0:
            continue
        h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:15], 16)
        kn = math.floor(
            (h / 1152921504606846976.0) ** (1.0 / r.n_chars) * 1e9 + 0.5
        )
        by_src.setdefault(r.source, []).append((kn, r.doc_id, r.n_chars))
    expected = []
    for src in sorted(by_src):
        ranked = sorted(by_src[src], key=lambda t: (-t[0], t[1]))[:3]
        expected += [
            (src, i + 1, doc, nc, kn)
            for i, (kn, doc, nc) in enumerate(ranked)
        ]
    assert [
        (r["source"], r["rk"], r["doc_id"], r["n_chars"], r["key_nano"])
        for r in got
    ] == expected
    # every stratum is represented with exactly 3 picks
    assert len(got) == 3 * len(by_src)


def test_bloom_matches_bit_exact_replay(spark):
    row = bloom_semijoin_prune_q(spark, SF_SMALL).collect()[0]
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    keys = set(o[o.o_orderpriority == "1-URGENT"].o_orderkey)

    def positions(k):
        h = hashlib.md5(str(k).encode()).hexdigest()
        return int(h[:8], 16) % 65536, int(h[8:16], 16) % 65536

    bits = set()
    for k in keys:
        p1, p2 = positions(k)
        bits.update((p1, p2))
    n_pass = sum(
        1
        for k in li.l_orderkey
        if positions(k)[0] in bits and positions(k)[1] in bits
    )
    n_true = int(li.l_orderkey.isin(keys).sum())
    assert row["n_keys"] == len(keys)
    assert row["n_bloom_pass"] == n_pass
    assert row["n_true"] == n_true
    assert row["n_false_pos"] == n_pass - n_true
    # a Bloom filter never false-negatives: every true match passes
    assert row["n_bloom_pass"] >= row["n_true"]
