"""Round-7 wave-14 behavior tests: RAKE against a pure-Python replay,
SCD2 merge invariants, LATERAL VIEW vs direct token math."""

from __future__ import annotations

import re

import pandas as pd

from clickhouse_objects_analysis_spark.queries.r7_wave14 import (
    _STOPWORDS,
    lateral_view_surface_q,
    rake_keyword_extraction_q,
    scd2_dimension_merge_q,
)

SF_SMALL = "/root/testdata/sf0.001"
_WS = re.compile(r"\s+")


def test_rake_matches_python_replay(spark):
    got = [r.asDict() for r in rake_keyword_extraction_q(spark, SF_SMALL).collect()]
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    stop = set(_STOPWORDS)
    deg: dict[str, int] = {}
    freq: dict[str, int] = {}
    phrases: set[tuple[str, int]] = set()
    for t in d.text:
        ws = [w for w in _WS.split(t.strip()) if w]
        cur: list[str] = []
        for w in ws + ["the"]:  # sentinel stopword flushes the tail
            if w in stop:
                if cur:
                    for x in cur:
                        deg[x] = deg.get(x, 0) + len(cur)
                        freq[x] = freq.get(x, 0) + 1
                    if len(cur) >= 2:
                        phrases.add((" ".join(cur), len(cur)))
                    cur = []
            else:
                cur.append(w)
    s_nano = {w: deg[w] * 1000000000 // freq[w] for w in deg}
    scored = [
        (sum(s_nano[w] for w in p.split(" ")), p, n) for p, n in phrases
    ]
    top = sorted(scored, key=lambda t: (-t[0], t[1]))[:15]
    assert [(r["score_nano"], r["phrase"], r["n_words"]) for r in got] == top
    # RAKE prefers longer phrases of high-degree words: top phrase is
    # multi-word by construction of the candidate filter
    assert all(r["n_words"] >= 2 for r in got)


def test_scd2_invariants(spark):
    rows = [r.asDict() for r in scd2_dimension_merge_q(spark, SF_SMALL).collect()]
    c = pd.read_parquet(f"{SF_SMALL}/customer.parquet")
    n, n_changed = len(c), int((c.c_custkey % 10 == 0).sum())
    assert len(rows) == n + n_changed
    by_key: dict[int, list[dict]] = {}
    for r in rows:
        by_key.setdefault(r["custkey"], []).append(r)
    for key, versions in by_key.items():
        assert sum(v["is_current"] for v in versions) == 1  # one open row
        if key % 10 == 0:
            assert len(versions) == 2
            old, new = sorted(versions, key=lambda v: v["valid_from"])
            assert old["valid_to"] == new["valid_from"] == "2024-06-01"
            assert not old["is_current"] and new["is_current"]
            assert new["acctbal_cents"] - old["acctbal_cents"] == 10000
            assert new["valid_to"] == "9999-12-31"
        else:
            assert len(versions) == 1
            assert versions[0]["valid_to"] == "9999-12-31"


def test_lateral_view_matches_direct_counts(spark):
    got = {r["doc_id"]: r.asDict() for r in lateral_view_surface_q(spark, SF_SMALL).collect()}
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    for r in d.itertuples():
        ws = [w for w in _WS.split(r.text.strip()) if w]
        if not ws:
            assert r.doc_id not in got
            continue
        g = got[r.doc_id]
        assert g["n_tokens"] == len(ws)
        assert g["first_token"] == ws[0]
        assert g["n_distinct"] == len(set(ws))
