"""Property-style randomized checks for the round-8 session operators:
base58 round-trip and reference parity over random ASCII payloads,
geohash encode against a pure-Python reference over random coordinates,
and synchronous LPA against a brute-force Python replay on random
graphs. Seeded RNG, deterministic; cases batched into single Spark
round trips."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from clickhouse_objects_analysis_spark.functions.ch import ch_expr
from clickhouse_objects_analysis_spark.operators.graph import (
    label_propagation,
)

_B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
_GEO32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _ref_b58(s: str) -> str:
    v = int.from_bytes(s.encode(), "big")
    out = ""
    while v:
        out = _B58[v % 58] + out
        v //= 58
    return out


def test_base58_random_roundtrip(spark):
    rng = np.random.RandomState(58001)
    printable = [chr(c) for c in range(33, 127) if chr(c) != "'"]
    probes = [
        "".join(rng.choice(printable, size=int(rng.randint(1, 9))))
        for _ in range(120)
    ]
    df = spark.createDataFrame([(p,) for p in probes], "s string")
    rows = df.select(
        "s",
        ch_expr("base58Encode", F.col("s")).alias("e"),
        ch_expr(
            "base58Decode", ch_expr("base58Encode", F.col("s"))
        ).alias("rt"),
    ).collect()
    for r in rows:
        assert r["e"] == _ref_b58(r["s"]), (r["s"], r["e"])
        assert r["rt"] == r["s"], (r["s"], r["rt"])


def _ref_geohash(lon: float, lat: float, p: int) -> str:
    nlon = (5 * p + 1) // 2
    nlat = 5 * p // 2
    xl = min(int((lon + 180.0) / 360.0 * (1 << nlon)), (1 << nlon) - 1)
    xt = min(int((lat + 90.0) / 180.0 * (1 << nlat)), (1 << nlat) - 1)
    bits = []
    for i in range(5 * p):
        if i % 2 == 0:
            bits.append((xl >> (nlon - 1 - i // 2)) & 1)
        else:
            bits.append((xt >> (nlat - 1 - (i - 1) // 2)) & 1)
    return "".join(
        _GEO32[
            sum(b << (4 - k) for k, b in enumerate(bits[5 * c : 5 * c + 5]))
        ]
        for c in range(p)
    )


def test_geohash_random_coordinates(spark):
    rng = np.random.RandomState(32768)
    pts = [
        (float(rng.uniform(-180, 180)), float(rng.uniform(-90, 90)))
        for _ in range(150)
    ] + [(-180.0, -90.0), (179.999999, 89.999999), (0.0, 0.0)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    for p in (4, 6, 11):
        rows = df.select(
            "lon", "lat",
            ch_expr("geohashEncode", F.col("lon"), F.col("lat"), p).alias(
                "g"
            ),
        ).collect()
        for r in rows:
            assert r["g"] == _ref_geohash(r["lon"], r["lat"], p), (
                p, r["lon"], r["lat"], r["g"],
            )


def _ref_lpa(edges, rounds: int) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    lbl = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n, nbrs in adj.items():
            votes: dict[int, int] = {}
            for m in nbrs:
                votes[lbl[m]] = votes.get(lbl[m], 0) + 1
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[n] = best[0]
        lbl = nxt
    return lbl


def test_lpa_random_graphs_match_reference(spark):
    rng = np.random.RandomState(90210)
    for _ in range(4):
        n = int(rng.randint(8, 24))
        m = int(rng.randint(n, 3 * n))
        edges = list(
            {
                (int(a), int(b)) if a < b else (int(b), int(a))
                for a, b in rng.randint(0, n, size=(m, 2))
                if a != b
            }
        )
        if not edges:
            continue
        rounds = int(rng.randint(1, 5))
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["n"]: r["lbl"]
            for r in label_propagation(df, "id_a", "id_b", rounds).collect()
        }
        assert got == _ref_lpa(edges, rounds), (edges, rounds)
