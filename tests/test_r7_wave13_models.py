"""Round-7 wave-13 behavior tests: centroid drift vs a numpy replay,
the one-pass profiler vs pandas, URL percent/form split vs urllib."""

from __future__ import annotations

import math
import urllib.parse

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from clickhouse_objects_analysis_spark.functions.ch import ch_expr
from clickhouse_objects_analysis_spark.queries.r7_wave13 import (
    embedding_centroid_drift_q,
    table_profile_orders_q,
)

SF_SMALL = "/root/testdata/sf0.001"


def test_centroid_drift_matches_numpy(spark):
    got = {
        r["label"]: r["centroid_cos"]
        for r in embedding_centroid_drift_q(spark, SF_SMALL).collect()
    }
    e = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    vecs = np.stack(e.embedding.to_numpy()).astype(np.float64)
    micro = np.floor(vecs * 1e6 + 0.5).astype(np.int64)
    ids = e.vec_id.to_numpy()
    labels = e.label.to_numpy()
    for lab in np.unique(labels):
        s0 = micro[(labels == lab) & (ids % 2 == 0)].sum(axis=0).astype(float)
        s1 = micro[(labels == lab) & (ids % 2 == 1)].sum(axis=0).astype(float)
        cos = float(s0 @ s1 / (np.linalg.norm(s0) * np.linalg.norm(s1)))
        # tolerance: numpy sums in a different order than the dim-fold
        assert abs(got[int(lab)] - cos) < 1e-6, lab
        # a cosine, and finite (the testdata's per-label centroids sit
        # near the origin, so the value is small — the MATH is what the
        # replay above pins down)
        assert -1.0 <= got[int(lab)] <= 1.0


def test_table_profile_matches_pandas(spark):
    got = {r["col"]: r.asDict() for r in table_profile_orders_q(spark, SF_SMALL).collect()}
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    for c in ["o_custkey", "o_orderpriority", "o_orderstatus"]:
        g = got[c]
        assert g["n"] == len(o)
        assert g["n_nonnull"] == int(o[c].notna().sum())
        assert g["n_distinct"] == o[c].nunique()
        assert g["min_str"] == str(o[c].min())
        assert g["max_str"] == str(o[c].max())
    assert got["o_orderdate"]["n_distinct"] == o.o_orderdate.nunique()


def test_url_percent_vs_form_split(spark):
    cases = ["a b", "a+b", "x & y=z", "plain", "100% sure+more"]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i long, s string")
    got = {
        r["i"]: (r["ep"], r["ef"], r["dp"], r["df"])
        for r in df.select(
            "i",
            ch_expr("encodeURLComponent", F.col("s")).alias("ep"),
            ch_expr("encodeURLFormComponent", F.col("s")).alias("ef"),
            ch_expr(
                "decodeURLComponent",
                ch_expr("encodeURLComponent", F.col("s")),
            ).alias("dp"),
            ch_expr(
                "decodeURLFormComponent",
                ch_expr("encodeURLFormComponent", F.col("s")),
            ).alias("df"),
        ).collect()
    }
    for i, s in enumerate(cases):
        ep, ef, dp, dfm = got[i]
        # percent-style: urllib.quote with no safe chars (it never emits '+')
        assert ep == urllib.parse.quote(s, safe=""), (s, ep)
        # form-style: Java URLEncoder == urllib.quote_plus
        assert ef == urllib.parse.quote_plus(s), (s, ef)
        # both styles must round-trip their own encoding
        assert dp == s and dfm == s, (s, dp, dfm)
    # the split itself: space differs between the two styles
    assert got[0][0] == "a%20b" and got[0][1] == "a+b"
    # a literal '+' must survive percent decode (the old mapping lost it)
    assert got[1][2] == "a+b"


def test_url_form_decode_plus_is_space(spark):
    df = spark.createDataFrame([("a+b%26c",)], "s string")
    r = df.select(
        ch_expr("decodeURLFormComponent", F.col("s")).alias("d")
    ).head()
    assert r["d"] == "a b&c"
