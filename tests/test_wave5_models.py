"""Model-based checks for the round-3 curation operators: each query's
result is recomputed with an independent pure-Python/pandas model on the
same input (the style of test_property_ops), so the Spark implementation
is pinned by something other than its own oracle SQL."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pytest

from clickhouse_objects_analysis_spark.queries import QUERIES


@pytest.fixture(scope="module")
def docs(sf_dir) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


class TestPiiScrub:
    PAT = re.compile(r"\b(customer|value|key)\b")

    def test_matches_python_re_model(self, spark, sf_dir, docs):
        got = (
            QUERIES["pii_scrub"](spark, sf_dir)
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        for doc_id, text in docs.set_index("doc_id")["text"].items():
            clean = self.PAT.sub("[REDACTED]", text)
            row = got.loc[doc_id]
            assert row["n_hits"] == len(self.PAT.findall(text)), doc_id
            assert row["clean_len"] == len(clean), doc_id
            assert row["clean_md5"] == hashlib.md5(clean.encode()).hexdigest(), (
                doc_id
            )

    def test_scrub_is_idempotent(self, docs):
        # the replacement token never matches the pattern, so a second
        # pass is a no-op — the property that makes re-running a curation
        # stage safe
        for text in docs["text"].head(50):
            once = self.PAT.sub("[REDACTED]", text)
            assert self.PAT.sub("[REDACTED]", once) == once


class TestSourceCap:
    def test_cap_and_deterministic_selection(self, spark, sf_dir, docs):
        got = QUERIES["source_cap"](spark, sf_dir).toPandas()
        assert got.groupby("source")["doc_id"].count().max() <= 15
        # model: same md5-of-key order, first 15 per source
        m = docs[["doc_id", "source"]].copy()
        m["h"] = m["doc_id"].map(
            lambda i: hashlib.md5(str(i).encode()).hexdigest()
        )
        expect = set()
        for src, grp in m.groupby("source"):
            kept = grp.sort_values(["h", "doc_id"]).head(15)["doc_id"]
            expect |= {(src, d) for d in kept}
        assert set(zip(got["source"], got["doc_id"])) == expect


class TestWinsorize:
    def test_matches_numpy_model(self, spark, sf_dir, docs):
        got = (
            QUERIES["winsorize_doclen"](spark, sf_dir)
            .toPandas()
            .set_index("source")
        )
        n = docs["n_chars"].to_numpy()
        # numpy 'linear' interpolation == Spark F.percentile == quantile_cont
        p01, p99 = np.percentile(n, [1, 99], method="linear")
        clamped = docs.assign(w=np.clip(n, p01, p99))
        for src, grp in clamped.groupby("source"):
            row = got.loc[src]
            assert row["n_docs"] == len(grp)
            assert row["mean_raw"] == pytest.approx(
                grp["n_chars"].mean(), abs=1e-4
            )
            assert row["mean_winsorized"] == pytest.approx(
                grp["w"].mean(), abs=1e-4
            )


class TestMovingSum:
    def test_matches_pandas_rolling(self, spark, sf_dir):
        got = (
            QUERIES["group_array_moving_sum"](spark, sf_dir)
            .toPandas()
            .set_index("user_id")["moving_sums"]
        )
        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        ev = ev[ev["event_type"] == "purchase"]
        for user, grp in ev.groupby("user_id"):
            g = grp.sort_values(["ts", "event_id"])
            vals = g["value"].round(2)
            mv = vals.rolling(3, min_periods=1).sum().round(2)
            expect = ",".join(f"{v:.2f}" for v in mv)
            assert got.loc[user] == expect, user
