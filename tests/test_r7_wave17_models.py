"""Round-7 wave-17 behavior tests: SQL UDF inlining + exact discount
math, VARIANT typed extraction vs direct JSON parsing."""

from __future__ import annotations

import contextlib
import io
import json
import math

import pandas as pd

from clickhouse_objects_analysis_spark.queries.r7_wave17 import (
    sql_udf_surface_q,
    variant_json_surface_q,
)

SF_SMALL = "/root/testdata/sf0.001"


def test_sql_udf_matches_python_and_inlines(spark):
    df = sql_udf_surface_q(spark, SF_SMALL)
    got = {r["o_orderpriority"]: r.asDict() for r in df.collect()}
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    for pri, grp in o.groupby("o_orderpriority"):
        g = got[pri]
        assert g["n"] == len(grp)
        assert g["n_big"] == int((grp.o_totalprice > 150000).sum())
        cents = [math.floor(p * 100 + 0.5) for p in grp.o_totalprice]
        assert g["discounted_cents"] == sum(c * 9 // 10 for c in cents)
    # Catalyst inlines the SQL UDF body: the physical plan carries the
    # expression, not a function call — codegen/pushdown unaffected
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "is_big" not in plan and "discount_cents" not in plan


def test_variant_extraction_matches_json(spark):
    got = {r["event_type"]: r.asDict() for r in variant_json_surface_q(spark, SF_SMALL).collect()}
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    for et, grp in ev.groupby("event_type"):
        ks = [json.loads(p).get("k") for p in grp.props]
        present = [k for k in ks if k is not None]
        g = got[et]
        assert g["n"] == len(grp)
        assert g["sum_k"] == sum(present)
        assert g["max_k"] == max(present)
        assert g["n_missing"] == len(ks) - len(present)
