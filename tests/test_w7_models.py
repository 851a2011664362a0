"""Round-5 aggregate wave vs independent numpy/pandas models — same
strategy as test_w6_models: recompute the statistic from the raw parquet
with a different library and compare to the registry query's output."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def orders(sf_dir):
    return pd.read_parquet(f"{sf_dir}/orders.parquet")


@pytest.fixture(scope="module")
def li(sf_dir):
    return pd.read_parquet(f"{sf_dir}/lineitem.parquet")


def test_theils_u_model(spark, sf_dir, orders):
    from clickhouse_objects_analysis_spark.queries import QUERIES

    got = QUERIES["theils_u"](spark, sf_dir).collect()[0]
    ct = pd.crosstab(orders["o_orderpriority"], orders["o_orderstatus"])
    n = ct.to_numpy().sum()
    px = ct.sum(axis=1).to_numpy() / n
    hx = -(px * np.log(px)).sum()
    hxy = 0.0
    for y in ct.columns:
        col = ct[y].to_numpy()
        ny = col.sum()
        nz = col[col > 0]
        hxy += -((nz / n) * np.log(nz / ny)).sum()
    assert got.n == n
    assert got.theils_u == pytest.approx((hx - hxy) / hx, abs=1e-5)


def test_mean_z_test_model(spark, sf_dir, li):
    from clickhouse_objects_analysis_spark.queries import QUERIES

    got = QUERIES["mean_z_test"](spark, sf_dir).collect()[0]
    cents = (li["l_extendedprice"] * 100).round().astype("int64")
    a = cents[li["l_returnflag"] == "A"].to_numpy()
    r = cents[li["l_returnflag"] == "R"].to_numpy()
    z = (a.mean() - r.mean()) / np.sqrt(
        a.var() / len(a) + r.var() / len(r)
    )
    assert (got.n_a, got.n_r) == (len(a), len(r))
    assert got.z_stat == pytest.approx(z, abs=1e-4)


def test_categorical_iv_model(spark, sf_dir, orders):
    from clickhouse_objects_analysis_spark.queries import QUERIES

    got = QUERIES["categorical_iv"](spark, sf_dir).collect()[0]
    bad = (orders["o_orderstatus"] == "F").astype(int)
    df = pd.DataFrame({"cat": orders["o_orderpriority"], "bad": bad})
    per = df.groupby("cat")["bad"].agg(["sum", "count"])
    g = per["count"] - per["sum"]
    b = per["sum"]
    keep = (g > 0) & (b > 0)
    gr = g[keep] / g.sum()
    br = b[keep] / b.sum()
    iv = ((gr - br) * np.log(gr / br)).sum()
    assert got.n_cats == int(keep.sum())
    assert got.information_value == pytest.approx(iv, abs=1e-5)


def test_sparkbar_is_24_glyphs_from_palette(spark, sf_dir):
    from clickhouse_objects_analysis_spark.queries import QUERIES

    rows = QUERIES["sparkbar_hourly"](spark, sf_dir).collect()
    palette = set("▁▂▃▄▅▆▇█")
    assert rows
    for r in rows:
        assert len(r.bar) == 24
        assert set(r.bar) <= palette
        assert "█" in r.bar  # the max bucket always renders full height


def test_ngram_novelty_model(spark, sf_dir):
    """Independent pandas recomputation of per-source 3-gram novelty."""
    from clickhouse_objects_analysis_spark.queries import QUERIES

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    got = {
        r.source: r
        for r in QUERIES["ngram_novelty"](spark, sf_dir).collect()
    }
    first: dict[str, int] = {}
    grams_by_doc: dict[int, tuple[str, set]] = {}
    for _, row in docs.sort_values("doc_id").iterrows():
        ws = [w for w in str(row.text).split() if w]
        gs = {
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        } if len(ws) >= 3 else set()
        grams_by_doc[row.doc_id] = (row.source, gs)
        for g in gs:
            first.setdefault(g, row.doc_id)
    agg: dict[str, list[int]] = {}
    for doc_id, (src, gs) in grams_by_doc.items():
        if not gs:
            continue
        novel = sum(1 for g in gs if first[g] == doc_id)
        a = agg.setdefault(src, [0, 0, 0])
        a[0] += 1
        a[1] += novel
        a[2] += len(gs)
    assert set(agg) == set(got)
    for src, (n_docs, novel, totg) in agg.items():
        r = got[src]
        assert (r.n_docs, r.novel_grams, r.total_grams) == (
            n_docs, novel, totg,
        ), src


def test_zipf_slope_model(spark, sf_dir):
    """Least-squares slope recomputed with numpy over the same top-1000."""
    from collections import Counter

    from clickhouse_objects_analysis_spark.queries import QUERIES

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    counts = Counter()
    for t in docs["text"]:
        counts.update(w for w in str(t).split() if w)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    r = np.arange(1, len(top) + 1, dtype=float)
    c = np.array([v for _, v in top], dtype=float)
    slope = np.polyfit(np.log(r), np.log(c), 1)[0]
    got = QUERIES["zipf_fit"](spark, sf_dir).collect()[0]
    assert got.n_ranks == len(top)
    assert got.zipf_slope == pytest.approx(slope, abs=1e-4)


def test_new_ch_function_builders(spark):
    """Round-5 translation-table additions (arrays/strings/math/dates)
    evaluated against hand-computed expectations."""
    import pyspark.sql.functions as F

    from clickhouse_objects_analysis_spark.functions.ch import ch_expr

    r = (
        spark.range(1)
        .select(
            ch_expr(
                "arrayCompact",
                F.array(F.lit(1), F.lit(1), F.lit(2), F.lit(2), F.lit(1)),
            ).alias("compact"),
            ch_expr(
                "arrayDifference", F.array(F.lit(1), F.lit(4), F.lit(9))
            ).alias("diff"),
            ch_expr("arrayProduct", F.array(F.lit(2.0), F.lit(3.0))).alias(
                "prod"
            ),
            ch_expr("levenshteinDistance", F.lit("abc"), F.lit("adc")).alias(
                "lev"
            ),
            ch_expr("soundex", F.lit("Robert")).alias("sx"),
            ch_expr("bitCount", F.lit(7)).alias("bc"),
            ch_expr("bitTest", F.lit(5), F.lit(2)).alias("bt"),
            ch_expr("toQuarter", F.lit("2026-08-14").cast("date")).alias("q"),
            ch_expr("locate", F.lit("b"), F.lit("abc")).alias("loc"),
            ch_expr("exp10", F.lit(3.0)).alias("e10"),
        )
        .collect()[0]
    )
    assert list(r.compact) == [1, 2, 1]
    assert [float(v) for v in r.diff] == [0.0, 3.0, 5.0]
    assert r.prod == 6.0
    assert r.lev == 1
    assert r.sx == "R163"
    assert r.bc == 3
    assert r.bt == 1  # bit 2 of 0b101
    assert r.q == 3
    assert r.loc == 2
    assert r.e10 == 1000.0


def test_window_funnel_strict_dedup_model(spark, sf_dir):
    """Pandas per-user replay of the strict_dedup rule: a repeat of an
    already-matched step before the next step interrupts the chain."""
    from clickhouse_objects_analysis_spark.queries import QUERIES

    W = 3 * 24 * 3600 * 1_000_000
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["t"] = ev["ts"].astype("datetime64[us]").astype("int64")  # -> us
    levels = {}
    for uid, g in ev.groupby("user_id"):
        views = sorted(g.loc[g.event_type == "view", "t"])
        clicks = sorted(g.loc[g.event_type == "click", "t"])
        purch = sorted(g.loc[g.event_type == "purchase", "t"])
        if not views:
            continue
        t1 = views[0]
        v2 = next((t for t in views if t > t1), None)
        t2 = next((t for t in clicks if t > t1 and t - t1 <= W), None)
        if t2 is None or (v2 is not None and v2 <= t2):
            levels[uid] = 1
            continue
        c2 = next((t for t in clicks if t > t2), None)
        t3 = next((t for t in purch if t > t2 and t - t1 <= W), None)
        if t3 is None or (c2 is not None and c2 <= t3):
            levels[uid] = 2
            continue
        levels[uid] = 3
    exp = pd.Series(list(levels.values())).value_counts().sort_index()
    got = {
        r.funnel_level: r.n_users
        for r in QUERIES["window_funnel_strict_dedup"](spark, sf_dir).collect()
    }
    assert got == {int(k): int(v) for k, v in exp.items()}


def test_entropy_agg_model(spark, sf_dir, li):
    from clickhouse_objects_analysis_spark.queries import QUERIES

    got = {r.l_returnflag: r for r in QUERIES["entropy_agg"](spark, sf_dir).collect()}
    for flag, g in li.groupby("l_returnflag"):
        p = g["l_shipdate"].value_counts(normalize=True).to_numpy()
        h = float(-(p * np.log2(p)).sum())
        assert got[flag].n == len(g)
        assert got[flag].entropy_bits == pytest.approx(h, abs=1e-5)


def test_exponential_moving_average_model(spark, sf_dir):
    from clickhouse_objects_analysis_spark.queries import QUERIES

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    p = ev[ev.event_type == "purchase"].sort_values(["ts", "event_id"])
    got = {
        r.user_id: r.ema
        for r in QUERIES["exponential_moving_average"](spark, sf_dir).collect()
    }
    for uid, g in p.groupby("user_id"):
        cents = (g["value"] * 100).round().to_numpy()
        n = len(cents)
        w = 0.5 ** np.arange(n - 1, -1, -1)
        keep = (n - 1 - np.arange(n)) <= 40
        ema = (cents[keep] * w[keep]).sum() / w[keep].sum() / 100.0
        assert got[uid] == pytest.approx(ema, abs=1e-4), uid


def test_quantile_interpolated_weighted_model(spark, sf_dir, li):
    from clickhouse_objects_analysis_spark.queries import QUERIES

    got = {
        r.l_returnflag: r.median_interp
        for r in QUERIES["quantile_interpolated_weighted"](spark, sf_dir).collect()
    }
    for flag, g in li.groupby("l_returnflag"):
        y = (g["l_extendedprice"] * 100).round().astype("int64")
        w = g["l_quantity"].astype("int64")
        h = pd.DataFrame({"y": y, "w": w}).groupby("y")["w"].sum().sort_index()
        cw = h.cumsum()
        tw = int(h.sum())
        lo = cw[2 * cw <= tw]
        hi = cw[2 * cw >= tw]
        y_lo = lo.index.max() if len(lo) else None
        y_hi = hi.index.min()
        if y_lo is not None and 2 * int(cw[y_lo]) == tw and y_hi > y_lo:
            med = (y_lo + y_hi) / 2.0
        else:
            med = float(y_hi)
        assert got[flag] == pytest.approx(round(med / 100.0, 4), abs=1e-9), flag


def test_kmeans_clusters_model(spark, sf_dir):
    """Pure-Python integer Lloyd replay (round-half-away quantize,
    truncating division) must reproduce the Spark trajectory exactly."""
    from clickhouse_objects_analysis_spark.queries import QUERIES

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")

    def q(x):  # round half away from zero, like Spark/DuckDB round()
        v = float(x) * 1e6
        return int(np.floor(v + 0.5)) if v >= 0 else -int(np.floor(-v + 0.5))

    def tdiv(s, n):  # truncation toward zero, like DIV / //
        return s // n if s >= 0 else -((-s) // n)

    vecs = {
        int(r.vec_id): [q(x) for x in r.embedding]
        for r in emb.itertuples()
    }
    k, dim = 4, len(next(iter(vecs.values())))
    ids = sorted(vecs)
    cents = {j: vecs[ids[j]] for j in range(k)}
    for _ in range(2):
        assign, dists = {}, {}
        for i, a in vecs.items():
            best = min(
                (sum((x - y) ** 2 for x, y in zip(a, cents[c])), c)
                for c in sorted(cents)
            )
            dists[i], assign[i] = best
        cents = {}
        for c in set(assign.values()):
            members = [vecs[i] for i in vecs if assign[i] == c]
            cents[c] = [
                tdiv(sum(m[p] for m in members), len(members))
                for p in range(dim)
            ]
    exp = {}
    for c in sorted(set(assign.values())):
        ms = [i for i in vecs if assign[i] == c]
        exp[c] = (len(ms), sum(dists[i] // 1000 for i in ms))
    got = {
        r.cluster: (r.n_vecs, r.inertia_k)
        for r in QUERIES["kmeans_clusters"](spark, sf_dir).collect()
    }
    assert got == exp


def test_array_map_builder_batch(spark):
    """Second round-5 builder batch: zip/enumerate/resize/push/pop,
    hasAny/hasAll, arrayFirst/Last/FirstIndex/Count, map builders."""
    import pyspark.sql.functions as F

    from clickhouse_objects_analysis_spark.functions.ch import ch_expr

    arr = F.array(F.lit(3), F.lit(1), F.lit(3), F.lit(2))
    r = (
        spark.range(1)
        .select(
            ch_expr("arrayEnumerate", arr).alias("en"),
            ch_expr("arrayEnumerateUniq", arr).alias("eu"),
            ch_expr("arrayResize", F.array(F.lit(1), F.lit(2)), 4, 0).alias(
                "rs"
            ),
            ch_expr("arrayPushBack", F.array(F.lit(1)), F.lit(9)).alias("pb"),
            ch_expr("arrayPushFront", F.array(F.lit(1)), F.lit(9)).alias(
                "pf"
            ),
            ch_expr("arrayPopBack", arr).alias("ob"),
            ch_expr("arrayPopFront", arr).alias("of"),
            ch_expr(
                "hasAny", arr, F.array(F.lit(9), F.lit(2))
            ).alias("ha"),
            ch_expr(
                "hasAll", arr, F.array(F.lit(3), F.lit(2))
            ).alias("hl"),
            ch_expr("arrayFirst", lambda x: x > 1, arr).alias("fi"),
            ch_expr("arrayLast", lambda x: x > 1, arr).alias("la"),
            ch_expr("arrayFirstIndex", lambda x: x == 2, arr).alias("fx"),
            ch_expr("arrayCount", lambda x: x == 3, arr).alias("ct"),
            ch_expr(
                "mapContains",
                ch_expr(
                    "mapFromArrays",
                    F.array(F.lit("a"), F.lit("b")),
                    F.array(F.lit(1), F.lit(2)),
                ),
                F.lit("b"),
            ).alias("mc"),
        )
        .collect()[0]
    )
    assert list(r.en) == [1, 2, 3, 4]
    assert list(r.eu) == [1, 1, 2, 1]
    assert list(r.rs) == [1, 2, 0, 0]
    assert list(r.pb) == [1, 9] and list(r.pf) == [9, 1]
    assert list(r.ob) == [3, 1, 3] and list(r.of) == [1, 3, 2]
    assert r.ha is True and r.hl is True
    assert r.fi == 3 and r.la == 2
    assert r.fx == 4 and r.ct == 2
    assert r.mc is True


def test_display_and_json_builders(spark):
    """Third builder batch: formatReadableSize, bar, toStartOfInterval,
    arrayFold, JSON length/bool."""
    import pyspark.sql.functions as F

    from clickhouse_objects_analysis_spark.functions.ch import ch_expr

    r = (
        spark.range(1)
        .select(
            ch_expr("formatReadableSize", F.lit(123)).alias("b"),
            ch_expr("formatReadableSize", F.lit(1536)).alias("kib"),
            ch_expr("formatReadableSize", F.lit(3 * 1024**2)).alias("mib"),
            ch_expr("bar", F.lit(5), 0, 10, 4).alias("bar_half"),
            ch_expr("bar", F.lit(10), 0, 10, 4).alias("bar_full"),
            ch_expr("bar", F.lit(-3), 0, 10, 4).alias("bar_clamped"),
            ch_expr(
                "toStartOfInterval",
                F.lit("2026-08-14 12:34:56").cast("timestamp"),
                900,
            ).alias("q15"),
            ch_expr(
                "arrayFold",
                lambda acc, x: acc + x,
                F.array(F.lit(1), F.lit(2), F.lit(3)),
                F.lit(10),
            ).alias("fold"),
            ch_expr("JSONLength", F.lit('[1,2,3]')).alias("jl_arr"),
            ch_expr("JSONLength", F.lit('{"a":1,"b":2}')).alias("jl_obj"),
            ch_expr("JSONExtractBool", F.lit('{"f":true}'), "f").alias("jb"),
        )
        .collect()[0]
    )
    assert r.b == "123.00 B"
    assert r.kib == "1.50 KiB"
    assert r.mib == "3.00 MiB"
    assert r.bar_half == "██"
    assert r.bar_full == "████"
    assert r.bar_clamped == ""
    assert str(r.q15) == "2026-08-14 12:30:00"
    assert r.fold == 16
    assert r.jl_arr == 3 and r.jl_obj == 2
    assert r.jb is True


def test_array_compact_null_safe(spark):
    """ClickHouse arrayCompact keeps one element per consecutive run
    INCLUDING nulls: [1,null,null,2,2,null] -> [1,null,2,null]."""
    import pyspark.sql.functions as F

    from clickhouse_objects_analysis_spark.functions.ch import ch_expr

    arr = F.array(
        F.lit(1), F.lit(None).cast("int"), F.lit(None).cast("int"),
        F.lit(2), F.lit(2), F.lit(None).cast("int"),
    )
    got = spark.range(1).select(ch_expr("arrayCompact", arr).alias("c")).head()[0]
    assert got == [1, None, 2, None]


def test_kmeans_rejects_zero_iters(spark):
    import pytest as _pytest

    from clickhouse_objects_analysis_spark.operators import kmeans as km

    docs = spark.createDataFrame([(1, [1.0, 2.0])], ["id", "vec"])
    e = km.quantize_vectors(docs, "id", "vec")
    with _pytest.raises(ValueError):
        km.kmeans_assignments(e, k=1, iters=0, dim=2)


def test_r6_ch_function_builders(spark):
    """Round-6 translation-table additions evaluated against hand-computed
    expectations (strings / bit / date / map / casts / URL)."""
    import datetime as dt

    import pyspark.sql.functions as F

    from clickhouse_objects_analysis_spark.functions.ch import CH_FUNCTIONS, ch_expr

    assert len(CH_FUNCTIONS) >= 250

    ts = F.lit("2026-08-14 10:47:31").cast("timestamp")
    r = (
        spark.range(1)
        .select(
            ch_expr("countMatches", F.lit("a1b22c333"), F.lit("[0-9]+")).alias("cm"),
            ch_expr("countSubstrings", F.lit("abcabcab"), F.lit("ab")).alias("cs"),
            ch_expr("extractAll", F.lit("a1b22c333"), F.lit("[0-9]+")).alias("ea"),
            ch_expr("splitByRegexp", F.lit("[,;]"), F.lit("a,b;c")).alias("sr"),
            ch_expr("splitByWhitespace", F.lit("  a\tb  c ")).alias("sw"),
            ch_expr("concatWithSeparator", "-", F.lit("x"), F.lit("y")).alias("cws"),
            ch_expr("left", F.lit("hello"), F.lit(2)).alias("l2"),
            ch_expr("right", F.lit("hello"), F.lit(2)).alias("r2"),
            ch_expr("ascii", F.lit("A")).alias("asc"),
            ch_expr("bitAnd", F.lit(12), F.lit(10)).alias("ba"),
            ch_expr("bitXor", F.lit(12), F.lit(10)).alias("bx"),
            ch_expr("bitShiftLeft", F.lit(3), 2).alias("bsl"),
            ch_expr("roundBankers", F.lit(2.5), 0).alias("rb"),
            ch_expr("isNaN", F.lit(float("nan"))).alias("nan"),
            ch_expr("isFinite", F.lit(1.5)).alias("fin"),
            ch_expr("isInfinite", F.lit(float("inf"))).alias("inf"),
            ch_expr("ifNotFinite", F.lit(float("inf")), F.lit(-1.0)).alias("inf2"),
            ch_expr("toStartOfWeek", ts).alias("sow"),
            ch_expr("toMonday", ts).alias("mon"),
            ch_expr("toStartOfFifteenMinutes", ts).alias("s15"),
            ch_expr("timeSlot", ts).alias("slot"),
            ch_expr("toDayOfYear", ts).alias("doy"),
            ch_expr("addHours", ts, F.lit(3)).alias("ah"),
            ch_expr("subtractMonths", F.lit("2026-08-14").cast("date"), F.lit(2)).alias("sm"),
            ch_expr("toRelativeHourNum", F.lit("1970-01-02 01:00:00").cast("timestamp")).alias("rh"),
            ch_expr(
                "mapFilter",
                lambda k, v: v > 1,
                F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2)),
            ).alias("mf"),
            ch_expr(
                "mapApply",
                lambda e: F.struct(
                    F.upper(e["key"]).alias("key"), (e["value"] * 10).alias("value")
                ),
                F.create_map(F.lit("a"), F.lit(1)),
            ).alias("ma"),
            ch_expr("toInt64OrNull", F.lit("12x")).alias("bad_int"),
            ch_expr("toInt64OrNull", F.lit("12")).alias("ok_int"),
            ch_expr("toFloat64", F.lit("2.5")).alias("f64"),
            ch_expr("encodeURLComponent", F.lit("a b&c")).alias("enc"),
            ch_expr("decodeURLComponent", F.lit("a%20b%26c")).alias("dec"),
            ch_expr("topLevelDomain", F.lit("https://docs.example.org/x?q=1")).alias("tld"),
            ch_expr("crc32", F.lit("hello")).alias("crc"),
        )
        .head()
    )
    assert r.cm == 3 and r.cs == 3
    assert r.ea == ["1", "22", "333"]
    assert r.sr == ["a", "b", "c"] and r.sw == ["a", "b", "c"]
    assert r.cws == "x-y" and r.l2 == "he" and r.r2 == "lo" and r.asc == 65
    assert r.ba == 8 and r.bx == 6 and r.bsl == 12
    assert r.rb == 2.0  # banker's rounding: 2.5 -> 2
    assert r.nan is True and r.fin is True and r.inf is True and r.inf2 == -1.0
    # 2026-08-14 is a Friday: Sunday start = 08-09, Monday = 08-10
    assert r.sow == dt.date(2026, 8, 9) and r.mon == dt.date(2026, 8, 10)
    assert r.s15 == dt.datetime(2026, 8, 14, 10, 45, 0)
    assert r.slot == dt.datetime(2026, 8, 14, 10, 30, 0)
    assert r.doy == 226
    assert r.ah == dt.datetime(2026, 8, 14, 13, 47, 31)
    assert r.sm == dt.date(2026, 6, 14)
    assert r.rh == 25  # 25 full hours since the epoch
    assert r.mf == {"b": 2} and r.ma == {"A": 10}
    assert r.bad_int is None and r.ok_int == 12 and r.f64 == 2.5
    # percent-style CH semantics: space -> %20, '+' survives decode
    assert r.enc == "a%20b%26c" and r.dec == "a b&c" and r.tld == "org"
    assert r.crc == 907060870  # zlib.crc32(b"hello")


def test_age_datediff_dateadd_builders(spark):
    """These three referenced nonexistent F.timestampadd/timestampdiff
    names until round 6 — pin them with real evaluations."""
    import datetime as dt

    import pyspark.sql.functions as F

    from clickhouse_objects_analysis_spark.functions.ch import ch_expr

    a = F.lit("2026-01-01 00:00:00").cast("timestamp")
    b = F.lit("2026-03-01 12:00:00").cast("timestamp")
    r = (
        spark.range(1)
        .select(
            ch_expr("age", "DAY", a, b).alias("age_d"),
            ch_expr("dateDiff", "HOUR", a, b).alias("dd_h"),
            ch_expr("dateAdd", "DAY", F.lit(10), a).alias("da"),
        )
        .head()
    )
    assert r.age_d == 59 and r.dd_h == 59 * 24 + 12
    assert r.da == dt.datetime(2026, 1, 11, 0, 0, 0)
