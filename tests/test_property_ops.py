"""Property-style randomized checks for the custom operators (SURVEY §5
item 4): asof_join across all (direction, allow_exact, how) combinations
against a brute-force Python oracle, and with_fill invariants
(density, value preservation, zero-fill, carry-forward).

Seeded RNG → deterministic; each case round-trips through Spark once.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from clickhouse_objects_analysis_spark.operators.fill import with_fill
from clickhouse_objects_analysis_spark.operators.joins import asof_join


def _gen_case(rng: np.random.RandomState):
    """Random (left, right) event sets over a few keys with colliding
    timestamps (ts drawn from a small range so exact-match ties happen)."""
    n_keys = rng.randint(1, 4)
    left = [
        (int(k), int(rng.randint(0, 20)), int(i))
        for i in range(rng.randint(1, 15))
        for k in [rng.randint(0, n_keys)]
    ]
    # unique (key, ts) on the right — the documented ASOF requirement
    seen = set()
    right = []
    for _ in range(rng.randint(1, 15)):
        k, ts = int(rng.randint(0, n_keys)), int(rng.randint(0, 20))
        if (k, ts) not in seen:
            seen.add((k, ts))
            right.append((k, ts, float(rng.randint(0, 100))))
    return left, right


def _brute_asof(left, right, direction, allow_exact):
    """Per left row: the single right row with the nearest ts on the
    allowed side, None if no candidate."""
    out = {}
    for k, lts, lid in left:
        if direction == "backward":
            cands = [
                (rts, v)
                for rk, rts, v in right
                if rk == k and (rts <= lts if allow_exact else rts < lts)
            ]
            best = max(cands) if cands else None
        else:
            cands = [
                (rts, v)
                for rk, rts, v in right
                if rk == k and (rts >= lts if allow_exact else rts > lts)
            ]
            best = min(cands) if cands else None
        out[lid] = best
    return out


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("allow_exact", [True, False])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_asof_join_matches_brute_force(spark, direction, allow_exact, how):
    rng = np.random.RandomState(hash((direction, allow_exact, how)) % 2**31)
    for _ in range(6):
        left_rows, right_rows = _gen_case(rng)
        l = spark.createDataFrame(left_rows, "k int, ts int, lid int")
        r = spark.createDataFrame(right_rows, "k int, ts int, val double")
        got = {
            row["lid"]: (row["matched_rts"], row["val"])
            for row in asof_join(
                l,
                r.withColumnRenamed("ts", "rts"),
                by=["k"],
                left_ts="ts",
                right_ts="rts",
                value_cols=["val"],
                direction=direction,
                allow_exact=allow_exact,
                how=how,
            ).collect()
        }
        expected = _brute_asof(left_rows, right_rows, direction, allow_exact)
        for lid, best in expected.items():
            if best is None:
                if how == "inner":
                    assert lid not in got, f"lid {lid} should have no match"
                else:
                    assert got[lid] == (None, None)
            else:
                assert got.get(lid) == best, (
                    f"lid {lid}: got {got.get(lid)}, want {best} "
                    f"({direction}, exact={allow_exact})"
                )


def test_with_fill_invariants(spark):
    rng = np.random.RandomState(7)
    for _ in range(4):
        # sparse integer axis with gaps
        xs = sorted(rng.choice(range(0, 30), size=8, replace=False).tolist())
        rows = [(int(x), int(rng.randint(1, 100)), float(x) * 1.5) for x in xs]
        df = spark.createDataFrame(rows, "x int, n int, v double")
        out = (
            with_fill(
                df,
                order_col="x",
                step=F.lit(1),
                fill_zero=["n"],
                interpolate_prev=["v"],
            )
            .orderBy("x")
            .collect()
        )
        # density: every integer between min and max appears exactly once
        assert [r["x"] for r in out] == list(range(xs[0], xs[-1] + 1))
        by_x = {r["x"]: r for r in out}
        carried = None
        for x in range(xs[0], xs[-1] + 1):
            r = by_x[x]
            if x in xs:  # original rows unchanged
                orig = next(row for row in rows if row[0] == x)
                assert (r["n"], r["v"]) == (orig[1], orig[2])
                carried = orig[2]
            else:  # synthesized rows: zero-filled count, carried value
                assert r["n"] == 0
                assert r["v"] == carried


def test_with_fill_grouped_axis(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 4, 40), ("b", 2, 20), ("b", 3, 30)],
        "g string, x int, n int",
    )
    out = with_fill(
        df, order_col="x", step=F.lit(1), by=["g"], fill_zero=["n"]
    ).collect()
    got = {(r["g"], r["x"]): r["n"] for r in out}
    # per-group bounds: a spans 1..4, b spans 2..3 — no cross-group bleed
    assert set(got) == {("a", 1), ("a", 2), ("a", 3), ("a", 4), ("b", 2), ("b", 3)}
    assert got[("a", 2)] == 0 and got[("a", 3)] == 0
    assert got[("b", 2)] == 20 and got[("b", 3)] == 30


def test_with_fill_preserves_off_grid_rows(spark):
    """ClickHouse WITH FILL never drops data rows — it only inserts fill
    rows on the grid. With step=2 from 1 to 7 the grid is {1,3,5,7}; the
    off-grid originals (2, 4) and the out-of-range one (11) must survive
    alongside the generated axis."""
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (4, 40), (11, 110)], "x int, n int"
    )
    out = with_fill(
        df,
        order_col="x",
        step=F.lit(2),
        from_=F.lit(1),
        to=F.lit(7),
        fill_zero=["n"],
    ).collect()
    got = {r["x"]: r["n"] for r in out}
    assert set(got) == {1, 2, 3, 4, 5, 7, 11}
    assert got[2] == 20 and got[4] == 40 and got[11] == 110
    assert got[3] == 0 and got[5] == 0 and got[7] == 0


def test_ivf_topk_invariants(spark, sf_dir):
    """IVF results must be well-formed (dense ranks, descending cosine, no
    self matches) and agree with the exact top-k wherever both report the
    same pair — IVF never invents a score, it only prunes candidates."""
    from clickhouse_objects_analysis_spark.operators.similarity import (
        cosine_topk,
        ivf_cosine_topk,
    )
    from clickhouse_objects_analysis_spark.queries.registry import tables

    e = tables(spark, sf_dir)["embeddings"]
    q = e.filter(F.col("vec_id") < 10)
    ivf = ivf_cosine_topk(
        e, q, "vec_id", "embedding", k=5, n_centroids=32, n_probe=8
    ).collect()
    exact = {
        (r.query_id, r.corpus_id): r.cos
        for r in cosine_topk(e, q, "vec_id", "embedding", k=5).collect()
    }
    by_q: dict[int, list] = {}
    for r in ivf:
        assert r.query_id != r.corpus_id
        by_q.setdefault(r.query_id, []).append(r)
    hits = total = 0
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        cosines = [r.cos for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        for r in rows:
            total += 1
            key = (r.query_id, r.corpus_id)
            if key in exact:
                hits += 1
                assert abs(exact[key] - r.cos) < 1e-6
    assert hits / total >= 0.3, f"IVF recall collapsed: {hits}/{total}"


class TestRangeJoin:
    """operators.joins.range_join — semantics vs a brute-force crossJoin
    oracle, including duplicate point values, unmatched points, negative
    values, and bin-boundary points."""

    def _frames(self, spark):
        pts = spark.createDataFrame(
            [(1, -7), (2, 0), (3, 5), (4, 5), (5, 12), (6, 99)],
            "pid int, x int",
        )
        iv = spark.createDataFrame(
            [(10, -10, 0), (20, 0, 10), (30, 4, 6), (40, 50, 60)],
            "iid int, lo int, hi int",
        )
        return pts, iv

    def _oracle(self, pts, iv, how):
        import itertools

        p_rows, i_rows = pts.collect(), iv.collect()
        out = []
        for p in p_rows:
            hits = [i for i in i_rows if i.lo <= p.x < i.hi]
            for i in hits:
                out.append((p.pid, p.x, i.iid, i.lo, i.hi))
            if not hits and how == "left":
                out.append((p.pid, p.x, None, None, None))
        return sorted(out, key=lambda r: (r[0], r[2] is None, r[2] or 0))

    @pytest.mark.parametrize("how", ["inner", "left"])
    @pytest.mark.parametrize("bin_width", [1, 3, 7, 100])
    def test_matches_brute_force(self, spark, how, bin_width):
        from clickhouse_objects_analysis_spark.operators.joins import range_join

        pts, iv = self._frames(spark)
        got = sorted(
            (
                (r.pid, r.x, r.iid, r.lo, r.hi)
                for r in range_join(
                    pts, iv, "x", "lo", "hi", bin_width, how=how
                ).collect()
            ),
            key=lambda r: (r[0], r[2] is None, r[2] or 0),
        )
        assert got == self._oracle(pts, iv, how)


class TestWindowFunnelDP:
    """The funnel DP keeps, per level, the MAX chain-start time over
    chains reaching that level at strictly earlier timestamps. Verify the
    whole state argument against brute-force chain enumeration on random
    event streams (ties included — ts drawn from a tiny range)."""

    STEPS = ("view", "click", "purchase")

    @staticmethod
    def _brute_level(events, window):
        """Max k such that a strictly-increasing-ts chain of the step
        prefix fits in `window` of its first event."""
        from itertools import product

        steps = TestWindowFunnelDP.STEPS
        by_step = [
            sorted(t for t, s in events if s == step) for step in steps
        ]
        best = 0
        for k in range(len(steps), 0, -1):
            for chain in product(*by_step[:k]):
                if all(b > a for a, b in zip(chain, chain[1:])) and (
                    chain[-1] - chain[0] <= window
                ):
                    best = k
                    break
            if best:
                break
        return best

    @staticmethod
    def _dp_level(events, window):
        """Reference model of the funnel DP whose relational form (strict-
        range-frame running-max windows) ships in queries/ch_aggregates.py."""
        import pandas as pd

        step_of = {s: i for i, s in enumerate(TestWindowFunnelDP.STEPS)}
        pdf = pd.DataFrame(events, columns=["t", "event_type"]).sort_values(
            "t"
        )
        best = [None] * len(step_of)
        for _, grp in pdf.groupby("t", sort=True):
            snap = list(best)
            t = int(grp["t"].iloc[0])
            for typ in grp["event_type"]:
                if typ not in step_of:  # same filter as the real query
                    continue
                j = step_of[typ]
                if j == 0:
                    best[0] = t if best[0] is None else max(best[0], t)
                elif snap[j - 1] is not None and t - snap[j - 1] <= window:
                    cand = snap[j - 1]
                    if best[j] is None or cand > best[j]:
                        best[j] = cand
        return max(
            (j + 1 for j in range(len(step_of)) if best[j] is not None),
            default=0,
        )

    def test_dp_matches_brute_force(self):
        rng = np.random.RandomState(7)
        types = list(self.STEPS) + ["other"]
        for case in range(300):
            n = rng.randint(0, 12)
            events = [
                (int(rng.randint(0, 15)), types[rng.randint(0, len(types))])
                for _ in range(n)
            ]
            window = int(rng.randint(1, 10))
            got = self._dp_level(events, window)
            want = self._brute_level(events, window)
            assert got == want, (case, events, window, got, want)


class TestSequenceCountIdentity:
    """The closed form in sequence_count_agg — matched = P −
    max(0, max_prefix(cumP − cumS)) — against the greedy scan it
    replaces, on exhaustive-ish random streams."""

    @staticmethod
    def _greedy(seq):
        avail = matched = 0
        for ev in seq:
            if ev == "s":
                avail += 1
            elif avail > 0:
                avail -= 1
                matched += 1
        return matched

    @staticmethod
    def _closed_form(seq):
        cum = mx = p = 0
        for ev in seq:
            cum += 1 if ev == "p" else -1
            p += ev == "p"
            mx = max(mx, cum)
        return p - max(mx, 0)

    def test_identity_on_random_streams(self):
        import random

        rng = random.Random(42)
        for trial in range(2000):
            n = rng.randrange(0, 12)
            seq = [rng.choice("sp") for _ in range(n)]
            assert self._greedy(seq) == self._closed_form(seq), seq

    def test_identity_exhaustive_short(self):
        from itertools import product

        for n in range(0, 10):
            for seq in product("sp", repeat=n):
                assert self._greedy(seq) == self._closed_form(seq), seq


class TestIntervalMergeIdentity:
    """interval_length_sum's gaps-and-islands covered-length against a
    brute-force sweep over the merged interval set."""

    @staticmethod
    def _brute_simple(intervals):
        pts = set()
        for lo, hi in intervals:
            pts.update(range(lo, hi))
        return len(pts)

    @staticmethod
    def _islands(intervals):
        """Mirror of the window formulation in interval_length_sum."""
        ivs = sorted(intervals)
        total = 0
        cur_lo = cur_hi = None
        for lo, hi in ivs:
            if cur_hi is None or lo > cur_hi:
                if cur_hi is not None:
                    total += cur_hi - cur_lo
                cur_lo, cur_hi = lo, hi
            else:
                cur_hi = max(cur_hi, hi)
        if cur_hi is not None:
            total += cur_hi - cur_lo
        return total

    def test_identity_on_random_interval_sets(self):
        import random

        rng = random.Random(7)
        for _ in range(500):
            n = rng.randrange(0, 10)
            ivs = []
            for _ in range(n):
                lo = rng.randrange(0, 40)
                ivs.append((lo, lo + rng.randrange(1, 12)))
            assert self._islands(ivs) == self._brute_simple(ivs), ivs


class TestWeightedMedianModel:
    def test_matches_numpy_model(self, spark, sf_dir):
        import pandas as pd

        from clickhouse_objects_analysis_spark.queries import QUERIES

        got = (
            QUERIES["weighted_median"](spark, sf_dir)
            .toPandas()
            .set_index("l_returnflag")["weighted_median"]
        )
        li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
        for rf, grp in li.groupby("l_returnflag"):
            g = grp.sort_values("l_extendedprice")
            cumw = g["l_quantity"].cumsum()
            total = g["l_quantity"].sum()
            model = g.loc[2 * cumw >= total, "l_extendedprice"].iloc[0]
            assert got.loc[rf] == model, rf


class TestDecoderSeam:
    """Pluggable multimodal decoder (VERDICT r4 item 9): injection wins,
    stub is the fallback, strict still raises when nothing is wired."""

    def test_injected_decoder_is_used(self, spark, sf_dir):
        from clickhouse_objects_analysis_spark.operators import multimodal as mm
        from clickhouse_objects_analysis_spark.queries.registry import tables

        docs = tables(spark, sf_dir)["documents"].limit(5)
        payloads = mm.attach_binary_payload(docs, "doc_id", "text")
        mm.set_decoder(lambda i, b: (len(b), 1, 2, [42.0]))
        try:
            out = mm.decode_features(payloads).collect()
        finally:
            mm.set_decoder(None)
        assert out and all(
            r.width == 1 and r.height == 2 and r.features == [42.0]
            for r in out
        )

    def test_strict_raises_on_undecodable_payload(self):
        import pytest as _pytest

        from clickhouse_objects_analysis_spark.operators import multimodal as mm

        assert mm._pil_decoder() is None  # this container has no PIL
        d = mm.resolve_decoder(strict=True)
        with _pytest.raises(NotImplementedError):
            d(1, b"\x00\x01not-an-image")  # per-payload, executor-side

    def test_stub_fallback_is_deterministic(self):
        from clickhouse_objects_analysis_spark.operators import multimodal as mm

        d = mm.resolve_decoder()
        assert d(1, b"abc") == d(1, b"abc") == mm._fake_decode(1, b"abc")

    def test_stdlib_ppm_decode(self):
        from clickhouse_objects_analysis_spark.operators import multimodal as mm

        # 2x2 P6 with a comment line; pixels R=(10,20,30,40) G=0 B=255
        px = bytes([10, 0, 255, 20, 0, 255, 30, 0, 255, 40, 0, 255])
        payload = b"P6\n# test\n2 2\n255\n" + px
        n, w, h, feats = mm.resolve_decoder(strict=True)(7, payload)
        assert (n, w, h) == (len(payload), 2, 2)
        assert feats == [25.0, 0.0, 255.0]
        # P3 ascii twin decodes to the same features
        p3 = b"P3\n2 2\n255\n" + " ".join(str(b) for b in px).encode()
        n3, w3, h3, f3 = mm.resolve_decoder(strict=True)(7, p3)
        assert (w3, h3, f3) == (2, 2, feats)

    def test_stdlib_bmp_decode(self):
        import struct

        from clickhouse_objects_analysis_spark.operators import multimodal as mm

        # hand-built 2x1 uncompressed 24-bit BMP: pixels (BGR on disk)
        # left = pure red, right = pure green; row padded to 8 bytes
        row = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"
        header = (
            b"BM"
            + struct.pack("<IHHI", 54 + len(row), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 24, 0, len(row), 0, 0, 0, 0)
        )
        payload = header + row
        n, w, h, feats = mm.resolve_decoder(strict=True)(3, payload)
        assert (n, w, h) == (len(payload), 2, 1)
        assert feats == [127.5, 127.5, 0.0]

    def test_encode_ppm_roundtrip(self, spark):
        from clickhouse_objects_analysis_spark.operators import multimodal as mm

        docs = spark.createDataFrame(
            [(1, "hello"), (2, "x" * 100)], ["doc_id", "text"]
        )
        out = {
            r.doc_id: r
            for r in mm.decode_features(
                mm.encode_ppm_payload(docs, "doc_id", "text"), strict=True
            ).collect()
        }
        for L, doc_id in [(5, 1), (100, 2)]:
            w, h = 16 + (L % 32), 16 + ((L // 32) % 32)
            r = out[doc_id]
            assert (r.width, r.height) == (w, h)
            assert r.features == [float(L % 256)] * 3


def test_pq_topk_invariants(spark, sf_dir):
    """PQ results must be well-formed (dense ranks, descending cosine,
    no self matches), deterministic across two runs (seedless
    deterministic training), and agree with the exact scores wherever
    both report the same pair — the re-rank computes exact cosines, so
    a reported score is never approximate."""
    from clickhouse_objects_analysis_spark.operators.similarity import (
        cosine_topk,
        pq_cosine_topk,
    )
    from clickhouse_objects_analysis_spark.queries.registry import tables

    e = tables(spark, sf_dir)["embeddings"]
    q = e.filter(F.col("vec_id") < 10)
    pq = pq_cosine_topk(
        e, q, "vec_id", "embedding", k=5, m=16, ksub=16, rerank=8
    ).collect()
    again = pq_cosine_topk(
        e, q, "vec_id", "embedding", k=5, m=16, ksub=16, rerank=8
    ).collect()
    assert sorted(map(tuple, pq)) == sorted(map(tuple, again))
    exact = {
        (r.query_id, r.corpus_id): r.cos
        for r in cosine_topk(e, q, "vec_id", "embedding", k=5).collect()
    }
    by_q: dict[int, list] = {}
    for r in pq:
        assert r.query_id != r.corpus_id
        by_q.setdefault(r.query_id, []).append(r)
    assert by_q, "PQ returned nothing"
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        cosines = [r.cos for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        for r in rows:
            if (r.query_id, r.corpus_id) in exact:
                assert abs(exact[(r.query_id, r.corpus_id)] - r.cos) < 1e-6


def test_pq_codebooks_deterministic_and_shaped():
    import numpy as np

    from clickhouse_objects_analysis_spark.operators.similarity import (
        train_pq_codebooks,
    )

    rng = np.random.RandomState(7)
    sample = rng.randn(200, 64)
    sample /= np.linalg.norm(sample, axis=1, keepdims=True)
    b1 = train_pq_codebooks(sample, m=16, ksub=8)
    b2 = train_pq_codebooks(sample, m=16, ksub=8)
    assert b1.shape == (16, 8, 4)
    assert np.array_equal(b1, b2)
    import pytest

    with pytest.raises(ValueError):
        train_pq_codebooks(sample, m=7, ksub=8)  # 64 % 7 != 0


class TestWavDecode:
    """Dependency-free RIFF/WAVE parser (operators/multimodal.py): the
    chunk walk must survive extra chunks and word-alignment padding, and
    reject the malformed shapes a strict decoder should refuse."""

    def _wav(self, samples, extra_chunk=b"", rate=8000):
        import struct

        data = struct.pack("<%dh" % len(samples), *samples)
        body = (
            b"WAVE"
            + extra_chunk
            + b"fmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
            + b"data"
            + struct.pack("<I", len(data))
            + data
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def test_roundtrip_stats(self):
        from clickhouse_objects_analysis_spark.operators.multimodal import (
            _decode_wav,
        )

        ns, rate, ch, peak, sabs = _decode_wav(self._wav([-300, 0, 200]))
        assert (ns, rate, ch, peak, sabs) == (3, 8000, 1, 300, 500)

    def test_skips_unknown_chunk_with_odd_padding(self):
        import struct

        from clickhouse_objects_analysis_spark.operators.multimodal import (
            _decode_wav,
        )

        # a 3-byte LIST chunk must be skipped with its pad byte
        extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
        ns, rate, ch, peak, sabs = _decode_wav(
            self._wav([100], extra_chunk=extra)
        )
        assert (ns, peak) == (1, 100)

    def test_rejects_malformed(self):
        import pytest

        from clickhouse_objects_analysis_spark.operators.multimodal import (
            _decode_wav,
        )

        with pytest.raises(ValueError, match="RIFF/WAVE"):
            _decode_wav(b"OggS" + b"\x00" * 32)
        with pytest.raises(ValueError, match="size field"):
            _decode_wav(self._wav([1, 2]) + b"trailing-junk")
        import struct

        # truncate the data chunk but keep the RIFF size consistent, so
        # the failure is the chunk walk's, not the outer size check's
        cut = self._wav([1, 2, 3])[:-2]
        cut = b"RIFF" + struct.pack("<I", len(cut) - 8) + cut[8:]
        with pytest.raises(ValueError, match="truncated"):
            _decode_wav(cut)


class TestAviDecode:
    """RIFF/AVI container parser: header cross-checks and rejection of
    inconsistent frame counts."""

    def test_roundtrip_via_encoder(self, spark):
        from clickhouse_objects_analysis_spark.operators.multimodal import (
            _avi_geometry,
            _decode_avi,
            encode_avi_payload,
        )

        docs = spark.createDataFrame(
            [(1, "hello world"), (2, "x" * 100)], "doc_id long, text string"
        )
        rows = {
            r["doc_id"]: bytes(r["payload"])
            for r in encode_avi_payload(docs, "doc_id", "text").collect()
        }
        for doc_id, text_len in ((1, 11), (2, 100)):
            w, h, nf = _avi_geometry(text_len)
            got = _decode_avi(rows[doc_id])
            assert got == (nf, w, h, 40000, nf * w * h * 3)

    def test_rejects_frame_count_mismatch(self, spark):
        import pytest

        from clickhouse_objects_analysis_spark.operators.multimodal import (
            _decode_avi,
            encode_avi_payload,
        )

        docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
        payload = bytearray(
            bytes(
                encode_avi_payload(docs, "doc_id", "text").collect()[0][
                    "payload"
                ]
            )
        )
        # corrupt avih dwTotalFrames (offset: RIFF(12) + LIST hdr(12)
        # + 'avih' chunk hdr(8) + 4*4 bytes into the struct)
        payload[12 + 12 + 8 + 16] ^= 0xFF
        with pytest.raises(ValueError, match="frame count disagrees"):
            _decode_avi(bytes(payload))


def test_ppm_nn_resize_kernel():
    """The NN resample must pick source pixel ((x*w)//tw, (y*h)//th) —
    checked against a hand-computed 4x2 -> 2x2 case, and the output must
    re-decode as a valid PPM."""
    from clickhouse_objects_analysis_spark.operators.multimodal import (
        _decode_ppm,
        _resize_ppm_nn,
    )

    # 4x2 image, pixel value = 10*x + y in every channel
    w, h = 4, 2
    px = bytes(10 * x + y for y in range(h) for x in range(w) for c in range(3))
    src = b"P6\n4 2\n255\n" + px
    out = _resize_ppm_nn(src, 2, 2)
    n_bytes, ow, oh, _ = _decode_ppm(out)
    assert (ow, oh) == (2, 2)
    body = out.split(b"\n255\n", 1)[1]
    # targets: (0,0)->src(0,0)=0, (1,0)->src(2,0)=20, (0,1)->src(0,1)=1,
    # (1,1)->src(2,1)=21
    assert list(body[0::3]) == [0, 20, 1, 21]


def test_ppm_nn_resize_rejects_multibyte_samples():
    """A 16-bit P6 (maxval > 255) has 2-byte samples that would alias as
    1-byte pixels and silently pass the length check — the kernel must
    reject it instead of emitting garbage."""
    from clickhouse_objects_analysis_spark.operators.multimodal import (
        _resize_ppm_nn,
    )

    src = b"P6\n2 2\n65535\n" + bytes(range(24))  # 2x2x3 2-byte samples
    with pytest.raises(ValueError, match="multi-byte"):
        _resize_ppm_nn(src, 2, 2)
    with pytest.raises(ValueError, match="binary PPM"):
        _resize_ppm_nn(b"P3\n1 1\n255\n0 0 0\n", 1, 1)
