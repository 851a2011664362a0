"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, decoded/feature-extracted via Arrow-batched
``mapInPandas`` UDFs.

Decode is REAL for stdlib-parseable formats: a dependency-free netpbm
(P6/P3 PPM) and uncompressed 24-bit BMP parser runs on the executors,
with PIL probed lazily per-executor for everything else and a
deterministic fake (or ``NotImplementedError`` when ``strict=True``) as
the honest fallback for formats this container can't decode. The
Spark-side plumbing — schema, Arrow batch shape, partition-preserving
mapInPandas, binary payload round trip — is tested end-to-end.

At scale: payloads ride in parquet binary columns; decode parallelism is
per input split; `spark.sql.files.maxPartitionBytes` sizes the batches;
metadata-only queries never touch the payload column (column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

#: Output schema of the stubbed image-feature extractor.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Model a multimodal table: the document text utf-8-encoded as an
    opaque binary payload plus typed metadata (what a real image/audio
    ingest would carry alongside the blob)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.md5(F.col(text_col)).alias("checksum"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


#: Output schema of the PPM synthesis step (a real image-bytes column).
PPM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def encode_ppm_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Synthesize a REAL binary P6 PPM image per document (Arrow-batched
    mapInPandas, 1→1): dimensions derived from the utf-8 byte length L
    (w = 16 + L%32, h = 16 + (L//32)%32) with a solid fill of L%256.
    The output is a valid netpbm file any viewer opens — so the decode
    step downstream exercises a genuine parse, while every field stays
    arithmetically derivable for the DuckDB oracle."""
    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("raw"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["raw"]):
                n = len(bytes(raw))
                w, h = 16 + (n % 32), 16 + ((n // 32) % 32)
                payload = b"P6\n%d %d\n255\n" % (w, h) + bytes(
                    [n % 256]
                ) * (w * h * 3)
                rows.append((int(doc_id), payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return src.mapInPandas(build, schema=PPM_SCHEMA)


def _fake_decode(doc_id: int, payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for an image decoder: pretends the payload is
    a (width x height) image and emits a tiny feature vector from byte
    statistics. Replace with PIL/torchvision/ffmpeg in a real deployment."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    head = payload[:64]
    mean = float(sum(head)) / max(len(head), 1)
    features = [float(n), mean, float(head[0]) if head else 0.0]
    return n, width, height, features


# ---------------------------------------------------------------------------
# Pluggable decoder seam. A decoder is (doc_id, payload) ->
# (n_bytes, width, height, features).
#
# Resolution order per payload: stdlib format parsers (PPM / BMP — real,
# dependency-free decodes) > PIL when importable > injected fallback >
# (strict ? raise : deterministic fake). An INJECTED decoder is resolved
# at plan time and serialized into the closure (explicit user intent);
# the PIL probe happens lazily INSIDE the mapInPandas function on the
# executor, so a cluster where driver and executor environments differ
# still picks the right path on each executor (driver-side probing would
# bake the driver's environment into the plan).
# ---------------------------------------------------------------------------

Decoder = "Callable[[int, bytes], tuple[int, int, int, list[float]]]"
_DECODER = None


def set_decoder(fn) -> None:
    """Inject a real decoder (or None to reset to auto/stub)."""
    global _DECODER
    _DECODER = fn


def _pil_decoder():
    """Real image decoder when Pillow is importable: decodes the payload,
    reports true dimensions, and emits mean-channel features. Returns
    None when PIL is absent (this container) — callers fall back."""
    try:
        import io

        from PIL import Image
    except ImportError:
        return None

    def decode(doc_id: int, payload: bytes):
        img = Image.open(io.BytesIO(payload)).convert("RGB")
        w, h = img.size
        small = img.resize((8, 8))
        px = list(small.getdata())
        features = [
            float(sum(c[i] for c in px)) / len(px) for i in range(3)
        ]
        return len(payload), w, h, features

    return decode


def _parse_ppm_header(payload: bytes) -> tuple[bool, int, int, int, int]:
    """Tokenize a netpbm header: magic, width, height, maxval (comments
    `#..\\n` can appear between tokens). Returns ``(binary, w, h,
    maxval, pos)`` with ``pos`` at the whitespace byte terminating
    maxval. Shared by decode and resample so the two paths cannot
    drift."""
    if payload[:2] not in (b"P6", b"P3"):
        raise ValueError("not a PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    w, h, maxval = fields
    return payload[:2] == b"P6", w, h, maxval, pos


def _decode_ppm(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Dependency-free netpbm decode (P6 binary / P3 ascii RGB): parse the
    whitespace/comment-tolerant header, then per-channel pixel means."""
    binary, w, h, _maxval, pos = _parse_ppm_header(payload)
    if binary:
        px = payload[pos + 1 : pos + 1 + w * h * 3]  # single ws after maxval
    else:
        px = bytes(int(t) for t in payload[pos:].split())[: w * h * 3]
    if len(px) != w * h * 3:
        raise ValueError("truncated PPM pixel data")
    n = w * h
    features = [
        float(sum(px[c::3])) / n if n else 0.0 for c in range(3)
    ]
    return len(payload), w, h, features


def _decode_bmp(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Dependency-free uncompressed 24-bit BMP decode: BITMAPINFOHEADER
    dims + per-channel means over the padded BGR rows."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    h = abs(h_raw)
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    sums, n = [0, 0, 0], w * h
    for r in range(h):
        row = payload[data_off + r * row_bytes :][: w * 3]
        if len(row) != w * 3:
            raise ValueError("truncated BMP pixel data")
        # BGR order on disk
        sums[0] += sum(row[2::3])
        sums[1] += sum(row[1::3])
        sums[2] += sum(row[0::3])
    features = [float(s) / n if n else 0.0 for s in sums]
    return len(payload), w, h, features


_STDLIB_MAGICS = {b"P6": _decode_ppm, b"P3": _decode_ppm, b"BM": _decode_bmp}


def _make_auto_decoder(strict: bool):
    """Build the executor-side decoder closure: stdlib parsers for
    recognized magics, then a lazily-probed PIL (cached per process),
    then fake/raise. Safe to pickle — probes nothing until called."""
    pil_cache = []  # [decoder-or-None], filled on first use per process

    def decode(doc_id: int, payload: bytes):
        fmt = _STDLIB_MAGICS.get(bytes(payload[:2]))
        if fmt is not None:
            try:
                return fmt(payload)
            except ValueError:
                pass  # mis-magic'd payload — fall through
        if not pil_cache:
            pil_cache.append(_pil_decoder())
        if pil_cache[0] is not None:
            return pil_cache[0](doc_id, payload)
        if strict:
            raise NotImplementedError(
                "payload is not a stdlib-decodable format (PPM/BMP), no "
                "decoder injected (set_decoder), and no image library "
                "importable on this executor"
            )
        return _fake_decode(doc_id, payload)

    return decode


def resolve_decoder(strict: bool = False):
    """Injection wins; otherwise the auto decoder closure (stdlib
    formats > executor-probed PIL > fake, or NotImplementedError per
    undecodable payload when ``strict``)."""
    if _DECODER is not None:
        return _DECODER
    return _make_auto_decoder(strict)


def decode_features(
    multimodal: DataFrame, strict: bool = False
) -> DataFrame:
    """mapInPandas feature extraction over the binary payload column.

    The decoder comes from the seam above: an injected callable wins;
    otherwise the auto closure parses PPM/BMP with stdlib code, probes
    PIL lazily ON THE EXECUTOR (per-process cache), and falls back to
    the deterministic fake (``strict=True`` raises per undecodable
    payload instead) — so the plumbing is testable everywhere and a
    driver/executor environment mismatch can't bake the wrong decoder
    into the plan.
    """
    decoder = resolve_decoder(strict)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(doc_id), *decoder(int(doc_id), bytes(payload)))
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "width", "height", "features"]
            )

    return multimodal.select("doc_id", "payload").mapInPandas(
        extract, schema=FEATURE_SCHEMA
    )


def resize_images(
    multimodal: DataFrame, target_w: int, target_h: int
) -> DataFrame:
    """Stub image resize with real plumbing: binary in → binary out through
    Arrow batches, output payload bounded by the target pixel count. The
    'decoder' is the same deterministic byte arithmetic as _fake_decode;
    swap PIL's `Image.resize` into the inner loop in production — the
    schema, batching, and partition behavior don't change."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cap = target_w * target_h
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n, ow, oh, _ = _fake_decode(int(doc_id), b)
                rows.append(
                    (int(doc_id), ow, oh, target_w, target_h, b[:cap])
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "orig_w", "orig_h", "w", "h", "payload"],
            )

    return multimodal.select("doc_id", "payload").mapInPandas(
        resize,
        schema="doc_id long, orig_w long, orig_h long, w long, h long, payload binary",
    )


FRAME_BYTES = 256


def sample_frames(multimodal: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame-sampling plumbing: one input row → N output rows (the
    UDTF shape, SURVEY §2.B UDF/UDTF row). The payload is treated as a
    stream of fixed-size frames; every ``every_n``-th frame is emitted
    with its index and byte length. In production the inner loop is
    ffmpeg/pyav keyframe extraction; the Spark side — mapInPandas
    exploding rows, frame-level schema, per-split parallelism — is
    exactly this."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(bytes(payload))
                n_frames = (n + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_frames, every_n):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    sizes.append(min(FRAME_BYTES, n - i * FRAME_BYTES))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_nbytes": pd.Series(sizes, dtype="int64"),
                }
            )

    return multimodal.select("doc_id", "payload").mapInPandas(
        sample, schema="doc_id long, frame_idx long, frame_nbytes long"
    )


# ---------------------------------------------------------------------------
# Audio: RIFF/WAVE. Same contract as the PPM/BMP image path — synthesis
# produces a REAL file (any player opens it), the decoder is a genuine
# chunk-walking stdlib parser, and every emitted field is arithmetically
# derivable for the DuckDB oracle.

#: Output schema of the WAV synthesis step (a real audio-bytes column).
WAV_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ]
)

#: Output schema of the WAV decode step.
WAV_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_channels", LongType()),
        StructField("peak", LongType()),
        StructField("sum_abs", LongType()),
    ]
)


def _build_wav(n: int) -> bytes:
    """Deterministic WAV bytes for a document of utf-8 length ``n`` —
    the pure kernel behind encode_wav_payload, fuzzable without Spark."""
    import struct

    ns, k = 64 + n % 256, 1 + n % 7
    data = struct.pack(
        "<%dh" % ns, *(((i * k) % 200 - 100) * 100 for i in range(ns))
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def encode_wav_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Synthesize a REAL 16-bit mono 8 kHz PCM RIFF/WAVE file per
    document: from the utf-8 byte length L, n = 64 + L%256 samples of a
    sawtooth ``s_i = ((i·k) % 200 − 100)·100`` with pitch ``k = 1 +
    L%7``. Valid WAV (RIFF size, fmt block, data chunk all correct) —
    the decode downstream exercises a genuine chunk walk while staying
    exactly reproducible in SQL."""
    return _encode_payload(df, id_col, text_col, _build_wav, WAV_SCHEMA)


def _encode_payload(
    df: DataFrame, id_col: str, text_col: str, kernel, schema
) -> DataFrame:
    """Shared synthesis plumbing: (id, text) → (doc_id, payload) via an
    Arrow-batched 1→1 mapInPandas calling ``kernel(utf8_byte_length)``."""
    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("raw"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(doc_id), kernel(len(bytes(raw))))
                for doc_id, raw in zip(pdf["doc_id"], pdf["raw"])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return src.mapInPandas(build, schema=schema)


def _decode_wav(payload: bytes) -> tuple[int, int, int, int, int]:
    """Dependency-free RIFF/WAVE decode: validate the RIFF header, walk
    chunks (skipping unknown ones, honoring odd-size padding) to the
    ``fmt `` and ``data`` chunks, unpack 16-bit PCM samples. Returns
    (n_samples, sample_rate, n_channels, peak, sum_abs)."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    riff_size = struct.unpack("<I", payload[4:8])[0]
    if riff_size != len(payload) - 8:
        raise ValueError("RIFF size field disagrees with payload length")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated chunk " + repr(cid))
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("fmt chunk shorter than 16 bytes")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError("only 16-bit PCM supported")
    if n_channels <= 0 or block_align <= 0:
        raise ValueError("non-positive channel count / block align")
    if len(data) % block_align:
        raise ValueError("data chunk not block-aligned")
    samples = struct.unpack("<%dh" % (len(data) // 2), data)
    return (
        len(samples) // n_channels,
        sample_rate,
        n_channels,
        max((abs(s) for s in samples), default=0),
        sum(abs(s) for s in samples),
    )


def decode_wav_features(payloads: DataFrame) -> DataFrame:
    """(doc_id, payload) → per-file audio stats via the stdlib WAV
    parser. Arrow-batched 1→1 mapInPandas; parallelism follows the input
    splits, metadata-only readers never touch the payload column."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                ns, rate, ch, peak, sabs = _decode_wav(bytes(payload))
                rows.append((int(doc_id), ns, rate, ch, peak, sabs))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "sample_rate",
                    "n_channels", "peak", "sum_abs",
                ],
            )

    return payloads.mapInPandas(extract, schema=WAV_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Video: RIFF/AVI with uncompressed DIB frames. Completes the trio —
# image (PPM/BMP), audio (WAV), video (AVI) all synthesize REAL files
# and parse them back with dependency-free chunk walkers; production
# swaps ffmpeg/pyav into the same mapInPandas seam.

#: Output schema of the AVI synthesis step.
AVI_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def _avi_geometry(n: int) -> tuple[int, int, int]:
    """(width, height, n_frames) from the utf-8 byte length — width kept
    a multiple of 4 so DIB rows need no stride padding."""
    return 4 + 4 * (n % 4), 2 + n % 3, 3 + n % 5


def _build_avi(n: int) -> bytes:
    """Deterministic AVI bytes for a document of utf-8 length ``n`` —
    the pure kernel behind encode_avi_payload, fuzzable without Spark."""
    import struct

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return (
            fourcc
            + struct.pack("<I", len(body))
            + body
            + (b"\x00" if len(body) & 1 else b"")
        )

    def lst(form: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", form + body)

    w, h, nf = _avi_geometry(n)
    fsize = w * h * 3
    avih = struct.pack(
        "<14I", 40000, fsize * 25, 0, 0, nf, 0, 1, fsize, w, h, 0, 0, 0, 0
    )
    strh = (
        b"vids" + b"DIB "
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, 25, 0, nf, fsize, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, fsize, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(
        b"movi",
        b"".join(
            chunk(b"00db", bytes([(n + i) % 256]) * fsize) for i in range(nf)
        ),
    )
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def encode_avi_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Synthesize a REAL uncompressed AVI per document: RIFF('AVI ') with
    a hdrl LIST (avih main header + one 'vids'/DIB stream with strh/strf)
    and a movi LIST of '00db' frames, 25 fps, frame i solid-filled with
    (L+i)%256. Every header field is consistent (sizes, frame counts,
    geometry), so the decode is a genuine container parse with an
    arithmetic oracle."""
    return _encode_payload(df, id_col, text_col, _build_avi, AVI_SCHEMA)


def _riff_children(body: bytes) -> list[tuple[bytes, bytes]]:
    """(fourcc, data) pairs of the chunks inside a RIFF/LIST body,
    honoring word alignment; raises on truncation."""
    import struct

    out, pos = [], 0
    while pos + 8 <= len(body):
        cid = body[pos : pos + 4]
        size = struct.unpack("<I", body[pos + 4 : pos + 8])[0]
        data = body[pos + 8 : pos + 8 + size]
        if len(data) != size:
            raise ValueError("truncated chunk " + repr(cid))
        out.append((cid, data))
        pos += 8 + size + (size & 1)
    return out


def _decode_avi(payload: bytes) -> tuple[int, int, int, int, int]:
    """Dependency-free AVI decode: walk RIFF('AVI ') → hdrl(avih, strh)
    and movi, cross-check the main header's frame count/geometry against
    the stream header and the actual movi chunks. Returns (n_frames,
    width, height, us_per_frame, total_frame_bytes)."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    size = struct.unpack("<I", payload[4:8])[0]
    if size != len(payload) - 8:
        raise ValueError("RIFF size field disagrees with payload length")
    avih = strh = None
    frames: list[bytes] = []
    for cid, data in _riff_children(payload[12:]):
        if cid != b"LIST":
            continue
        form, body = data[:4], data[4:]
        if form == b"hdrl":
            for c2, d2 in _riff_children(body):
                if c2 == b"avih":
                    avih = struct.unpack("<14I", d2[:56])
                elif c2 == b"LIST" and d2[:4] == b"strl":
                    for c3, d3 in _riff_children(d2[4:]):
                        if c3 == b"strh":
                            strh = d3
        elif form == b"movi":
            frames = [
                d2 for c2, d2 in _riff_children(body)
                if c2[2:] in (b"db", b"dc")
            ]
    if avih is None or strh is None:
        raise ValueError("missing avih/strh header")
    us_per_frame, n_frames, w, h = avih[0], avih[4], avih[8], avih[9]
    if strh[:4] != b"vids":
        raise ValueError("first stream is not video")
    strh_len = struct.unpack("<I", strh[32:36])[0]
    if n_frames != strh_len or n_frames != len(frames):
        raise ValueError("frame count disagrees across headers and movi")
    return n_frames, w, h, us_per_frame, sum(len(f) for f in frames)


def decode_avi_features(payloads: DataFrame, every_n: int = 2) -> DataFrame:
    """(doc_id, payload) → container stats + sampled-frame count via the
    stdlib AVI parser — the real-parse upgrade of sample_frames (which
    models the payload as a raw frame stream)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                nf, w, h, uspf, tot = _decode_avi(bytes(payload))
                rows.append(
                    (
                        int(doc_id), nf, w, h, uspf, tot,
                        len(range(0, nf, every_n)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "width", "height",
                    "us_per_frame", "total_frame_bytes", "n_sampled",
                ],
            )

    return payloads.mapInPandas(
        extract,
        schema="doc_id long, n_frames long, width long, height long, "
        "us_per_frame long, total_frame_bytes long, n_sampled long",
    )


def _resize_ppm_nn(payload: bytes, tw: int, th: int) -> bytes:
    """REAL nearest-neighbor resample of a P6 PPM: decode header+pixels,
    map target pixel (x, y) to source ((x·w)//tw, (y·h)//th), re-encode
    a valid P6. Raises ValueError on non-P6, multi-byte-sample
    (maxval > 255), or truncated input — resize_images_real is strict
    by design, like decode_features(strict=True): one bad payload fails
    the task rather than emitting corrupt pixels."""
    binary, w, h, maxval, pos = _parse_ppm_header(payload)
    if not binary:
        raise ValueError("not a binary PPM payload")
    if maxval > 255:
        # 2-byte samples would alias as 1-byte pixels and pass the
        # length check below while producing garbage — reject instead
        raise ValueError("multi-byte PPM samples unsupported")
    px = payload[pos + 1 : pos + 1 + w * h * 3]
    if len(px) != w * h * 3:
        raise ValueError("truncated PPM pixel data")
    out = bytearray()
    for y in range(th):
        sy = (y * h) // th
        for x in range(tw):
            sx = (x * w) // tw
            o = (sy * w + sx) * 3
            out += px[o : o + 3]
    return b"P6\n%d %d\n%d\n" % (tw, th, maxval) + bytes(out)


def resize_images_real(
    multimodal: DataFrame, target_w: int, target_h: int
) -> DataFrame:
    """REAL image resize (upgrade of the resize_images stub): decode the
    P6 PPM payload, nearest-neighbor resample to (target_w, target_h),
    re-encode — the output is a valid viewable PPM whose every pixel is
    arithmetically determined by the source, so the DuckDB oracle can
    replay per-channel stats. Same mapInPandas seam as the stub; PIL's
    Image.resize slots into the same inner loop for other formats."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                _, ow, oh, _mx, _pos = _parse_ppm_header(b)
                rows.append(
                    (
                        int(doc_id), ow, oh, target_w, target_h,
                        _resize_ppm_nn(b, target_w, target_h),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "orig_w", "orig_h", "w", "h", "payload"],
            )

    return multimodal.select("doc_id", "payload").mapInPandas(
        resize,
        schema="doc_id long, orig_w long, orig_h long, w long, h long, "
        "payload binary",
    )


def _build_ppm_gradient(n: int) -> bytes:
    """Gradient P6 PPM for a document of utf-8 length ``n`` — pixel
    (x, y) channel c = (7x + 13y + 29c + n) % 256, so a resample's
    output is position-dependent (a solid fill would make any resize
    look correct)."""
    w, h = 8 + n % 16, 8 + (n // 16) % 16
    px = bytes(
        (7 * x + 13 * y + 29 * c + n) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    return b"P6\n%d %d\n255\n" % (w, h) + px


def encode_ppm_gradient(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gradient-filled PPM synthesis (resize-test source image)."""
    return _encode_payload(df, id_col, text_col, _build_ppm_gradient, PPM_SCHEMA)
