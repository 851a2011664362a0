"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, decoded/feature-extracted via Arrow-batched
``mapInPandas`` UDFs.

The image/audio decode libraries are not in this container, so the decode
step is STUBBED (deterministic fake derived from the payload bytes, or
``NotImplementedError`` when ``strict=True``) — but the Spark-side plumbing
is real and tested: schema, Arrow batch shape, partition-preserving
mapInPandas, and the binary payload round trip.

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
# Pluggable decoder seam: stub by default, real decode by injection or
# by PIL auto-detection. A decoder is (doc_id, payload) ->
# (n_bytes, width, height, features). It is RESOLVED AT PLAN TIME and
# serialized into the mapInPandas closure, so inject before building the
# DataFrame, and the executors never re-probe the environment per batch.
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


def resolve_decoder(strict: bool = False):
    """Injection > PIL auto-detect > (strict ? raise : deterministic
    stub). The NotImplementedError branch is the honest 'no decoder in
    this environment' behavior the rows-only registry entry declares."""
    if _DECODER is not None:
        return _DECODER
    pil = _pil_decoder()
    if pil is not None:
        return pil
    if strict:
        raise NotImplementedError(
            "no decoder injected (set_decoder) and no image library "
            "importable in this environment"
        )
    return _fake_decode


def decode_features(
    multimodal: DataFrame, strict: bool = False
) -> DataFrame:
    """mapInPandas feature extraction over the binary payload column.

    The decoder comes from the seam above: an injected callable or PIL
    when available, else the deterministic fake (``strict=True`` raises
    instead) so the plumbing — Arrow batching, schema, partitioning — is
    testable everywhere.
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
