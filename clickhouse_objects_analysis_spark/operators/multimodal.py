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


def decode_features(
    multimodal: DataFrame, strict: bool = False
) -> DataFrame:
    """mapInPandas feature extraction over the binary payload column.

    ``strict=True`` raises NotImplementedError (the honest "no decoder in
    this environment" behavior); the default runs the deterministic fake so
    the plumbing — Arrow batching, schema, partitioning — is testable.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "image/audio decode libraries are not available in this "
                "container; wire a real decoder here"
            )
        for pdf in batches:
            rows = [
                (int(doc_id), *_fake_decode(int(doc_id), bytes(payload)))
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "width", "height", "features"]
            )

    return multimodal.select("doc_id", "payload").mapInPandas(
        extract, schema=FEATURE_SCHEMA
    )
