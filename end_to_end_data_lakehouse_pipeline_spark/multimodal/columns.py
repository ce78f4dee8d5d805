"""Multimodal columns for training-data pipelines (BASELINE.json north star).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The Spark side — schema, partition
spread, UDF signature, batch shape — is real and tested; the actual codec
call is stubbed (this container ships no PIL/ffmpeg): feature extraction
uses a deterministic byte-level fake, and resize/frame-sample raise
``NotImplementedError`` unless the optional library imports.

Scale notes: payload bytes never pass through a Python row loop — Arrow
moves whole batches; ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds batch memory so a partition of 100 MB videos cannot OOM a worker.
Partitioning by content hash spreads hot media evenly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional codec backends — absent in this container
    from PIL import Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def make_media_df(spark: SparkSession, n: int = 64, parts: int = 8) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 4  # 128 B
        rows.append(
            (
                i,
                bytearray(payload),
                {"media_type": "image", "mime": "image/fake", "width": 8, "height": 4, "duration_ms": None},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(parts, "media_id")


def decode_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extract via mapInPandas. The 'decode' is a deterministic
    byte-histogram fake standing in for a real model/codec call; the Arrow
    batch shape and output schema are exactly what the real one would use."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0).astype("int32"),
                    "content_hash": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None
                    ),
                    "feature": pdf["payload"].map(
                        lambda b: _byte_histogram(bytes(b), dim) if b is not None else None
                    ),
                }
            )
            yield out

    return media.mapInPandas(extract, schema=FEATURES_SCHEMA)


def _byte_histogram(payload: bytes, dim: int) -> list[float]:
    hist = [0.0] * dim
    for b in payload:
        hist[b % dim] += 1.0
    total = sum(hist) or 1.0
    return [v / total for v in hist]


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub: real Spark plumbing, codec gated on PIL presence."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image resize requires PIL; this container has no codec libs — "
            "the mapInPandas pipeline shape is identical to decode_features"
        )
    raise NotImplementedError("wire PIL Image.resize inside a mapInPandas stage")


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan: one output row per sampled frame timestamp.
    The frame timestamps come from metadata (real); frame decode is the
    stubbed step. Demonstrates the explode-then-decode shape that keeps
    per-frame work distributed."""
    frames = media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
    return frames
