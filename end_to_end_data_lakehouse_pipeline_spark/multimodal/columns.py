"""Multimodal columns for training-data pipelines (BASELINE.json north star).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The Spark side — schema, partition
spread, UDF signature, batch shape — is real and tested. Compressed-format
DECODE is the one stubbed step (this container ships no PIL/ffmpeg):
feature extraction uses a deterministic byte-level fake, and resize
operates on raw uint8 planes with a pure-numpy nearest-neighbor gather —
with a codec lib you'd decode first, same pipeline shape.

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
    """Nearest-neighbor resize via Arrow-batched mapInPandas — dependency
    free (pure numpy index-gather, no PIL/codec needed).

    Payloads are interpreted as row-major uint8 planes of
    ``meta.width × meta.height`` (the decoded-image stand-in for this
    container; with a codec lib you'd decode compressed formats first —
    identical pipeline shape). Buffers shorter/longer than w*h are
    deterministically cycled/trimmed (np.resize). The per-image work is
    vectorized numpy (two index gathers); the loop is per image, never per
    pixel, and batches stream through Arrow.
    """
    import numpy as np

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                ids.append(media_id)
                w = meta.get("width") if meta is not None else None
                h = meta.get("height") if meta is not None else None
                if payload is None or not w or not h:
                    payloads.append(None)
                    metas.append(meta)
                    continue
                plane = np.resize(
                    np.frombuffer(bytes(payload), dtype=np.uint8), int(w) * int(h)
                ).reshape(int(h), int(w))
                ys = (np.arange(height) * int(h)) // height
                xs = (np.arange(width) * int(w)) // width
                payloads.append(bytearray(plane[ys][:, xs].tobytes()))
                metas.append({**meta, "width": width, "height": height})
            yield pd.DataFrame(
                {"media_id": ids, "payload": payloads, "meta": metas}
            )

    return media.mapInPandas(resize, schema=MEDIA_SCHEMA)


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


# ---------------------------------------------------------------------------
# Perceptual-hash near-dup detection for binary payloads: 64-bit aHash
# stand-in (bit i = byte-histogram bucket i above the per-payload mean),
# banded into 4x16-bit keys for candidate generation, exact Hamming
# verify. With a codec lib the bits would come from DCT coefficients of
# decoded pixels (classic pHash) — the banding/verify scale machinery is
# identical either way.
#
# Banding guarantee (pigeonhole): any pair within Hamming distance < 4
# shares at least one of the 4 bands exactly, so candidates cover every
# pair at the verify threshold (PHASH_MAX_HAMMING=3).
# ---------------------------------------------------------------------------

PHASH_BITS = 64
PHASH_BANDS = 4
PHASH_MAX_HAMMING = 3


def phash_media(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(id, payload) -> (id, phash bigint, band_0..band_3 int).

    mapInPandas computes the 64-bucket byte histogram per payload with
    numpy (no row loop over bytes) and thresholds at the bucket mean;
    the band keys are 16-bit slices of the hash.
    """
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("phash", T.LongType(), True),
            *[
                T.StructField(f"band_{j}", T.LongType(), True)
                for j in range(PHASH_BANDS)
            ],
        ]
    )

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                a = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(a >> 2, minlength=64)[:64]
                bits = hist > hist.mean()
                h = 0
                for b in bits:  # 64 iterations per payload, not per byte
                    h = (h << 1) | int(b)
                ids.append(int(mid))
                hashes.append(h)
            hs = np.array(hashes, dtype=np.uint64)
            out = pd.DataFrame(
                {
                    id_col: np.array(ids, dtype=np.int64),
                    # top bit maps to negative via the int64 view
                    "phash": hs.view(np.int64),
                }
            )
            for j in range(PHASH_BANDS):
                shift = np.uint64(16 * (PHASH_BANDS - 1 - j))
                out[f"band_{j}"] = ((hs >> shift) & np.uint64(0xFFFF)).astype(
                    np.int64
                )
            yield out

    return media.mapInPandas(hash_batches, schema=out_schema)


def phash_near_dups(
    hashed: DataFrame, id_col: str = "media_id", max_hamming: int = PHASH_MAX_HAMMING
) -> DataFrame:
    """Banded candidate join + exact popcount(xor) Hamming verify."""
    bands = hashed.select(
        id_col,
        "phash",
        F.posexplode(
            F.array(*[F.col(f"band_{j}") for j in range(PHASH_BANDS)])
        ).alias("band_idx", "band_key"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            F.col("a.phash").alias("h1"),
            F.col("b.phash").alias("h2"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return (
        cand.select("id1", "id2", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
