"""Multimodal column plumbing: schema, Arrow batch shape, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_data_lakehouse_pipeline_spark.multimodal import (
    decode_features,
    frame_sample,
    make_media_df,
    resize_images,
)


def test_media_schema_and_partitioning(spark):
    media = make_media_df(spark, n=32, parts=4)
    assert dict(media.dtypes)["payload"] == "binary"
    assert media.rdd.getNumPartitions() == 4
    assert media.count() == 32


def test_decode_features_shape_and_determinism(spark):
    media = make_media_df(spark, n=16)
    feats = decode_features(media, dim=16)
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 16
    r0 = rows[0]
    assert r0.n_bytes == 128
    assert len(r0.feature) == 16
    assert abs(sum(r0.feature) - 1.0) < 1e-6  # normalized histogram
    # deterministic across runs
    again = {r.media_id: r.content_hash for r in decode_features(media, dim=16).collect()}
    assert again == {k: v.content_hash for k, v in rows.items()}


def test_decode_features_null_payload(spark):
    media = make_media_df(spark, n=4).withColumn(
        "payload", F.when(F.col("media_id") == 0, F.col("payload"))
    )
    feats = decode_features(media)
    null_rows = feats.filter(F.col("content_hash").isNull())
    assert null_rows.count() == 3


def test_resize_nearest_neighbor_matches_numpy(spark):
    import hashlib

    import numpy as np

    # make_media_df payloads are 128 B; meta says 8x4 -> the first 32 bytes
    # form the plane. Resize to 4x2 and check against a driver-side numpy
    # nearest-neighbor reference.
    out = {r.media_id: r for r in resize_images(make_media_df(spark, n=3), 4, 2).collect()}
    assert set(out) == {0, 1, 2}
    for i in range(3):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 4
        plane = np.resize(np.frombuffer(payload, dtype=np.uint8), 32).reshape(4, 8)
        ys = (np.arange(2) * 4) // 2
        xs = (np.arange(4) * 8) // 4
        expected = plane[ys][:, xs].tobytes()
        r = out[i]
        assert bytes(r.payload) == expected
        assert (r.meta.width, r.meta.height) == (4, 2)
        assert r.meta.mime == "image/fake"  # rest of meta preserved


def test_resize_null_payload_passthrough(spark):
    from pyspark.sql import functions as F

    media = make_media_df(spark, n=2).withColumn(
        "payload", F.when(F.col("media_id") == 0, F.col("payload"))
    )
    rows = {r.media_id: r for r in resize_images(media, 4, 2).collect()}
    assert rows[1].payload is None
    assert rows[0].payload is not None


def test_frame_sample_explode_shape(spark):
    media = make_media_df(spark, n=2).withColumn(
        "meta", F.named_struct(
            F.lit("media_type"), F.lit("video"),
            F.lit("mime"), F.lit("video/fake"),
            F.lit("width"), F.lit(8).cast("int"),
            F.lit("height"), F.lit(4).cast("int"),
            F.lit("duration_ms"), F.lit(3500).cast("long"),
        )
    )
    frames = frame_sample(media, every_ms=1000)
    per_media = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in per_media)  # 0,1000,2000,3000


def test_phash_near_dups_finds_duplicates_not_randoms(spark):
    import hashlib

    from pyspark.sql import types as T

    from end_to_end_data_lakehouse_pipeline_spark.multimodal.columns import (
        phash_media,
        phash_near_dups,
    )

    def payload(seed: str) -> bytearray:
        return bytearray(hashlib.sha256(seed.encode()).digest() * 8)  # 256 B

    rows = []
    for i in range(20):  # distinct random payloads
        rows.append((i, payload(f"r{i}")))
    dup = payload("r0")
    rows.append((100, dup))  # exact duplicate of media 0
    near = payload("r1")
    near[0] = (near[0] + 1) % 256  # tiny perturbation of media 1
    rows.append((101, near))
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )
    media = spark.createDataFrame(rows, schema).repartition(4, "media_id")
    pairs = phash_near_dups(phash_media(media)).collect()
    found = {(r["id1"], r["id2"]): r["hamming"] for r in pairs}
    assert found.get((0, 100)) == 0, "exact duplicate must match at hamming 0"
    assert (1, 101) in found, "1-byte perturbation must stay within the radius"
    # random pairs must not collide (64 random bits, radius 3)
    for (a, b) in found:
        assert {a, b} <= {0, 100} or {a, b} <= {1, 101}, f"false pair {(a, b)}"
