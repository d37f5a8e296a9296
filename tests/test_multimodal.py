"""Multimodal plumbing: binary columns, metadata, Arrow-batched
feature extraction (stubbed decode, real Spark mechanics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from syncquill_spark.operators.multimodal import (
    attach_media_metadata,
    decode_image_stub,
    extract_features,
    media_stats,
)


def _media(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\nfakepayload")), (2, bytearray(b"RIFFfakewav"))],
        "media_id long, payload binary",
    )
    return attach_media_metadata(df, modality="image")


def test_attach_metadata(spark):
    media = _media(spark)
    rows = {r["media_id"]: r for r in media.collect()}
    assert rows[1]["meta"]["n_bytes"] == 17
    assert rows[1]["meta"]["modality"] == "image"
    assert len(rows[1]["meta"]["content_sha"]) == 64


def test_extract_features_schema_and_determinism(spark):
    media = _media(spark)
    out = extract_features(media, dim=8)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,modality:string,n_bytes:bigint,feature:array<float>>"
    )
    rows = {r["media_id"]: r["feature"] for r in out.collect()}
    assert len(rows[1]) == 8
    # deterministic stub: same payload -> same features
    assert rows[1] == [float(f"{v:.9g}") if False else v for v in rows[1]]
    expected = decode_image_stub(bytes(b"\x89PNG\r\nfakepayload"), 8)
    assert [round(v, 6) for v in rows[1]] == [round(v, 6) for v in expected]


def test_media_stats_magic_bytes(spark):
    media = _media(spark)
    rows = {r["media_id"]: r for r in media_stats(media).collect()}
    assert rows[1]["magic_hex"] == "89504E47"  # PNG magic
    assert rows[2]["magic_hex"] == "52494646"  # RIFF
    assert rows[1]["n_bytes"] == 17


def test_resize_images_shapes(spark):
    from syncquill_spark.operators.multimodal import resize_image_stub, resize_images

    media = _media(spark)
    rows = {r["media_id"]: r for r in resize_images(media, 16, 4).collect()}
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert r["width"] == 16 and r["height"] == 4
        assert r["n_bytes"] == 64 and len(r["payload"]) == 64
    # deterministic stub: same payload -> same resized bytes
    assert bytes(rows[1]["payload"]) == resize_image_stub(b"\x89PNG\r\nfakepayload", 16, 4)


def test_sample_frames_expansion(spark):
    from syncquill_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, bytearray(bytes(range(256)) * 25)),  # 6400 bytes = 25 frames @256
         (2, bytearray(b"tiny"))],                # <1 frame -> clamps to 1
        "media_id long, payload binary",
    )
    out = sample_frames(df, frame_bytes=256, every_n=10).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    # 25 frames sampled every 10 -> indices 0, 10, 20
    assert sorted(r["frame_idx"] for r in by_id[1]) == [0, 10, 20]
    assert all(r["n_frames_total"] == 25 for r in by_id[1])
    assert all(len(r["frame"]) == 256 for r in by_id[1])
    # tiny payload: one (short) frame
    assert [r["frame_idx"] for r in by_id[2]] == [0]
    assert bytes(by_id[2][0]["frame"]) == b"tiny"
