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


# ---------------------------------------------------------------------------
# Real codecs (pure numpy): PPM/PGM + BMP
# ---------------------------------------------------------------------------


def _ppm_p6(w, h, pixels, header=b"P6\n%d %d\n255\n"):
    return (header % (w, h)) + bytes(pixels)


def test_decode_ppm_p6_known_pixels():
    import numpy as np

    from syncquill_spark.operators.multimodal import decode_ppm

    # 2x2 RGB: red, green / blue, white
    raster = [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]
    img, maxval = decode_ppm(_ppm_p6(2, 2, raster))
    assert maxval == 255 and img.shape == (2, 2, 3)
    assert img.dtype == np.uint8
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [0, 255, 0]
    assert img[1, 0].tolist() == [0, 0, 255]
    assert img[1, 1].tolist() == [255, 255, 255]


def test_decode_ppm_header_comments_and_whitespace():
    from syncquill_spark.operators.multimodal import decode_ppm

    payload = b"P6 # magic\n# a comment line\n  2\t1 # dims\n255\n" + bytes(
        [1, 2, 3, 4, 5, 6]
    )
    img, maxval = decode_ppm(payload)
    assert img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [1, 2, 3] and img[0, 1].tolist() == [4, 5, 6]


def test_decode_ppm_p5_grayscale_and_16bit():
    import numpy as np

    from syncquill_spark.operators.multimodal import decode_ppm

    img, maxval = decode_ppm(b"P5\n3 1\n255\n" + bytes([0, 128, 255]))
    assert img.shape == (1, 3, 1) and img[0, 1, 0] == 128
    # 16-bit samples are big-endian per spec
    img16, maxval16 = decode_ppm(
        b"P5\n2 1\n65535\n" + (1000).to_bytes(2, "big") + (65535).to_bytes(2, "big")
    )
    assert maxval16 == 65535 and img16.dtype == np.uint16
    assert img16[0, 0, 0] == 1000 and img16[0, 1, 0] == 65535


def test_decode_ppm_rejects_malformed():
    import pytest

    from syncquill_spark.operators.multimodal import decode_ppm

    with pytest.raises(ValueError, match="not a binary PPM"):
        decode_ppm(b"P3\n1 1\n255\n1 2 3")  # ASCII ppm unsupported
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n2 2\n255\n" + bytes(5))  # raster too short
    with pytest.raises(ValueError, match="header truncated"):
        decode_ppm(b"P6\n2")


def test_decode_bmp_24bit_bottom_up_with_padding():
    from syncquill_spark.operators.multimodal import decode_bmp

    # 2x2, 24bpp: stride = 2*3 padded to 8 bytes. BMP stores BGR,
    # bottom-up: file row 0 is the image's BOTTOM row.
    import struct

    width, height, stride = 2, 2, 8
    raster = (
        bytes([255, 0, 0, 0, 255, 0]) + b"\x00\x00"   # bottom: blue, green
        + bytes([0, 0, 255, 255, 255, 255]) + b"\x00\x00"  # top: red, white
    )
    header = (
        b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(raster), 2835, 2835, 0, 0)
    )
    img, maxval = decode_bmp(header + raster)
    assert img.shape == (2, 2, 3) and maxval == 255
    assert img[0, 0].tolist() == [255, 0, 0]      # top-left red (RGB)
    assert img[0, 1].tolist() == [255, 255, 255]  # top-right white
    assert img[1, 0].tolist() == [0, 0, 255]      # bottom-left blue
    assert img[1, 1].tolist() == [0, 255, 0]      # bottom-right green


def test_decode_image_dispatch_and_unknown():
    import pytest

    from syncquill_spark.operators.multimodal import decode_image

    img, _ = decode_image(_ppm_p6(1, 1, [9, 9, 9]))
    assert img.shape == (1, 1, 3)
    with pytest.raises(ValueError, match="no built-in codec"):
        decode_image(b"\x89PNG\r\n...")


def test_image_moments_real_decode_end_to_end(spark):
    from syncquill_spark.operators.multimodal import image_moments

    p6 = _ppm_p6(2, 2, [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    p5 = b"P5\n3 1\n255\n" + bytes([10, 20, 30])
    df = spark.createDataFrame(
        [(1, bytearray(p6)), (2, bytearray(p5))],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in image_moments(df).collect()}
    assert rows[1].width == 2 and rows[1].height == 2
    assert (rows[1].r_sum, rows[1].g_sum, rows[1].b_sum) == (510, 510, 510)
    assert rows[1].px_min == 0 and rows[1].px_max == 255
    # grayscale reports its channel in all three sums
    assert (rows[2].r_sum, rows[2].g_sum, rows[2].b_sum) == (60, 60, 60)
    assert rows[2].width == 3 and rows[2].height == 1


# ---------------------------------------------------------------------------
# Real audio codec (pure numpy): PCM WAV
# ---------------------------------------------------------------------------


def _wav(samples_le: bytes, channels=1, rate=8000, bits=16, extra_chunk=False):
    import struct

    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate,
        rate * channels * bits // 8, channels * bits // 8, bits,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:  # LIST chunk with odd size (tests pad handling)
        chunks += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    chunks += b"data" + struct.pack("<I", len(samples_le)) + samples_le
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_wav_16bit_known_samples():
    import struct

    import numpy as np

    from syncquill_spark.operators.multimodal import decode_wav

    samples = struct.pack("<4h", -32768, -1, 0, 32767)
    frames, rate = decode_wav(_wav(samples))
    assert rate == 8000 and frames.shape == (4, 1)
    assert frames[:, 0].tolist() == [-32768, -1, 0, 32767]
    assert frames.dtype == np.dtype("<i2")


def test_decode_wav_stereo_and_8bit_and_chunk_walk():
    import struct

    from syncquill_spark.operators.multimodal import decode_wav

    stereo = struct.pack("<4h", 1, 2, 3, 4)  # L1 R2 / L3 R4
    frames, _ = decode_wav(_wav(stereo, channels=2, extra_chunk=True))
    assert frames.shape == (2, 2)
    assert frames.tolist() == [[1, 2], [3, 4]]
    # 8-bit unsigned per spec
    frames8, rate8 = decode_wav(_wav(bytes([0, 128, 255]), bits=8, rate=44100))
    assert rate8 == 44100 and frames8[:, 0].tolist() == [0, 128, 255]


def test_decode_wav_rejects_malformed():
    import struct

    import pytest

    from syncquill_spark.operators.multimodal import decode_wav

    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"OggS....")
    with pytest.raises(ValueError, match="missing fmt/data"):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    # float WAV (format 3) rejected
    bad = _wav(struct.pack("<2h", 0, 0))
    bad = bad.replace(struct.pack("<HH", 1, 1), struct.pack("<HH", 3, 1), 1)
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav(bad)


def test_audio_moments_real_decode_end_to_end(spark):
    import struct

    from syncquill_spark.operators.multimodal import audio_moments

    w1 = _wav(struct.pack("<4h", -5, 10, -15, 20))
    w2 = _wav(bytes([0, 100, 200]), bits=8, rate=16000)
    df = spark.createDataFrame(
        [(1, bytearray(w1)), (2, bytearray(w2))],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in audio_moments(df).collect()}
    assert (rows[1].sample_sum, rows[1].sample_min, rows[1].sample_max) == (10, -15, 20)
    assert rows[1].n_frames == 4 and rows[1].sample_rate == 8000
    assert (rows[2].sample_sum, rows[2].n_frames, rows[2].sample_rate) == (300, 3, 16000)


def test_image_moments_zero_pixel_bmp(spark):
    """ADVICE r07: BMP permits width or height 0 and decode_bmp accepts
    it; moments over a zero-pixel image must report 0 sums/min/max, not
    raise inside the executor (mirrors audio_moments' empty guard)."""
    import struct

    from syncquill_spark.operators.multimodal import decode_bmp, image_moments

    width, height = 0, 2  # stride = (0*3+3) & ~3 = 0 -> empty raster
    header = (
        b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      0, 2835, 2835, 0, 0)
    )
    img, _ = decode_bmp(header)
    assert img.size == 0
    df = spark.createDataFrame(
        [(1, bytearray(header))], "media_id long, payload binary"
    )
    (row,) = image_moments(df).collect()
    assert (row.width, row.height) == (0, 2)
    assert (row.r_sum, row.g_sum, row.b_sum) == (0, 0, 0)
    assert (row.px_min, row.px_max) == (0, 0)


def test_decode_ppm_16bit_odd_truncation_friendly_error():
    """ADVICE r07: a 16-bit raster truncated to an ODD byte count must
    hit the codec's 'raster truncated' ValueError, not numpy's generic
    buffer-size error from count=-1."""
    import pytest

    from syncquill_spark.operators.multimodal import decode_ppm

    payload = b"P6\n1 1\n65535\n" + b"\x00" * 5  # want 6 bytes, have 5 (odd)
    with pytest.raises(ValueError, match="raster truncated"):
        decode_ppm(payload)


def test_media_triage_reports_instead_of_raising(spark):
    """The decodability gate (r13): media_stats triages by bytes alone
    and cannot catch truncation behind a valid magic — exactly the
    corruption that aborts the strict decode stages at corpus scale.
    media_triage attempts the real decode per payload and reports the
    outcome as a row; nothing raises, including NULL payloads and
    unknown magics."""
    import struct

    from syncquill_spark.operators.multimodal import media_triage

    good_ppm = _ppm_p6(2, 2, [255, 0, 0, 0, 255, 0, 0, 0, 255, 1, 2, 3])
    truncated_ppm = good_ppm[:-5]          # valid magic, cut raster
    good_wav = _wav(struct.pack("<2h", 1, -1))
    truncated_wav = good_wav[:20]          # RIFF magic, cut chunks
    rows = [
        (1, good_ppm),
        (2, truncated_ppm),
        (3, good_wav),
        (4, truncated_wav),
        (5, b"\x89PNG\r\n\x1a\n garbage"),  # magic no codec handles
        (6, None),                           # null payload
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in media_triage(df).collect()}
    assert out[1]["ok"] and out[1]["modality"] == "image"
    assert not out[2]["ok"] and "truncated" in out[2]["error"]
    assert out[3]["ok"] and out[3]["modality"] == "audio"
    assert not out[4]["ok"] and out[4]["error"]
    assert not out[5]["ok"] and "no codec" in out[5]["error"]
    assert not out[6]["ok"] and out[6]["error"] == "null payload"


def test_media_triage_respects_id_name_and_type(spark):
    """ADVICE r13: the triage output schema hard-coded a long
    'media_id', so a string-keyed or renamed-id frame failed Arrow
    conversion before the quarantine join could run. The id column now
    passes through under its own name and type."""
    from syncquill_spark.operators.multimodal import media_triage

    df = spark.createDataFrame(
        [("asset-1", _ppm_p6(1, 1, [9, 9, 9])), ("asset-2", None)],
        "asset string, payload binary",
    )
    out = media_triage(df, id_col="asset")
    assert out.schema["asset"].dataType.simpleString() == "string"
    rows = {r["asset"]: r for r in out.collect()}
    assert rows["asset-1"]["ok"] and rows["asset-1"]["modality"] == "image"
    assert not rows["asset-2"]["ok"]
