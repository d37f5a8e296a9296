"""Perceptual media fingerprints + hamming-band near-dup.

Pins: dHash/energy-hash exact-integer semantics (gradient bits,
invariances, cross-format identity), the mapInPandas fingerprint stage
against the driver-side pure functions, and the reuse of the SimHash
band machinery at bits=64 (planted near-pairs found, far pairs and
cross-modality pairs absent, gate == rebuild restricted to cross).
"""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

import numpy as np
import pytest

from syncquill_spark.operators.multimodal import (
    audio_energy_hash,
    decode_bmp,
    decode_image,
    decode_wav,
    image_dhash,
    media_fingerprints,
    media_matches_against,
    media_near_pairs,
)


def _ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return (b"P6\n%d %d\n255\n" % (w, h)) + img.astype(np.uint8).tobytes()


def _bmp(img: np.ndarray) -> bytes:
    """24-bpp bottom-up BMP of an (H, W, 3) RGB uint8 array."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = []
    for r in range(h - 1, -1, -1):  # bottom-up
        row = img[r, :, ::-1].astype(np.uint8).tobytes()  # RGB -> BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    raster = b"".join(rows)
    return (
        b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                      len(raster), 2835, 2835, 0, 0)
        + raster
    )


def _wav16(samples: np.ndarray, rate: int = 8000) -> bytes:
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _gray(h, w, fn) -> np.ndarray:
    g = np.fromfunction(lambda i, j: fn(i, j) % 200, (h, w)).astype(np.uint8)
    return np.repeat(g[:, :, None], 3, axis=2)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# ---------------------------------------------------------------------------
# Pure hash functions
# ---------------------------------------------------------------------------


def test_image_dhash_flat_and_gradient():
    flat = np.full((8, 9, 3), 77, dtype=np.uint8)
    assert image_dhash(flat) == 0
    # 8x9 = one pixel per lattice cell; strictly increasing columns
    # -> every left<right comparison true -> all 64 bits -> signed -1
    ramp = np.repeat(
        np.tile(np.arange(9, dtype=np.uint8) * 20, (8, 1))[:, :, None], 3, axis=2
    )
    assert image_dhash(ramp) == -1
    # decreasing columns -> no bit set
    assert image_dhash(ramp[:, ::-1]) == 0


def test_image_dhash_cross_format_and_invariance():
    img = _gray(24, 30, lambda i, j: i * 3 + j * 5)
    via_ppm = image_dhash(*decode_image(_ppm(img)))
    via_bmp = image_dhash(*decode_image(_bmp(img)))
    assert via_ppm == via_bmp  # same pixels, any container
    # exact x2 brightness preserves every mean comparison (keep the
    # base under 128 so the doubling stays inside uint8)
    half = img // 2
    assert image_dhash(half * 2) == image_dhash(half)
    # sub-lattice thumbnails are deterministic (empty cells compare 0)
    assert image_dhash(np.full((2, 3, 3), 9, dtype=np.uint8)) == 0


def test_audio_energy_hash_props():
    up = (np.arange(650, dtype=np.int64) * 7).reshape(-1, 1)
    assert audio_energy_hash(up) == -1  # all 64 bits set (rising energy)
    down = up[::-1]
    assert audio_energy_hash(down) == 0
    # integer gain invariance
    assert audio_energy_hash(up * 3) == audio_energy_hash(up)
    # 8-bit unsigned re-biasing: constant 128 is silence (hash 0)
    silent = np.full((400, 1), 128, dtype=np.uint8)
    assert audio_energy_hash(silent) == 0
    # short clip: deterministic
    assert audio_energy_hash(np.zeros((3, 1), dtype=np.int64)) == 0


# ---------------------------------------------------------------------------
# Spark stage + band-join reuse
# ---------------------------------------------------------------------------

_BASE = _gray(32, 36, lambda i, j: i * 3 + j * 5)
_FAR = _gray(32, 36, lambda i, j: j * 11 - i * 7)
_UP = (np.arange(1300, dtype=np.int64) * 5 % 12000).reshape(-1, 1)


def _near_img() -> np.ndarray:
    # a localized edit strong enough to flip a few gradient bits
    # (hamming 2 vs _BASE) — exercises the banded-recall path, not
    # just exact fingerprint equality
    img = _BASE.copy()
    img[4:12, 8:16] = np.minimum(
        img[4:12, 8:16].astype(np.int64) + 60, 255
    ).astype(np.uint8)
    return img


def _near_audio() -> np.ndarray:
    # a short loudness burst — flips one energy-gradient bit
    v = _UP[:, 0].copy()
    v[100:140] = np.clip(v[100:140] + 3000, -32768, 32767)
    return v


def _media_df(spark):
    near = _near_img()
    rows = [
        (1, _ppm(_BASE)),
        (2, _bmp(near)),              # near-dup of 1, other container
        (3, _ppm(_FAR)),              # unrelated image
        (4, _wav16(_UP[:, 0])),
        (5, _wav16(_near_audio())),   # near of 4 (hamming 1)
        (6, _wav16(_UP[::-1, 0])),    # unrelated audio
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary"), near


def test_media_fingerprints_match_pure_functions(spark):
    df, near = _media_df(spark)
    got = {r.media_id: (r.modality, r.simhash)
           for r in media_fingerprints(df).collect()}
    assert got[1] == ("image", image_dhash(_BASE))
    assert got[2] == ("image", image_dhash(*decode_bmp(_bmp(near))))
    assert got[4] == ("audio", audio_energy_hash(decode_wav(_wav16(_UP[:, 0]))[0]))
    assert {m for m, _ in got.values()} == {"image", "audio"}
    # the planted fixtures really are near/far at the hash level
    assert _ham(got[1][1], got[2][1]) <= 6 < _ham(got[1][1], got[3][1])
    assert _ham(got[4][1], got[5][1]) <= 6 < _ham(got[4][1], got[6][1])


def test_media_fingerprints_unknown_magic_raises(spark):
    df = spark.createDataFrame(
        [(9, b"\x89PNG\r\n\x1a\n....")], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="no fingerprint codec"):
        media_fingerprints(df).collect()


def test_media_near_pairs_planted(spark):
    df, _ = _media_df(spark)
    fp = media_fingerprints(df)
    pairs = {(r.modality, r.id_a, r.id_b)
             for r in media_near_pairs(fp, max_hamming=6).collect()}
    assert pairs == {("image", 1, 2), ("audio", 4, 5)}


def test_media_near_pairs_no_cross_modality_on_collision(spark):
    # identical 64-bit fingerprints but different modalities: the
    # per-modality split must keep them apart
    fp = spark.createDataFrame(
        [(1, "image", 12345), (2, "audio", 12345), (3, "image", 12345)],
        "media_id long, modality string, simhash long",
    )
    pairs = {(r.modality, r.id_a, r.id_b)
             for r in media_near_pairs(fp, max_hamming=6).collect()}
    assert pairs == {("image", 1, 3)}


def test_media_matches_against_equals_rebuild_cross(spark):
    df, _ = _media_df(spark)
    fp = media_fingerprints(df).persist()
    corpus = fp.filter("media_id <= 3")
    batch = fp.filter("media_id > 3")
    got = {(r.modality, r.id_new, r.id_corpus, r.hamming)
           for r in media_matches_against(batch, corpus, max_hamming=40).collect()}
    # rebuild over the union, restricted to cross pairs
    want = {
        (r.modality, max(r.id_a, r.id_b), min(r.id_a, r.id_b), r.hamming)
        for r in media_near_pairs(fp, max_hamming=40).collect()
        if (r.id_a <= 3) != (r.id_b <= 3)
    }
    fp.unpersist()
    assert got == want


def test_media_fingerprint_index_lifecycle(spark, tmp_path):
    """The docstring's claim, proven: a (media_id, modality, simhash)
    frame rides the index_store lifecycle — save, batch-I/O append,
    reload, and the gate from STORED rows equals the full rebuild
    restricted to cross pairs. Payload bytes are touched only at
    fingerprint time."""
    from syncquill_spark.sources.index_store import (
        append_index,
        load_index,
        save_index,
    )

    df, _ = _media_df(spark)
    corpus_fp = media_fingerprints(df.filter("media_id <= 3"))
    batch = df.filter("media_id > 3")
    path = str(tmp_path / "media_fp_idx")
    save_index(path, fps=corpus_fp)
    append_index(path, fps=media_fingerprints(batch))
    stored = load_index(spark, path)["fps"]
    assert stored.count() == 6  # append extended the part

    # gate a NEW batch (ids 14/15: copies of 4/5) against the stored rows
    batch2 = df.filter("media_id IN (4, 5)").withColumn(
        "media_id", F.col("media_id") + 10
    )
    got = {(r.modality, r.id_new, r.id_corpus)
           for r in media_matches_against(
               media_fingerprints(batch2), stored, max_hamming=6).collect()}
    # 14==4 exactly (hamming 0), 15==5 exactly; 14~5 and 15~4 at
    # hamming 1 (the planted burst) — all four cross matches, audio only
    assert got == {("audio", 14, 4), ("audio", 14, 5),
                   ("audio", 15, 4), ("audio", 15, 5)}


# ---------------------------------------------------------------------------
# Video frame fingerprints + frame-vote pairing
# ---------------------------------------------------------------------------

def _rand_frame(seed: int) -> np.ndarray:
    # seeded random gray frames: smooth gradients all share the same
    # monotone dHash, so distinct frames need distinct SIGN structure
    # (pairwise hamming ~30 here; a near-frame edit stays <= 3)
    g = np.random.RandomState(seed).randint(0, 200, (12, 16)).astype(np.uint8)
    return np.repeat(g[:, :, None], 3, axis=2)


_F1, _F2, _F3, _F4 = (_rand_frame(s) for s in range(4))
_FRAME_BYTES = len(_ppm(_F1))


def _near_frame(img):
    out = img.copy()
    out[2:5, 3:7] = np.minimum(out[2:5, 3:7].astype(np.int64) + 35, 255).astype(
        np.uint8
    )
    return out


def _video(*frames) -> bytes:
    payloads = [_ppm(f) for f in frames]
    assert all(len(p) == _FRAME_BYTES for p in payloads)
    return b"".join(payloads)


def test_video_frame_fingerprints_per_frame(spark):
    from syncquill_spark.operators.multimodal import video_frame_fingerprints

    df = spark.createDataFrame(
        [(1, _video(_F1, _F2, _F3))], "media_id long, payload binary"
    )
    got = {
        (r.media_id, r.frame_idx): r.simhash
        for r in video_frame_fingerprints(df, frame_bytes=_FRAME_BYTES).collect()
    }
    assert got == {
        (1, 0): image_dhash(_F1),
        (1, 1): image_dhash(_F2),
        (1, 2): image_dhash(_F3),
    }


def test_video_near_pairs_frame_votes(spark):
    from syncquill_spark.operators.multimodal import (
        video_frame_fingerprints,
        video_near_pairs,
    )

    # A and B share F1 exactly and F2 near (re-used footage); C is
    # unrelated except sharing the single frame F3 with A (an intro
    # alone must stay under min_frames=2)
    df = spark.createDataFrame(
        [
            (1, _video(_F1, _F2, _F3)),
            (2, _video(_near_frame(_F2), _F4, _F1)),
            (3, _video(_F3, _rand_frame(9))),
        ],
        "media_id long, payload binary",
    )
    fp = video_frame_fingerprints(df, frame_bytes=_FRAME_BYTES).persist()
    got = {(r.id_a, r.id_b): r.n_frame_matches
           for r in video_near_pairs(fp, max_hamming=6, min_frames=2).collect()}
    assert got == {(1, 2): 2}
    # raising the threshold drops the pair; min_frames=1 admits the
    # shared-intro pair too
    assert video_near_pairs(fp, max_hamming=6, min_frames=3).count() == 0
    got1 = {(r.id_a, r.id_b)
            for r in video_near_pairs(fp, max_hamming=6, min_frames=1).collect()}
    fp.unpersist()
    assert (1, 3) in got1 and (1, 2) in got1


def test_video_near_pairs_frame_cap_raises(spark):
    from syncquill_spark.operators.multimodal import (
        video_frame_fingerprints,
        video_near_pairs,
    )

    df = spark.createDataFrame(
        [(1, _video(_F1, _F2, _F3))], "media_id long, payload binary"
    )
    fp = video_frame_fingerprints(df, frame_bytes=_FRAME_BYTES)
    with pytest.raises(Exception, match="max_frames_per_video"):
        video_near_pairs(fp, max_frames_per_video=2).collect()


def test_video_partial_frames(spark):
    from syncquill_spark.operators.multimodal import video_frame_fingerprints

    # a trailing partial frame is dropped by sample_frames' integer
    # division (documented) — the two whole frames still hash
    payload = _video(_F1, _F2) + _ppm(_F3)[: _FRAME_BYTES // 2]
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    got = video_frame_fingerprints(df, frame_bytes=_FRAME_BYTES).collect()
    assert {(r.frame_idx, r.simhash) for r in got} == {
        (0, image_dhash(_F1)), (1, image_dhash(_F2))
    }
    # but a payload SMALLER than one frame fails loud in the decoder
    short = spark.createDataFrame(
        [(2, _ppm(_F1)[: _FRAME_BYTES // 2])], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="truncated"):
        video_frame_fingerprints(short, frame_bytes=_FRAME_BYTES).collect()


def test_streaming_media_ingest_with_index_append(spark, tmp_path):
    """Day-in-the-life of the media ingest path: a stream of image
    microbatches is gated in foreachBatch against a PERSISTED
    fingerprint index; survivors' fingerprints append batch-I/O, so a
    later batch's near-copy of an EARLIER batch's survivor is caught
    — the index grows mid-stream without a corpus rewrite (the media
    twin of the text streaming-ingest scenario)."""
    import os

    from syncquill_spark.sources.index_store import (
        append_index,
        load_index,
        save_index,
    )

    def img(seed):
        g = np.random.RandomState(seed).randint(0, 200, (24, 24)).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)

    def near(base):
        out = base.copy()
        out[3:7, 4:10] = np.minimum(
            out[3:7, 4:10].astype(np.int64) + 35, 255
        ).astype(np.uint8)
        return out

    c1, c2 = img(20), img(21)
    new1, new2 = img(22), img(23)
    # fixture sanity: near-copies sit within the gate's radius, all
    # distinct images sit far outside it
    dh = image_dhash
    assert _ham(dh(c1), dh(near(c1))) <= 6 and _ham(dh(new1), dh(near(new1))) <= 6
    for a in (c1, c2, new1, new2):
        for b in (c1, c2, new1, new2):
            if a is not b:
                assert _ham(dh(a), dh(b)) > 6
    assert _ham(dh(near(new1)), dh(c1)) > 6 and _ham(dh(near(new1)), dh(c2)) > 6

    corpus = spark.createDataFrame(
        [(1, _ppm(c1)), (2, _ppm(c2))], "media_id long, payload binary"
    )
    idx_path = str(tmp_path / "media_idx")
    save_index(idx_path, fps=media_fingerprints(corpus))

    b1 = [(101, _ppm(new1)), (102, _ppm(near(c1)))]     # 102 dupes corpus
    b2 = [(201, _ppm(near(new1))), (202, _ppm(new2))]   # 201 dupes survivor 101

    src = str(tmp_path / "media_stream")
    os.makedirs(src)
    spark.createDataFrame(b1, "media_id long, payload binary").coalesce(
        1
    ).write.mode("append").parquet(src)

    survivors, dropped = [], []

    def gate(mb, epoch):
        fps = media_fingerprints(mb).persist()
        stored = load_index(spark, idx_path)["fps"]
        dupes = {
            r.id_new
            for r in media_matches_against(fps, stored, max_hamming=6).collect()
        }
        keep_fp = fps.filter(~F.col("media_id").isin(list(dupes) or [-1]))
        kept = [r.media_id for r in keep_fp.select("media_id").collect()]
        survivors.extend(kept)
        dropped.extend(sorted(dupes))
        if kept:
            append_index(idx_path, fps=keep_fp)
        fps.unpersist()

    def run_stream():
        q = (
            spark.readStream.schema("media_id long, payload binary")
            .parquet(src)
            .writeStream.foreachBatch(gate)
            .option("checkpointLocation", str(tmp_path / "media_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_stream()
    spark.createDataFrame(b2, "media_id long, payload binary").coalesce(
        1
    ).write.mode("append").parquet(src)
    run_stream()

    assert sorted(survivors) == [101, 202]
    assert sorted(dropped) == [102, 201]  # 201 caught ONLY via the append
    stored = load_index(spark, idx_path)["fps"]
    assert sorted(r.media_id for r in stored.collect()) == [1, 2, 101, 202]


# ---------------------------------------------------------------------------
# Property pins for the exact-integer invariances the docstrings claim
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 10_000), shift=st.integers(0, 55),
       h=st.integers(8, 20), w=st.integers(9, 24))
def test_image_dhash_uniform_brightness_shift_invariance(seed, shift, h, w):
    # adding c to every pixel adds c*n to every block sum, and the
    # c*n_l*n_r terms cancel in the cross-multiplied comparison —
    # exact invariance as long as nothing clips (pixels < 200+56)
    img = np.random.RandomState(seed).randint(0, 200, (h, w, 3)).astype(np.uint8)
    assert image_dhash(img + np.uint8(shift)) == image_dhash(img)


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 10_000), gain=st.integers(1, 7),
       n=st.integers(10, 400), ch=st.integers(1, 2))
def test_audio_energy_hash_integer_gain_invariance(seed, gain, n, ch):
    frames = np.random.RandomState(seed).randint(
        -4000, 4000, (n, ch)
    ).astype(np.int64)
    assert audio_energy_hash(frames * gain) == audio_energy_hash(frames)
