"""Media-directory ingestion (sources/media_files.py): binaryFile scan
-> multimodal table shape, composing with the feature-extraction
operators downstream."""

from __future__ import annotations

import hashlib
import os


def _write_tree(tmp_path):
    d = tmp_path / "media"
    (d / "sub").mkdir(parents=True)
    files = {
        "a.jpg": b"\xff\xd8fakejpegbytes",
        "b.PNG": b"\x89PNGfake",
        "sub/c.wav": b"RIFFfakewav",
        "sub/d.mp4": b"\x00\x00ftypfake",
        "notes.txt": b"not media",
    }
    for rel, payload in files.items():
        p = d / rel
        p.write_bytes(payload)
    return str(d), files


def test_read_media_dir_shape_and_modalities(spark, tmp_path):
    from syncquill_spark.sources.media_files import read_media_dir

    root, files = _write_tree(tmp_path)
    rows = read_media_dir(spark, root).collect()
    assert len(rows) == len(files)
    by_name = {os.path.basename(r.source_path): r for r in rows}
    assert by_name["a.jpg"].meta.modality == "image"
    assert by_name["b.PNG"].meta.modality == "image"  # case-insensitive ext
    assert by_name["c.wav"].meta.modality == "audio"
    assert by_name["d.mp4"].meta.modality == "video"
    assert by_name["notes.txt"].meta.modality == "binary"  # quarantine class
    for name, payload in files.items():
        r = by_name[os.path.basename(name)]
        assert bytes(r.payload) == payload
        assert r.meta.n_bytes == len(payload)
        assert r.meta.content_sha == hashlib.sha256(payload).hexdigest()
    # ids are distinct and deterministic across reads
    ids1 = sorted(r.media_id for r in rows)
    ids2 = sorted(r.media_id for r in read_media_dir(spark, root).collect())
    assert ids1 == ids2 and len(set(ids1)) == len(ids1)


def test_read_media_dir_glob_prunes_at_listing(spark, tmp_path):
    from syncquill_spark.sources.media_files import read_media_dir

    root, _ = _write_tree(tmp_path)
    got = {
        os.path.basename(r.source_path)
        for r in read_media_dir(spark, root, glob="*.jpg").collect()
    }
    assert got == {"a.jpg"}
    # non-recursive: subdirectory files excluded
    flat = {
        os.path.basename(r.source_path)
        for r in read_media_dir(spark, root, recursive=False).collect()
    }
    assert "c.wav" not in flat and "a.jpg" in flat


def test_read_media_dir_composes_with_feature_extraction(spark, tmp_path):
    from syncquill_spark.operators.multimodal import extract_features
    from syncquill_spark.sources.media_files import read_media_dir

    root, files = _write_tree(tmp_path)
    media = read_media_dir(spark, root, glob="*.jpg", modality="image")
    feats = extract_features(media, dim=4).collect()
    assert len(feats) == 1
    (row,) = feats
    # stub features are md5-derived from the payload: recompute
    h = hashlib.md5(files["a.jpg"]).digest()
    assert [round(v, 6) for v in row.feature] == [
        round(h[i % 16] / 255.0, 6) for i in range(4)
    ]


def test_write_media_dir_roundtrip_and_atomic_overwrite(spark, tmp_path):
    """Export payloads as files (executor-side), re-ingest via
    binaryFile: byte-identical payloads, ids re-derivable from names;
    a second export atomically replaces the first (no stale files)."""
    import os

    from syncquill_spark.sources.media_files import (
        read_media_dir,
        write_media_dir,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"\x00\x01payload-one")), (2, bytearray(b"two\xff"))],
        "media_id long, payload binary",
    )
    out = str(tmp_path / "export")
    write_media_dir(df, out, ext="bin")
    assert sorted(os.listdir(out)) == ["1.bin", "2.bin"]
    back = {
        int(os.path.basename(r.source_path).split(".")[0]): bytes(r.payload)
        for r in read_media_dir(spark, out, glob="*.bin").collect()
    }
    assert back == {1: b"\x00\x01payload-one", 2: b"two\xff"}

    # overwrite: a smaller second export leaves NO stale first-export files
    df2 = spark.createDataFrame(
        [(9, bytearray(b"only"))], "media_id long, payload binary"
    )
    write_media_dir(df2, out, ext="bin")
    assert sorted(os.listdir(out)) == ["9.bin"]


def test_read_media_dir_knows_netpbm_modalities(spark, tmp_path):
    from syncquill_spark.sources.media_files import read_media_dir

    d = tmp_path / "m"
    d.mkdir()
    (d / "x.ppm").write_bytes(b"P6\n1 1\n255\n\x01\x02\x03")
    rows = read_media_dir(spark, str(d)).collect()
    assert rows[0].meta.modality == "image"
