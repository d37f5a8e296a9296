"""Multimodal column operators (EXT tier).

Non-text payloads are opaque ``binary`` columns plus a typed metadata
struct — the lakehouse-native layout for image/audio/video at 100 TB
(payload bytes stay columnar in parquet; metadata prunes without
touching them). Decode / feature-extraction run as Arrow-batched
``mapInPandas`` stages.

Codecs: PPM/PGM (P6/P5) and uncompressed 24/32-bit BMP decode is REAL
— a pure-numpy parser (``decode_ppm`` / ``decode_bmp`` /
``decode_image``), no image library needed, driving the
``image_moments`` exact-integer feature stage. Formats that require a
library this container lacks (JPEG/PNG/audio/video) remain stubbed
behind ``decode_image_stub`` / ``resize_image_stub`` — swap in
PIL/torchaudio per modality; the mapInPandas plumbing is identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType(
            [
                T.StructField("modality", T.StringType()),
                T.StructField("n_bytes", T.LongType()),
                T.StructField("content_sha", T.StringType()),
            ]
        )),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_media_metadata(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id",
    modality: str = "image",
) -> DataFrame:
    """Wrap raw binary payloads with the typed metadata struct (pure
    built-ins: length/sha2 over binary — no UDF)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.length(payload_col).cast("long").alias("n_bytes"),
            F.sha2(F.col(payload_col), 256).alias("content_sha"),
        ).alias("meta"),
    )


def decode_image_stub(payload: bytes, dim: int = 8) -> list[float]:
    """STUB decode+featurize: no image LIBRARIES in this container.

    Deterministic fake: md5-seeded pseudo-features in [0,1). A real
    deployment replaces the body with e.g. PIL.Image.open + resize +
    channel means — the mapInPandas plumbing around it is unchanged.
    For PPM/PGM and uncompressed BMP payloads no library is needed at
    all: ``decode_image`` below is a REAL pure-numpy codec.
    """
    h = hashlib.md5(payload).digest()
    return [h[i % 16] / 255.0 for i in range(dim)]


# ---------------------------------------------------------------------------
# Real codecs (pure numpy — no image library required)
# ---------------------------------------------------------------------------


def decode_ppm(payload: bytes) -> "tuple":
    """Decode binary Netpbm images — P6 (RGB) and P5 (grayscale) — to
    (H, W, C) uint8/uint16 numpy. A real parser, not a stub: handles
    ``#`` comments, arbitrary whitespace runs in the header, and
    1- vs 2-byte samples by maxval, per the Netpbm spec. Raises
    ValueError on malformed input (truncated raster, bad magic)."""
    import numpy as np

    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM payload: {payload[:2]!r}")
    channels = 3 if payload[:2] == b"P6" else 1

    # header tokenizer: magic, width, height, maxval; '#' to EOL is a
    # comment; ONE whitespace byte terminates the header before raster
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(payload):
            raise ValueError("PPM header truncated")
        b = payload[pos]
        if b == ord("#"):
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
        elif b in b" \t\r\n\x0b\x0c":
            pos += 1
        else:
            end = pos
            while end < len(payload) and payload[end] not in b" \t\r\n\x0b\x0c#":
                end += 1
            tok = payload[pos:end]
            if not tok.isdigit():
                raise ValueError(f"bad PPM header token {tok!r}")
            fields.append(int(tok))
            pos = end
    if pos >= len(payload) or payload[pos] not in b" \t\r\n\x0b\x0c":
        raise ValueError("PPM header not terminated by whitespace")
    pos += 1  # exactly one whitespace byte, then raster
    width, height, maxval = fields
    if not (0 < maxval < 65536):
        raise ValueError(f"PPM maxval {maxval} out of range")
    dtype = np.uint8 if maxval < 256 else np.dtype(">u2")
    n = width * height * channels
    # count computed explicitly: with count=-1 an odd trailing byte on
    # the 2-byte dtype raises numpy's generic "buffer size must be a
    # multiple of element size" instead of the truncation ValueError
    avail = (len(payload) - pos) // np.dtype(dtype).itemsize
    raster = np.frombuffer(payload, dtype=dtype, count=avail, offset=pos)
    if raster.size < n:
        raise ValueError(
            f"PPM raster truncated: want {n} samples, have {raster.size}"
        )
    img = raster[:n].astype(np.uint16 if maxval >= 256 else np.uint8)
    return img.reshape(height, width, channels), maxval


def decode_bmp(payload: bytes) -> "tuple":
    """Decode uncompressed 24/32-bit BMP (BITMAPINFOHEADER family) to
    (H, W, 3) uint8 numpy, top-down row order, RGB channel order —
    undoing BMP's bottom-up rows, BGR order, and 4-byte row padding.
    Raises ValueError on compressed or paletted files."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError(f"not a BMP payload: {payload[:2]!r}")
    if len(payload) < 54:
        raise ValueError("BMP header truncated")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3  # rows pad to 4 bytes
    need = data_offset + stride * height
    if len(payload) < need:
        raise ValueError(f"BMP raster truncated: want {need}, have {len(payload)}")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)
    img = rows[:, : width * bytes_pp].reshape(height, width, bytes_pp)
    if bottom_up:
        img = img[::-1]
    return img[:, :, 2::-1], 255  # BGRA/BGR -> RGB; alpha dropped


def decode_image(payload: bytes) -> "tuple":
    """Magic-byte dispatch to the real codecs: P6/P5 -> Netpbm,
    BM -> BMP. Returns ((H, W, C) numpy, maxval). ValueError for
    formats that need a library this container lacks (JPEG/PNG/...)."""
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise ValueError(
        f"no built-in codec for magic {payload[:2]!r}; JPEG/PNG need an "
        "image library (PIL) — use decode_image_stub plumbing for those"
    )


def decode_wav(payload: bytes) -> "tuple":
    """Decode PCM WAV (RIFF/WAVE, 8- or 16-bit integer samples) to
    ((n_frames, n_channels) numpy int array, sample_rate). A real
    chunk-walking parser: finds ``fmt `` and ``data`` wherever they
    sit (skipping LIST/INFO/fact chunks, honoring odd-size padding),
    requires audio format 1 (PCM), rejects float/ADPCM/truncated
    payloads with ValueError. 8-bit WAV is unsigned per spec
    (returned as-is, 0..255); 16-bit is signed little-endian."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE payload: {payload[:4]!r}")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("WAV fmt chunk truncated")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            if len(body) < size:
                raise ValueError("WAV data chunk truncated")
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16) or n_channels < 1:
        raise ValueError(
            f"unsupported WAV: format={audio_format} bits={bits} "
            f"channels={n_channels} (PCM 8/16-bit only)"
        )
    dtype = np.uint8 if bits == 8 else np.dtype("<i2")
    samples = np.frombuffer(data, dtype=dtype)
    n_frames = samples.size // n_channels
    return (
        samples[: n_frames * n_channels].reshape(n_frames, n_channels),
        sample_rate,
    )


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("sample_sum", T.LongType()),
        T.StructField("sample_min", T.LongType()),
        T.StructField("sample_max", T.LongType()),
    ]
)


def audio_moments(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL audio decode + exact integer moments: PCM WAV payloads ->
    (sample_rate, n_channels, n_frames, global sample sum/min/max as
    int64) per clip, via the pure-numpy ``decode_wav``. The audio twin
    of ``image_moments`` — same Arrow-batched mapInPandas template,
    every output an order-independent exact integer, so the registry's
    oracle can recompute the moments from the raw bytes."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "sample_rate", "n_channels", "n_frames",
                "sample_sum", "sample_min", "sample_max",
            )}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                frames, rate = decode_wav(bytes(payload))
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["n_channels"].append(frames.shape[1])
                out["n_frames"].append(frames.shape[0])
                out["sample_sum"].append(int(frames.sum(dtype=np.int64)))
                out["sample_min"].append(int(frames.min()) if frames.size else 0)
                out["sample_max"].append(int(frames.max()) if frames.size else 0)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, AUDIO_SCHEMA)


MOMENTS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("maxval", T.LongType()),
        T.StructField("r_sum", T.LongType()),
        T.StructField("g_sum", T.LongType()),
        T.StructField("b_sum", T.LongType()),
        T.StructField("px_min", T.LongType()),
        T.StructField("px_max", T.LongType()),
    ]
)


def image_moments(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL image decode + exact integer moments over binary payloads:
    (width, height, maxval, per-channel sums, global min/max) per
    image, via the pure-numpy codecs — same Arrow-batched mapInPandas
    template as extract_features, but nothing is stubbed and every
    output is an exact integer (int64 sums of uint8/16 samples —
    order-independent, so engine-exact against any oracle that sums
    the same bytes). Grayscale images report their single channel in
    all three sums. At 100 TB the shape is extract_features': payload
    bytes live only inside this stage, batches are Arrow-sized, rows
    out are skinny fixed-width audit rows."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "width", "height", "maxval",
                "r_sum", "g_sum", "b_sum", "px_min", "px_max",
            )}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                img, maxval = decode_image(bytes(payload))
                h, w, c = img.shape
                sums = img.reshape(-1, c).sum(axis=0, dtype=np.int64)
                if c == 1:
                    sums = np.repeat(sums, 3)
                # BMP permits width or height 0 (decode_bmp accepts it);
                # min/max of an empty array would raise in the executor
                # and fail the stage — report 0, as audio_moments does.
                px_min = int(img.min()) if img.size else 0
                px_max = int(img.max()) if img.size else 0
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["maxval"].append(maxval)
                out["r_sum"].append(int(sums[0]))
                out["g_sum"].append(int(sums[1]))
                out["b_sum"].append(int(sums[2]))
                out["px_min"].append(px_min)
                out["px_max"].append(px_max)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, MOMENTS_SCHEMA)


def extract_features(
    media: DataFrame, dim: int = 8, batch_hint: int | None = None
) -> DataFrame:
    """Arrow-batched feature extraction over media payloads.

    mapInPandas: each Arrow batch arrives as a pandas DataFrame; the
    stub featurizer runs per payload; output conforms to
    FEATURE_SCHEMA. At scale: payload column is only materialized
    inside the stage (column pruning keeps it out of earlier stages),
    and partition size is governed by files.maxPartitionBytes — resize
    upstream with repartition when payloads are huge.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "feature": [decode_image_stub(p, dim) for p in pdf["payload"]],
                }
            )
            yield out

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_image_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB resize: no image codecs in this container. Deterministic
    fake: md5-keystream bytes of exactly width*height length (so batch
    shapes and downstream size accounting behave like a real resize).
    A real deployment replaces the body with PIL resize + re-encode."""
    out = bytearray()
    seed = hashlib.md5(payload).digest()
    while len(out) < width * height:
        seed = hashlib.md5(seed).digest()
        out.extend(seed)
    return bytes(out[: width * height])


def resize_images(
    media: DataFrame, width: int = 32, height: int = 32
) -> DataFrame:
    """Arrow-batched image resize over media payloads (mapInPandas).

    1-row-in/1-row-out transform: payload bytes are rewritten, typed
    dimensions attached. Partitioning note for 100 TB: payload-heavy
    stages inherit scan partitions (files.maxPartitionBytes); if source
    files hold many large payloads per row-group, repartition upstream
    so a batch of decoded images fits executor memory.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [resize_image_stub(p, width, height) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": resized,
                    "width": width,
                    "height": height,
                    "n_bytes": [len(b) for b in resized],
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_frames_total", T.IntegerType()),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 256, every_n: int = 10
) -> DataFrame:
    """Frame sampling for video payloads: 1 row in -> K rows out.

    STUB decoder: the payload is treated as a concatenation of
    fixed-size fake frames (a real deployment swaps in pyav/ffmpeg
    iteration); every_n-th frame is emitted as its own row. The 1->K
    expansion INSIDE mapInPandas is the scale-relevant shape: frames
    never materialize as a giant array column, batches stay
    Arrow-sized, and downstream per-frame operators (resize, feature
    extract) parallelize over frame rows, not video rows.
    """
    # guard driver-side (r15 battery): frame_bytes = 0 otherwise dies
    # in the worker with a bare ZeroDivisionError; every_n = 0 would
    # range-step-zero the same way
    if frame_bytes <= 0:
        raise ValueError(f"frame_bytes must be positive, got {frame_bytes}")
    if every_n <= 0:
        raise ValueError(f"every_n must be positive, got {every_n}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, totals = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                n_total = max(len(p) // frame_bytes, 1)
                for fi in range(0, n_total, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(bytes(p[fi * frame_bytes:(fi + 1) * frame_bytes]))
                    totals.append(n_total)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame": frames,
                    "n_frames_total": totals,
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Byte-level stats over binary payloads — pure built-ins, no
    decode: size, sha prefix, magic-byte hex. Useful for partition
    planning and corrupt-payload triage before any codec runs."""
    return media.select(
        "media_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.substring(F.col("meta.content_sha"), 1, 8).alias("sha_prefix"),
        F.hex(F.substring(F.col("payload"), 1, 4)).alias("magic_hex"),
    )


TRIAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("modality", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def media_triage(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(media_id, ok, modality, error) — the DECODABILITY gate.

    ``media_stats`` triages by bytes alone (size, magic), which cannot
    catch the corruption that actually kills a decode stage at corpus
    scale: a TRUNCATED payload behind a valid magic (partial upload,
    interrupted copy). The strict operators (``image_moments``,
    ``media_fingerprints``, ...) raise in-stage by documented contract
    — one such payload aborts the job. This operator ATTEMPTS the full
    decode per payload inside the stage and reports the outcome as a
    row instead: join its ``ok`` back to the media frame to quarantine
    undecodable assets before any strict stage runs.

    NULL payloads report ok=false (error 'null payload'), unknown
    magics ok=false with the magic in the error — nothing raises. At
    100 TB this is one Arrow-batched pass over the bytes (same single
    payload read as the strict stages) producing skinny audit rows;
    the quarantine join moves only (id, bool) columns."""
    # The id column passes through under its own name and type,
    # derived from the input schema (ADVICE r13: a hard-coded
    # long 'media_id' broke Arrow conversion for string-keyed or
    # renamed-id frames before the quarantine join could run).
    id_field = media.schema[id_col]
    schema = T.StructType(
        [T.StructField(id_field.name, id_field.dataType)]
        + [f for f in TRIAGE_SCHEMA.fields if f.name != "media_id"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, oks, mods, errs = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(mid)
                if payload is None:
                    oks.append(False)
                    mods.append(None)
                    errs.append("null payload")
                    continue
                p = bytes(payload)
                try:
                    if p[:2] in (b"P6", b"P5") or p[:2] == b"BM":
                        decode_image(p)
                        oks.append(True)
                        mods.append("image")
                        errs.append(None)
                    elif p[:4] == b"RIFF":
                        decode_wav(p)
                        oks.append(True)
                        mods.append("audio")
                        errs.append(None)
                    else:
                        oks.append(False)
                        mods.append(None)
                        errs.append(f"no codec for magic {p[:4]!r}")
                except Exception as e:  # report, never raise: the gate
                    oks.append(False)  # must survive what it triages
                    mods.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {id_col: ids, "ok": oks, "modality": mods, "error": errs}
            )

    return media.mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Perceptual fingerprints — near-duplicate detection for decoded media.
#
# Text near-dup has MinHash/SimHash/winnowing; the media twin is a
# 64-bit PERCEPTUAL hash per payload (dHash for images, an energy-
# gradient hash for audio), after which near-dup IS the SimHash
# problem: hamming-banded candidate join + exact bit_count verify —
# so the pair/gate machinery is reused from operators.dedup verbatim
# (bits=64), and a persisted (media_id, simhash) fingerprint frame can
# ride the same index_store lifecycle as the text SimHash family.
#
# Determinism doctrine: both hashes are EXACT integer functions of the
# decoded samples — luma/energy block sums as Python ints, block-mean
# comparisons by cross-multiplication (sum_l * n_r vs sum_r * n_l), no
# float anywhere — so the same payload hashes identically on every
# runtime, and the same pixels hash identically across container
# formats (PPM vs BMP of one image -> hamming 0 — pinned in tests).
# ---------------------------------------------------------------------------


def image_dhash(img, maxval: int = 255, grid: int = 8) -> int:
    """64-bit difference hash (dHash) of a decoded (H, W, C) image:
    integer luma (299R + 587G + 114B; a grayscale channel as-is),
    area block sums over a ``grid`` x ``grid``+1 cell lattice, bit
    (i, j) set iff cell (i, j)'s mean luma < cell (i, j+1)'s —
    brightness rising left-to-right. Row-gradient signs survive
    resizing, re-encoding, brightness/contrast scaling, and small
    local edits — the classic near-dup signal; ``maxval`` is accepted
    for decode_image call-site symmetry (gradient signs don't depend
    on sample scale). Images narrower/shorter than the lattice yield
    empty cells whose comparisons are deterministically 0 — thumbnails
    below 9x8 all hash near 0 and should be gated on size first.
    Returns a SIGNED int64 (two's complement) so the value lands in a
    Spark LongType and XOR/bit_count work on the raw 64-bit pattern."""
    import numpy as np

    h, w, c = img.shape
    px = img.astype(np.int64)
    if c >= 3:
        luma = 299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
    else:
        luma = px[:, :, 0]
    rows = [(i * h) // grid for i in range(grid + 1)]
    cols = [(j * w) // (grid + 1) for j in range(grid + 2)]
    code = 0
    for i in range(grid):
        r0, r1 = rows[i], rows[i + 1]
        for j in range(grid):
            c0, c1, c2 = cols[j], cols[j + 1], cols[j + 2]
            sum_l = int(luma[r0:r1, c0:c1].sum())
            sum_r = int(luma[r0:r1, c1:c2].sum())
            n_l = (r1 - r0) * (c1 - c0)
            n_r = (r1 - r0) * (c2 - c1)
            if sum_l * n_r < sum_r * n_l:  # mean_l < mean_r, exactly
                code |= 1 << (i * grid + j)
    return code - (1 << 64) if code >= 1 << 63 else code


def audio_energy_hash(frames, windows: int = 65) -> int:
    """64-bit energy-gradient hash of decoded PCM frames: channel-
    summed absolute amplitude (8-bit unsigned is re-biased at 128 per
    the WAV spec; 16-bit is already signed), ``windows`` equal-share
    time windows, bit i set iff window i's mean energy < window
    i+1's — loudness rising over time, the 1-D twin of ``image_dhash``
    and invariant to constant gain (integer-exact for integer gain).
    Clips shorter than ``windows`` frames yield empty windows whose
    comparisons are deterministically 0. Returns a signed int64."""
    import numpy as np

    x = frames.astype(np.int64)
    if np.issubdtype(frames.dtype, np.unsignedinteger):
        x = x - 128
    amp = np.abs(x).sum(axis=1)
    n = amp.shape[0]
    bounds = [(i * n) // windows for i in range(windows + 1)]
    code = 0
    for i in range(windows - 1):
        b0, b1, b2 = bounds[i], bounds[i + 1], bounds[i + 2]
        e_l, e_r = int(amp[b0:b1].sum()), int(amp[b1:b2].sum())
        if e_l * (b2 - b1) < e_r * (b1 - b0):
            code |= 1 << i
    return code - (1 << 64) if code >= 1 << 63 else code


FINGERPRINT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("simhash", T.LongType()),
    ]
)


def media_fingerprints(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(media_id, modality, simhash) perceptual fingerprints over
    binary payloads — magic-byte dispatch to the real codecs (P6/P5/BM
    -> ``image_dhash``; RIFF/WAVE -> ``audio_energy_hash``). The
    fingerprint column is named ``simhash`` deliberately: downstream
    pairing/gating IS ``operators.dedup``'s hamming-band machinery at
    bits=64, and a persisted fingerprint frame rides the same
    ``index_store`` lifecycle as the text SimHash family (one 16-byte
    row per asset). Payloads no codec handles raise in-stage, same
    contract as ``image_moments`` — gate with ``media_triage`` first
    (``media_stats`` covers byte-level triage only and cannot catch
    truncation behind a valid magic).

    At 100 TB: payload bytes are read exactly once, inside this one
    Arrow-batched stage; everything after (band join, verify,
    clustering, gate) moves only (id, int64) rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mods, hashes = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(payload)
                if p[:2] in (b"P6", b"P5") or p[:2] == b"BM":
                    img, maxval = decode_image(p)
                    mods.append("image")
                    hashes.append(image_dhash(img, maxval))
                elif p[:4] == b"RIFF":
                    frames, _rate = decode_wav(p)
                    mods.append("audio")
                    hashes.append(audio_energy_hash(frames))
                else:
                    raise ValueError(
                        f"no fingerprint codec for magic {p[:4]!r} "
                        f"(media_id={mid}); gate undecodable payloads "
                        "out with media_triage first"
                    )
                ids.append(mid)
            yield pd.DataFrame(
                {"media_id": ids, "modality": mods, "simhash": hashes}
            )

    return media.mapInPandas(run, FINGERPRINT_SCHEMA)


VIDEO_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ]
)


def video_frame_fingerprints(
    media: DataFrame,
    frame_bytes: int,
    every_n: int = 1,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(media_id, frame_idx, simhash) per-frame perceptual hashes for
    video payloads: ``sample_frames`` does the 1->K frame expansion
    (frames never materialize as a giant array column), then each
    sampled frame decodes through the real image codecs and hashes
    with ``image_dhash``. The container contract matches
    ``sample_frames``: the payload is a concatenation of fixed-size
    frames — here each frame must be a complete PPM/PGM/BMP of exactly
    ``frame_bytes`` bytes (uniform dims -> uniform size). A trailing
    partial frame is silently DROPPED by sample_frames' integer
    division (test-pinned); a payload smaller than one whole frame
    fails loud with the codec's truncation ValueError rather than
    hashing garbage. A real deployment swaps
    the ``sample_frames`` stub for pyav/ffmpeg iteration and keeps
    everything downstream unchanged — that is the point of the seam.

    At 100 TB: video bytes are read once; per-frame rows are
    (int64, int64, int64) — the frame-level index of the YT-style
    content-match pipeline."""
    frames = sample_frames(
        media.select(
            F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")
        ),
        frame_bytes=frame_bytes,
        every_n=every_n,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, fi, fr in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["frame"]
            ):
                img, maxval = decode_image(bytes(fr))
                ids.append(mid)
                idxs.append(fi)
                hashes.append(image_dhash(img, maxval))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "simhash": hashes}
            )

    return frames.mapInPandas(run, VIDEO_FP_SCHEMA)


def video_near_pairs(
    frame_fp: DataFrame,
    max_hamming: int = 6,
    min_frames: int = 2,
    bands: int | None = None,
    max_band_df: int | None = None,
    max_frames_per_video: int = 1 << 20,
) -> DataFrame:
    """(id_a, id_b, n_frame_matches) video near-dup pairs: two videos
    match when >= ``min_frames`` DISTINCT sampled-frame pairs agree
    within ``max_hamming`` — the frame-vote shape of content-match
    systems (a shared intro alone stays under the threshold; a
    re-encode matches on nearly every frame). Frames enter the SAME
    SimHash band join as everything else via a synthetic frame id
    ``media_id * max_frames_per_video + frame_idx`` (in-plan
    raise_error if a frame_idx ever reaches the cap — wrong pairs are
    worse than a failed job); within-video frame matches are filtered
    out, votes are counted as distinct (frame_a, frame_b) pairs.

    Scale shape: inherits the band join's properties (skinny int64
    rows, pigeonhole recall, optional ``max_band_df`` hub cap — near-
    static frames ARE hubs, cap them); the vote count is one
    map-side-combinable aggregation over id pairs."""
    from syncquill_spark.operators.dedup import simhash_pairs_from_fingerprints

    if max_frames_per_video < 1:
        # a parameter error knowable driver-side; the in-plan
        # raise_error below is reserved for genuine data overflow
        # (a frame_idx reaching a sane cap), not cap<=0 (r16 battery)
        raise ValueError(
            f"max_frames_per_video must be >= 1, got {max_frames_per_video}"
        )
    k = max_frames_per_video
    fid = frame_fp.select(
        F.when(
            F.col("frame_idx") < F.lit(k),
            F.col("media_id") * F.lit(k) + F.col("frame_idx"),
        )
        .otherwise(
            F.raise_error(
                F.lit(
                    f"frame_idx >= max_frames_per_video ({k}); raise the "
                    "cap or the synthetic frame ids collide"
                )
            ).cast("long")
        )
        .alias("fid"),
        "simhash",
    )
    pairs = simhash_pairs_from_fingerprints(
        fid,
        id_col="fid",
        bits=64,
        max_hamming=max_hamming,
        bands=bands,
        max_band_df=max_band_df,
    )
    va, vb = F.expr(f"id_a div {k}"), F.expr(f"id_b div {k}")
    return (
        pairs.filter(va != vb)
        .select(
            F.least(va, vb).alias("vid_a"),
            F.greatest(va, vb).alias("vid_b"),
            F.least(F.col("id_a"), F.col("id_b")).alias("_fa"),
            F.greatest(F.col("id_a"), F.col("id_b")).alias("_fb"),
        )
        .groupBy("vid_a", "vid_b")
        .agg(F.count_distinct("_fa", "_fb").cast("long").alias("n_frame_matches"))
        .filter(F.col("n_frame_matches") >= min_frames)
        .select(
            F.col("vid_a").alias("id_a"),
            F.col("vid_b").alias("id_b"),
            "n_frame_matches",
        )
    )


def media_near_pairs(
    fp: DataFrame,
    max_hamming: int = 6,
    bands: int | None = None,
    max_band_df: int | None = None,
) -> DataFrame:
    """(modality, id_a, id_b, hamming) near-duplicate media pairs from
    a (media_id, modality, simhash) fingerprint frame — the text
    SimHash band join (``simhash_pairs_from_fingerprints``, bits=64)
    run per modality so an image never pairs with an audio clip even
    on a 64-bit collision. Same recall contract: any pair within
    ``max_hamming`` shares at least one identical band (pigeonhole);
    ``max_band_df`` is the same hub-bucket insurance. Resolve pairs to
    clusters/survivors with ``operators.clusters`` exactly as for
    text."""
    from syncquill_spark.operators.dedup import simhash_pairs_from_fingerprints

    parts = [
        simhash_pairs_from_fingerprints(
            fp.filter(F.col("modality") == mod).select("media_id", "simhash"),
            id_col="media_id",
            bits=64,
            max_hamming=max_hamming,
            bands=bands,
            max_band_df=max_band_df,
        ).select(F.lit(mod).alias("modality"), "id_a", "id_b", "hamming")
        for mod in ("image", "audio")
    ]
    return parts[0].unionByName(parts[1])


def media_matches_against(
    fp_new: DataFrame,
    fp_corpus: DataFrame,
    max_hamming: int = 6,
    bands: int | None = None,
    max_band_df: int | None = None,
) -> DataFrame:
    """(modality, id_new, id_corpus, hamming) ingest-gate matches of a
    batch's media fingerprints against a (typically persisted) corpus
    fingerprint frame — ``simhash_matches_between`` per modality at
    bits=64. Inherits the gate==rebuild identity: with batch ids
    disjoint from corpus ids, output equals ``media_near_pairs`` over
    the union restricted to new x corpus (``max_band_df``, when set,
    must be applied over the union basis — handled inside)."""
    from syncquill_spark.operators.dedup import simhash_matches_between

    parts = [
        simhash_matches_between(
            fp_new.filter(F.col("modality") == mod).select(
                F.col("media_id").alias("id_new"), "simhash"
            ),
            fp_corpus.filter(F.col("modality") == mod).select(
                F.col("media_id").alias("id_corpus"), "simhash"
            ),
            bits=64,
            max_hamming=max_hamming,
            bands=bands,
            max_band_df=max_band_df,
        ).select(F.lit(mod).alias("modality"), "id_new", "id_corpus", "hamming")
        for mod in ("image", "audio")
    ]
    return parts[0].unionByName(parts[1])
