"""Multimodal column operators (EXT tier).

Non-text payloads are opaque ``binary`` columns plus a typed metadata
struct — the lakehouse-native layout for image/audio/video at 100 TB
(payload bytes stay columnar in parquet; metadata prunes without
touching them). Decode / feature-extraction run as Arrow-batched
``mapInPandas`` stages: the Spark-side plumbing (schemas, batch
iteration, partition sizing) is real and tested; the codec call itself
is stubbed behind ``decode_image_stub`` because no image/audio libs
exist in this container — swap in PIL/torchaudio per modality.
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
    """STUB decode+featurize: no image codecs in this container.

    Deterministic fake: md5-seeded pseudo-features in [0,1). A real
    deployment replaces the body with e.g. PIL.Image.open + resize +
    channel means — the mapInPandas plumbing around it is unchanged.
    """
    h = hashlib.md5(payload).digest()
    return [h[i % 16] / 255.0 for i in range(dim)]


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
