"""Streaming ingest-time TEXT dedup against a static corpus index —
the exact-hash sibling of streaming/vector_dedup.py, for gating raw
document streams before anything expensive touches them.

Reference shape: /root/reference/syncquill.py has no streaming; this
is EXT-tier capability for the LLM-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_text_hash_index(
    corpus: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One-column (sha256 of text) distinct index of everything already
    kept. Fixed-width 64-hex keys — the index is content-size
    independent; production writes it to a table bucketed on the hash
    and unions in each accepted batch."""
    return corpus.select(F.sha2(F.col(text_col), 256).alias("_text_sha")).distinct()


def stream_drop_seen_text(
    stream: DataFrame, index: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Pass through only stream rows whose text was NOT already in the
    corpus: stream-static LEFT ANTI join on the content hash. No state
    store; each microbatch hashes its own rows once. (Duplicates
    WITHIN the stream are the separate dropDuplicatesWithinWatermark
    concern — this operator is the stream-vs-corpus gate.)"""
    hashed = stream.withColumn("_text_sha", F.sha2(F.col(text_col), 256))
    return hashed.join(index, "_text_sha", "left_anti").drop("_text_sha")
