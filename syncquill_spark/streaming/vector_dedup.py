"""Streaming ingest-time vector dedup: a stream of embeddings checked
against a STATIC corpus signature index — the readStream form of
operators/similarity.embedding_near_dup_against (same quantized-int64
band keys, same exact-integer verify), for pipelines that gate
documents at ingest instead of in nightly batches.

Scale shape: the corpus index is built ONCE (one signature pass,
persisted / written to a table); each microbatch computes signatures
only for its own rows, equi-joins the index on (band, key) — a
stream-static join, no state store for candidate generation — and
verifies candidates with the exact integer dot. The stream never sees
the O(|stream| x |corpus|) pair space.

Reference shape: /root/reference/syncquill.py has no streaming (the
whole reference is a batch sync script); this is EXT-tier capability
mandated by the LLM-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from syncquill_spark.operators.similarity import (
    _make_sig_udf,
    _dotq,
    _q_cos_ge,
    _sig_frame,
)


def build_embedding_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 4,
    planes_per_band: int = 4,
    dim: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """One-time corpus signature index for streaming dedup:
    (keys, vecs) where keys = (corpus_id, band, key) for the bucket
    join and vecs = (corpus_id, q, n2) for the verify. Both derive
    from ONE persisted signature pass (_sig_frame); a production
    pipeline writes them to tables partitioned/bucketed by (band, key)
    and corpus_id respectively and refreshes on corpus growth."""
    base = _sig_frame(corpus, id_col, vec_col, bands, planes_per_band, dim)
    keys = base.select(
        F.col(id_col).alias("corpus_id"),
        F.posexplode("_keys").alias("_band", "_key"),
    )
    vecs = base.select(
        F.col(id_col).alias("corpus_id"),
        F.col("_q").alias("_qc"),
        F.col("_n2").alias("_nc"),
    )
    return keys, vecs


def stream_embedding_near_dups(
    stream: DataFrame,
    index_keys: DataFrame,
    index_vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    bands: int = 4,
    planes_per_band: int = 4,
    dim: int = 64,
) -> DataFrame:
    """(stream_id, corpus_id) matches: streamed vectors whose band keys
    collide with the corpus index and whose exact quantized cosine
    clears the threshold.

    The signature kernel is marked nondeterministic ON THE STREAM SIDE
    only: Catalyst may not then duplicate the ArrowEvalPython node to
    satisfy pushed-down join-key predicates (the batch operators use a
    persist as that barrier — a streaming frame cannot be persisted).
    The kernel is in fact deterministic, so results are unchanged; the
    marking only pins evaluate-once placement.

    Matches are per-band candidates verified once each; a pair that
    collides in several bands emits once per colliding band within the
    batch — dedupe downstream per batch (foreachBatch dropDuplicates)
    or accept the multiplicity in the audit sink. A stateful global
    dropDuplicates here would grow state unboundedly on an unbounded
    stream; with an event-time column, use
    dropDuplicatesWithinWatermark instead.
    """
    sig = _make_sig_udf(bands, planes_per_band, dim).asNondeterministic()
    s = (
        stream.select(
            F.col(id_col).alias("stream_id"), sig(F.col(vec_col)).alias("_s")
        )
        .select(
            "stream_id",
            F.col("_s.q").alias("_qs"),
            F.col("_s.n2").alias("_ns"),
            F.posexplode("_s.keys").alias("_band", "_key"),
        )
    )
    cand = s.join(index_keys, ["_band", "_key"]).select(
        "stream_id", "corpus_id", "_qs", "_ns"
    )
    return (
        cand.join(index_vecs, "corpus_id")
        .filter(
            _q_cos_ge(
                _dotq(F.col("_qs"), F.col("_qc")),
                F.col("_ns"),
                F.col("_nc"),
                threshold,
            )
        )
        .select("stream_id", "corpus_id")
    )
