"""Vector similarity: brute-force exactness + LSH recall sanity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from syncquill_spark.operators.similarity import brute_force_topk, lsh_topk


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_self_is_rank_one(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = brute_force_topk(embeddings, queries, k=5)
    rank1 = {r["query_id"]: r["neighbor_id"] for r in top.filter("rk = 1").collect()}
    assert rank1 and all(q == n for q, n in rank1.items())


def test_topk_matches_numpy(spark, embeddings):
    import numpy as np

    pdf = embeddings.toPandas().sort_values("vec_id")
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    qidx = ids % 100 == 0
    qmat, qids = mat[qidx], ids[qidx]
    sims = (qmat @ mat.T) / (
        np.linalg.norm(qmat, axis=1)[:, None] * np.linalg.norm(mat, axis=1)[None, :]
    )
    queries = embeddings.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["rk"]): r["neighbor_id"]
        for r in brute_force_topk(embeddings, queries, k=3).collect()
    }
    for qi, qid in enumerate(qids):
        order = sorted(zip(-sims[qi], ids), key=lambda t: (t[0], t[1]))
        for rk in range(1, 4):
            assert got[(qid, rk)] == order[rk - 1][1]


def test_lsh_topk_is_subset_quality(spark, embeddings):
    """LSH neighbors must be real (cosine computed exactly); rank-1 for
    a query in the corpus is still itself (same bucket trivially)."""
    queries = embeddings.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = lsh_topk(embeddings, queries, k=5)
    rank1 = {r["query_id"]: r["neighbor_id"] for r in top.filter("rk = 1").collect()}
    assert rank1 and all(q == n for q, n in rank1.items())
