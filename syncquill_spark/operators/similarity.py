"""Vector similarity search over embedding columns (EXT tier).

- brute-force top-k cosine: broadcast the (small) query set against the
  full corpus; one pass, no shuffle of the corpus, window-ranked top-k.
  The verifiable baseline.
- LSH-bucketed variant (random hyperplane signs): corpus and queries
  hash to sign-pattern buckets; candidates only from matching buckets,
  then exact re-rank. The 100 TB path: bucket join instead of cross
  product. Hyperplanes are derived deterministically from md5 hashes so
  runs are reproducible (no RNG state).

All math is built-in higher-order functions (zip_with/aggregate) —
JVM codegen, no Python UDF, no Arrow transfer on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from syncquill_spark.functions.vectors import cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Broadcast-join the query set (must be small: k queries x corpus is
    the work, corpus never shuffles); rank per query with a window over
    the query partition; deterministic tie-break on neighbor id.
    Output: (query_id, neighbor_id, rk) — ints only, hash-stable.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
    scored = c.join(F.broadcast(q)).select(
        query_id_col,
        "neighbor_id",
        cosine_similarity(F.col("_qvec"), F.col("_cvec")).alias("_score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("_score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id_col, "neighbor_id", "rk")
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component j is
    derived from md5(plane_idx:j) mapped to [-1, 1). Reproducible across
    runs and languages (same recipe works in any engine)."""
    import hashlib

    comps = []
    for j in range(dim):
        h = int(hashlib.md5(f"{plane_idx}:{j}".encode()).hexdigest()[:15], 16)
        comps.append((h / float(2**60)) * 2.0 - 1.0)
    return comps


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: random-hyperplane sign bucket join + exact
    re-rank within candidates. Recall < 1 by construction (rows-only
    check; brute_force_topk is the oracle-checked baseline).
    """
    planes = [_hyperplane(dim, p) for p in range(n_planes)]

    def sig(vec):
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(x) for x in plane]),
                        lambda a, b: a.cast("double") * b,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                >= 0,
                F.lit(1),
            ).otherwise(F.lit(0))
            for plane in planes
        ]
        return F.concat_ws("", *[b.cast("string") for b in bits])

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        sig(F.col(vec_col)).alias("_bucket"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        sig(F.col(vec_col)).alias("_bucket"),
    )
    scored = c.join(F.broadcast(q), "_bucket").select(
        query_id_col,
        "neighbor_id",
        cosine_similarity(F.col("_qvec"), F.col("_cvec")).alias("_score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("_score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id_col, "neighbor_id", "rk")
    )
