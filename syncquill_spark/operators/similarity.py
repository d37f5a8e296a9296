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
from pyspark.storagelevel import StorageLevel
from pyspark.sql import functions as F

from syncquill_spark.functions.vectors import cosine_similarity, dot, l2_norm


def _spread(df: DataFrame) -> DataFrame:
    """Ensure the O(|corpus| x |queries|) scoring projection downstream
    runs on every core: a small/medium corpus read from one parquet
    file is one input split, so the hot fold would run single-task
    (benched 6.4x slower at sf0.1). Repartition ONLY when the plan is
    under-split — at real scale a 100 TB corpus already spans thousands
    of 128 MB splits and this is a no-op (no gratuitous payload
    shuffle). round-robin repartition; downstream ranking is
    order-insensitive (deterministic tie-breaks), so output is
    bit-identical either way.
    """
    spark = df.sparkSession
    # Target: at least the session's shuffle width; defaultParallelism
    # alone under-counts on a dynamically-allocated cluster (it sees
    # only executors registered at plan time). The conf may hold a
    # non-numeric value on some runtimes (e.g. "auto") — fall back to
    # the stock 200 rather than crash every similarity operator.
    try:
        target = int(spark.conf.get("spark.sql.shuffle.partitions", "200") or 200)
    except (TypeError, ValueError):
        target = 200
    try:
        target = max(target, spark.sparkContext.defaultParallelism)
    except Exception:  # Spark Connect client: no sparkContext
        pass
    try:
        # First probe: file count. Listing is already cached on the
        # scan relation (no job, no physical planning) and it LOWER-
        # bounds the split count, so `>= target` here proves the scan
        # is well-split without touching the RDD path.
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    try:
        # Few/no files: confirm with the exact split count before
        # paying a repartition (a handful of >maxPartitionBytes files
        # still yields many splits). Cheap in classic Spark (physical
        # planning of a scan+project); unsupported under Spark Connect,
        # where the file-count verdict above stands (worst case: a
        # redundant — but harmless — repartition).
        n_splits = df.rdd.getNumPartitions()
    except Exception:
        n_splits = n_files
    if n_splits < target:
        return df.repartition(target)
    return df


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
    c = _spread(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
    )
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


def _plane_matrix(bands: int, planes_per_band: int, dim: int):
    """All `bands * planes_per_band` hyperplanes as ONE nested-array
    literal (array<array<double>>). A single Literal node instead of
    one 64-element CreateArray per plane: the per-plane formulation
    built a ~16x64-node expression tree whose Catalyst analysis +
    optimization + codegen dominated the whole query at fixture scale
    (measured: ~40% of dedup_embedding_incremental's wall time was
    plan handling, not data). Values are identical — only the literal
    representation changed."""
    return F.lit(
        [
            _hyperplane(dim, b * planes_per_band + p)
            for b in range(bands)
            for p in range(planes_per_band)
        ]
    )


def _sig_frame(
    src: DataFrame,
    id_col: str,
    vec_col: str,
    bands: int,
    planes_per_band: int,
    dim: int,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *extra_cols, _u, _bk) — per vector, its unit-normalized
    form and its `bands` band keys (struct<band,key>, key = sign
    pattern of the band's md5-derived hyperplane dots) — computed in
    ONE pass over the source and persisted ONCE.

    The previous split (a persisted band-key frame + a persisted
    unit-vector frame) scanned the source twice and ran the plane
    folds and the norm fold in separate cached plans; fusing them
    halves the scan count and drops one cache. Callers explode `_bk`
    AFTER the cache, so the candidate bucket join still shuffles only
    (id, band, key) — never the vector payload.

    All dots fold left-to-right over dimension order (zip_with +
    aggregate, same accumulation order as the per-plane form), so band
    keys and verify scores stay bit-identical to the DuckDB oracle.

    Persist lifecycle: scoped to the returned plan; callers that run
    many operators in one session reclaim it with
    ``spark.catalog.clearCache()`` (the bench does this per query).

    NOTE: the lambda folds run interpreted, but an explicit 64-term
    element_at sum chain is ~7x WORSE (giant expression trees choke
    optimizer + codegen) — measured, don't revisit.
    """
    mat = _plane_matrix(bands, planes_per_band, dim)
    vec = F.col(vec_col)
    dots = F.transform(
        mat,
        lambda p: F.aggregate(
            F.zip_with(vec, p, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    bits = F.transform(
        dots, lambda d: F.when(d >= 0, F.lit("1")).otherwise(F.lit("0"))
    )
    keys = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda bi: F.struct(
            bi.alias("band"),
            F.array_join(
                F.slice(bits, bi * planes_per_band + 1, planes_per_band), ""
            ).alias("key"),
        ),
    )
    # Norm in its own projection: a lambda referencing l2_norm(vec)
    # directly would re-fold the vector PER ELEMENT once
    # CollapseProject inlines it.
    return (
        src.select(
            F.col(id_col),
            *[F.col(c) for c in extra_cols],
            F.col(vec_col).alias("_v"),
            l2_norm(F.col(vec_col)).alias("_nrm"),
            keys.alias("_bk"),
        )
        .select(
            F.col(id_col),
            *extra_cols,
            F.transform(F.col("_v"), lambda x: x.cast("double") / F.col("_nrm")).alias("_u"),
            "_bk",
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    bands: int = 4,
    planes_per_band: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup over a vector
    column): banded random-hyperplane blocking + exact cosine verify.

    Each vector gets `bands` bucket keys (one per band, each the sign
    pattern of `planes_per_band` hyperplane dots); a pair is a
    candidate if ANY band key matches (OR-construction — recall
    1-(1-p^r)^b for per-plane agreement p). Candidates self-join on
    (band, key) only — never the O(n^2) pair space — then exact cosine
    >= threshold verifies. Hyperplanes are md5-derived (deterministic,
    reproducible in any engine); all math is codegen built-ins folding
    left-to-right, so scores are bit-identical to the DuckDB oracle.

    Output: (id_a, id_b) int pairs with id_a < id_b, hash-stable.
    """
    # Bucket self-join carries IDS ONLY (the candidate shuffle is two
    # ints per row, not two embedding payloads); vectors re-attach for
    # verification from the same persisted frame (_bk exploded after
    # the cache).
    # _spread: the interpreted plane-folds are the hot compute; an
    # under-split corpus (one parquet file = one task) would run them
    # on a single core.
    src = _spread(corpus.select(F.col(id_col), F.col(vec_col)))
    base = _sig_frame(src, id_col, vec_col, bands, planes_per_band, dim)
    keyed = base.select(F.col(id_col), F.explode("_bk").alias("_b")).select(
        id_col,
        F.col("_b.band").alias("_band"),
        F.col("_b.key").alias("_key"),
    )
    a = keyed.select(
        F.col("_band").alias("_ba"), F.col("_key").alias("_ka"),
        F.col(id_col).alias("id_a"),
    )
    b = keyed.select(
        F.col("_band").alias("_bb"), F.col("_key").alias("_kb"),
        F.col(id_col).alias("id_b"),
    )
    cand = (
        a.join(
            b,
            (a["_ba"] == b["_bb"]) & (a["_ka"] == b["_kb"]) & (a["id_a"] < b["id_b"]),
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    u_a = base.select(F.col(id_col).alias("_ia"), F.col("_u").alias("_ua"))
    u_b = base.select(F.col(id_col).alias("_ib"), F.col("_u").alias("_ub"))
    return (
        cand.join(u_a, F.col("id_a") == F.col("_ia"))
        .join(u_b, F.col("id_b") == F.col("_ib"))
        .filter(dot(F.col("_ua"), F.col("_ub")) >= threshold)
        .select("id_a", "id_b")
    )


def embedding_near_dup_against(
    new: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    bands: int = 4,
    planes_per_band: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Incremental (cross-corpus) embedding near-dup: NEW vectors whose
    band keys collide with the EXISTING corpus, verified by exact
    cosine — the ingest-time vector-dedup shape (a fresh batch of
    embeddings checked against everything already kept; only the new
    side is small). No corpus self-pairs, no new self-pairs.

    Same blocking machinery as embedding_near_dup_pairs (md5-derived
    hyperplanes, sign-pattern band keys, ids-only candidate shuffle)
    but the bucket join is new-side x corpus-side only. Band keys AND
    unit vectors are computed over the TAGGED UNION in one fused pass
    (one generated plan, one persist — separate per-side or per-frame
    plans compiled the same 16-fold expression tree several times and
    doubled plan-compile latency); a production pipeline instead
    persists the corpus's band keys as an index and computes only the
    new side per batch — the join shape (equi-join on (band, key)) is
    identical.

    Output: (id_new, id_corpus) int pairs, hash-stable.
    """
    tagged = _spread(
        new.select(F.col(id_col), F.col(vec_col), F.lit("n").alias("_side")).unionByName(
            corpus.select(F.col(id_col), F.col(vec_col), F.lit("c").alias("_side"))
        )
    )
    base = _sig_frame(
        tagged, id_col, vec_col, bands, planes_per_band, dim, extra_cols=("_side",)
    )
    keyed = base.select(
        F.col(id_col), F.col("_side"), F.explode("_bk").alias("_b")
    ).select(
        id_col,
        "_side",
        F.col("_b.band").alias("_band"),
        F.col("_b.key").alias("_key"),
    )
    # The ingest premise — a bounded new batch against an unbounded
    # corpus — makes every new-side frame legitimately broadcastable:
    # with explicit hints, the corpus side NEVER exchanges (its band
    # keys stream through a broadcast-hash join; its unit vectors
    # stream through the final verify join). The only shuffle left is
    # the candidate-id dropDuplicates — skinny int pairs.
    left = keyed.filter(F.col("_side") == "n").select(
        F.col("_band").alias("_lb"), F.col("_key").alias("_lk"),
        F.col(id_col).alias("id_new"),
    )
    right = keyed.filter(F.col("_side") == "c").select(
        F.col("_band").alias("_rb"), F.col("_key").alias("_rk"),
        F.col(id_col).alias("id_corpus"),
    )
    cand = (
        right.join(
            F.broadcast(left),
            (left["_lb"] == right["_rb"]) & (left["_lk"] == right["_rk"])
            & (left["id_new"] != right["id_corpus"]),
        )
        .select("id_new", "id_corpus")
        .dropDuplicates(["id_new", "id_corpus"])
    )
    u_n = base.filter(F.col("_side") == "n").select(
        F.col(id_col).alias("_ia"), F.col("_u").alias("_ua")
    )
    u_c = base.filter(F.col("_side") == "c").select(
        F.col(id_col).alias("_ib"), F.col("_u").alias("_ub")
    )
    # candidates (with the new-side vector attached) are new-batch-
    # bounded too -> broadcast them INTO the corpus unit-vector side.
    cand_n = cand.join(F.broadcast(u_n), F.col("id_new") == F.col("_ia"))
    return (
        u_c.join(F.broadcast(cand_n), F.col("id_corpus") == F.col("_ib"))
        .filter(dot(F.col("_ua"), F.col("_ub")) >= threshold)
        .select("id_new", "id_corpus")
    )


#: Centroid components are quantized to 1e-6 before averaging so the
#: per-cell mean is an exact int64 sum — order-independent, hence
#: bit-identical across engines (a double sum's value depends on
#: accumulation order, which Spark does not guarantee across shuffles).
LLOYD_SCALE = 1_000_000


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    refine_iters: int = 0,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index — the
    partition-and-probe scale path alongside `lsh_topk`.

    1. **Centroids**: the `n_cells` corpus vectors with the smallest
       `md5(id)` — a deterministic uniform sample (md5 order is
       uncorrelated with id order), reproducible in any engine with no
       RNG state and no iterative k-means. Unit-normalized so cell
       scores are one dot product each.
    2. **Assign**: every corpus vector goes to its max-cosine cell
       (argmax over `n_cells` dots; on unit centroids argmax dot ==
       argmax cosine, so the corpus-side norm fold is skipped).
    3. **Probe**: each query scores the same centroid set and keeps its
       `nprobe` best cells; candidates are corpus rows in probed cells
       only — the cross product never materializes.
    4. **Verify**: exact cosine re-rank within candidates, window
       top-k per query. Same fold math as `brute_force_topk`, so scores
       are bit-identical to the DuckDB oracle.

    Scale shape: centroids are O(n_cells·dim) — broadcast; assignment
    is one broadcast nested-loop pass (no corpus shuffle) + a skinny
    (id, cell, score) argmax agg; the candidate join is an equi-join on
    cell_id (AQE handles fat cells). At 1000-executor scale you would
    additionally collect the centroid table into literal arrays to fold
    assignment into a single zero-shuffle projection — kept in-plan
    here so the whole query (centroid choice included) stays
    declarative and oracle-checkable at any scale factor.

    ``refine_iters`` runs that many spherical-k-means (Lloyd)
    refinement passes over the sampled centroids before the final
    assignment: assign -> per-cell mean of UNIT corpus vectors ->
    renormalize. Better-balanced cells on skewed corpora => better
    recall at equal nprobe. Deterministic and oracle-exact: the mean
    uses LLOYD_SCALE-quantized int64 component sums (order-independent
    exact arithmetic, floor(x*S + 0.5) half-up — round() tie rules
    differ across engines), and a cell that loses all its vectors (or
    degenerates to a zero mean) keeps its previous centroid. Each
    iteration costs one broadcast assignment pass + one skinny
    (cell, pos) aggregation — no corpus shuffle.

    Output: (query_id, neighbor_id, rk) — ints only, hash-stable.
    """
    # Deterministic "sample without replacement": total order by
    # (md5(id), id), take n_cells. orderBy+limit is TakeOrdered — a
    # distributed partial top-k, not a global sort.
    hashed = corpus.select(
        F.col(id_col), F.col(vec_col).alias("_cv"),
        F.md5(F.col(id_col).cast("string")).alias("_h"),
    )
    cents0 = hashed.orderBy("_h", id_col).limit(n_cells)
    w_cells = Window.orderBy("_h", id_col)  # n_cells rows — single partition is fine
    cents = (
        cents0.withColumn("cell_id", F.row_number().over(w_cells))
        .withColumn("_nrm", l2_norm(F.col("_cv")))
        .select(
            "cell_id",
            F.transform(F.col("_cv"), lambda x: x.cast("double") / F.col("_nrm")).alias("_ucv"),
        )
    )

    if refine_iters > 0:
        # unit corpus vectors once; reused by every Lloyd pass
        u = corpus.select(
            F.col(id_col), F.col(vec_col).alias("_v"), l2_norm(F.col(vec_col)).alias("_unrm")
        ).select(
            F.col(id_col),
            F.transform(F.col("_v"), lambda x: x.cast("double") / F.col("_unrm")).alias("_u"),
        )
    for _ in range(refine_iters):
        w_assign = Window.partitionBy(id_col).orderBy(
            F.col("_cs").desc(), F.col("cell_id").asc()
        )
        assigned_u = (
            u.join(F.broadcast(cents))
            .select(id_col, "cell_id", "_u", dot(F.col("_u"), F.col("_ucv")).alias("_cs"))
            .withColumn("_rn", F.row_number().over(w_assign))
            .filter(F.col("_rn") == 1)
        )
        sums = (
            assigned_u.select("cell_id", F.posexplode("_u").alias("_pos", "_x"))
            .groupBy("cell_id", "_pos")
            .agg(
                F.sum(
                    F.floor(F.col("_x") * LLOYD_SCALE + F.lit(0.5)).cast("long")
                ).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
        )
        means = (
            sums.select(
                "cell_id",
                "_pos",
                (
                    F.col("_s").cast("double")
                    / (F.col("_n") * F.lit(float(LLOYD_SCALE)))
                ).alias("_m"),
            )
            .groupBy("cell_id")
            .agg(F.array_sort(F.collect_list(F.struct("_pos", "_m"))).alias("_pm"))
            .select("cell_id", F.transform(F.col("_pm"), lambda s: s["_m"]).alias("_mv"))
        )
        new_cents = means.select(
            "cell_id", F.col("_mv"), l2_norm(F.col("_mv")).alias("_mnrm")
        ).select(
            "cell_id",
            F.when(
                F.col("_mnrm") > 0,
                F.transform(F.col("_mv"), lambda x: x / F.col("_mnrm")),
            ).alias("_ucv_new"),
        )
        # persist: `cents` is n_cells rows but its lineage is a full
        # corpus assignment pass; it is consumed by the NEXT iteration
        # AND broadcast twice downstream (corpus assign + query probe)
        # — unpersisted, each consumer re-runs the whole Lloyd subtree.
        # Materialize eagerly (count on n_cells rows) so the previous
        # iteration's cache can be RELEASED immediately: without this,
        # n_iter cached frames accumulated per call (and the lazy
        # persist could be computed concurrently by its first two
        # consumers).
        prev_cents = cents
        cents = (
            cents.join(new_cents, "cell_id", "left")
            .select("cell_id", F.coalesce("_ucv_new", "_ucv").alias("_ucv"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        cents.count()
        if prev_cents.is_cached:
            prev_cents.unpersist()

    def best_cells(side: DataFrame, side_id: str, n: int) -> DataFrame:
        """Per row of `side`: its `n` highest-dot cells (ties → lower
        cell_id). Broadcast NL join against the tiny centroid table."""
        scored = side.join(F.broadcast(cents)).select(
            side_id,
            "cell_id",
            F.col(vec_col).alias(vec_col),
            dot(F.col(vec_col), F.col("_ucv")).alias("_cs"),
        )
        w = Window.partitionBy(side_id).orderBy(
            F.col("_cs").desc(), F.col("cell_id").asc()
        )
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .select(side_id, "cell_id", vec_col)
        )

    assigned = best_cells(
        _spread(corpus.select(F.col(id_col).alias("neighbor_id"), vec_col)),
        "neighbor_id",
        1,
    ).withColumnRenamed(vec_col, "_cvec")
    probed = best_cells(
        queries.select(query_id_col, vec_col), query_id_col, nprobe
    ).withColumnRenamed(vec_col, "_qvec")

    scored = assigned.join(F.broadcast(probed), "cell_id").select(
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
    # One nested-array literal for all planes + one transform fold —
    # same values as the per-plane formulation, ~n_planes x smaller
    # expression tree (see _plane_matrix).
    mat = _plane_matrix(1, n_planes, dim)

    def sig(vec):
        dots = F.transform(
            mat,
            lambda p: F.aggregate(
                F.zip_with(vec, p, lambda a, b: a.cast("double") * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        return F.array_join(
            F.transform(
                dots, lambda d: F.when(d >= 0, F.lit("1")).otherwise(F.lit("0"))
            ),
            "",
        )

    c = _spread(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
    ).withColumn("_bucket", sig(F.col("_cvec")))
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


def label_centroid_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Exact per-(label, dimension) centroid statistics:
    (label, pos, sum_q, n_vecs) — all integers.

    Components are LLOYD_SCALE-quantized to int64 (floor(x*S + 0.5))
    and summed as exact integers, so the result is order-independent
    and engine-exact (same determinism trick as the Lloyd refinement
    above). This all-scalar, all-integer frame is the cross-engine
    CHECKED shape: the repo's hash-robustness policy (plans/queries.py)
    bans both raw doubles and array columns from checked outputs, and
    the mean (one division) is recoverable as sum_q / (n_vecs * S).

    Scale shape: posexplode -> one (label, dim) groupBy with map-side
    combine; shuffle rows = |labels| x dim, independent of corpus size.
    """
    pos = df.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "_x")
    )
    q = F.floor(F.col("_x").cast("double") * LLOYD_SCALE + F.lit(0.5)).cast("long")
    return (
        pos.withColumn("_q", q)
        .groupBy(label_col, "pos")
        .agg(F.sum("_q").alias("sum_q"), F.count(F.lit(1)).alias("n_vecs"))
    )


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label mean vector: (label, centroid array<double>, n_vecs).

    Class centroids for embedding spaces (cluster summaries, nearest-
    centroid classification, per-class drift monitoring). Built on
    label_centroid_stats (exact integer sums), divided back once and
    reassembled per label ordered by dimension.
    """
    per_dim = label_centroid_stats(df, vec_col, label_col).withColumn(
        "_m",
        F.col("sum_q").cast("double") / (F.col("n_vecs") * F.lit(float(LLOYD_SCALE))),
    )
    return per_dim.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("pos").alias("_p"), "_m"))),
            lambda s: s["_m"],
        ).alias("centroid"),
        F.max("n_vecs").alias("n_vecs"),
    )


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """k-NN majority-vote label prediction — the classification
    application of the similarity stack (auto-labeling a small curated
    query set from a labeled corpus, e.g. topic/quality propagation in
    a training-data pipeline).

    Neighbors come from brute_force_topk (exact, broadcast queries, no
    corpus shuffle); labels re-attach by neighbor id; the winning label
    per query is the one with the most votes among the k neighbors,
    ties broken by best (lowest) neighbor rank, then smallest label —
    fully deterministic, int-only output.

    Scale shape: the only shuffles are the skinny (query_id,
    neighbor_id, rk) frames — k rows per query; corpus labels join by
    equi-key. Output: (query_id, predicted_label, n_votes).
    """
    nn = brute_force_topk(
        corpus, queries, k=k, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col,
    )
    labeled = nn.join(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(label_col)),
        "neighbor_id",
    )
    votes = labeled.groupBy(query_id_col, label_col).agg(
        F.count(F.lit(1)).alias("n_votes"), F.min("rk").alias("_best_rk")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("n_votes").desc(), F.col("_best_rk").asc(), F.col(label_col).asc()
    )
    return (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            query_id_col,
            F.col(label_col).alias("predicted_label"),
            "n_votes",
        )
    )


def assign_nearest_centroid(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Assign every vector to its nearest label centroid (squared-L2);
    nearest-centroid classification / cluster-coherence audit: the
    output says, for each vector, which label's mean it actually sits
    closest to.

    Determinism: centroid means are exact rationals sum_q/(n*S) from
    label_centroid_stats, materialized as doubles identically in any
    engine (single int64->double division); the distance is a LEFT
    fold over dimension order (zip_with + aggregate), so both engines
    accumulate in the same order and produce bit-identical doubles —
    argmin (ties -> smallest label) is then engine-exact.

    Scale shape: the centroid table is |labels| rows — broadcast; the
    corpus never shuffles (one projection + broadcast join + window
    over |labels| rows per vector... the argmin is a groupBy on
    id_col, shuffling |corpus| x |labels| skinny (id, label, dist)
    rows; for large label spaces switch to a min_by aggregation,
    which this uses, keeping one row per vector after the map-side
    combine).

    Output: (vec_id, nearest_label) — ints only, hash-stable.
    """
    stats = label_centroid_stats(corpus, vec_col=vec_col, label_col=label_col)
    centroids = stats.groupBy(label_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("pos").alias("_p"),
                        (
                            F.col("sum_q").cast("double")
                            / (F.col("n_vecs") * F.lit(float(LLOYD_SCALE)))
                        ).alias("_m"),
                    )
                )
            ),
            lambda s: s["_m"],
        ).alias("_c")
    ).select(F.col(label_col).alias("_clabel"), "_c")
    scored = corpus.select(F.col(id_col), F.col(vec_col).alias("_v")).join(
        F.broadcast(centroids)
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("_v"),
            F.col("_c"),
            lambda x, m: (x.cast("double") - m) * (x.cast("double") - m),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        scored.select(F.col(id_col), F.col("_clabel"), d2.alias("_d2"))
        .groupBy(id_col)
        .agg(
            F.min_by(
                F.col("_clabel"), F.struct(F.col("_d2"), F.col("_clabel"))
            ).alias("nearest_label")
        )
    )
