"""Deduplication operators for LLM training-data pipelines (EXT tier).

Four strategies, all designed scale-first:

- exact: group on sha2(text) — fixed-width shuffle keys instead of
  full document bodies; one shuffle, map-side partial agg.
- n-gram Jaccard: exact pairwise verification within cheap blocking
  buckets (language + length band) — the verifiable reference path.
- MinHash + LSH: signature -> banded bucket join -> candidate pairs ->
  exact Jaccard verify. The 100 TB path: candidate generation touches
  only hash buckets (near-linear), never the O(n^2) pair space.
- SimHash: one 32-bit locality-sensitive fingerprint per doc; hamming
  distance on candidate pairs from identical high-bit prefixes.

Everything is built-in-function DataFrame code (no Python UDFs); all
hashes are md5-derived so DuckDB oracles reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.storagelevel import StorageLevel

from syncquill_spark.functions.hashing import (
    HASH_PRIME,
    minhash_from_hashes,
    shingle_hashes,
    simhash_from_hashes,
    token_hashes,
    word_shingles,
)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per distinct text; expose group size."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("_h"))
        .agg(
            F.min(id_col).alias(f"keeper_{id_col}"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("_h")
    )


def _tokens(text_col: str):
    return F.split(F.trim(F.col(text_col)), r"\s+")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    block_cols: tuple[str, ...] = ("lang",),
    length_band: int | None = 64,
    length_col: str = "n_chars",
) -> DataFrame:
    """Exact k-shingle Jaccard near-dup pairs within blocking buckets.

    Blocking (same lang + same length band) keeps the self-join from
    exploding: pairs are only generated inside buckets. At 100 TB the
    bucket self-join shuffles once on the block key; MinHash-LSH below
    replaces it when buckets are still too large.

    Output: (id_a, id_b, jac) with id_a < id_b, jac as double computed
    from exact integer set sizes (cross-engine stable).

    Physical strategy: a set-similarity join, NOT a bucket cross-join.
    Explode (doc, shingle), equi-join on (block, shingle), and count
    matches per pair — the intersection size. Pairs sharing zero
    shingles (jac = 0, the overwhelming majority of each bucket's
    O(c^2) pair space) never materialize, and the per-match work is one
    hash-join probe instead of an array_intersect over full documents.
    Union size follows from |A| + |B| - |A∩B|. Measured 9x faster than
    the array_intersect cross-join form at sf0.1 (with the zip_with
    shingler in functions.hashing), identical output.
    """
    sh = df.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        *( [ (F.col(length_col) / length_band).cast("long").alias("_band") ]
           if length_band else [] ),
        F.array_distinct(word_shingles(text_col, k)).alias("_sh"),
    ).select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        *( ["_band"] if length_band else [] ),
        F.size("_sh").alias("_n"),
        F.explode("_sh").alias("_s"),
    ).persist(StorageLevel.MEMORY_AND_DISK)  # feeds both join sides
    block = list(block_cols) + (["_band"] if length_band else [])
    a = sh.select(
        *[F.col(c).alias(f"_l_{c}") for c in block],
        F.col("_s").alias("_ls"),
        F.col(id_col).alias("id_a"),
        F.col("_n").alias("_na"),
    )
    b = sh.select(
        *[F.col(c).alias(f"_r_{c}") for c in block],
        F.col("_s").alias("_rs"),
        F.col(id_col).alias("id_b"),
        F.col("_n").alias("_nb"),
    )
    cond = (
        [a[f"_l_{c}"] == b[f"_r_{c}"] for c in block]
        + [a["_ls"] == b["_rs"], a["id_a"] < b["id_b"]]
    )
    inter = F.count(F.lit(1))
    return (
        a.join(b, cond)
        .groupBy("id_a", "id_b", "_na", "_nb")
        .agg(inter.alias("_i"))
        .select(
            "id_a",
            "id_b",
            (
                F.col("_i").cast("double")
                / (F.col("_na") + F.col("_nb") - F.col("_i")).cast("double")
            ).alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs with exact Jaccard verify.

    signature (n_perm mins) -> split into `bands` bands of n_perm/bands
    rows -> explode one row per (band_idx, band_key) -> self-join on the
    band bucket -> distinct candidate pairs -> verify with true shingle
    Jaccard >= threshold.

    Scale: the only joins are equi-joins on (band_idx, band_signature);
    candidate count ~ true-duplicate count, never O(n^2). Probability a
    pair at similarity s collides: 1-(1-s^r)^b with r = n_perm/bands.
    """
    assert n_perm % bands == 0, "bands must divide n_perm"
    r = n_perm // bands

    # Three projections, each materializing what the next references
    # many times: shingles -> hash array -> signature. Higher-order
    # exprs run interpreted, so letting the 32 permutations re-inline
    # the md5 pipeline costs 16x (see functions.hashing.shingle_hashes).
    base = (
        df.select(
            F.col(id_col),
            F.array_distinct(word_shingles(text_col, k)).alias("_sh"),
        )
        .withColumn("_h", shingle_hashes(F.col("_sh")))
        .select(
            id_col, "_sh", minhash_from_hashes(F.col("_h"), n_perm).alias("_sig")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)  # feeds both join sides
    )

    buckets = base.select(
        F.col(id_col),
        F.col("_sh"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.struct(
                    bi.alias("band"),
                    F.concat_ws(
                        ",", F.transform(F.slice("_sig", bi * r + 1, r), lambda v: v.cast("string"))
                    ).alias("key"),
                ),
            )
        ).alias("_b"),
    ).select(id_col, "_sh", F.col("_b.band").alias("_band"), F.col("_b.key").alias("_key"))

    left = buckets.select(
        F.col("_band").alias("_lb"), F.col("_key").alias("_lk"),
        F.col(id_col).alias("id_a"), F.col("_sh").alias("_sh_a"),
    )
    right = buckets.select(
        F.col("_band").alias("_rb"), F.col("_key").alias("_rk"),
        F.col(id_col).alias("id_b"), F.col("_sh").alias("_sh_b"),
    )
    cand = (
        left.join(
            right,
            (left["_lb"] == right["_rb"]) & (left["_lk"] == right["_rk"])
            & (left["id_a"] < right["id_b"]),
        )
        .select("id_a", "id_b", "_sh_a", "_sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("_sh_a", "_sh_b"))
    union = F.size(F.array_union("_sh_a", "_sh_b"))
    return (
        cand.select(
            "id_a", "id_b",
            (inter.cast("double") / union.cast("double")).alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
    )


def simhash_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """Per-document SimHash fingerprint (int64 carrying `bits` bits)."""
    return df.select(
        F.col(id_col), token_hashes(_tokens(text_col)).alias("_h")
    ).select(
        F.col(id_col),
        simhash_from_hashes(F.col("_h"), bits).alias("simhash"),
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
    prefix_bits: int = 8,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on the high
    `prefix_bits` of the fingerprint (identical prefix => candidate).

    Scale note: single-prefix blocking misses pairs that differ inside
    the prefix; production recall uses the standard trick of joining on
    each of C(bands) rotated prefixes. One block keeps the oracle SQL
    tractable; recall/cost is tunable via prefix_bits.
    """
    fp = simhash_fingerprints(df, id_col, text_col, bits)
    pre = fp.withColumn(
        "_pre", F.shiftright(F.col("simhash"), bits - prefix_bits)
    ).persist(StorageLevel.MEMORY_AND_DISK)  # feeds both join sides
    a = pre.select(
        F.col("_pre").alias("_pa"), F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a")
    )
    b = pre.select(
        F.col("_pre").alias("_pb"), F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b")
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, (a["_pa"] == b["_pb"]) & (a["id_a"] < b["id_b"]))
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
