"""Scaling probe: do the dedup-family operators scale ~linearly in
corpus size, as SCALE.md claims?

Builds m x replicas of the sf documents table (doc_ids shifted; every
token suffixed with a per-replica tag so replicas are NOT near-dups of
each other — cross-replica candidate pairs would otherwise grow
quadratically and measure the duplicate structure, not the engine).
Within each replica the near-dup structure mirrors the original, so
pair counts and work should grow ~m; wall time growing ~m is the
pass signal.

Usage: python tools/scale_probe.py [sf_dir] [m ...]
Prints one line per (operator, m): seconds, output rows, rows/sec.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from syncquill_spark import get_spark  # noqa: E402
from syncquill_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)

ID_OFFSET = 10_000_000


def scaled_corpus(spark, sf_dir: str, m: int) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reps = []
    for r in range(m):
        rep = docs.select(
            (F.col("doc_id") + r * ID_OFFSET).alias("doc_id"),
            # suffix every token for r > 0: replicas share no shingles
            # with the base corpus, so near-dup structure is per-replica
            (
                F.col("text")
                if r == 0
                else F.regexp_replace(F.col("text"), r"(\S+)", rf"$1_x{r}")
            ).alias("text"),
            "lang",
            "source",
        )
        reps.append(rep)
    out = reps[0]
    for rep in reps[1:]:
        out = out.unionByName(rep)
    return out.withColumn("n_chars", F.length("text"))


def probe(name, fn, corpus) -> tuple[float, int]:
    # Same isolation discipline as bench.py: drop the persisted frames
    # each operator scopes to its own run (they can't unpersist them —
    # the returned DataFrame still depends on them lazily) and nudge
    # the ContextCleaner, whose broadcast/shuffle cleanup only runs on
    # driver GC. Without this, leftovers tax later probes with
    # GC/spill and the measurement reads as superlinear scaling.
    spark = corpus.sparkSession
    cached = corpus.storageLevel.useMemory or corpus.storageLevel.useDisk
    spark.catalog.clearCache()
    if cached:
        corpus.persist()
        corpus.count()
    spark.sparkContext._jvm.System.gc()
    t0 = time.time()
    n = fn(corpus).count()
    return time.time() - t0, n


OPS = {
    "exact_dedup": lambda c: exact_dedup(c),
    "ngram_jaccard": lambda c: ngram_jaccard_pairs(
        c, k=3, threshold=0.2, block_cols=("lang",), length_band=64
    ),
    "minhash_lsh": lambda c: minhash_lsh_pairs(c, k=3, threshold=0.2),
    "simhash_pairs": lambda c: simhash_near_pairs(c),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ms = [int(a) for a in sys.argv[2:]] or [1, 2, 4]
    spark = get_spark("scale-probe")
    for m in ms:
        corpus = scaled_corpus(spark, sf_dir, m).persist()
        n_docs = corpus.count()
        for name, fn in OPS.items():
            sec, rows = probe(name, fn, corpus)
            print(
                f"{name} m={m} docs={n_docs} rows={rows} "
                f"sec={sec:.2f} docs_per_sec={n_docs / sec:.0f}",
                flush=True,
            )
        corpus.unpersist()


if __name__ == "__main__":
    main()
