"""The r12 64x scale ladder — reproduces every round-12 SCALE.md
table (r11 verdict #7 and the follow-ups it triggered).

Reuses scale_probe's corpus/embedding replication and measurement
discipline (clearCache + driver GC per probe, per-replica token
suffixes / sign flips so structure stays per-replica); this module
only pins the m=1/8/64 ladder and the knob variants the tables cite:

- dedup: minhash_lsh and winnow_pairs (the two corpus-sized-wall
  families) at 1/8/64;
- simhash: bits=32 to m=8 only (256 buckets/band makes m=64 the
  documented ~1e9-row quadratic — nothing to learn by grinding it),
  bits=60 (band width scaled with log2(corpus)) the full ladder;
- relational-dedup composition: ngram_jaccard + connected components;
- ANN: topk_lsh, fixed-16-cells IVF (the linear-candidates control)
  and sqrt(n)-scaled cells (the build-once/serve-many knob; the
  one-shot probe honestly shows O(n*cells) assignment dominating —
  SCALE.md explains).

Usage: python tools/ladder64.py [sf_dir] [--families=dedup,simhash,docs,ann]
Prints one JSON line per (operator, m).
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from syncquill_spark import get_spark  # noqa: E402
from tools.scale_probe import (  # noqa: E402
    ID_OFFSET,
    _winnow_pairs,
    probe,
    scaled_corpus,
    scaled_embeddings,
)

LADDER = (1, 8, 64)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    fam_args = [a for a in sys.argv[1:] if a.startswith("--families=")]
    families = (
        set(fam_args[-1].split("=", 1)[1].split(","))
        if fam_args
        else {"dedup", "simhash", "docs", "ann"}
    )
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    spark = get_spark("ladder64")
    spark.sparkContext.setLogLevel("ERROR")

    from syncquill_spark.operators.clusters import connected_components
    from syncquill_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_near_pairs,
    )
    from syncquill_spark.operators.similarity import ivf_topk, lsh_topk

    def emit(name, m, secs, rows):
        print(
            json.dumps(
                {"op": name, "m": m, "secs": round(secs, 1), "rows": rows}
            ),
            flush=True,
        )

    if families & {"dedup", "simhash", "docs"}:
        for m in LADDER:
            corpus = scaled_corpus(spark, sf_dir, m)
            ops: dict = {}
            if "dedup" in families:
                ops["minhash_lsh"] = lambda c: minhash_lsh_pairs(
                    c, k=3, threshold=0.2
                )
                ops["winnow_pairs"] = _winnow_pairs
            if "simhash" in families:
                if m <= 8:
                    ops["simhash_bits32"] = lambda c: simhash_near_pairs(
                        c, bits=32
                    )
                ops["simhash_bits60"] = lambda c: simhash_near_pairs(
                    c, bits=60
                )
            if "docs" in families:
                ops["ngram_jaccard"] = lambda c: ngram_jaccard_pairs(
                    c, k=3, threshold=0.2, block_cols=("lang",), length_band=64
                )
                ops["dedup_clusters"] = lambda c: connected_components(
                    ngram_jaccard_pairs(
                        c,
                        k=3,
                        threshold=0.2,
                        block_cols=("lang",),
                        length_band=64,
                    )
                )
            for name, fn in ops.items():
                secs, rows = probe(name, fn, corpus)
                emit(name, m, secs, rows)

    if "ann" in families:
        base_n = spark.read.parquet(
            f"{sf_dir}/embeddings.parquet"
        ).count()
        for m in LADDER:
            emb = scaled_embeddings(spark, sf_dir, m)
            queries = emb.filter(
                (F.col("vec_id") % 40 == 0) & (F.col("vec_id") < ID_OFFSET)
            ).select(F.col("vec_id").alias("query_id"), "embedding")
            n = base_n * m
            cells = max(16, 2 ** int(round(math.log2(math.sqrt(n)))))
            ops = {
                "topk_lsh": lambda c: lsh_topk(c, queries, k=10),
                "topk_ivf_fixed16": lambda c: ivf_topk(
                    c, queries, k=10, n_cells=16, nprobe=4
                ),
                f"topk_ivf_cells{cells}": lambda c: ivf_topk(
                    c, queries, k=10, n_cells=cells, nprobe=4
                ),
            }
            for name, fn in ops.items():
                secs, rows = probe(name, fn, emb)
                emit(name, m, secs, rows)


if __name__ == "__main__":
    main()
