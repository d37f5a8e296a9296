"""Boundary-parameter battery — the r13 bug-hunting probe that found
the minhash ANSI-0/0 sentinel-collision crash, the zip_with k-depth
plan overflow, and the vector-kernel NULL/ragged/NaN crashes (the
round-12 precedent was the simhash bits=64 overflow, found by the 64x
ladder). Every case drives an operator with inputs a 100 TB corpus
WILL eventually contain — empty frames, sub-k documents, NULL
text/lang, NULL/NaN/Inf/ragged embeddings, truncated media payloads,
parameter extremes — and prints one PASS/FAIL line per case.

The fixes this battery forced are pinned as pytest regressions
(tests/test_dedup.py, tests/test_similarity.py,
tests/test_multimodal.py); this tool remains the exploration harness:
re-run it after adding an operator, extend it with the new operator's
edges, and treat any FAIL as a latent production crash until proven
otherwise.

Usage: python tools/boundary_battery.py [sf_dir]
Exit code: number of FAILed cases (0 = all green).
"""

from __future__ import annotations

import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from syncquill_spark import get_spark  # noqa: E402

RESULTS: list[tuple[str, str, object]] = []


def case(name, fn, expect_error=None):
    """Run one case. expect_error: exception type name expected to be
    RAISED (a clean guard); anything else raising is a FAIL."""
    try:
        out = fn()
        n = out.count() if hasattr(out, "count") else out
        if expect_error:
            RESULTS.append(("FAIL", name, f"expected {expect_error}, got rows={n}"))
            print(f"FAIL {name}: expected {expect_error}, ran fine ({n})", flush=True)
        else:
            RESULTS.append(("PASS", name, n))
            print(f"PASS {name}: {n}", flush=True)
    except Exception as e:
        kind = type(e).__name__
        if expect_error and kind == expect_error:
            RESULTS.append(("PASS", name, kind))
            print(f"PASS {name}: clean {kind}", flush=True)
        else:
            msg = str(e).split("\n")[0][:160]
            RESULTS.append(("FAIL", name, f"{kind}: {msg}"))
            print(f"FAIL {name}: {kind}: {msg}", flush=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("boundary-battery")
    spark.sparkContext.setLogLevel("ERROR")

    from syncquill_spark.functions.vectors import quantize_int8
    from syncquill_spark.functions.zorder import zorder_key
    from syncquill_spark.operators.clusters import connected_components
    from syncquill_spark.operators.dedup import (
        exact_dedup,
        fuzzy_name_pairs,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_near_pairs,
    )
    from syncquill_spark.operators.multimodal import media_triage
    from syncquill_spark.operators.similarity import (
        brute_force_topk,
        embedding_near_dup_pairs,
        pca_fit,
        pca_project,
        random_projection,
    )
    from syncquill_spark.operators.text import (
        chunk_documents,
        language_id,
        quality_rules,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    empty_docs, empty_emb, tiny = docs.limit(0), emb.limit(0), docs.limit(5)

    # --- empty inputs ---------------------------------------------------
    case("minhash_empty", lambda: minhash_lsh_pairs(empty_docs, k=3, threshold=0.2))
    case("simhash_empty", lambda: simhash_near_pairs(empty_docs, bits=32))
    case("ngram_empty", lambda: ngram_jaccard_pairs(empty_docs, k=3, threshold=0.2))
    case("exact_empty", lambda: exact_dedup(empty_docs))
    case("cc_empty", lambda: connected_components(
        spark.createDataFrame([], "id_a long, id_b long")))
    case("brute_empty_corpus", lambda: brute_force_topk(
        empty_emb,
        emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding"),
        k=5))
    case("brute_empty_queries", lambda: brute_force_topk(
        emb, empty_emb.select(F.col("vec_id").alias("query_id"), "embedding"),
        k=5))

    # --- short docs (the ANSI-0/0 find) --------------------------------
    short = spark.createDataFrame(
        [(1, "a b", "en"), (2, "c d", "en"),
         (3, "the quick brown fox jumps over the lazy dog", "en"),
         (4, "the quick brown fox jumps over the lazy cat", "en")],
        "doc_id long, text string, lang string")
    case("minhash_short_docs", lambda: minhash_lsh_pairs(short, k=3, threshold=0.5))
    case("ngram_no_nchars_col", lambda: ngram_jaccard_pairs(short, k=3, threshold=0.5))

    # --- NULL text / lang ----------------------------------------------
    nulldocs = spark.createDataFrame(
        [(1, None, "en"), (2, "the quick brown fox jumps over it", "en"),
         (3, "the quick brown fox jumps over it", None)],
        "doc_id long, text string, lang string")
    case("minhash_null_text", lambda: minhash_lsh_pairs(nulldocs, k=3, threshold=0.5))
    case("simhash_null_text", lambda: simhash_near_pairs(nulldocs, bits=32))
    case("langid_null_text", lambda: language_id(nulldocs))
    case("quality_null_text", lambda: quality_rules(nulldocs))
    case("chunk_null_text", lambda: chunk_documents(nulldocs))

    # --- parameter extremes (clean guards must RAISE ValueError) -------
    case("minhash_k_0", lambda: minhash_lsh_pairs(short, k=0),
         expect_error="ValueError")
    case("minhash_k_10000", lambda: minhash_lsh_pairs(short, k=10_000),
         expect_error="ValueError")
    case("minhash_k_64_boundary", lambda: minhash_lsh_pairs(short, k=64, threshold=0.2))
    case("minhash_t0", lambda: minhash_lsh_pairs(short, k=3, threshold=0.0))
    case("minhash_t1", lambda: minhash_lsh_pairs(short, k=3, threshold=1.0))
    case("simhash_bits1", lambda: simhash_near_pairs(short, bits=1, max_hamming=0, bands=1))
    case("simhash_bits64_full", lambda: simhash_near_pairs(short, bits=64, max_hamming=0, bands=1))
    case("zorder_63bits", lambda: docs.select(zorder_key([F.col("doc_id")], bits=63).alias("z")))
    case("quantize_extremes", lambda: spark.createDataFrame(
        [(1, [1e30, -1e30, 0.0]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    ).select(quantize_int8(F.col("embedding")).alias("q")))
    case("chunk_1_token", lambda: chunk_documents(tiny, chunk_tokens=1, overlap=0))
    case("chunk_overlap_ge_chunk", lambda: chunk_documents(tiny, chunk_tokens=16, overlap=16),
         expect_error="ValueError")
    case("pack_budget_0", lambda: __import__(
        "syncquill_spark.operators.curation", fromlist=["pack_sequences"]
    ).pack_sequences(tiny, budget=0), expect_error="ValueError")

    # --- CDC / join edges ----------------------------------------------
    from syncquill_spark.operators.asof import asof_join
    from syncquill_spark.operators.ranges import binned_range_join
    from syncquill_spark.operators.scd2 import scd2_history

    L = spark.createDataFrame(
        [(1, 10, "a"), (1, None, "b"), (2, 5, "c")],
        "k long, ts long, lv string")
    R = spark.createDataFrame(
        [(1, 8, "x"), (1, None, "y"), (3, 1, "z")],
        "k long, ts long, rv string")
    case("asof_null_ts", lambda: asof_join(L, R, on="k", ts="ts"))
    case("asof_empty_right", lambda: asof_join(L, R.limit(0), on="k", ts="ts"))
    pts = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, float("nan"))], "pid long, p double")
    ivl = spark.createDataFrame(
        [(10, 0.0, 10.0), (11, None, 5.0)], "iid long, lo double, hi double")
    case("range_null_point", lambda: binned_range_join(pts, ivl, "p", "lo", "hi", bin_width=1.0))
    case("range_binwidth_0", lambda: binned_range_join(pts, ivl, "p", "lo", "hi", bin_width=0.0),
         expect_error="ValueError")
    case("range_binwidth_neg", lambda: binned_range_join(pts, ivl, "p", "lo", "hi", bin_width=-1.0),
         expect_error="ValueError")
    S = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, None), (1, 3, None), (1, None, "b")],
        "k long, t long, v string")
    case("scd2_null_order", lambda: scd2_history(S, "k", "t", ["v"]))
    case("scd2_empty", lambda: scd2_history(S.limit(0), "k", "t", ["v"]))
    from syncquill_spark.operators.text import winnowing_fingerprints

    case("winnow_window_0", lambda: winnowing_fingerprints(tiny, k=3, window=0),
         expect_error="ValueError")
    case("winnow_k1_w1", lambda: winnowing_fingerprints(tiny, k=1, window=1))
    case("fuzzy_maxdist0", lambda: fuzzy_name_pairs(
        spark.createDataFrame(
            [(1, "anna lee"), (2, "anna lee"), (3, "bob ray")],
            "doc_id long, name string"),
        name_col="name", max_dist=0))
    case("fuzzy_empty_names", lambda: fuzzy_name_pairs(
        spark.createDataFrame([(1, ""), (2, "")], "doc_id long, name string"),
        name_col="name", max_dist=2))

    # --- pathological embeddings (the vector-kernel find) --------------
    base = [float(i % 7 - 3) for i in range(64)]
    patho = spark.createDataFrame(
        [(1, base), (2, base), (3, None), (4, [float("nan")] * 64),
         (5, [float("inf")] * 64), (6, base[:63])],
        "vec_id long, embedding array<double>")
    q1 = spark.createDataFrame([(100, base)], "query_id long, embedding array<double>")
    case("neardup_pathological", lambda: embedding_near_dup_pairs(patho, threshold=0.5))
    case("brute_pathological", lambda: brute_force_topk(patho, q1, k=5))
    case("rp_pathological", lambda: random_projection(patho, out_dim=8))
    case("pca_pathological", lambda: pca_project(patho, pca_fit(patho, k=4)))
    case("neardup_zero_vectors", lambda: embedding_near_dup_pairs(
        spark.createDataFrame([(1, [0.0] * 64), (2, [0.0] * 64)],
                              "vec_id long, embedding array<double>"),
        threshold=0.5))

    # --- corrupt media payloads (the triage gate) ----------------------
    ppm = b"P6\n2 2\n255\n" + bytes(range(12))
    wav = (b"RIFF" + struct.pack("<I", 36 + 4) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
           + b"data" + struct.pack("<I", 4) + struct.pack("<2h", 1, -1))
    media = spark.createDataFrame(
        [(1, ppm), (2, ppm[:-5]), (3, wav), (4, wav[:20]),
         (5, b"\x89PNG\r\n\x1a\n junk"), (6, None)],
        "media_id long, payload binary")
    case("media_triage_corrupt", lambda: media_triage(media))

    fails = [r for r in RESULTS if r[0] == "FAIL"]
    print(f"\n{len(RESULTS) - len(fails)}/{len(RESULTS)} passed, {len(fails)} failed")
    return len(fails)


if __name__ == "__main__":
    raise SystemExit(main())
