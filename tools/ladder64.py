"""The 64x scale ladder — reproduces the SCALE.md 64x tables
(r11 verdict #7 and the follow-ups it triggered; extended r13).

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
  SCALE.md explains);
- text64 (r13, r12 verdict #3): the text/curation families previously
  pinned only to 8x — cross-doc line dedup (the one text-sized
  rebuild groupBy), the bracketed two-pass stratified order statistic
  (quality_pctl), and the BM25 index BUILD (build + Hive-partitioned
  save, the storage_bm25_index lifecycle's expensive half);
- serve (r13, r12 verdict #4): the sqrt-cells story's positive half —
  build the IVF-PQ index ONCE per corpus size (paying the O(n*cells)
  assignment), persist it cell-partitioned, then time SERVING a fixed
  query batch from the loaded parts: serve wall must grow with
  probed-cell volume (nprobe*n/cells ~ sqrt(n)), not the corpus;
- bpe (r13, r12 verdict #7): BPE train at 1/8/64 with the
  per-iteration wall split out via an n_merges sweep (10/20/40) —
  the merges-bound claim is slope(t, n_merges) flat-ish in m while
  the one corpus pass (word_freqs) scales ~m;
- stream (r13): the streaming ingest gates' scale claim — a FIXED
  batch gated against a PERSISTED index built over a 1/8/64x corpus
  (exact sha anti-join, MinHash band gate, SimHash band gate,
  SRP vector gate). Batch texts/vectors come verbatim (or one-token
  modified) from the BASE replica, so gate output is CONSTANT while
  the index grows — gate wall must track the batch + its matches,
  never the corpus; the one-time build walls (~corpus-sized) are
  emitted alongside for contrast;
- deep512 (r13): the 512x decade — m = 8/64/512 (2.56M docs at 512x)
  for the headline corpus-wall families (minhash_lsh, winnow_pairs,
  ngram+CC composition), hunting any super-linear term two full
  decades above the test fixture;
- skew (r13): the skew-mitigation ladder — a fact table with ONE
  planted hot key holding ~50% of all rows, joined to a 1,000-key
  dim under four configs: session defaults (AQE broadcasts the dim —
  skew never materializes, the first-line answer), broadcast
  suppressed + AQE skew split (the 100 TB simulation: a dim too big
  to broadcast), broadcast + AQE both off (the naive straggler), and
  operators/skew.salted_join under the same suppression (the
  explicit fallback). Plus plain-vs-salted_agg on the same hot key
  (expected ~equal: map-side combine already de-skews decomposable
  aggs — the docstring's claim, probed as a negative).

Usage: python tools/ladder64.py [sf_dir]
    [--families=dedup,simhash,docs,ann,text64,serve,bpe,stream,deep512,skew]
Prints one JSON line per (operator, m). Default families are the r12
set (dedup,simhash,docs,ann); the r13 additions run opt-in.
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

    if "text64" in families:
        import shutil
        import tempfile
        import time

        from syncquill_spark.operators.text import build_bm25_index
        from syncquill_spark.sources.index_store import (
            load_index,
            save_index,
        )
        from tools.scale_probe import _lines_drop, _quality_pctl

        for m in LADDER:
            corpus = scaled_corpus(spark, sf_dir, m)
            for name, fn in (
                ("lines_dedup_drop", _lines_drop),
                ("quality_pctl", _quality_pctl),
            ):
                secs, rows = probe(name, fn, corpus)
                emit(name, m, secs, rows)
            # BM25 index BUILD: tokenize + 4 part aggregations + the
            # Hive-partitioned (term_bucket) atomic save — the real
            # lifecycle cost, not just the plan. Rows = postings size
            # read back from the stored part.
            tmp = tempfile.mkdtemp(prefix="ladder_bm25_")
            try:
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                t0 = time.time()
                idx = build_bm25_index(corpus)
                save_index(
                    f"{tmp}/bm25",
                    _partition_by={"postings": ["term_bucket"]},
                    **idx,
                )
                build_s = time.time() - t0
                rows = load_index(spark, f"{tmp}/bm25")["postings"].count()
                emit("bm25_build_save", m, build_s, rows)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)

    if "serve" in families:
        import shutil
        import tempfile
        import time

        from syncquill_spark.operators.similarity import (
            ivfpq_build_index,
            ivfpq_topk_from_index,
        )
        from syncquill_spark.sources.index_store import (
            load_index,
            save_index,
        )

        base_n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        for m in LADDER:
            emb = scaled_embeddings(spark, sf_dir, m)
            queries = emb.filter(
                (F.col("vec_id") % 40 == 0) & (F.col("vec_id") < ID_OFFSET)
            ).select(F.col("vec_id").alias("query_id"), "embedding")
            n = base_n * m
            cells = max(16, 2 ** int(round(math.log2(math.sqrt(n)))))
            tmp = tempfile.mkdtemp(prefix="ladder_serve_")
            try:
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                t0 = time.time()
                idx = ivfpq_build_index(emb, n_cells=cells)
                save_index(
                    f"{tmp}/ivfpq",
                    _partition_by={"codes": ["cell_id"]},
                    **idx,
                )
                build_s = time.time() - t0
                emit(f"ivfpq_build_cells{cells}", m, build_s, n)
                loaded = load_index(spark, f"{tmp}/ivfpq")
                # two timed serves: first pays plan compile, second is
                # the steady per-batch cost the claim is about
                for tag in ("cold", "warm"):
                    spark.catalog.clearCache()
                    spark.sparkContext._jvm.System.gc()
                    t0 = time.time()
                    rows = ivfpq_topk_from_index(
                        queries, loaded, k=10, nprobe=4
                    ).count()
                    emit(
                        f"ivfpq_serve_{tag}_cells{cells}",
                        m,
                        time.time() - t0,
                        rows,
                    )
                # probed-cell volume: the serve-side work driver —
                # nprobe/cells of the corpus's code rows per query
                emit(
                    f"ivfpq_probed_rows_per_query_cells{cells}",
                    m,
                    0.0,
                    int(4 * n / cells) * 8,  # nprobe * n/cells * m_sub
                )
            finally:
                shutil.rmtree(tmp, ignore_errors=True)

    if "more64" in families:
        # the remaining 8x-only corpus families (r13, beyond the
        # verdict's named three): tf-idf's corpus df join, the
        # bigram-LM c12 scoring join under Zipfian skew, the span
        # decontamination composition, the classifier gate, and the
        # fuzzy-linkage catalog probes
        from tools.name_catalog import synth_name_catalog
        from tools.scale_probe import (
            _bigram_gate,
            _bigram_lm,
            _clf_gate,
            _remove_spans_probe,
            _tfidf_terms,
        )

        from syncquill_spark.operators.dedup import fuzzy_name_pairs

        for m in LADDER:
            corpus = scaled_corpus(spark, sf_dir, m)
            for name, fn in (
                ("tfidf_terms", _tfidf_terms),
                ("bigram_lm", _bigram_lm),
                ("bigram_gate", _bigram_gate),
                ("remove_spans", _remove_spans_probe),
                ("clf_gate", _clf_gate),
                (
                    "fuzzy_pairs",
                    lambda c: fuzzy_name_pairs(
                        synth_name_catalog(c.select("doc_id")),
                        name_col="name",
                        max_dist=2,
                    ),
                ),
            ):
                secs, rows = probe(name, fn, corpus)
                emit(name, m, secs, rows)

    if "serve2" in families:
        import shutil
        import tempfile
        import time

        from syncquill_spark.operators.text import (
            bm25_from_index,
            build_bm25_index,
        )
        from syncquill_spark.sources.index_store import (
            load_index,
            save_index,
        )

        # BM25 serve-from-persisted-index vs corpus size: postings are
        # Hive-partitioned by term_bucket, so a fixed 4-term query
        # reads only its <=4 buckets' files — serve wall should grow
        # with bucket-file volume (~corpus/n_buckets), far below the
        # corpus itself. Query terms are the registry row's; replicas
        # tag-suffix their tokens, so matches stay in the base replica
        # while bucket files still grow ~m (the pruning is what's
        # under test, not the match count).
        terms = ("spark", "hash", "merge", "window")
        for m in LADDER:
            corpus = scaled_corpus(spark, sf_dir, m)
            tmp = tempfile.mkdtemp(prefix="ladder_bm25s_")
            try:
                idx = build_bm25_index(corpus)
                save_index(
                    f"{tmp}/bm25",
                    _partition_by={"postings": ["term_bucket"]},
                    **idx,
                )
                loaded = load_index(spark, f"{tmp}/bm25")
                for tag in ("cold", "warm"):
                    spark.catalog.clearCache()
                    spark.sparkContext._jvm.System.gc()
                    t0 = time.time()
                    rows = bm25_from_index(loaded, terms).count()
                    emit(f"bm25_serve_{tag}", m, time.time() - t0, rows)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)

        # IVF-PQ serve vs QUERY BATCH size at the 64x corpus: per-batch
        # cost should be ~linear in queries over a fixed floor (the
        # probed-cell scan) — the other axis of the serve story.
        from syncquill_spark.operators.similarity import (
            ivfpq_build_index,
            ivfpq_topk_from_index,
        )

        base_n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        m = 64
        emb = scaled_embeddings(spark, sf_dir, m)
        n = base_n * m
        cells = max(16, 2 ** int(round(math.log2(math.sqrt(n)))))
        tmp = tempfile.mkdtemp(prefix="ladder_srvq_")
        try:
            idx = ivfpq_build_index(emb, n_cells=cells)
            save_index(
                f"{tmp}/ivfpq", _partition_by={"codes": ["cell_id"]}, **idx
            )
            loaded = load_index(spark, f"{tmp}/ivfpq")
            for mod in (40, 8, 1):  # 50 / 250 / 2000 queries
                queries = emb.filter(
                    (F.col("vec_id") % mod == 0)
                    & (F.col("vec_id") < ID_OFFSET)
                ).select(F.col("vec_id").alias("query_id"), "embedding")
                nq = queries.count()
                for tag in ("cold", "warm"):
                    spark.catalog.clearCache()
                    spark.sparkContext._jvm.System.gc()
                    t0 = time.time()
                    rows = ivfpq_topk_from_index(
                        queries, loaded, k=10, nprobe=4
                    ).count()
                    emit(
                        f"ivfpq_serve_{tag}_q{nq}_cells{cells}",
                        m,
                        time.time() - t0,
                        rows,
                    )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    if "serve512" in families:
        # r14 (verdict #7): the serve story at the same depth as the
        # pair-finding story — BM25 serve and IVF-PQ serve from
        # persisted indexes built over the 512x corpus (2.56M docs /
        # 1.02M vectors). deep512 discipline: the scaled corpus is
        # MATERIALIZED to parquet before the index build so the
        # 512-way union plan never contaminates the build or the
        # serve; the serve reads ONLY the stored index either way.
        import shutil
        import tempfile
        import time

        from syncquill_spark.operators.similarity import (
            ivfpq_build_index,
            ivfpq_topk_from_index,
        )
        from syncquill_spark.operators.text import (
            bm25_from_index,
            build_bm25_index,
        )
        from syncquill_spark.sources.index_store import (
            load_index,
            save_index,
        )

        m = 512
        terms = ("spark", "hash", "merge", "window")
        tmp = tempfile.mkdtemp(prefix="ladder_s512_")
        try:
            t0 = time.time()
            scaled_corpus(spark, sf_dir, m).write.mode("overwrite").parquet(
                f"{tmp}/corpus"
            )
            corpus = spark.read.parquet(f"{tmp}/corpus")
            emit("s512_corpus_materialize", m, time.time() - t0, corpus.count())
            t0 = time.time()
            idx = build_bm25_index(corpus)
            save_index(
                f"{tmp}/bm25",
                _partition_by={"postings": ["term_bucket"]},
                **idx,
            )
            emit("bm25_build", m, time.time() - t0, 0)
            spark.catalog.clearCache()
            loaded = load_index(spark, f"{tmp}/bm25")
            emit("bm25_postings", m, 0.0, loaded["postings"].count())
            for tag in ("cold", "warm"):
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                t0 = time.time()
                rows = bm25_from_index(loaded, terms).count()
                emit(f"bm25_serve_{tag}", m, time.time() - t0, rows)
            shutil.rmtree(f"{tmp}/bm25", ignore_errors=True)
            shutil.rmtree(f"{tmp}/corpus", ignore_errors=True)

            t0 = time.time()
            scaled_embeddings(spark, sf_dir, m).write.mode(
                "overwrite"
            ).parquet(f"{tmp}/emb")
            emb = spark.read.parquet(f"{tmp}/emb")
            n = emb.count()
            emit("s512_emb_materialize", m, time.time() - t0, n)
            cells = max(16, 2 ** int(round(math.log2(math.sqrt(n)))))
            t0 = time.time()
            idx = ivfpq_build_index(emb, n_cells=cells)
            save_index(
                f"{tmp}/ivfpq", _partition_by={"codes": ["cell_id"]}, **idx
            )
            emit(f"ivfpq_build_cells{cells}", m, time.time() - t0, 0)
            spark.catalog.clearCache()
            loaded = load_index(spark, f"{tmp}/ivfpq")
            for mod in (40, 1):  # 50 / 2000 queries
                queries = emb.filter(
                    (F.col("vec_id") % mod == 0)
                    & (F.col("vec_id") < ID_OFFSET)
                ).select(F.col("vec_id").alias("query_id"), "embedding")
                nq = queries.count()
                for tag in ("cold", "warm"):
                    spark.catalog.clearCache()
                    spark.sparkContext._jvm.System.gc()
                    t0 = time.time()
                    rows = ivfpq_topk_from_index(
                        queries, loaded, k=10, nprobe=4
                    ).count()
                    emit(
                        f"ivfpq_serve_{tag}_q{nq}_cells{cells}",
                        m,
                        time.time() - t0,
                        rows,
                    )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    if "bm25buckets512" in families:
        # r15 (verdict #3): pin the BM25 serve law at 512x by MOVING
        # THE KNOB. r14's serve512 showed 4.8s warm at n_buckets=64
        # over 59.5M postings and inferred serve I/O ∝ corpus /
        # n_buckets; this family rebuilds the SAME 512x index at
        # n_buckets=512 (corpus-scaled per the recorded sizing rule)
        # and re-serves the same 4-term query — if the law holds, the
        # per-bucket posting volume drops 8x and the serve wall
        # returns to ~the 64x-corpus constant. Both builds run in ONE
        # process on ONE materialized corpus so the comparison is
        # within-VM-day; postings-read per serve is emitted alongside
        # the wall (the I/O the law is actually about).
        import shutil
        import tempfile
        import time

        from syncquill_spark.operators.text import (
            bm25_from_index,
            bm25_query_buckets,
            build_bm25_index,
        )
        from syncquill_spark.sources.index_store import (
            load_index,
            save_index,
        )

        m = 512
        terms = ("spark", "hash", "merge", "window")
        tmp = tempfile.mkdtemp(prefix="ladder_b512_")
        try:
            t0 = time.time()
            scaled_corpus(spark, sf_dir, m).write.mode("overwrite").parquet(
                f"{tmp}/corpus"
            )
            corpus = spark.read.parquet(f"{tmp}/corpus")
            emit("b512_corpus_materialize", m, time.time() - t0, corpus.count())
            for n_buckets in (64, 512):
                t0 = time.time()
                idx = build_bm25_index(corpus, n_buckets=n_buckets)
                save_index(
                    f"{tmp}/bm25_{n_buckets}",
                    _partition_by={"postings": ["term_bucket"]},
                    **idx,
                )
                emit(f"bm25_build_nb{n_buckets}", m, time.time() - t0, 0)
                spark.catalog.clearCache()
                loaded = load_index(spark, f"{tmp}/bm25_{n_buckets}")
                emit(
                    f"bm25_postings_nb{n_buckets}",
                    m,
                    0.0,
                    loaded["postings"].count(),
                )
                # the I/O the 1/n_buckets law governs: postings rows in
                # the query's <= 4 pruned buckets
                bkts = bm25_query_buckets(terms, n_buckets)
                t0 = time.time()
                pruned = (
                    loaded["postings"]
                    .filter(F.col("term_bucket").isin(bkts))
                    .count()
                )
                emit(
                    f"bm25_bucket_rows_nb{n_buckets}",
                    m,
                    time.time() - t0,
                    pruned,
                )
                for tag in ("cold", "warm"):
                    spark.catalog.clearCache()
                    spark.sparkContext._jvm.System.gc()
                    t0 = time.time()
                    rows = bm25_from_index(
                        loaded, terms, n_buckets=n_buckets
                    ).count()
                    emit(
                        f"bm25_serve_{tag}_nb{n_buckets}",
                        m,
                        time.time() - t0,
                        rows,
                    )
                shutil.rmtree(f"{tmp}/bm25_{n_buckets}", ignore_errors=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    if "bm25doclens512" in families:
        # r16 (r15 verdict #3): the doclens term, killed by inlining dl
        # onto posting rows — measured by serving the SAME materialized
        # 512x index both ways in ONE process (within-VM-day): the
        # inline-dl serve (the shipped plan) vs the pre-r16 shape
        # (postings.drop("dl") forces the doclens-join fallback). The
        # law: the join path's scan side is the WHOLE doclens part
        # (corpus-sized, 2.56M rows at 512x) regardless of matches; the
        # inline path reads ZERO doclens rows at any corpus size
        # (plan-asserted), with matches constant at 4,919 both ways.
        import shutil
        import tempfile
        import time

        from syncquill_spark.operators.text import (
            bm25_from_index,
            build_bm25_index,
            load_bm25_index,
            save_bm25_index,
        )

        m = 512
        n_buckets = 512  # the corpus-scaled width per the r15 sizing rule
        terms = ("spark", "hash", "merge", "window")
        tmp = tempfile.mkdtemp(prefix="ladder_dl512_")
        try:
            t0 = time.time()
            scaled_corpus(spark, sf_dir, m).write.mode("overwrite").parquet(
                f"{tmp}/corpus"
            )
            corpus = spark.read.parquet(f"{tmp}/corpus")
            emit("dl512_corpus_materialize", m, time.time() - t0, corpus.count())
            t0 = time.time()
            save_bm25_index(
                f"{tmp}/bm25", build_bm25_index(corpus, n_buckets=n_buckets),
                n_buckets=n_buckets,
            )
            emit("bm25_build_inline_dl", m, time.time() - t0, 0)
            spark.catalog.clearCache()
            loaded = load_bm25_index(spark, f"{tmp}/bm25", n_buckets=n_buckets)
            emit("bm25_doclens_part_rows", m, 0.0, loaded["doclens"].count())
            serves = {
                # the shipped plan: dl rides the pruned postings read
                "inline": loaded,
                # the pre-r16 serve shape on the same stored bytes
                "joined": {**loaded, "postings": loaded["postings"].drop("dl")},
            }
            for name, idx in serves.items():
                plan = (
                    bm25_from_index(idx, terms, n_buckets=n_buckets)
                    ._jdf.queryExecution()
                    .executedPlan()
                    .toString()
                )
                has_dl_scan = "struct<doc_id:bigint,dl:bigint>" in plan
                # doclens rows the serve scan touches: the whole part on
                # the join path, zero on the inline path (plan-proven)
                dl_rows = (
                    loaded["doclens"].count() if has_dl_scan else 0
                )
                assert has_dl_scan == (name == "joined"), (name, plan)
                emit(f"bm25_doclens_scan_rows_{name}", m, 0.0, dl_rows)
                for tag in ("cold", "warm"):
                    spark.catalog.clearCache()
                    spark.sparkContext._jvm.System.gc()
                    t0 = time.time()
                    rows = bm25_from_index(
                        idx, terms, n_buckets=n_buckets
                    ).count()
                    emit(
                        f"bm25_serve_{tag}_{name}", m, time.time() - t0, rows
                    )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    if "vgate512" in families:
        # r14: the bucketed-vs-flat vector-gate comparison at the 512x
        # decade (the SCALE.md crossover row), reproducible. deep512
        # discipline: the 512x embeddings are materialized to parquet
        # before the index build.
        import shutil
        import tempfile
        import time

        from syncquill_spark.sources.index_store import (
            load_index,
            save_index,
        )
        from syncquill_spark.streaming.vector_dedup import (
            build_embedding_index,
            save_embedding_index,
            stream_embedding_near_dups,
        )

        BATCH_OFFSET = 99 * ID_OFFSET
        base_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        batches = {
            "b500": base_emb.filter(F.col("vec_id") % 4 == 0),
            "b50": base_emb.filter(F.col("vec_id") % 40 == 0),
        }
        batches = {
            name: b.select(
                (F.col("vec_id") + BATCH_OFFSET).alias("vec_id"),
                "embedding",
            )
            for name, b in batches.items()
        }
        m = 512
        tmp = tempfile.mkdtemp(prefix="ladder_vg512_")
        try:
            t0 = time.time()
            scaled_embeddings(spark, sf_dir, m).write.mode(
                "overwrite"
            ).parquet(f"{tmp}/emb")
            emb = spark.read.parquet(f"{tmp}/emb")
            emit("vg512_materialize", m, time.time() - t0, emb.count())
            vkeys, vvecs = build_embedding_index(
                emb, bands=4, planes_per_band=12
            )
            t0 = time.time()
            save_index(f"{tmp}/flat", keys=vkeys.drop("_bucket"), vecs=vvecs)
            emit("vg512_build_flat", m, time.time() - t0, 0)
            spark.catalog.clearCache()
            vkeys, vvecs = build_embedding_index(
                emb, bands=4, planes_per_band=12
            )
            t0 = time.time()
            save_embedding_index(f"{tmp}/bkt", vkeys, vvecs)
            emit("vg512_build_bucketed", m, time.time() - t0, 0)
            spark.catalog.clearCache()
            idxs = {
                "flat": load_index(spark, f"{tmp}/flat"),
                "bucketed": load_index(spark, f"{tmp}/bkt"),
            }
            for bname, vb in batches.items():
                for lname, vidx in idxs.items():
                    for tag in ("cold", "warm"):
                        spark.catalog.clearCache()
                        vb.persist()
                        vb.count()
                        spark.sparkContext._jvm.System.gc()
                        t0 = time.time()
                        rows = (
                            stream_embedding_near_dups(
                                vb,
                                vidx["keys"],
                                vidx["vecs"],
                                threshold=0.55,
                                bands=4,
                                planes_per_band=12,
                            )
                            .dropDuplicates(["stream_id", "corpus_id"])
                            .count()
                        )
                        emit(
                            f"vg512_gate_{lname}_{bname}_{tag}",
                            m,
                            time.time() - t0,
                            rows,
                        )
                        vb.unpersist()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    if "vgate4096" in families:
        # r15 (verdict #8): one step past the r14 crossover. At 512x
        # the stored keys part is 4.1M rows and bucketed-vs-flat read
        # parity-to-slight-win at 50-vec batches — the 4,096-small-file
        # constant still offset the scan savings. This family scales
        # the KEYS PART ALONE to 8x that (32.8M rows = 4096x the 1x
        # keys volume) with synthetic non-colliding keys (corpus_id
        # offset, _key rehashed per replica so no synthetic row can
        # join a batch key — matches stay identical to the unscaled
        # serve by construction, emitted for verification), so the
        # comparison isolates exactly the term the layout governs: the
        # stored-keys scan. Both layouts serve the SAME scaled frame.
        import shutil
        import tempfile
        import time

        from syncquill_spark.sources.index_store import (
            load_index,
            save_index,
        )
        from syncquill_spark.streaming.vector_dedup import (
            _bucket_expr,
            build_embedding_index,
            save_embedding_index,
            stream_embedding_near_dups,
        )

        BATCH_OFFSET = 99 * ID_OFFSET
        SYN_OFFSET = 10**12
        base_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        batches = {
            "b500": base_emb.filter(F.col("vec_id") % 4 == 0),
            "b50": base_emb.filter(F.col("vec_id") % 40 == 0),
        }
        batches = {
            name: b.select(
                (F.col("vec_id") + BATCH_OFFSET).alias("vec_id"),
                "embedding",
            )
            for name, b in batches.items()
        }
        m = 512
        tmp = tempfile.mkdtemp(prefix="ladder_vg4k_")
        try:
            t0 = time.time()
            scaled_embeddings(spark, sf_dir, m).write.mode(
                "overwrite"
            ).parquet(f"{tmp}/emb")
            emb = spark.read.parquet(f"{tmp}/emb")
            emit("vg4k_materialize", m, time.time() - t0, emb.count())
            vkeys, vvecs = build_embedding_index(
                emb, bands=4, planes_per_band=12
            )
            syn = [vkeys]
            for j in range(1, 8):
                syn.append(
                    vkeys.select(
                        (F.col("corpus_id") + j * SYN_OFFSET).alias(
                            "corpus_id"
                        ),
                        "_band",
                        F.xxhash64(F.col("_key"), F.lit(j)).alias("_key"),
                    ).withColumn(
                        "_bucket", _bucket_expr(F.col("_band"), F.col("_key"))
                    )
                )
            big_keys = syn[0]
            for s in syn[1:]:
                big_keys = big_keys.unionByName(s)
            t0 = time.time()
            save_index(f"{tmp}/flat", keys=big_keys.drop("_bucket"), vecs=vvecs)
            emit("vg4k_build_flat", m, time.time() - t0, 0)
            spark.catalog.clearCache()
            t0 = time.time()
            save_embedding_index(f"{tmp}/bkt", big_keys, vvecs)
            emit("vg4k_build_bucketed", m, time.time() - t0, 0)
            spark.catalog.clearCache()
            idxs = {
                "flat": load_index(spark, f"{tmp}/flat"),
                "bucketed": load_index(spark, f"{tmp}/bkt"),
            }
            emit("vg4k_keys_rows", m, 0.0, idxs["flat"]["keys"].count())
            for bname, vb in batches.items():
                for lname, vidx in idxs.items():
                    for tag in ("cold", "warm"):
                        spark.catalog.clearCache()
                        vb.persist()
                        vb.count()
                        spark.sparkContext._jvm.System.gc()
                        t0 = time.time()
                        rows = (
                            stream_embedding_near_dups(
                                vb,
                                vidx["keys"],
                                vidx["vecs"],
                                threshold=0.55,
                                bands=4,
                                planes_per_band=12,
                            )
                            .dropDuplicates(["stream_id", "corpus_id"])
                            .count()
                        )
                        emit(
                            f"vg4k_gate_{lname}_{bname}_{tag}",
                            m,
                            time.time() - t0,
                            rows,
                        )
                        vb.unpersist()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    if "stream" in families:
        import shutil
        import tempfile
        import time

        from syncquill_spark.sources.index_store import (
            load_index,
            save_index,
        )
        from syncquill_spark.streaming.text_dedup import (
            build_simhash_index,
            build_text_hash_index,
            build_text_minhash_index,
            simhash_matches_against,
            stream_drop_seen_text,
            text_near_dups_against_index,
        )
        from syncquill_spark.streaming.vector_dedup import (
            build_embedding_index,
            stream_embedding_near_dups,
        )

        BATCH_OFFSET = 99 * ID_OFFSET

        def _gate(name, m, fn, batch):
            # serve-style timing: clearCache drops the persisted batch,
            # so re-pin it (a microbatch arrives materialized — its
            # read is not the cost under test), then time the gate.
            for tag in ("cold", "warm"):
                spark.catalog.clearCache()
                batch.persist()
                batch.count()
                spark.sparkContext._jvm.System.gc()
                t0 = time.time()
                rows = fn().count()
                emit(f"{name}_{tag}", m, time.time() - t0, rows)

        base_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # fixed 1,000-doc batch from the BASE replica: half verbatim
        # (exact + near-dup hits), half with one appended token
        # (near-dup hits only). Replica tokens are tag-suffixed, so
        # every match lands in the base replica — output constant in m.
        batch = base_docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + BATCH_OFFSET).alias("doc_id"),
            F.when(F.col("doc_id") % 10 == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" ladderprobe")))
            .alias("text"),
            "lang",
            "source",
        )
        for m in LADDER:
            corpus = scaled_corpus(spark, sf_dir, m)
            tmp = tempfile.mkdtemp(prefix="ladder_gate_")
            try:
                t0 = time.time()
                save_index(f"{tmp}/exact", sha=build_text_hash_index(corpus))
                emit("gate_exact_build", m, time.time() - t0, 0)
                t0 = time.time()
                keys, sh = build_text_minhash_index(corpus)
                save_index(f"{tmp}/minhash", keys=keys, shingles=sh)
                emit("gate_minhash_build", m, time.time() - t0, 0)
                t0 = time.time()
                save_index(
                    f"{tmp}/simhash",
                    fps=build_simhash_index(corpus, bits=60),
                )
                emit("gate_simhash_build", m, time.time() - t0, 0)

                exact_idx = load_index(spark, f"{tmp}/exact")["sha"]
                mh = load_index(spark, f"{tmp}/minhash")
                sh_idx = load_index(spark, f"{tmp}/simhash")["fps"]
                _gate(
                    "gate_exact",
                    m,
                    lambda: stream_drop_seen_text(batch, exact_idx),
                    batch,
                )
                _gate(
                    "gate_minhash",
                    m,
                    lambda: text_near_dups_against_index(
                        batch, mh["keys"], mh["shingles"], threshold=0.5
                    ),
                    batch,
                )
                _gate(
                    "gate_simhash",
                    m,
                    lambda: simhash_matches_against(
                        batch, sh_idx, bits=60, max_hamming=3
                    ),
                    batch,
                )
            finally:
                shutil.rmtree(tmp, ignore_errors=True)

        # vector gate: fixed batches of verbatim base-replica
        # embeddings under new ids — exact self-matches at cos 1.0;
        # sign-flipped replicas decorrelate, so matches stay constant.
        # planes_per_band=12 per SCALE.md probe finding #1 (bucket
        # count must scale with the corpus), threshold 0.55 per #2.
        # r14: the stored-keys part is measured in BOTH layouts — flat
        # (r13's, scan grows with the corpus) and Hive-partitioned by
        # the fixed xxhash64(band, key) mod 4096 bucket
        # (save_embedding_index; the gate prunes the scan to the
        # batch's buckets, constant in corpus). Two batch sizes,
        # because the pruning factor is touched-buckets/4096 — a
        # property of the BATCH's key count, not of the corpus: a
        # 50-vector micro-batch touches ~200 buckets (~6% of stored
        # rows), a 500-vector batch ~1500 (~46%).
        from syncquill_spark.streaming.vector_dedup import (
            save_embedding_index,
        )

        base_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        batches = {
            "b500": base_emb.filter(F.col("vec_id") % 4 == 0),
            "b50": base_emb.filter(F.col("vec_id") % 40 == 0),
        }
        batches = {
            name: b.select(
                (F.col("vec_id") + BATCH_OFFSET).alias("vec_id"),
                "embedding",
            )
            for name, b in batches.items()
        }
        for m in LADDER:
            emb = scaled_embeddings(spark, sf_dir, m)
            tmp = tempfile.mkdtemp(prefix="ladder_vgate_")
            try:
                t0 = time.time()
                vkeys, vvecs = build_embedding_index(
                    emb, bands=4, planes_per_band=12
                )
                save_index(
                    f"{tmp}/flat", keys=vkeys.drop("_bucket"), vecs=vvecs
                )
                emit("gate_vector_build_flat", m, time.time() - t0, 0)
                spark.catalog.clearCache()
                t0 = time.time()
                vkeys, vvecs = build_embedding_index(
                    emb, bands=4, planes_per_band=12
                )
                save_embedding_index(f"{tmp}/bkt", vkeys, vvecs)
                emit("gate_vector_build_bucketed", m, time.time() - t0, 0)
                spark.catalog.clearCache()
                idxs = {
                    "flat": load_index(spark, f"{tmp}/flat"),
                    "bucketed": load_index(spark, f"{tmp}/bkt"),
                }
                for bname, vb in batches.items():
                    for lname, vidx in idxs.items():
                        _gate(
                            f"gate_vector_{lname}_{bname}",
                            m,
                            lambda vidx=vidx, vb=vb: (
                                stream_embedding_near_dups(
                                    vb,
                                    vidx["keys"],
                                    vidx["vecs"],
                                    threshold=0.55,
                                    bands=4,
                                    planes_per_band=12,
                                ).dropDuplicates(["stream_id", "corpus_id"])
                            ),
                            vb,
                        )
            finally:
                shutil.rmtree(tmp, ignore_errors=True)

    if "deep512" in families:
        # two full decades above the fixture: does any super-linear
        # term hide beyond 64x? Headline corpus-wall families only —
        # at 512x the corpus is 2.56M docs and a single probe is
        # minutes, so this family is deliberately narrow.
        #
        # Unlike the 64x tables, the scaled corpus is MATERIALIZED to
        # parquet first and the probe reads it back: at 512 replicas
        # the fixture's union plan (512 scan branches + per-branch
        # regexp) costs more driver/plan time than the operator under
        # test (measured: minhash over 25k docs read 95s from the
        # 512-way union vs seconds from a scan), and a real corpus is
        # a parquet scan, not a 512-way union. Applied at every m in
        # this family so the decade ratios stay like-for-like.
        import shutil
        import tempfile

        for m in (8, 64, 512):
            tmp = tempfile.mkdtemp(prefix="ladder_deep_")
            scaled_corpus(spark, sf_dir, m).write.mode("overwrite").parquet(
                f"{tmp}/corpus"
            )
            corpus = spark.read.parquet(f"{tmp}/corpus")
            for name, fn in (
                (
                    "minhash_lsh",
                    lambda c: minhash_lsh_pairs(c, k=3, threshold=0.2),
                ),
                ("winnow_pairs", _winnow_pairs),
                (
                    "dedup_clusters",
                    lambda c: connected_components(
                        ngram_jaccard_pairs(
                            c,
                            k=3,
                            threshold=0.2,
                            block_cols=("lang",),
                            length_band=64,
                        )
                    ),
                ),
            ):
                secs, rows = probe(name, fn, corpus)
                emit(name, m, secs, rows)
            shutil.rmtree(tmp, ignore_errors=True)

    if "skew" in families:
        import shutil
        import tempfile
        import time

        from syncquill_spark.operators.skew import salted_agg, salted_join

        def _timed(name, m, fn):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            rows = fn().count()
            emit(name, m, time.time() - t0, rows)
            return rows

        for m in (8, 64):
            tmp = tempfile.mkdtemp(prefix="ladder_skew_")
            try:
                # fact = one row per token; 90% of rows get the hot
                # key 0 (carrying the token string as payload so the
                # hot shuffle partition crosses AQE's 256 MB skew
                # threshold), the rest spread over 1,000 keys.
                # Materialized to parquet so every config times the
                # JOIN, not the explode. Dim rows are unique per key,
                # so join output == fact rows in every config
                # (routing-only parity).
                corpus = scaled_corpus(spark, sf_dir, m)
                corpus.select(
                    F.explode(F.split("text", r"\s+")).alias("tok"),
                    "doc_id",
                ).select(
                    F.when(
                        F.pmod(F.xxhash64("tok", "doc_id"), F.lit(10)) < 9,
                        F.lit(0),
                    )
                    .otherwise(F.pmod(F.xxhash64("tok"), F.lit(1000)))
                    .cast("long")
                    .alias("k"),
                    F.col("doc_id").alias("payload"),
                    F.col("tok").alias("payload_s"),
                ).write.mode("overwrite").parquet(f"{tmp}/fact")
                fact = spark.read.parquet(f"{tmp}/fact")
                dim = spark.range(1000).select(
                    F.col("id").alias("k"), (F.col("id") * 7).alias("dim_val")
                )
                conf = spark.conf
                base_thresh = conf.get("spark.sql.autoBroadcastJoinThreshold")
                counts = set()
                try:
                    # A: session defaults — AQE broadcasts the dim
                    counts.add(
                        _timed(
                            "skewjoin_defaults",
                            m,
                            lambda: fact.join(dim, "k"),
                        )
                    )
                    # B: dim too big to broadcast (100 TB simulation),
                    # AQE skew split on at DEFAULT thresholds
                    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
                    counts.add(
                        _timed(
                            "skewjoin_noBcast_aqe",
                            m,
                            lambda: fact.join(dim, "k"),
                        )
                    )
                    # B2: AQE with skew thresholds scaled to the
                    # fixture's POST-COMPRESSION bytes. AQE's skew
                    # detector keys on compressed shuffle-partition
                    # bytes: this fixture's 15.6M-row hot partition
                    # lz4-compresses to ~2 MiB (repetitive tokens), so
                    # the 256 MB default — and any threshold above
                    # ~2 MB — never fires even though the partition is
                    # row/CPU-skewed. At 1 MB/512 KB the split
                    # demonstrably triggers.
                    conf.set(
                        "spark.sql.adaptive.skewJoin."
                        "skewedPartitionThresholdInBytes",
                        "1MB",
                    )
                    conf.set(
                        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                        "512KB",
                    )
                    counts.add(
                        _timed(
                            "skewjoin_noBcast_aqeTuned",
                            m,
                            lambda: fact.join(dim, "k"),
                        )
                    )
                    conf.unset(
                        "spark.sql.adaptive.skewJoin."
                        "skewedPartitionThresholdInBytes"
                    )
                    conf.unset(
                        "spark.sql.adaptive.advisoryPartitionSizeInBytes"
                    )
                    # C: the naive straggler — no broadcast, no AQE
                    conf.set("spark.sql.adaptive.enabled", "false")
                    counts.add(
                        _timed(
                            "skewjoin_noBcast_noAqe",
                            m,
                            lambda: fact.join(dim, "k"),
                        )
                    )
                    # D: explicit salting under the same suppression
                    counts.add(
                        _timed(
                            "skewjoin_salted_noAqe",
                            m,
                            lambda: salted_join(
                                fact, dim, "k", salt_factor=32
                            ),
                        )
                    )
                    # agg: plain vs salted two-phase on the hot key,
                    # AQE still off — expected ~equal (map-side
                    # combine de-skews decomposable aggs on its own)
                    _timed(
                        "skewagg_plain_noAqe",
                        m,
                        lambda: fact.groupBy("k").agg(
                            F.count(F.lit(1)).alias("n"),
                            F.sum("payload").alias("s"),
                        ),
                    )
                    _timed(
                        "skewagg_salted_noAqe",
                        m,
                        lambda: salted_agg(
                            fact,
                            "k",
                            {
                                "n": (F.count(F.lit(1)), "count"),
                                "s": (F.sum("payload"), "sum"),
                            },
                            salt_factor=32,
                        ),
                    )
                finally:
                    conf.set("spark.sql.adaptive.enabled", "true")
                    conf.set(
                        "spark.sql.autoBroadcastJoinThreshold", base_thresh
                    )
                if len(counts) != 1:
                    raise AssertionError(
                        f"skew join configs disagree on output rows: {counts}"
                    )
            finally:
                shutil.rmtree(tmp, ignore_errors=True)

    if "bpe" in families:
        from syncquill_spark.operators.bpe import train_bpe, word_freqs

        for m in LADDER:
            corpus = scaled_corpus(spark, sf_dir, m)
            secs, rows = probe(
                "bpe_wordfreqs", lambda c: word_freqs(c), corpus
            )
            emit("bpe_wordfreqs", m, secs, rows)
            for nm in (10, 20, 40):
                secs, rows = probe(
                    f"bpe_train{nm}",
                    lambda c, _n=nm: train_bpe(c, n_merges=_n)[1],
                    corpus,
                )
                emit(f"bpe_train{nm}", m, secs, rows)


if __name__ == "__main__":
    main()
