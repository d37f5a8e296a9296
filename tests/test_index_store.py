"""Persisted index lifecycle (sources/index_store.py): save/load
round trip preserves dedup results exactly; writes are atomic."""

from __future__ import annotations

import os

import pytest

from syncquill_spark.sources.index_store import load_index, save_index


def test_minhash_index_round_trip_preserves_matches(spark, tmp_path, sf_dir):
    """Build the corpus MinHash index, persist it, reload it, and run
    the ingest-time fuzzy gate against both — identical match sets.
    This is the nightly-build / per-batch-query deployment shape."""
    from pyspark.sql import functions as F

    from syncquill_spark.streaming.text_dedup import (
        build_text_minhash_index,
        stream_text_near_dups,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    new_batch = docs.filter(F.col("doc_id") % 5 == 0)

    keys, shingles = build_text_minhash_index(corpus)
    idx_path = str(tmp_path / "minhash_idx")
    save_index(idx_path, keys=keys, shingles=shingles)
    loaded = load_index(spark, idx_path)
    assert set(loaded) == {"keys", "shingles"}

    def matches(k, s):
        return sorted(
            (r.stream_id, r.corpus_id)
            for r in stream_text_near_dups(new_batch, k, s, threshold=0.2)
            .select("stream_id", "corpus_id")
            .dropDuplicates()
            .collect()
        )

    fresh = matches(keys, shingles)
    persisted = matches(loaded["keys"], loaded["shingles"])
    assert fresh == persisted and len(fresh) > 0


def test_embedding_index_round_trip(spark, tmp_path, sf_dir):
    from pyspark.sql import functions as F

    from syncquill_spark.streaming.vector_dedup import (
        build_embedding_index,
        stream_embedding_near_dups,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    new_batch = emb.filter(F.col("vec_id") % 5 == 0)
    built = build_embedding_index(corpus)
    keys, vecs = built if isinstance(built, tuple) else (built, None)
    idx_path = str(tmp_path / "emb_idx")
    save_index(idx_path, keys=keys, vecs=vecs)
    loaded = load_index(spark, idx_path)

    def matches(k, v):
        return sorted(
            (r.stream_id, r.corpus_id)
            for r in stream_embedding_near_dups(new_batch, k, v, threshold=0.3)
            .select("stream_id", "corpus_id")
            .dropDuplicates()
            .collect()
        )

    assert matches(keys, vecs) == matches(loaded["keys"], loaded["vecs"])


def test_save_index_atomic_overwrite_and_guards(spark, tmp_path):
    df1 = spark.createDataFrame([(1,)], "x long")
    df2 = spark.createDataFrame([(2,), (3,)], "x long")
    p = str(tmp_path / "idx")
    save_index(p, part=df1)
    assert [r.x for r in load_index(spark, p)["part"].collect()] == [1]
    save_index(p, part=df2)  # full replacement, no stale parts
    assert sorted(r.x for r in load_index(spark, p)["part"].collect()) == [2, 3]
    assert os.path.exists(os.path.join(p, "_index_manifest.json"))
    with pytest.raises(ValueError):
        save_index(str(tmp_path / "empty"))


def test_ivf_index_round_trip_and_prebuilt_centroids(spark, tmp_path, sf_dir):
    """ivf_build_index -> save -> load -> ivf_topk(centroids=loaded)
    returns EXACTLY what the inline build returns (both refine
    settings) — the ANN index's nightly-build lifecycle."""
    from pyspark.sql import functions as F

    from syncquill_spark.operators.similarity import ivf_build_index, ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for refine in (0, 2):
        idx = ivf_build_index(emb, n_cells=16, refine_iters=refine)
        p = str(tmp_path / f"ivf_{refine}")
        save_index(p, centroids=idx)
        loaded = load_index(spark, p)["centroids"]
        inline = sorted(
            tuple(r) for r in ivf_topk(emb, queries, k=5, refine_iters=refine).collect()
        )
        from_index = sorted(
            tuple(r) for r in ivf_topk(emb, queries, k=5, centroids=loaded).collect()
        )
        assert inline == from_index and len(inline) > 0


def test_batch_gate_against_loaded_index_equals_recompute(spark, tmp_path, sf_dir):
    """text_near_dups_against_index over a persisted+reloaded index
    must equal minhash_lsh_pairs_against recomputing both sides from
    text — the identity the storage_index_roundtrip registry query
    puts under the driver's oracle gate."""
    from pyspark.sql import functions as F

    from syncquill_spark.operators.dedup import minhash_lsh_pairs_against
    from syncquill_spark.streaming.text_dedup import (
        build_text_minhash_index,
        text_near_dups_against_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new_side = docs.filter(F.col("doc_id") % 2 == 1)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)

    keys, shingles = build_text_minhash_index(corpus)
    p = str(tmp_path / "gate_idx")
    save_index(p, keys=keys, shingles=shingles)
    loaded = load_index(spark, p)

    via_index = sorted(
        (r.id_new, r.id_corpus, r.jac)
        for r in text_near_dups_against_index(
            new_side, loaded["keys"], loaded["shingles"], threshold=0.2
        ).collect()
    )
    recompute = sorted(
        (r.id_new, r.id_corpus, r.jac)
        for r in minhash_lsh_pairs_against(
            new_side, corpus, threshold=0.2
        ).collect()
    )
    assert via_index == recompute and len(via_index) > 0


def test_incremental_index_merge_equals_rebuild(spark, tmp_path, sf_dir):
    """merge_text_minhash_index(stored, batch) must equal
    build_text_minhash_index(corpus+batch) row-for-row, and the pairs
    emitted from the merged index alone must equal
    minhash_lsh_pairs recomputing from text — the append==rebuild
    identity storage_index_incremental pins to the driver oracle."""
    from pyspark.sql import functions as F

    from syncquill_spark.operators.dedup import minhash_lsh_pairs
    from syncquill_spark.streaming.text_dedup import (
        build_text_minhash_index,
        merge_text_minhash_index,
        minhash_pairs_from_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)

    keys0, sh0 = build_text_minhash_index(half)
    p = str(tmp_path / "inc_idx")
    save_index(p, keys=keys0, shingles=sh0)
    loaded = load_index(spark, p)
    mkeys, msh = merge_text_minhash_index(loaded["keys"], loaded["shingles"], batch)

    rkeys, rsh = build_text_minhash_index(docs)
    assert sorted(map(tuple, mkeys.collect())) == sorted(map(tuple, rkeys.collect()))
    assert sorted(
        (r.corpus_id, tuple(r._sh_c)) for r in msh.collect()
    ) == sorted((r.corpus_id, tuple(r._sh_c)) for r in rsh.collect())

    from_index = sorted(
        (r.id_a, r.id_b, r.jac)
        for r in minhash_pairs_from_index(mkeys, msh, threshold=0.2).collect()
    )
    from_text = sorted(
        (r.id_a, r.id_b, r.jac)
        for r in minhash_lsh_pairs(docs, threshold=0.2).collect()
    )
    assert from_index == from_text and len(from_index) > 0


def test_winnowing_index_merge_equals_rebuild(spark, tmp_path, sf_dir):
    """merge_winnowing_index(stored, batch) must equal
    build_winnowing_index(corpus+batch) row-for-row, and the pairs
    emitted from the merged index alone must equal
    winnowing_match_pairs recomputing from text — the append==rebuild
    identity storage_winnowing_index pins to the driver oracle."""
    from pyspark.sql import functions as F

    from syncquill_spark.operators.text import winnowing_match_pairs
    from syncquill_spark.streaming.text_dedup import (
        build_winnowing_index,
        merge_winnowing_index,
        winnowing_pairs_from_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)

    fps0 = build_winnowing_index(half)
    p = str(tmp_path / "win_idx")
    save_index(p, fps=fps0)
    loaded = load_index(spark, p)
    merged = merge_winnowing_index(loaded["fps"], batch)

    rebuilt = build_winnowing_index(docs)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )

    from_index = sorted(
        (r.id_a, r.id_b, r.n_shared)
        for r in winnowing_pairs_from_index(
            merged, min_shared=2, max_fp_df=20
        ).collect()
    )
    from_text = sorted(
        (r.id_a, r.id_b, r.n_shared)
        for r in winnowing_match_pairs(
            docs, min_shared=2, max_fp_df=20
        ).collect()
    )
    assert from_index == from_text and len(from_index) > 0


def test_winnowing_gate_matches_rebuild_cross_pairs(spark, sf_dir):
    """winnowing_matches_against (batch fingerprinted, corpus from the
    index, hub df over the union) must equal winnowing_match_pairs over
    corpus+batch restricted to (new x corpus) pairs — the gate loses
    nothing and invents nothing vs a full rebuild."""
    from pyspark.sql import functions as F

    from syncquill_spark.operators.text import winnowing_match_pairs
    from syncquill_spark.streaming.text_dedup import (
        build_winnowing_index,
        winnowing_matches_against,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    gate = sorted(
        (r.id_new, r.id_corpus, r.n_shared)
        for r in winnowing_matches_against(
            batch, build_winnowing_index(corpus), min_shared=2, max_fp_df=20
        ).collect()
    )
    full = winnowing_match_pairs(docs, min_shared=2, max_fp_df=20).collect()
    # match_pairs orients id_a < id_b; the gate orients (new, corpus)
    cross = sorted(
        (r.id_a, r.id_b, r.n_shared) if r.id_a % 2 == 1 else (r.id_b, r.id_a, r.n_shared)
        for r in full
        if (r.id_a % 2) != (r.id_b % 2)
    )
    assert gate == cross and len(gate) > 0


def test_winnowing_gate_in_foreachbatch_stream(spark, tmp_path, sf_dir):
    """Streaming deployment shape: winnowing selection is a per-doc
    window aggregation, so the gate runs inside foreachBatch — each
    microbatch is fingerprinted as a small batch DataFrame and joined
    against the loaded index."""
    from pyspark.sql import functions as F

    from syncquill_spark.streaming.text_dedup import (
        build_winnowing_index,
        winnowing_matches_against,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch_src = str(tmp_path / "stream_src")
    docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text").coalesce(
        1
    ).write.mode("overwrite").parquet(batch_src)
    save_index(str(tmp_path / "win_idx"), fps=build_winnowing_index(corpus))
    index_fps = load_index(spark, str(tmp_path / "win_idx"))["fps"]

    got = []

    def gate(mb, _epoch):
        got.extend(
            (r.id_new, r.id_corpus, r.n_shared)
            for r in winnowing_matches_against(
                mb, index_fps, min_shared=1, max_fp_df=20
            ).collect()
        )

    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(batch_src)
    )
    q = stream.writeStream.foreachBatch(gate).trigger(availableNow=True).start()
    q.awaitTermination(120)

    expect = sorted(
        (r.id_new, r.id_corpus, r.n_shared)
        for r in winnowing_matches_against(
            spark.read.parquet(batch_src), index_fps, min_shared=1, max_fp_df=20
        ).collect()
    )
    assert sorted(got) == expect and len(expect) > 0


def test_winnowing_df_part_equals_recount(spark, sf_dir):
    """The persisted (fp, df) part: merge_winnowing_df (stored df +
    batch counts) must equal winnowing_fp_df over the merged index
    row-for-row, and both the pairs emitter and the gate must produce
    IDENTICAL output through the stored-df path and the recount path —
    the batch-sized-nightly-cost optimization changes nothing."""
    from pyspark.sql import functions as F

    from syncquill_spark.streaming.text_dedup import (
        build_winnowing_index,
        merge_winnowing_df,
        winnowing_fp_df,
        winnowing_matches_against,
        winnowing_pairs_from_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    corpus_fps = build_winnowing_index(corpus)
    batch_fps = build_winnowing_index(batch)
    merged_fps = corpus_fps.unionByName(batch_fps)

    inc_df = merge_winnowing_df(winnowing_fp_df(corpus_fps), batch_fps)
    assert sorted(map(tuple, inc_df.collect())) == sorted(
        map(tuple, winnowing_fp_df(merged_fps).collect())
    )

    pair_args = dict(min_shared=2, max_fp_df=20)
    with_df = winnowing_pairs_from_index(merged_fps, index_df=inc_df, **pair_args)
    recount = winnowing_pairs_from_index(merged_fps, **pair_args)
    assert sorted(map(tuple, with_df.collect())) == sorted(
        map(tuple, recount.collect())
    )

    gate_df = winnowing_matches_against(
        batch, corpus_fps, index_df=winnowing_fp_df(corpus_fps), **pair_args
    )
    gate_recount = winnowing_matches_against(batch, corpus_fps, **pair_args)
    got = sorted(map(tuple, gate_df.collect()))
    assert got == sorted(map(tuple, gate_recount.collect())) and len(got) > 0


def test_winnowing_positions_part_and_match_spans(spark, tmp_path):
    """Match LOCALIZATION (round-8 verdict #6): the optional positions
    part persists through the same manifest without changing pair
    detection, and winnowing_match_spans merges shared-fingerprint
    anchors on the diagonal into the planted copied passage's span in
    BOTH documents. Planted layout: doc 1 carries the passage after a
    2-token prefix, doc 2 after a 4-token prefix, so every anchor sits
    on diagonal +2 and the merged run's starts differ by exactly 2."""
    from syncquill_spark.sources.index_store import load_index, save_index
    from syncquill_spark.streaming.text_dedup import (
        build_winnowing_index,
        build_winnowing_positions,
        winnowing_fp_df,
        winnowing_match_spans,
        winnowing_pairs_from_index,
    )

    shared = "the quick brown fox jumps over the lazy dog tonight again"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma"),
            (2, f"one two three four {shared}"),
            (3, "completely unrelated text about something else entirely"),
        ],
        "doc_id long, text string",
    )
    fps = build_winnowing_index(docs)
    pos = build_winnowing_positions(docs)
    path = str(tmp_path / "win_idx")
    save_index(path, fps=fps, fpdf=winnowing_fp_df(fps), positions=pos)
    loaded = load_index(spark, path)

    # pair detection from the 2-part view is unchanged by the 3rd part
    pairs = winnowing_pairs_from_index(
        loaded["fps"], min_shared=2, index_df=loaded["fpdf"]
    )
    got_pairs = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got_pairs == {(1, 2)}

    spans = winnowing_match_spans(pairs, loaded["positions"], k=3).collect()
    assert len(spans) == 1, f"expected one merged run, got {spans}"
    s = spans[0]
    assert (s.id_a, s.id_b) == (1, 2)
    # diagonal: doc 2's prefix is 2 tokens longer than doc 1's
    assert s.start_b - s.start_a == 2 and s.end_b - s.end_a == 2
    # the run lies inside the shared passage's gram range of each doc
    # (doc 1: grams 0..last; passage tokens start at index 2)
    assert s.start_a >= 2 and s.end_a <= 2 + len(shared.split()) - 1
    assert s.n_anchors >= 2

    # unrelated pair list -> no spans (join semantics, not a crash)
    empty = winnowing_match_spans(
        pairs.filter("id_a = 999"), loaded["positions"], k=3
    )
    assert empty.count() == 0


def test_ivfpq_index_serve_equals_monolithic(spark, tmp_path, sf_dir):
    """The persisted cell-co-located IVF-PQ layout (round-8 verdict
    #7): build -> save (codes Hive-partitioned by cell_id) -> load ->
    serve must equal the monolithic ivfpq_topk row-for-row, in both
    plain and residual modes; the on-disk codes part must actually be
    partitioned by cell (the layout DPP prunes at serve time)."""
    import os

    from pyspark.sql import functions as F

    from syncquill_spark.operators.similarity import (
        ivfpq_build_index,
        ivfpq_topk,
        ivfpq_topk_from_index,
    )
    from syncquill_spark.sources.index_store import load_index, save_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for residual in (False, True):
        idx = ivfpq_build_index(emb, n_cells=8, residual=residual)
        path = str(tmp_path / f"ivfpq_{residual}")
        save_index(path, _partition_by={"codes": ["cell_id"]}, **idx)
        loaded = load_index(spark, path)
        got = sorted(
            map(
                tuple,
                ivfpq_topk_from_index(
                    q, loaded, k=5, nprobe=2, residual=residual
                ).collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                ivfpq_topk(
                    emb, q, k=5, n_cells=8, nprobe=2, residual=residual
                ).collect(),
            )
        )
        assert got == want, f"residual={residual}: serve != monolithic"
        # the layout claim itself: Hive partition dirs per cell
        cell_dirs = [
            d for d in os.listdir(os.path.join(path, "codes"))
            if d.startswith("cell_id=")
        ]
        assert len(cell_dirs) >= 2, f"codes not cell-partitioned: {cell_dirs}"


def _simhash_corpus(spark):
    """Hand-built corpus with planted near-dup groups spanning the
    even/odd id split: per base text, ids 4i..4i+3 carry the base with
    0-2 token edits, so every group yields within- and cross-split
    pairs at small hamming."""
    bases = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "pack my box with five dozen liquor jugs before the long trip",
        "sphinx of black quartz judge my vow under the ancient stone arch",
        "how vexingly quick daft zebras jump across the frozen northern lake",
        "we promptly judged antique ivory buckles for the next big prize",
        "crazy frederick bought many very exquisite opal jewels last summer",
    ]
    rows = []
    for i, base in enumerate(bases):
        toks = base.split()
        rows.append((4 * i, " ".join(toks)))
        rows.append((4 * i + 1, " ".join(toks)))  # identical twin
        rows.append((4 * i + 2, " ".join(toks[:-1] + ["changed"])))
        rows.append((4 * i + 3, " ".join(["extra"] + toks[1:])))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_index_merge_equals_rebuild(spark, tmp_path):
    """merge_simhash_index(stored, batch) must equal
    build_simhash_index(corpus+batch) row-for-row, and pairs emitted
    from the merged index alone must equal simhash_near_pairs
    recomputing from text — append == rebuild for the fourth (and
    cheapest) index family."""
    from pyspark.sql import functions as F

    from syncquill_spark.operators.dedup import simhash_near_pairs
    from syncquill_spark.streaming.text_dedup import (
        build_simhash_index,
        merge_simhash_index,
        simhash_pairs_from_index,
    )

    docs = _simhash_corpus(spark)
    half = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)

    p = str(tmp_path / "sh_idx")
    save_index(p, fps=build_simhash_index(half))
    merged = merge_simhash_index(load_index(spark, p)["fps"], batch)

    rebuilt = build_simhash_index(docs)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )

    from_index = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_pairs_from_index(merged, max_hamming=5).collect()
    )
    from_text = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_pairs(docs, max_hamming=5).collect()
    )
    assert from_index == from_text and len(from_index) > 0


def test_simhash_gate_matches_rebuild_cross_pairs(spark):
    """simhash_matches_against (batch fingerprinted, corpus from the
    index) must equal simhash_near_pairs over corpus+batch restricted
    to (new x corpus) pairs — the gate loses nothing and invents
    nothing vs a full rebuild."""
    from pyspark.sql import functions as F

    from syncquill_spark.operators.dedup import simhash_near_pairs
    from syncquill_spark.streaming.text_dedup import (
        build_simhash_index,
        simhash_matches_against,
    )

    docs = _simhash_corpus(spark)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    gate = sorted(
        (r.id_new, r.id_corpus, r.hamming)
        for r in simhash_matches_against(
            batch, build_simhash_index(corpus), max_hamming=5
        ).collect()
    )
    full = simhash_near_pairs(docs, max_hamming=5).collect()
    cross = sorted(
        (r.id_a, r.id_b, r.hamming) if r.id_a % 2 == 1 else (r.id_b, r.id_a, r.hamming)
        for r in full
        if (r.id_a % 2) != (r.id_b % 2)
    )
    assert gate == cross and len(gate) > 0


def test_simhash_band_hub_cap_insurance(spark):
    """The optional max_band_df cap: a huge cap changes nothing (exact
    parity with the uncapped join); a tiny cap drops pairs that relied
    only on hub buckets (documented lossy insurance); and the gate's
    cap basis is the UNION of stored + batch band rows, so
    gate-with-cap equals rebuild-with-cap restricted to cross pairs."""
    from pyspark.sql import functions as F

    from syncquill_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_pairs_from_fingerprints,
    )
    from syncquill_spark.streaming.text_dedup import (
        build_simhash_index,
        simhash_matches_against,
        simhash_pairs_from_index,
    )

    docs = _simhash_corpus(spark)
    idx = build_simhash_index(docs)

    uncapped = sorted(
        map(tuple, simhash_pairs_from_index(idx, max_hamming=5).collect())
    )
    big_cap = sorted(
        map(
            tuple,
            simhash_pairs_from_index(idx, max_hamming=5, max_band_df=10**6).collect(),
        )
    )
    assert big_cap == uncapped and len(uncapped) > 0

    # identical twins share EVERY band; cap 1 kills every bucket that
    # holds >1 doc, so all pairs vanish — maximal illustration of the
    # documented loss mode (run exact_dedup upstream)
    twins = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(6)],
        "doc_id long, text string",
    )
    fp = simhash_fingerprints(twins)
    capped = simhash_pairs_from_fingerprints(fp, max_hamming=0, max_band_df=1)
    assert capped.count() == 0

    # gate cap parity over the union basis
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    cap = 3
    gate = sorted(
        (r.id_new, r.id_corpus, r.hamming)
        for r in simhash_matches_against(
            batch, build_simhash_index(corpus), max_hamming=5, max_band_df=cap
        ).collect()
    )
    rebuilt = simhash_pairs_from_index(idx, max_hamming=5, max_band_df=cap).collect()
    cross = sorted(
        (r.id_a, r.id_b, r.hamming) if r.id_a % 2 == 1 else (r.id_b, r.id_a, r.hamming)
        for r in rebuilt
        if (r.id_a % 2) != (r.id_b % 2)
    )
    assert gate == cross


def test_simhash_gate_in_foreachbatch_stream(spark, tmp_path):
    """Streaming deployment shape: the SimHash fingerprint is a per-doc
    aggregation, so the gate runs inside foreachBatch — same contract
    as the winnowing and bigram gates."""
    from pyspark.sql import functions as F

    from syncquill_spark.streaming.text_dedup import (
        build_simhash_index,
        simhash_matches_against,
    )

    docs = _simhash_corpus(spark)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch_src = str(tmp_path / "sh_stream_src")
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(batch_src)
    save_index(str(tmp_path / "sh_idx"), fps=build_simhash_index(corpus))
    index_fps = load_index(spark, str(tmp_path / "sh_idx"))["fps"]

    got = []

    def gate(mb, _epoch):
        got.extend(
            (r.id_new, r.id_corpus, r.hamming)
            for r in simhash_matches_against(mb, index_fps, max_hamming=5).collect()
        )

    stream = spark.readStream.schema("doc_id long, text string").parquet(batch_src)
    q = stream.writeStream.foreachBatch(gate).trigger(availableNow=True).start()
    q.awaitTermination(120)

    expect = sorted(
        (r.id_new, r.id_corpus, r.hamming)
        for r in simhash_matches_against(
            spark.read.parquet(batch_src), index_fps, max_hamming=5
        ).collect()
    )
    assert sorted(got) == expect and len(expect) > 0


def test_ivfpq_index_merge_appends_against_frozen_quantizer(spark, tmp_path, sf_dir):
    """merge_ivfpq_index: only the batch is read; its codes are
    computed against the STORED centroids+codebook (frozen-quantizer
    append). Pins: merged == build(corpus+batch, centroids=stored,
    codebook=stored) part-for-part; serving from the merged index ==
    serving from that rebuilt index row-for-row; existing codes are
    byte-identical after the append — in plain and residual modes."""
    from pyspark.sql import functions as F

    from syncquill_spark.operators.similarity import (
        ivfpq_build_index,
        ivfpq_topk_from_index,
        merge_ivfpq_index,
    )
    from syncquill_spark.sources.index_store import load_index, save_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for residual in (False, True):
        path = str(tmp_path / f"ivfpq_m_{residual}")
        save_index(
            path,
            _partition_by={"codes": ["cell_id"]},
            **ivfpq_build_index(half, n_cells=8, residual=residual),
        )
        stored = load_index(spark, path)
        merged = merge_ivfpq_index(stored, batch, residual=residual)

        rebuilt = ivfpq_build_index(
            emb,
            n_cells=8,
            residual=residual,
            centroids=stored["centroids"],
            codebook=stored["codebook"],
        )
        for part in ("centroids", "codebook", "codes"):
            got = sorted(map(tuple, merged[part].collect()))
            want = sorted(map(tuple, rebuilt[part].collect()))
            assert got == want, f"residual={residual}: {part} differs"

        # stored codes untouched by the append (r16: one array row per
        # vector — (cell_id, vec_id, codes array<long>))
        cols = ["cell_id", "vec_id", "codes"]
        stored_codes = sorted(map(tuple, stored["codes"].select(*cols).collect()))
        merged_half = sorted(
            map(
                tuple,
                merged["codes"]
                .filter(F.col("vec_id") % 2 == 0)
                .select(*cols)
                .collect(),
            )
        )
        assert merged_half == stored_codes

        got_serve = sorted(
            map(
                tuple,
                ivfpq_topk_from_index(
                    q, merged, k=5, nprobe=2, residual=residual
                ).collect(),
            )
        )
        want_serve = sorted(
            map(
                tuple,
                ivfpq_topk_from_index(
                    q, rebuilt, k=5, nprobe=2, residual=residual
                ).collect(),
            )
        )
        assert got_serve == want_serve and len(got_serve) > 0


def test_ivfpq_build_prebuilt_parts_guard(spark, sf_dir):
    """centroids/codebook must be given together — one without the
    other is a contract error, not a silent half-frozen build."""
    import pytest as _pytest

    from syncquill_spark.operators.similarity import ivfpq_build_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    idx = ivfpq_build_index(emb, n_cells=4)
    with _pytest.raises(ValueError):
        ivfpq_build_index(emb, n_cells=4, centroids=idx["centroids"])
    with _pytest.raises(ValueError):
        ivfpq_build_index(emb, n_cells=4, codebook=idx["codebook"])


def test_append_index_equals_save_over(spark, tmp_path):
    """append_index(batch rows) must load back identical to
    save_index(stored ∪ batch), while leaving the original data files
    hardlinked in place (batch-sized write cost) — flat and
    Hive-partitioned parts, plus a new part extending the manifest."""
    import os

    from pyspark.sql import functions as F

    from syncquill_spark.sources.index_store import append_index

    docs = _simhash_corpus(spark)
    half = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)

    # flat part
    p1 = str(tmp_path / "app_idx")
    save_index(p1, rows=half)
    before = {
        f: os.stat(os.path.join(p1, "rows", f)).st_ino
        for f in os.listdir(os.path.join(p1, "rows"))
        if not f.startswith((".", "_"))
    }
    append_index(p1, rows=batch)
    got = sorted(map(tuple, load_index(spark, p1)["rows"].collect()))
    want = sorted(map(tuple, docs.collect()))
    assert got == want
    after = {
        f: os.stat(os.path.join(p1, "rows", f)).st_ino
        for f in os.listdir(os.path.join(p1, "rows"))
        if not f.startswith((".", "_"))
    }
    # original files survive as hardlinks (same names, same inodes)
    assert set(before) <= set(after)
    assert all(after[f] == ino for f, ino in before.items())
    assert len(after) > len(before)  # batch added its own files

    # Hive-partitioned part + a NEW part in the same call
    pb = {"bucketed": ["b"]}
    halfb = half.withColumn("b", (F.col("doc_id") % 3).cast("int"))
    batchb = batch.withColumn("b", (F.col("doc_id") % 3).cast("int"))
    p2 = str(tmp_path / "app_idx_part")
    save_index(p2, _partition_by=pb, bucketed=halfb)
    append_index(p2, _partition_by=pb, bucketed=batchb, extra=batch)
    loaded = load_index(spark, p2)
    gotb = sorted(
        (r.doc_id, r.text, r.b)
        for r in loaded["bucketed"].collect()
    )
    wantb = sorted(
        (r.doc_id, r.text, r.b)
        for r in docs.withColumn("b", (F.col("doc_id") % 3).cast("int")).collect()
    )
    assert gotb == wantb
    assert sorted(map(tuple, loaded["extra"].collect())) == sorted(
        map(tuple, batch.collect())
    )
    dirs = [d for d in os.listdir(os.path.join(p2, "bucketed")) if d.startswith("b=")]
    assert len(dirs) == 3


def test_append_index_winnowing_gate_parity(spark, sf_dir, tmp_path):
    """The deployment recipe end-to-end: winnowing fps appended
    batch-sized via append_index (the (fp, df) part re-derived from
    the stored rows on load), gate matches == full-rebuild cross
    pairs — identical to the save-over path."""
    from pyspark.sql import functions as F

    from syncquill_spark.sources.index_store import append_index
    from syncquill_spark.streaming.text_dedup import (
        build_winnowing_index,
        winnowing_fp_df,
        winnowing_matches_against,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    corpus_a = docs.filter(F.col("doc_id") % 4 == 0)
    corpus_b = docs.filter(F.col("doc_id") % 4 == 2)
    probe = docs.filter(F.col("doc_id") % 2 == 1)

    p = str(tmp_path / "win_app")
    save_index(p, fps=build_winnowing_index(corpus_a))
    append_index(p, fps=build_winnowing_index(corpus_b))
    stored = load_index(spark, p)["fps"]

    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    got = sorted(
        (r.id_new, r.id_corpus, r.n_shared)
        for r in winnowing_matches_against(
            probe, stored, min_shared=1, max_fp_df=20,
            index_df=winnowing_fp_df(stored),
        ).collect()
    )
    want = sorted(
        (r.id_new, r.id_corpus, r.n_shared)
        for r in winnowing_matches_against(
            probe, build_winnowing_index(corpus), min_shared=1, max_fp_df=20,
        ).collect()
    )
    assert got == want and len(got) > 0


def test_append_index_with_replace_parts(spark, sf_dir, tmp_path):
    """One atomic call per nightly merge: row parts appended, small
    aggregated parts rewritten — committed in the same swap. Pinned
    against the save-over path on the winnowing two-part index, plus
    the append/replace-overlap guard."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from syncquill_spark.sources.index_store import append_index
    from syncquill_spark.streaming.text_dedup import (
        build_winnowing_index,
        merge_winnowing_df,
        winnowing_fp_df,
        winnowing_pairs_from_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    half = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)

    p = str(tmp_path / "win_app_rep")
    fps0 = build_winnowing_index(half)
    save_index(p, fps=fps0, fpdf=winnowing_fp_df(fps0))
    loaded = load_index(spark, p)
    batch_fps = build_winnowing_index(batch)
    append_index(
        p,
        _replace={"fpdf": merge_winnowing_df(loaded["fpdf"], batch_fps)},
        fps=batch_fps,
    )
    stored = load_index(spark, p)

    # stored (fp, df) == recount over the merged rows
    got_df = sorted(map(tuple, stored["fpdf"].collect()))
    want_df = sorted(map(tuple, winnowing_fp_df(stored["fps"]).collect()))
    assert got_df == want_df

    # pairs from the appended index (stored-df hub cap) == full rebuild
    got = sorted(
        map(
            tuple,
            winnowing_pairs_from_index(
                stored["fps"], min_shared=1, max_fp_df=20,
                index_df=stored["fpdf"],
            ).collect(),
        )
    )
    full = build_winnowing_index(docs)
    want = sorted(
        map(
            tuple,
            winnowing_pairs_from_index(
                full, min_shared=1, max_fp_df=20
            ).collect(),
        )
    )
    assert got == want and len(got) > 0

    with _pytest.raises(ValueError):
        append_index(p, _replace={"fps": batch_fps}, fps=batch_fps)


@pytest.mark.parametrize("gate", ["nogate", "cap", "cap_stored"])
def test_winnowing_spans_against_contamination_report(spark, tmp_path, gate):
    """Cross-corpus span localization (the decontamination report):
    batch-vs-index matches localized to token spans must equal the
    within-corpus span merge over corpus+batch restricted to cross
    pairs — same diagonals, same runs — and the corpus side reads
    only the stored fps + positions parts.

    Parametrized over the hub-cap gate (ADVICE r11: the max_fp_df and
    index_df branches of the spans path previously had no caller in
    any test, so the inline copy of the gate could silently diverge
    from winnowing_matches_against's — now both share
    ``_gated_winnowing_matches`` AND this test drives the spans path
    through all three branches):
      nogate      — max_fp_df=None (the original case);
      cap         — max_fp_df set, df aggregated over the union basis;
      cap_stored  — max_fp_df set with the persisted (fp, df) part,
                    union df = stored df + batch counts.
    A planted boilerplate phrase in 2 corpus + 1 batch docs (its
    interior fingerprints carry union df 3 > 2 = max_fp_df) makes the
    gated result DIFFER from the ungated one (boilerplate-only pairs
    vanish), proving the branch executed."""
    from pyspark.sql import functions as F

    from syncquill_spark.streaming.text_dedup import (
        build_winnowing_index,
        build_winnowing_positions,
        winnowing_fp_df,
        winnowing_match_spans,
        winnowing_pairs_from_index,
        winnowing_spans_against,
    )

    shared = "the quick brown fox jumps over the lazy dog tonight again"
    boiler = "subscribe to our newsletter for updates every single day"
    corpus = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma"),
            (3, f"completely unrelated text about something else {boiler}"),
            (5, f"{boiler} stapled onto an otherwise distinct page"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (101, f"one two three four {shared}"),
            (102, f"another unrelated new document arriving {boiler}"),
        ],
        "doc_id long, text string",
    )
    max_fp_df = None if gate == "nogate" else 2
    p = str(tmp_path / "win_spans_idx")
    fps = build_winnowing_index(corpus)
    save_index(
        p,
        fps=fps,
        fpdf=winnowing_fp_df(fps),
        positions=build_winnowing_positions(corpus),
    )
    loaded = load_index(spark, p)

    got = sorted(
        map(
            tuple,
            winnowing_spans_against(
                batch,
                loaded["fps"],
                loaded["positions"],
                min_shared=2,
                max_fp_df=max_fp_df,
                index_df=loaded["fpdf"] if gate == "cap_stored" else None,
            ).collect(),
        )
    )

    # rebuild equivalent: spans over corpus+batch, cross pairs only —
    # the hub cap's union basis IS the rebuild's basis, so the same
    # max_fp_df applies on both sides of the identity
    both = corpus.unionByName(batch)
    fps_all = build_winnowing_index(both)
    pairs_all = winnowing_pairs_from_index(
        fps_all, min_shared=2, max_fp_df=max_fp_df
    )
    cross = pairs_all.filter(
        ((F.col("id_a") < 100) & (F.col("id_b") >= 100))
        | ((F.col("id_a") >= 100) & (F.col("id_b") < 100))
    )
    spans_all = winnowing_match_spans(
        cross.select("id_a", "id_b"), build_winnowing_positions(both)
    )
    # orient (new, corpus): batch ids are >= 100; pairs orient id_a<id_b
    want = sorted(
        (
            r.id_b, r.id_a,
            r.start_b, r.end_b, r.start_a, r.end_a, r.n_anchors,
        )
        for r in spans_all.collect()
    )
    assert got == want and len(got) >= 1
    pairs_got = {(r[0], r[1]) for r in got}
    if gate == "nogate":
        # the boilerplate hub creates cross matches beyond the planted
        # contamination pair — the material the cap exists to drop
        assert (101, 1) in pairs_got and len(pairs_got) > 1
    else:
        # capped: the boilerplate's shared interior fps (df 3 > 2)
        # are gone; only the distinctive passage (df 2) still matches
        assert pairs_got == {(101, 1)}
        (row,) = got
        # doc 101 carries the passage after a 4-token prefix, doc 1
        # after 2
        assert row[2] - row[4] == 2 and row[3] - row[5] == 2


def test_append_index_rejects_mismatched_partition_layout(spark, tmp_path):
    """ADVICE r09: appending rows in a different Hive layout than the
    stored part used to commit a mixed directory that only failed
    later, at load_index, AFTER the swap replaced the good index. The
    disagreement must now raise up front, before anything is written
    — in both directions — and an explicit matching layout (or a
    genuinely new part) must keep working."""
    import pytest
    from pyspark.sql import functions as F

    from syncquill_spark.sources.index_store import append_index

    rows = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("int").alias("cell")
    )
    batch = spark.range(20, 30).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("int").alias("cell")
    )

    # stored partitioned, append flat -> refused
    p1 = str(tmp_path / "part_idx")
    save_index(p1, _partition_by={"rows": ["cell"]}, rows=rows)
    with pytest.raises(ValueError, match="partitioned by \\['cell'\\]"):
        append_index(p1, rows=batch)
    # ...and nothing was committed: the stored index still loads whole
    assert load_index(spark, p1)["rows"].count() == 20

    # stored flat, append partitioned -> refused
    p2 = str(tmp_path / "flat_idx")
    save_index(p2, rows=rows)
    with pytest.raises(ValueError, match="requested \\['cell'\\]"):
        append_index(p2, _partition_by={"rows": ["cell"]}, rows=batch)

    # matching layouts and new parts still work
    append_index(p1, _partition_by={"rows": ["cell"]}, rows=batch)
    assert load_index(spark, p1)["rows"].count() == 30
    append_index(p2, rows=batch, extra=batch)
    loaded = load_index(spark, p2)
    assert loaded["rows"].count() == 30 and loaded["extra"].count() == 10


def test_tracked_persist_release_between_batches(spark):
    """The operator-internal multi-consumer caches (ADVICE r09) are
    registered and released surgically: release_cached_intermediates
    unpersists exactly the operator's intermediates, leaves
    caller-owned persists alone, and reports the count."""
    from pyspark.sql import functions as F

    from syncquill_spark.operators._cache import release_cached_intermediates
    from syncquill_spark.operators.text import build_bm25_index

    release_cached_intermediates()  # drain anything earlier tests left
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i}") for i in range(8)],
        "doc_id long, text string",
    )
    mine = docs.filter(F.col("doc_id") < 4).persist()
    mine.count()

    parts = build_bm25_index(docs)
    # consuming action (what save_index would do)
    for df in parts.values():
        df.count()
    released = release_cached_intermediates()
    assert released == 1  # the bm25 'tok' intermediate, nothing else
    assert mine.is_cached  # caller-owned persist untouched
    assert release_cached_intermediates() == 0  # idempotent
    mine.unpersist()


def test_nightly_merge_loop_releases_intermediates_per_batch(spark, tmp_path):
    """The ADVICE-r09 deployment story end to end: the nightly BM25
    index merge loop (the advice's own example) calls
    release_cached_intermediates() after each batch's append commit —
    the builder's internal token-table cache is re-registered and
    re-released every batch, so cached blocks stay bounded across
    batches, caller-owned persists survive, and the final index equals
    a one-shot rebuild part for part."""
    from pyspark.sql import functions as F

    from syncquill_spark.operators._cache import release_cached_intermediates
    from syncquill_spark.operators.bpe import _persistent_rdd_ids
    from syncquill_spark.operators.text import (
        build_bm25_index,
        merge_bm25_index,
    )
    from syncquill_spark.sources.index_store import append_index

    docs = _simhash_corpus(spark)
    mine = docs.persist()
    mine.count()  # caller-owned, must survive every release

    part_by = {"postings": ["term_bucket"]}
    path = str(tmp_path / "bm25_loop")
    save_index(path, _partition_by=part_by, **build_bm25_index(
        docs.filter(F.col("doc_id") % 4 == 0)
    ))
    release_cached_intermediates()  # drain the initial build
    sc = spark.sparkContext
    base_ids = _persistent_rdd_ids(sc)

    per_batch_released = []
    for i in (1, 2, 3):
        batch = docs.filter(F.col("doc_id") % 4 == i)
        merged = merge_bm25_index(load_index(spark, path), batch)
        batch_only = build_bm25_index(batch)
        append_index(
            path,
            _partition_by=part_by,
            _replace={"dfreq": merged["dfreq"], "stats": merged["stats"]},
            postings=batch_only["postings"],
            doclens=batch_only["doclens"],
        )
        per_batch_released.append(release_cached_intermediates())
        leaked = _persistent_rdd_ids(sc) - base_ids
        assert len(leaked) == 0, f"batch {i} leaked RDDs {sorted(leaked)}"
    assert all(n >= 1 for n in per_batch_released), per_batch_released
    assert mine.is_cached  # caller-owned persist untouched
    mine.unpersist()

    # after three released merges the stored index still equals a
    # one-shot rebuild, part for part
    full = build_bm25_index(docs)
    loaded = load_index(spark, path)
    for part in ("postings", "doclens", "dfreq", "stats"):
        cols = full[part].columns  # the partitioned read reorders them
        got = sorted(map(tuple, loaded[part].select(*cols).collect()))
        want = sorted(map(tuple, full[part].collect()))
        assert got == want, part
    release_cached_intermediates()


def test_tracked_persist_sweeps_dead_entries(spark):
    """A session that cleans with spark.catalog.clearCache() instead
    of release_cached_intermediates() must not grow the tracking
    registry without bound: each tracked_persist sweeps entries whose
    cache is already gone (they hold JVM plan references otherwise)."""
    from syncquill_spark.operators import _cache
    from syncquill_spark.operators._cache import (
        release_cached_intermediates,
        tracked_persist,
    )

    release_cached_intermediates()
    for i in range(5):
        df = tracked_persist(spark.range(10 + i))
        df.count()
        spark.catalog.clearCache()  # the "wrong" cleanup path
    # the sweep keeps only the most recent (possibly-live) entry
    assert len(_cache._TRACKED) == 1
    assert release_cached_intermediates() == 0  # clearCache already won


def test_winnowing_self_spans_equals_naive_composition(spark, sf_dir):
    """r11 one-pass composition: `winnowing_self_spans` (positions
    computed once, persisted, pair basis derived from their distinct
    (id, fp) rows) must equal the naive three-subtree composition —
    winnowing_match_pairs from text + winnowing_match_spans over a
    freshly-built positions frame — row for row, on real fixture data
    with the registered parameters. Also pins the release discipline:
    the persisted positions frame is tracked and freed by
    release_cached_intermediates."""
    from pyspark.sql import functions as F

    from syncquill_spark.operators._cache import release_cached_intermediates
    from syncquill_spark.operators.text import winnowing_match_pairs
    from syncquill_spark.streaming.text_dedup import (
        build_winnowing_positions,
        winnowing_match_spans,
        winnowing_self_spans,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 200)
    )
    args = dict(k=3, window=4, min_shared=2, max_fp_df=20)

    release_cached_intermediates()
    fused = sorted(map(tuple, winnowing_self_spans(docs, **args).collect()))
    assert release_cached_intermediates() == 1  # the positions frame

    pairs = winnowing_match_pairs(docs, **args)
    naive = sorted(
        map(
            tuple,
            winnowing_match_spans(
                pairs, build_winnowing_positions(docs, k=3, window=4), k=3
            ).collect(),
        )
    )
    assert fused == naive and len(fused) > 0


def test_concurrent_part_write_failure_aborts_before_swap(spark, tmp_path):
    """save_index writes parts from a thread pool; an execution-time
    failure in ANY part must propagate to the caller BEFORE the atomic
    swap — the live index (if any) stays untouched and the target path
    is never half-written."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "idx")
    ok = spark.createDataFrame([(1,)], "x long")
    save_index(p, part=ok)  # live index to protect

    boom = spark.createDataFrame([(1,)], "x long").select(
        F.udf(lambda v: (_ for _ in ()).throw(RuntimeError("part boom")), "long")(
            "x"
        ).alias("x")
    )
    with pytest.raises(Exception):
        save_index(p, part=ok, bad=boom)
    # live index intact, readable, and still only the old parts
    idx = load_index(spark, p)
    assert sorted(idx) == ["part"]
    assert [r.x for r in idx["part"].collect()] == [1]
