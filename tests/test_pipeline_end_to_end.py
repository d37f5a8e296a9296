"""End-to-end training-data pipeline over the documents fixture: the
operators compose into the full curation flow a pretraining corpus
actually runs — each stage's output feeds the next, and the invariants
that matter (no duplicate texts, no contaminated docs, clusters never
straddle splits, packs respect the budget) hold on the final result.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_full_curation_pipeline(spark, sf_dir):
    from syncquill_spark.operators.clusters import apply_dedup
    from syncquill_spark.operators.curation import (
        fuzzy_decontaminate,
        leakage_safe_split,
        pack_sequences,
    )
    from syncquill_spark.operators.dedup import ngram_jaccard_pairs
    from syncquill_spark.operators.text import quality_rules

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. quality gate (Gopher/C4-style envelope)
    keep_ids = quality_rules(docs, min_tokens=5).filter(F.col("keep") == 1).select("doc_id")
    quality_kept = docs.join(keep_ids, "doc_id")
    n1 = quality_kept.count()
    assert 0 < n1 <= n0

    # 2. exact dedup (drop later copies of identical text)
    exact_kept = (
        quality_kept.groupBy(F.sha2("text", 256).alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .join(quality_kept, "doc_id")
    )
    n2 = exact_kept.count()
    assert 0 < n2 <= n1
    # invariant: all remaining texts distinct
    assert exact_kept.select("text").distinct().count() == n2

    # 3. near-dup cluster dedup (one doc per jaccard cluster)
    pairs = ngram_jaccard_pairs(
        exact_kept, k=3, threshold=0.2, block_cols=("lang",), length_band=64
    )
    deduped = apply_dedup(exact_kept, pairs)
    n3 = deduped.count()
    assert 0 < n3 <= n2

    # 4. fuzzy decontamination vs a held-out eval set
    eval_df = docs.filter(F.col("doc_id") % 17 == 0)
    corpus = deduped.filter(F.col("doc_id") % 17 != 0)
    clean = fuzzy_decontaminate(corpus, eval_df, threshold=0.2)
    n4 = clean.count()
    assert 0 < n4 <= n3

    # 5. leakage-safe split: clusters of the CLEAN corpus stay together
    clean_pairs = ngram_jaccard_pairs(
        clean, k=3, threshold=0.2, block_cols=("lang",), length_band=64
    )
    split = leakage_safe_split(clean, clean_pairs)
    assert split.count() == n4
    straddle = (
        split.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddle == 0
    names = {r.split for r in split.select("split").distinct().collect()}
    assert names <= {"train", "val", "test"} and "train" in names

    # 6. pack the train split into fixed token budgets
    train = split.filter(F.col("split") == "train").select("doc_id", "lang", "text")
    packs = pack_sequences(train, budget=512, stratify_col="lang")
    assert packs.count() == train.count()
    # invariant: a pack only exceeds the budget by (at most) its last
    # doc's tokens (contiguous cumsum packing admits one straddler)
    over = (
        packs.groupBy("lang", "pack_id")
        .agg(F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx"))
        .filter(F.col("tot") - F.col("mx") >= 512)
        .count()
    )
    assert over == 0


def test_nightly_versioned_index_recipe(spark, tmp_path):
    """The deployment recipe the three round-6 storage surfaces exist
    to serve, composed end to end: ingest a raw text dir -> land it as
    a VERSIONED snapshot -> build + persist the MinHash index from the
    live version -> a new day's crawl arrives -> reload the index,
    gate the batch (exact + fuzzy dedup) -> append only survivors as
    the next immutable version. Asserts version lineage, index reuse,
    and that the gate actually dropped the dupes."""
    from pyspark.sql import functions as F

    from syncquill_spark.sources.index_store import load_index, save_index
    from syncquill_spark.sources.parquet import VersionedParquetTable
    from syncquill_spark.sources.text_files import read_text_dir
    from syncquill_spark.streaming.text_dedup import (
        build_text_minhash_index,
        text_near_dups_against_index,
    )

    # day 0: raw crawl on disk
    day0 = tmp_path / "day0"
    day0.mkdir()
    (day0 / "a.txt").write_text("the quick brown fox jumps over the lazy dog")
    (day0 / "b.txt").write_text("colorless green ideas sleep furiously tonight")
    corpus_tbl = VersionedParquetTable(str(tmp_path / "corpus"))
    corpus_tbl.overwrite(read_text_dir(spark, str(day0)))        # v1
    assert corpus_tbl.current_version() == 1

    # nightly index build from the LIVE version
    live = corpus_tbl.read(spark)
    keys, shingles = build_text_minhash_index(live)
    idx = str(tmp_path / "minhash_idx")
    save_index(idx, keys=keys, shingles=shingles)

    # day 1: one exact dup, one near dup (1-word edit), one novel doc
    day1 = tmp_path / "day1"
    day1.mkdir()
    (day1 / "c.txt").write_text("the quick brown fox jumps over the lazy dog")
    (day1 / "d.txt").write_text("colorless green ideas sleep furiously today")
    (day1 / "e.txt").write_text("an entirely different document about spark engines")
    batch = read_text_dir(spark, str(day1))

    loaded = load_index(spark, idx)
    # exact gate: content hash anti-join against the live corpus
    hashed = batch.withColumn("_sha", F.sha2(F.col("text"), 256))
    live_sha = live.select(F.sha2(F.col("text"), 256).alias("_sha")).distinct()
    no_exact = hashed.join(live_sha, "_sha", "left_anti").drop("_sha")
    # fuzzy gate: banded MinHash against the RELOADED index
    fuzzy = text_near_dups_against_index(
        no_exact, loaded["keys"], loaded["shingles"], threshold=0.5
    ).select(F.col("id_new").alias("doc_id")).distinct()
    survivors = no_exact.join(fuzzy, "doc_id", "left_anti")

    kept = [r.text for r in survivors.collect()]
    assert kept == ["an entirely different document about spark engines"]

    corpus_tbl.append(survivors)                                  # v2
    assert corpus_tbl.versions() == [1, 2]
    assert corpus_tbl.read(spark).count() == 3
    # time travel still sees day 0 alone
    assert corpus_tbl.read_version(spark, 1).count() == 2

    # maintenance: hardlink appends accumulate part files; compact the
    # live version (v3 via the same manifest flip), contents unchanged
    pre = sorted((r.doc_id, r.text) for r in corpus_tbl.read(spark).collect())
    corpus_tbl.compact(spark)                                     # v3
    assert corpus_tbl.versions() == [1, 2, 3]
    assert sorted(
        (r.doc_id, r.text) for r in corpus_tbl.read(spark).collect()
    ) == pre
    assert corpus_tbl.read_version(spark, 2).count() == 3  # rollback target intact


def test_streaming_ingest_with_index_append(spark, tmp_path):
    """Day-in-the-life of the ingest path built this round: a stream
    of microbatches is gated against a PERSISTED SimHash index and a
    PERSISTED bigram-LM quality model via foreachBatch, and each
    batch's survivors are appended to the index batch-I/O
    (append_index), so a later batch's near-copy of an EARLIER batch's
    survivor is caught — the index grows mid-stream without a corpus
    rewrite."""
    import os

    from syncquill_spark.operators.text import (
        bigram_score_against,
        build_bigram_model,
    )
    from syncquill_spark.sources.index_store import (
        append_index,
        load_index,
        save_index,
    )
    from syncquill_spark.streaming.text_dedup import (
        build_simhash_index,
        simhash_matches_against,
    )

    fluent = "the quick brown fox jumps over the lazy dog near the river"
    corpus = spark.createDataFrame(
        [(1, fluent), (2, "pack my box with five dozen liquor jugs today")],
        "doc_id long, text string",
    )
    # batch 1 (epoch 0): 101 is new text sharing model bigrams but far
    # from the corpus (hamming >= 7); 102 duplicates corpus doc 1
    b1 = [
        (101, "a story about the quick brown bear who naps by the river bank"),
        (102, fluent),
    ]
    # batch 2 (epoch 1): 201 near-copies batch-1 survivor 101 (hamming
    # 3 to 101 but >= 4 to every CORPUS doc — only the APPENDED index
    # catches it); 202 is new (hamming >= 7 from everything kept)
    b2 = [
        (201, "a story about the quick brown bear who naps by the river edge"),
        (202, "many unrelated words describe the river and the fox today"),
    ]
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    spark.createDataFrame(b1, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    idx_path = str(tmp_path / "ingest_idx")
    save_index(idx_path, fps=build_simhash_index(corpus))
    c1, c12 = build_bigram_model(corpus)
    c1.persist().count(), c12.persist().count()

    survivors, dropped = [], []

    def gate(mb, epoch):
        stored = load_index(spark, idx_path)["fps"]
        dupes = {
            r.id_new
            for r in simhash_matches_against(mb, stored, max_hamming=3).collect()
        }
        fresh = mb.filter(~F.col("doc_id").isin(list(dupes) or [-1]))
        # quality gate against the stored model: drop all-unseen docs
        scored = bigram_score_against(fresh, c1, c12)
        ok = {r.doc_id for r in scored.filter(F.col("sum_q") > 0).collect()}
        keep = fresh.filter(F.col("doc_id").isin(list(ok) or [-1]))
        kept_rows = keep.collect()
        survivors.extend(r.doc_id for r in kept_rows)
        dropped.extend(r.doc_id for r in mb.collect() if r.doc_id not in {x.doc_id for x in kept_rows})
        if kept_rows:
            append_index(
                idx_path,
                fps=build_simhash_index(
                    spark.createDataFrame(kept_rows, mb.schema)
                ),
            )

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # second file arrives; resume the stream from the checkpoint
    spark.createDataFrame(b2, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q2 = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(src)
        .writeStream.foreachBatch(gate)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    assert 101 in survivors          # new text passes
    assert 102 in dropped            # exact copy of corpus doc gated
    assert 201 in dropped            # near-copy of an EARLIER BATCH survivor
    assert 202 in survivors          # genuinely new text passes
    # the persisted index now carries corpus + both batches' survivors
    final_ids = {
        r.corpus_id for r in load_index(spark, idx_path)["fps"].collect()
    }
    assert final_ids == {1, 2, 101, 202}


def test_tokenizer_aware_release_pipeline(spark, sf_dir, tmp_path):
    """The session's capstone composition — the tokenizer-aware half
    of a corpus release, every stage feeding the next:

      eval index -> span-removal decontamination (cut, not drop)
      -> temperature mix (alpha=0.5 over languages)
      -> BPE trained on the mix, persisted via index_store
      -> tokenizer-TRUE counts -> pack_sequences(counts=...)
      -> materialize_packs -> corpus_card(counts=...) + fertility

    Invariants checked on the final artifacts: the cleaned corpus is
    gate-silent against the eval index; mix counts sum to the target
    with the low-resource tail up-weighted vs natural share; every
    pack respects budget + one boundary doc in TRUE tokens; the card's
    totals equal the encode totals; fertility is defined for every
    language in the mix."""
    from syncquill_spark.operators.bpe import (
        bpe_encode,
        bpe_fertility,
        train_bpe,
    )
    from syncquill_spark.operators.curation import (
        corpus_card,
        materialize_packs,
        pack_sequences,
        remove_spans,
        temperature_mix,
    )
    from syncquill_spark.sources.index_store import load_index, save_index
    from syncquill_spark.streaming.text_dedup import (
        build_winnowing_index,
        build_winnowing_positions,
        winnowing_matches_against,
        winnowing_spans_against,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # plant an eval passage into two training docs so the cut has work
    passage = "the quick brown fox jumps over the lazy dog tonight again"
    evalset = spark.createDataFrame(
        [(900001, f"alpha beta {passage} gamma")], "doc_id long, text string"
    )
    contaminated = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id").isin(3, 7),
            F.concat(F.col("text"), F.lit(f" {passage}")),
        ).otherwise(F.col("text")),
    )
    p = str(tmp_path / "eval_idx")
    save_index(
        p,
        fps=build_winnowing_index(evalset),
        positions=build_winnowing_positions(evalset),
    )
    idx = load_index(spark, p)

    spans = winnowing_spans_against(
        contaminated, idx["fps"], idx["positions"], min_shared=2
    )
    assert {r.id_new for r in spans.collect()} == {3, 7}
    cleaned = remove_spans(contaminated, spans, pad=3).select(
        "doc_id", F.col("text_clean").alias("text")
    ).join(contaminated.select("doc_id", "lang", "source"), "doc_id")
    assert winnowing_matches_against(
        cleaned, idx["fps"], min_shared=2
    ).count() == 0  # gate-silent after the cut

    total = 120
    mix = temperature_mix(cleaned, total=total, alpha=0.5)
    mix_counts = {
        r.lang: r.c
        for r in mix.groupBy("lang").agg(F.count("*").alias("c")).collect()
    }
    assert sum(mix_counts.values()) == total
    nat = {
        r.lang: r.c
        for r in cleaned.groupBy("lang").agg(F.count("*").alias("c")).collect()
    }
    n_all = sum(nat.values())
    tail = min(nat, key=nat.get)
    assert mix_counts[tail] / total > nat[tail] / n_all  # tail up-weighted

    merges, _ = train_bpe(mix, n_merges=25)
    mp = str(tmp_path / "bpe_model")
    save_index(mp, merges=merges)
    stored = load_index(spark, mp)["merges"]
    counts = bpe_encode(mix, stored).select(
        "doc_id", F.col("n_bpe_tokens").alias("n_tokens")
    )

    budget = 120
    asg = pack_sequences(mix, budget=budget, counts=counts)
    packs = materialize_packs(mix, asg)
    max_doc = counts.agg(F.max("n_tokens")).collect()[0][0]
    for r in packs.collect():
        assert r.n_tokens <= budget + max_doc
    assert packs.agg(F.sum("n_docs")).collect()[0][0] == total

    card = {
        (r.section, r.metric): r.value
        for r in corpus_card(mix, counts=counts).collect()
    }
    enc_total = counts.agg(F.sum("n_tokens")).collect()[0][0]
    assert card[("size", "n_docs")] == total
    assert card[("size", "n_tokens_ws")] == enc_total

    fert = {r.lang: r for r in bpe_fertility(mix, stored).collect()}
    assert set(fert) == set(mix_counts)
    assert all(r.fertility_ppm and r.fertility_ppm >= 1_000_000
               for r in fert.values())  # >= 1 token per word, defined everywhere

    # SHIP (r10): the release sink closes the pipeline — the mixed
    # corpus exported as shuffled shards with TOKENIZER-TRUE manifest
    # accounting, then read back through the consumer's integrity gate
    from syncquill_spark.sources.training_export import (
        read_training_shards,
        write_training_shards,
    )

    rel = str(tmp_path / "release")
    manifest = write_training_shards(
        mix.join(counts, "doc_id"), rel, n_shards=4, token_col="n_tokens"
    )
    shipped, _ = read_training_shards(spark, rel, verify=True)
    assert manifest["total_docs"] == total
    assert manifest["total_tokens"] == enc_total  # the card's own number
    assert manifest["token_unit"] == "n_tokens"
    assert shipped.count() == total
