"""BPE trainer/encoder vs a pure-Python reference model.

The trainer is an iterative argmax loop (non-SQL-expressible, like
Lloyd refinement), so its correctness pin is a from-scratch Python
implementation of the same algorithm: word-frequency BPE with
overlap-counting pair frequencies, (freq DESC, left ASC, right ASC)
tie-breaks, and greedy left-to-right merge application.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from syncquill_spark.operators.bpe import EOW, bpe_encode, train_bpe, word_freqs


# --- reference model ------------------------------------------------------


def _ref_word_freqs(texts):
    c = Counter()
    for t in texts:
        c.update((t or "").lower().split())
    return dict(c)


def _ref_syms(word):
    s = list(word)
    s[-1] = s[-1] + EOW
    return s


def _ref_apply(syms, l, r):
    out, i, n = [], 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(texts, n_merges, min_pair_freq=2):
    words = {w: (_ref_syms(w), f) for w, f in _ref_word_freqs(texts).items()}
    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for syms, f in words.values():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), pf = best
        if pf < min_pair_freq:
            break
        merges.append((rank, l, r, pf))
        words = {w: (_ref_apply(s, l, r), f) for w, (s, f) in words.items()}
    return merges, words


# --- fixtures -------------------------------------------------------------

# 'banana'/'bandana' force overlapping pairs; repeated words force
# frequency-weighted counts; ties exercised by the single-occurrence tail
_CORPUS = [
    (1, "the banana stand sells banana bread and bandana hats"),
    (2, "low lower lowest newer newest wide wider widest"),
    (3, "the the the banana banana aaaa aa a"),
    (4, "Mixed CASE Tokens mixed case tokens"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_CORPUS, "doc_id long, text string")


def test_word_freqs_matches_reference(spark, docs):
    got = {r.word: r.freq for r in word_freqs(docs).collect()}
    assert got == _ref_word_freqs([t for _, t in _CORPUS])


def test_train_bpe_matches_reference_model(spark, docs):
    """Merge table identical to the reference implementation row for
    row — ranks, pair identities, frequencies, and tie-breaks — and
    the final vocab segmentation identical word for word."""
    merges_df, vocab = train_bpe(docs, n_merges=20)
    got = [(r.rank, r.left, r.right, r.pair_freq) for r in merges_df.orderBy("rank").collect()]
    want_merges, want_words = _ref_train([t for _, t in _CORPUS], 20)
    assert got == want_merges
    got_vocab = {r.word: list(r.syms) for r in vocab.collect()}
    assert got_vocab == {w: s for w, (s, _) in want_words.items()}


def test_train_bpe_converges_early(spark):
    """Every pair below min_pair_freq: training stops with fewer
    merges than asked, not an error."""
    docs = spark.createDataFrame(
        [(1, "ab cd ef"), (2, "gh ij kl")], "doc_id long, text string"
    )
    merges_df, _ = train_bpe(docs, n_merges=50, min_pair_freq=2)
    assert merges_df.count() == 0


def test_train_bpe_deterministic(spark, docs):
    a, _ = train_bpe(docs, n_merges=12)
    b, _ = train_bpe(docs, n_merges=12)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_bpe_encode_consistent_with_training(spark, docs):
    """Encoding the training corpus with the trained merges reproduces
    the trainer's own final segmentation: per doc, n_bpe_tokens equals
    the sum over its words of the trainer's final symbol counts."""
    merges_df, vocab = train_bpe(docs, n_merges=20)
    seg_len = {r.word: len(r.syms) for r in vocab.collect()}
    got = {r.doc_id: (r.n_words, r.n_bpe_tokens) for r in bpe_encode(docs, merges_df).collect()}
    for doc_id, text in _CORPUS:
        ws = text.lower().split()
        assert got[doc_id] == (len(ws), sum(seg_len[w] for w in ws))


def test_bpe_encode_unseen_and_empty(spark, docs):
    """Unseen words segment with the same merge table (characters
    merge as far as the learned pairs allow); empty/whitespace docs
    count zero."""
    merges_df, _ = train_bpe(docs, n_merges=20)
    new = spark.createDataFrame(
        [(10, "bananas unseenword"), (11, "   "), (12, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in bpe_encode(new, merges_df).collect()}
    assert rows[11].n_words == 0 and rows[11].n_bpe_tokens == 0
    assert rows[12].n_words == 0 and rows[12].n_bpe_tokens == 0
    assert rows[10].n_words == 2
    # each word segments to at least 1 and at most len(word)+1 symbols
    assert 2 <= rows[10].n_bpe_tokens <= len("bananas") + len("unseenword") + 2
    # reference check for the unseen words
    want_merges, _ = _ref_train([t for _, t in _CORPUS], 20)
    ml = [(l, r) for _, l, r, _ in want_merges]

    def seg(word):
        s = _ref_syms(word)
        for l, r in ml:
            s = _ref_apply(s, l, r)
        return s

    assert rows[10].n_bpe_tokens == len(seg("bananas")) + len(seg("unseenword"))


def test_bpe_model_persists_through_index_store(spark, docs, tmp_path):
    """The tokenizer is a corpus-derived artifact like every other
    model here: the merge table persists through the same index_store
    manifest, and encoding from the STORED model is identical to
    encoding from the in-memory one. (No merge_* sibling on purpose:
    BPE training is not incremental — merges depend on global pair
    ranks, so extending the corpus means retraining, stated honestly.)"""
    from syncquill_spark.operators.bpe import bpe_encode, train_bpe
    from syncquill_spark.sources.index_store import load_index, save_index

    merges, vocab = train_bpe(docs, n_merges=15)
    p = str(tmp_path / "bpe_model")
    save_index(p, merges=merges, vocab=vocab)
    loaded = load_index(spark, p)
    direct = sorted(map(tuple, bpe_encode(docs, merges).collect()))
    stored = sorted(map(tuple, bpe_encode(docs, loaded["merges"]).collect()))
    assert direct == stored
    assert sorted(map(tuple, loaded["merges"].collect())) == sorted(
        map(tuple, merges.collect())
    )


# --- byte-level mode -------------------------------------------------------


def _ref_syms_bytes(word):
    s = [chr(b) for b in word.encode("utf-8")]
    s[-1] = s[-1] + EOW
    return s


def _ref_train_bytes(texts, n_merges, min_pair_freq=2):
    words = {
        w: (_ref_syms_bytes(w), f) for w, f in _ref_word_freqs(texts).items()
    }
    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for syms, f in words.values():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), pf = best
        if pf < min_pair_freq:
            break
        merges.append((rank, l, r, pf))
        words = {w: (_ref_apply(s, l, r), f) for w, (s, f) in words.items()}
    return merges, words


_UNICODE_CORPUS = [
    (1, "café café naïve straße 日本語 text"),
    (2, "café straße über über döner text"),
    (3, "plain ascii words also mix in café"),
]


def test_byte_level_train_matches_reference(spark):
    """Byte-level mode (GPT-2 recipe): Spark's UTF-8-byte symbolization
    and merge loop equal the reference model on multibyte text —
    merges, frequencies, tie-breaks, and final vocab segmentation."""
    docs = spark.createDataFrame(_UNICODE_CORPUS, "doc_id long, text string")
    merges_df, vocab = train_bpe(docs, n_merges=25, byte_level=True)
    got = [
        (r.rank, r.left, r.right, r.pair_freq)
        for r in merges_df.orderBy("rank").collect()
    ]
    want_merges, want_words = _ref_train_bytes(
        [t for _, t in _UNICODE_CORPUS], 25
    )
    assert got == want_merges and len(got) > 0
    got_vocab = {r.word: list(r.syms) for r in vocab.collect()}
    assert got_vocab == {w: s for w, (s, _) in want_words.items()}
    # multibyte chars really do start split: 'café' begins as 5 byte
    # symbols (c, a, f, 0xc3, 0xa9</w>)
    assert any(len(w.encode("utf-8")) > len(w) for w in got_vocab)


def test_byte_level_encode_consistent_and_unicode_complete(spark):
    """Encoding with the byte-level model reproduces training
    segmentation, and UNSEEN text in any script tokenizes without an
    unknown-character case (count = merged byte count)."""
    docs = spark.createDataFrame(_UNICODE_CORPUS, "doc_id long, text string")
    merges_df, vocab = train_bpe(docs, n_merges=25, byte_level=True)
    seg_len = {r.word: len(r.syms) for r in vocab.collect()}
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_encode(docs, merges_df, byte_level=True).collect()
    }
    for doc_id, text in _UNICODE_CORPUS:
        ws = text.lower().split()
        assert got[doc_id] == (len(ws), sum(seg_len[w] for w in ws))

    new = spark.createDataFrame(
        [(10, "łódź Ωμέγα emoji 🚀 here")], "doc_id long, text string"
    )
    (row,) = bpe_encode(new, merges_df, byte_level=True).collect()
    assert row.n_words == 5
    # every word tokenizes; upper bound = raw byte count + 1 per word
    raw = sum(len(w.encode("utf-8")) for w in "łódź ωμέγα emoji 🚀 here".split())
    assert 5 <= row.n_bpe_tokens <= raw


def test_bpe_fertility_per_stratum(spark):
    """Fertility = BPE tokens per word, per stratum, exact integer
    ppm; a stratum of unseen-script words (every char splits) shows
    the higher fertility the report exists to surface; wordless
    strata report null instead of dividing by zero."""
    docs = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    merges, vocab = train_bpe(docs, n_merges=20)
    labeled = spark.createDataFrame(
        [
            (1, "the banana stand sells banana bread", "en"),
            (2, "the banana banana bread", "en"),
            (3, "qqqq zzzz xxxx qqqq", "xx"),  # unseen chars -> splits
            (4, "   ", "empty"),
        ],
        "doc_id long, text string, lang string",
    )
    from syncquill_spark.operators.bpe import bpe_fertility

    rows = {r.lang: r for r in bpe_fertility(labeled, merges).collect()}
    # python expectation via the reference segmentation
    want_m, _ = _ref_train([t for _, t in _CORPUS], 20)
    ml = [(l, r) for _, l, r, _ in want_m]

    def seg_len(w):
        s = _ref_syms(w)
        for l, r in ml:
            s = _ref_apply(s, l, r)
        return len(s)

    en_words = "the banana stand sells banana bread the banana banana bread".split()
    want_en = (1_000_000 * sum(seg_len(w) for w in en_words)) // len(en_words)
    assert rows["en"].n_docs == 2
    assert rows["en"].n_words == len(en_words)
    assert rows["en"].fertility_ppm == want_en
    xx_words = "qqqq zzzz xxxx qqqq".split()
    want_xx = (1_000_000 * sum(seg_len(w) for w in xx_words)) // len(xx_words)
    assert rows["xx"].fertility_ppm == want_xx
    assert rows["xx"].fertility_ppm > rows["en"].fertility_ppm
    assert rows["empty"].n_words == 0 and rows["empty"].fertility_ppm is None


def test_train_bpe_releases_prior_checkpoints(spark, docs):
    """ADVICE r09: each merge iteration localCheckpoints the word
    table; without releasing the prior generation, executor storage
    grows linearly with n_merges. After training, the context must
    hold at most ONE word-table generation beyond what it held before
    (the returned vocab's backing blocks, owned by the caller)."""
    from syncquill_spark.operators.bpe import _persistent_rdd_ids

    sc = spark.sparkContext
    before = _persistent_rdd_ids(sc)
    merges_df, vocab = train_bpe(docs, n_merges=12)
    assert merges_df.count() > 0
    leaked = _persistent_rdd_ids(sc) - before
    # one localCheckpoint generation persists <= 2 RDDs (the
    # checkpointed internal RDD; implementations may register a
    # wrapper) — 12 iterations without release would leak ~12+
    assert len(leaked) <= 2, f"checkpoint blocks leaked: {sorted(leaked)}"
    # the survivor is exactly the returned vocab's generation: its
    # rows are still served from the released-everything-else state
    assert vocab.count() > 0


def test_bpe_encode_carries_nonlong_id_types(spark, docs):
    """ADVICE r09: the output schema used to hardcode `{id} long`,
    failing inside the Arrow batch for string ids. The id column's
    actual type must pass through unchanged."""
    merges_df, _ = train_bpe(docs, n_merges=8)
    sdocs = docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("doc_id"),
        "text",
    )
    out = bpe_encode(sdocs, merges_df)
    assert dict(out.dtypes)["doc_id"] == "string"
    rows = {r.doc_id: r.n_bpe_tokens for r in out.collect()}
    base = {
        f"doc-{r.doc_id}": r.n_bpe_tokens
        for r in bpe_encode(docs, merges_df).collect()
    }
    assert rows == base


def test_export_bpe_files_round_trip(spark, docs, tmp_path):
    """The tokenizer handoff artifact (GPT-2-style merges.txt +
    vocab.json): the parsed-back merge list reproduces bpe_encode's
    counts exactly, every emittable symbol has an id, ids follow the
    base-alphabet-then-merge-order convention, and the export is
    deterministic and atomic over rewrites."""
    import json
    import os

    from syncquill_spark.operators.bpe import (
        export_bpe_files,
        load_bpe_merge_list,
    )

    merges_df, vocab_df = train_bpe(docs, n_merges=15)
    p = str(tmp_path / "tok")
    vocab_json = export_bpe_files(merges_df, vocab_df, p)

    # files present, header written, merge list round-trips in order
    parsed = load_bpe_merge_list(p)
    want_merges = [
        (r.left, r.right) for r in merges_df.orderBy("rank").collect()
    ]
    assert parsed == want_merges
    with open(os.path.join(p, "merges.txt")) as fh:
        assert fh.readline() == "#version: 0.2\n"
    with open(os.path.join(p, "vocab.json")) as fh:
        assert json.load(fh) == vocab_json

    # every symbol the model emits has an id; merged tokens' ids come
    # after the whole base alphabet, in rank order
    emitted = {s for r in vocab_df.collect() for s in r.syms}
    assert emitted <= set(vocab_json)
    ids = list(vocab_json.values())
    assert ids == sorted(ids)  # insertion order == id order
    merged = [l + r for l, r in want_merges]
    base_ids = [i for t, i in vocab_json.items() if t not in set(merged)]
    merged_ids = [vocab_json[t] for t in dict.fromkeys(merged)]
    assert base_ids and merged_ids and max(base_ids) < min(merged_ids)
    assert merged_ids == sorted(merged_ids)

    # encoding with the parsed merge list equals encoding with the
    # trained frame — the consumer-side contract
    enc_frame = {
        r.doc_id: r.n_bpe_tokens for r in bpe_encode(docs, merges_df).collect()
    }
    from syncquill_spark.operators.bpe import _segment

    def n_tokens(text):
        return sum(len(_segment(w, parsed)) for w in text.lower().split())

    texts = {r.doc_id: r.text for r in docs.collect()}
    assert {i: n_tokens(t) for i, t in texts.items()} == enc_frame

    # deterministic re-export, atomic overwrite
    assert export_bpe_files(merges_df, vocab_df, p) == vocab_json
    assert sorted(os.listdir(p)) == ["merges.txt", "vocab.json"]
