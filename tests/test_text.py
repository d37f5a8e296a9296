"""Text-analysis operators: language ID, quality, tokens, fingerprints."""

from __future__ import annotations

from syncquill_spark.operators.text import (
    fingerprints,
    language_id,
    quality_features,
    quality_filter,
    token_counts,
)

DOCS = "doc_id long, text string"


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is warm"),
            (2, "der Hund ist nicht zu Hause und die Katze"),
            (3, "el perro es grande y la casa es de piedra"),
            (4, "zzz qqq xxx"),
        ],
        DOCS,
    )
    out = {r["doc_id"]: r["pred_lang"] for r in language_id(df).collect()}
    assert out == {1: "en", 2: "de", 3: "es", 4: "und"}


def test_quality_features_and_filter(spark):
    good = "this is a reasonably long document with many distinct useful words overall"
    spam = "buy buy buy buy buy buy buy buy buy buy buy buy"
    df = spark.createDataFrame([(1, good), (2, spam)], DOCS)
    feats = {r["doc_id"]: r for r in quality_features(df).collect()}
    assert feats[1]["n_tokens"] == 12
    assert feats[1]["uniq_ratio"] > 0.9
    assert feats[2]["uniq_ratio"] < 0.1
    kept = [r["doc_id"] for r in quality_filter(df, min_tokens=5).collect()]
    assert kept == [1]


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "ab cdefgh i")], DOCS)
    r = token_counts(df).collect()[0]
    assert r["n_tokens_ws"] == 3
    assert r["n_tokens_bpeish"] == 1 + 2 + 1  # ceil(2/4)+ceil(6/4)+ceil(1/4)


def test_fingerprint_distinguishes_order(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "c b a"), (3, "a b c")], DOCS)
    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprints(df).collect()}
    assert fp[1] == fp[3] != fp[2]


def test_repetition_dup_bigram_frac(spark):
    from syncquill_spark.operators.text import repetition_signals

    # "a b a b a" bigrams: [a b, b a, a b, b a] -> all duplicated
    df = spark.createDataFrame([(1, "a b a b a"), (2, "u v w x y")], DOCS)
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert out[1]["dup_bigram_frac"] == 1.0
    assert out[2]["dup_bigram_frac"] == 0.0
    assert out[1]["max_bigram_freq"] == 2
    assert out[2]["is_repetitive"] == 0
    assert out[1]["is_repetitive"] == 1  # 'a' is 3/5 > 1/5


def test_quality_rules_flags(spark):
    from syncquill_spark.operators.text import quality_rules

    good = "this is a reasonably long document with many distinct useful words overall"
    spam = "buy buy buy buy buy buy buy buy buy buy buy buy"
    short = "too short"
    df = spark.createDataFrame([(1, good), (2, spam), (3, short)], DOCS)
    out = {r["doc_id"]: r for r in quality_rules(df, min_tokens=5).collect()}
    assert out[1]["keep"] == 1
    assert out[2]["keep"] == 0
    assert out[2]["pass_uniq_ratio"] == 0
    assert out[2]["pass_not_repetitive"] == 0
    assert out[3]["keep"] == 0
    assert out[3]["pass_length"] == 0
    # rules are individually reported
    assert set(out[1].asDict()) == {
        "doc_id", "pass_length", "pass_chars_per_token", "pass_uniq_ratio",
        "pass_not_repetitive", "pass_dup_bigrams", "keep",
    }


def test_bm25_ranks_matching_docs(spark):
    from syncquill_spark.operators.text import bm25_scores

    df = spark.createDataFrame(
        [
            (1, "spark spark spark is fast"),
            (2, "spark is a word here once with lots of other words padding it"),
            (3, "nothing relevant at all"),
        ],
        DOCS,
    )
    out = {r.doc_id: r for r in bm25_scores(df, ("spark",)).collect()}
    assert set(out) == {1, 2}  # non-matching doc absent
    assert out[1].bm25 > out[2].bm25  # higher tf, shorter doc wins
    assert out[1].n_matched == 1


def test_top_distinctive_terms_prefers_rare_terms(spark):
    """A term unique to one doc outranks the corpus-wide stopword even
    when the stopword has higher tf."""
    from syncquill_spark.operators.text import top_distinctive_terms

    docs = [
        (1, "the the the zebra"),
        (2, "the the cat"),
        (3, "the the dog"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {(r.doc_id, r.rk): r.term for r in top_distinctive_terms(df, top_n=2).collect()}
    # doc 1: zebra tf=1 df=1 -> score 3; the tf=3 df=3 -> score 3 -- tie,
    # term asc puts "the" first? No: 1*3/1 = 3.0 and 3*3/3 = 3.0; tie ->
    # term asc -> "the" < "zebra". Use rank set instead of order claims.
    assert {out[(2, 1)], out[(2, 2)]} == {"cat", "the"}
    assert out[(2, 1)] == "cat"  # 1*3/1=3.0 beats the: 2*3/3=2.0
    assert out[(3, 1)] == "dog"


def test_chunk_documents_overlap_and_coverage(spark):
    from syncquill_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, words), (2, "single")], "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r
    # doc 1: starts 0,3,6,9 -> 4 chunks; stride 3, window 4 => 1-token overlap
    c = by_doc[1]
    assert len(c) == 4
    assert c[0].chunk_text == "w0 w1 w2 w3"
    assert c[1].chunk_text == "w3 w4 w5 w6"          # overlaps w3
    assert c[3].chunk_text == "w9" and c[3].n_chunk_tokens == 1
    # every token appears in some chunk
    covered = set()
    for r in c.values():
        covered.update(r.chunk_text.split())
    assert covered == set(words.split())
    # short doc -> exactly one chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "single"


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    from syncquill_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_chunk_documents_matches_duckdb_twin(spark, sf_dir):
    """chunk_documents vs an independent DuckDB implementation of the
    same spec over the documents fixture — registry-grade verification
    ahead of next round's window slot."""
    import duckdb

    from syncquill_spark.operators.text import chunk_documents

    chunk_tokens, overlap = 32, 8
    stride = chunk_tokens - overlap
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        (r.doc_id, r.chunk_id, r.n_chunk_tokens, r.chunk_text)
        for r in chunk_documents(
            docs, chunk_tokens=chunk_tokens, overlap=overlap
        ).collect()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    expect = sorted(
        tuple(r)
        for r in con.execute(f"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
chunks AS (
  SELECT doc_id, t, UNNEST(range(0, greatest(len(t) - 1, 0) + 1, {stride})) AS start
  FROM base
)
SELECT doc_id, CAST(start / {stride} AS BIGINT) AS chunk_id,
       CAST(len(list_slice(t, start + 1, start + {chunk_tokens})) AS INT) AS n_chunk_tokens,
       array_to_string(list_slice(t, start + 1, start + {chunk_tokens}), ' ') AS chunk_text
FROM chunks
""").fetchall()
    )
    assert len(got) > len(
        {d for d, _, _, _ in got}
    ), "fixture should produce multi-chunk docs"
    assert got == expect


def test_dedup_segments_within_doc(spark):
    from syncquill_spark.operators.text import dedup_segments_within_doc

    docs = spark.createDataFrame(
        [
            (1, "header\nbody one\nheader\nbody two\nheader"),
            (2, "no dups here\nat all"),
            (3, "x\nx\nx"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_segments_within_doc(docs).collect()}
    assert out[1].text_deduped == "header\nbody one\nbody two"
    assert (out[1].n_segments, out[1].n_unique_segments) == (5, 3)
    assert out[2].text_deduped == "no dups here\nat all"
    assert out[3].text_deduped == "x" and out[3].n_unique_segments == 1


def test_segment_dedup_long_doc_linear(spark):
    """Round-5 verdict #5: a pathological scraped doc (~1e4 repeated
    lines) must dedup in linear time — the old array_position HOF was
    O(s^2) per doc. Semantics pinned: first occurrence kept, encounter
    order preserved, empty segments treated as ordinary values."""
    import time

    from syncquill_spark.operators.text import dedup_segments_within_doc

    n = 10_000
    lines = [f"line {i % 37}" for i in range(n)]  # heavy repetition
    lines[5] = ""  # empty segment is a value, not a gap
    docs = spark.createDataFrame([(1, "\n".join(lines))], "doc_id long, text string")
    t0 = time.monotonic()
    row = dedup_segments_within_doc(docs).collect()[0]
    elapsed = time.monotonic() - t0
    # order-preserving first-occurrence reference, computed in Python
    expect = list(dict.fromkeys(lines))
    assert row.text_deduped.split("\n") == expect
    assert (row.n_segments, row.n_unique_segments) == (n, len(expect))
    # the quadratic form took minutes here; linear is a couple seconds
    # of Spark overhead at most
    assert elapsed < 30, f"segment dedup took {elapsed:.1f}s on a 1e4-line doc"


def test_vocab_coverage_counts(spark):
    from syncquill_spark.operators.text import vocab_coverage

    df = spark.createDataFrame(
        [
            (1, "a a b c"),
            (2, "a b b x"),
            (3, "y z"),
        ],
        "doc_id long, text string",
    )
    # counts: a=3 b=3 c=1 x=1 y=1 z=1 -> top-3 by (count desc, term
    # asc) = a, b, c
    rows = {r.doc_id: r for r in vocab_coverage(df, vocab_size=3).collect()}
    assert (rows[1].n_tokens, rows[1].n_oov) == (4, 0)
    assert (rows[2].n_tokens, rows[2].n_oov) == (4, 1)   # x OOV
    assert (rows[3].n_tokens, rows[3].n_oov) == (2, 2)   # y z OOV


def test_quality_percentile_filter_exact_cut_and_strata(spark):
    from pyspark.sql import functions as F

    from syncquill_spark.operators.curation import quality_percentile_filter

    rows = [(i, "en", 100 - i) for i in range(10)] + [
        (100 + i, "de", i) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, sig long")
    kept = quality_percentile_filter(
        df, "sig", keep_frac=0.5, stratify_col="lang"
    )
    by_lang = {
        lang: sorted(r.doc_id for r in grp)
        for lang, grp in __import__("itertools").groupby(
            sorted(kept.collect(), key=lambda r: r.lang), key=lambda r: r.lang
        )
    }
    # en: 10 rows, keep ceil(5) = 5 best sig (doc_ids 0..4)
    assert by_lang["en"] == [0, 1, 2, 3, 4]
    # de: 4 rows, keep ceil(2) = 2 best sig (103, 102)
    assert by_lang["de"] == [102, 103]
    # output keeps the input columns (membership contract — no global
    # rank: that would force the whole-stratum sort the plan avoids)
    assert set(kept.columns) == {"doc_id", "lang", "sig"}

    # global mode (no stratify): one curve across everything
    glob = quality_percentile_filter(df, "sig", keep_frac=0.25)
    assert sorted(r.doc_id for r in glob.collect()) == [0, 1, 2, 3]

    # ties broken by id asc: equal sigs keep the LOWest ids
    tied = spark.createDataFrame(
        [(i, "en", 7) for i in range(4)], "doc_id long, lang string, sig long"
    )
    got = sorted(
        r.doc_id
        for r in quality_percentile_filter(tied, "sig", keep_frac=0.5).collect()
    )
    assert got == [0, 1]


def test_winnowing_hand_example(spark):
    """4 tokens -> 2 trigrams < window=4 -> no output; 7 tokens -> 5
    trigram hashes -> 2 windows; selections follow min + rightmost-tie."""
    from syncquill_spark.operators.text import winnowing_fingerprints

    short = spark.createDataFrame(
        [(1, "a b c d")], "doc_id long, text string"
    )
    assert winnowing_fingerprints(short, k=3, window=4).count() == 0

    df = spark.createDataFrame(
        [(2, "a b c d e f g")], "doc_id long, text string"
    )
    out = winnowing_fingerprints(df, k=3, window=4).collect()
    # replicate: hashes of the 5 trigrams, windows [0..3] and [1..4];
    # python twin of portable_hash60 (first 15 md5 hex chars)
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    toks = "a b c d e f g".split()
    grams = [" ".join(toks[i:i + 3]) for i in range(5)]
    hs = [h60(g) for g in grams]

    def rightmost_min(seg, base):
        mn = min(seg)
        return base + max(i for i, v in enumerate(seg) if v == mn)

    expect = sorted({rightmost_min(hs[0:4], 0), rightmost_min(hs[1:5], 1)})
    got = sorted((r.gram_pos) for r in out)
    assert got == expect
    assert all(r.fp == hs[r.gram_pos] for r in out)


def test_winnowing_guarantee_shared_fingerprint(spark):
    """Winnowing's coverage guarantee: two docs sharing a run of
    >= window + k - 1 tokens share at least one fingerprint."""
    from syncquill_spark.operators.text import winnowing_fingerprints

    shared = "the quick brown fox jumps over"  # 6 tokens = w + k - 1
    df = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"one two three {shared} four"),
        ],
        "doc_id long, text string",
    )
    fp = winnowing_fingerprints(df, k=3, window=4)
    a = {r.fp for r in fp.filter("doc_id = 1").collect()}
    b = {r.fp for r in fp.filter("doc_id = 2").collect()}
    assert a & b, "shared run must produce a shared fingerprint"


# ---------------------------------------------------------------------------
# Property tests: the new text/curation operators vs pure-python models
# ---------------------------------------------------------------------------

import hashlib as _hashlib
import math as _math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abcde", min_size=1, max_size=3)
_doc = st.lists(_word, min_size=0, max_size=20).map(" ".join)


def _h60_py(s: str) -> int:
    return int(_hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _winnow_py(text: str, k: int, w: int):
    toks = text.strip().lower().split() if text.strip() else []
    grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    hs = [_h60_py(g) for g in grams]
    picks = set()
    for i in range(len(hs) - w + 1):
        seg = hs[i:i + w]
        mn = min(seg)
        picks.add(i + max(j for j, v in enumerate(seg) if v == mn))
    return sorted((p, hs[p]) for p in picks)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(_doc, min_size=1, max_size=6))
def test_winnowing_matches_python_model(spark, docs):
    from syncquill_spark.operators.text import winnowing_fingerprints

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = sorted(
        (r.doc_id, r.gram_pos, r.fp)
        for r in winnowing_fingerprints(df, k=3, window=4).collect()
    )
    want = sorted(
        (i, p, fp) for i, d in enumerate(docs) for p, fp in _winnow_py(d, 3, 4)
    )
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["en", "de", "zh"]), st.integers(0, 50)),
        min_size=1, max_size=30,
    ),
    frac=st.sampled_from([0.1, 0.33, 0.5, 0.8, 1.0]),
)
def test_percentile_filter_matches_python_model(spark, rows, frac):
    from syncquill_spark.operators.curation import quality_percentile_filter

    data = [(i, lang, sig) for i, (lang, sig) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, lang string, sig long")
    got = sorted(
        r.doc_id
        for r in quality_percentile_filter(
            df, "sig", keep_frac=frac, stratify_col="lang"
        ).collect()
    )
    want = []
    for lang in {r[1] for r in data}:
        grp = sorted(
            (r for r in data if r[1] == lang), key=lambda r: (-r[2], r[0])
        )
        cut = _math.ceil(frac * len(grp))
        want += [r[0] for r in grp[:cut]]
    assert got == sorted(want)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(_doc, min_size=1, max_size=6), v=st.integers(1, 8))
def test_vocab_coverage_matches_python_model(spark, docs, v):
    from collections import Counter

    from syncquill_spark.operators.text import vocab_coverage

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = sorted(
        (r.doc_id, r.n_tokens, r.n_oov)
        for r in vocab_coverage(df, vocab_size=v).collect()
    )
    tok = {
        i: (d.strip().lower().split() if d.strip() else [""])
        for i, d in enumerate(docs)
    }
    counts = Counter(t for ts in tok.values() for t in ts)
    vocab = {
        t for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:v]
    }
    want = sorted(
        (i, len(ts), sum(1 for t in ts if t not in vocab))
        for i, ts in tok.items()
    )
    assert got == want


def test_winnowing_match_pairs_planted_run_and_hub_cap(spark):
    from syncquill_spark.operators.text import winnowing_match_pairs

    shared = "the quick brown fox jumps over the lazy dog tonight"
    docs = [
        (1, f"alpha beta {shared} gamma"),
        (2, f"one two {shared} three"),
        (3, "completely unrelated text about something else entirely here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnowing_match_pairs(df, k=3, window=4, min_shared=2).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert all(3 not in p for p in pairs)
    # hub cap: fingerprints present in > max_fp_df docs are dropped —
    # with the shared run in EVERY doc and max_fp_df=1, no pairs remain
    every = spark.createDataFrame(
        [(i, f"x{i} {shared} y{i}") for i in range(4)],
        "doc_id long, text string",
    )
    capped = winnowing_match_pairs(
        every, k=3, window=4, min_shared=1, max_fp_df=1
    )
    assert capped.count() == 0


def test_quality_percentile_filter_fallback_and_degenerate_ties(spark):
    """The bracket sketch affects work placement, never the answer:
    null signals (which percentile_approx ignores but ranking sorts
    last) make a stratum's bracket fail its guarantee and route through
    the in-plan whole-stratum fallback; an all-tied stratum resolves
    entirely inside the boundary rank by id."""
    from syncquill_spark.operators.curation import quality_percentile_filter

    rows = [(1, "en", 9), (2, "en", 7), (3, "en", None), (4, "en", None)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, sig long")
    # k = ceil(1.0 * 4) = 4 > 2 non-null rows -> bracket invalid -> fallback
    got = sorted(
        r.doc_id
        for r in quality_percentile_filter(
            df, "sig", keep_frac=1.0, stratify_col="lang"
        ).collect()
    )
    assert got == [1, 2, 3, 4]
    # k = 3: two non-null + the null with the smaller id (nulls rank last,
    # id tie-break) — still via the fallback branch
    got3 = sorted(
        r.doc_id
        for r in quality_percentile_filter(
            df, "sig", keep_frac=0.75, stratify_col="lang"
        ).collect()
    )
    assert got3 == [1, 2, 3]
    # degenerate: every row ties at the cutoff value
    tied = spark.createDataFrame(
        [(i, "en", 5) for i in range(8)], "doc_id long, lang string, sig long"
    )
    got_t = sorted(
        r.doc_id
        for r in quality_percentile_filter(
            tied, "sig", keep_frac=0.5, stratify_col="lang"
        ).collect()
    )
    assert got_t == [0, 1, 2, 3]


def test_bigram_commonness_hand_example(spark):
    """Corpus: 'a b a c', 'a b', 'z z', 'x'. Bigram counts c(a b)=2,
    c(b a)=1, c(a c)=1, c(z z)=1; context counts c(a.)=3, c(b.)=1,
    c(z.)=1. q = (1e6 * c12) div c1 — exact integer division, so sums
    are engine-exact; the common transition (a b) scores 666666, the
    rare one (a c) 333333. Single-token docs have no bigrams and are
    absent."""
    from syncquill_spark.operators.text import bigram_commonness

    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b"), (3, "z z"), (4, "x")], DOCS
    )
    rows = {r.doc_id: r for r in bigram_commonness(df).collect()}
    assert set(rows) == {1, 2, 3}
    assert (rows[1].n_bigrams, rows[1].sum_q) == (3, 666666 + 1000000 + 333333)
    assert (rows[2].n_bigrams, rows[2].sum_q) == (1, 666666)
    assert (rows[3].n_bigrams, rows[3].sum_q) == (1, 1000000)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(_doc, min_size=1, max_size=6))
def test_bigram_commonness_matches_python_model(spark, docs):
    """bigram_commonness vs an independent python model: corpus bigram
    counts, context counts, q = (1e6*c12) // c1, per-doc exact sums."""
    from collections import Counter

    from syncquill_spark.operators.text import bigram_commonness

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = sorted(
        (r.doc_id, r.n_bigrams, r.sum_q)
        for r in bigram_commonness(df).collect()
    )
    # mirror F.split(trim(lower(text)), '\s+'): empty text -> [""]
    toks = {i: ((d.strip().lower().split()) or [""]) for i, d in enumerate(docs)}
    bigrams = {
        i: list(zip(t, t[1:])) for i, t in toks.items()
    }
    c12 = Counter(bg for bgs in bigrams.values() for bg in bgs)
    c1 = Counter(bg[0] for bgs in bigrams.values() for bg in bgs)
    want = sorted(
        (i, len(bgs), sum((1_000_000 * c12[bg]) // c1[bg[0]] for bg in bgs))
        for i, bgs in bigrams.items()
        if bgs
    )
    assert got == want


def test_bigram_model_lifecycle_append_equals_rebuild(spark, tmp_path):
    """The persisted bigram model's core identity: build on half the
    corpus, save via index_store, reload, merge the other half
    (counts add — only the batch is tokenized), save over (atomic
    exchange), reload — scoring the corpus against the STORED model
    must equal the one-shot in-memory bigram_commonness row-for-row."""
    from syncquill_spark.operators.text import (
        bigram_commonness,
        bigram_score_against,
        build_bigram_model,
        merge_bigram_model,
    )
    from syncquill_spark.sources.index_store import load_index, save_index

    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b"), (3, "z z a b"), (4, "b a c"),
         (5, "x"), (6, "a c a b z z")],
        DOCS,
    )
    first = df.filter("doc_id % 2 = 0")
    batch = df.filter("doc_id % 2 = 1")
    c1, c12 = build_bigram_model(first)
    path = str(tmp_path / "bigram_lm")
    save_index(path, unigrams=c1, bigrams=c12)
    loaded = load_index(spark, path)
    m1, m12 = merge_bigram_model(loaded["unigrams"], loaded["bigrams"], batch)
    save_index(path, unigrams=m1, bigrams=m12)
    reloaded = load_index(spark, path)

    # merged model == model rebuilt from scratch over the full corpus
    r1, r12 = build_bigram_model(df)
    assert sorted(map(tuple, reloaded["unigrams"].collect())) == sorted(
        map(tuple, r1.collect())
    )
    assert sorted(map(tuple, reloaded["bigrams"].collect())) == sorted(
        map(tuple, r12.collect())
    )
    # scoring against the stored model == one-shot bigram_commonness
    got = sorted(
        map(tuple, bigram_score_against(
            df, reloaded["unigrams"], reloaded["bigrams"]
        ).collect())
    )
    want = sorted(map(tuple, bigram_commonness(df).collect()))
    assert got == want


def test_bigram_gate_unseen_scores_zero(spark):
    """Ingest-gate semantics: a batch bigram the model never saw
    contributes q = 0 (maximally rare) but still counts toward
    n_bigrams. Model from 'a b': c(a b)=1, c(a.)=1. Batch 'a b c x y':
    (a b) seen -> 1000000; (b c), (c x), (x y) unseen -> 0 each."""
    from syncquill_spark.operators.text import (
        bigram_score_against,
        build_bigram_model,
    )

    corpus = spark.createDataFrame([(1, "a b")], DOCS)
    batch = spark.createDataFrame([(10, "a b c x y"), (11, "q")], DOCS)
    c1, c12 = build_bigram_model(corpus)
    rows = {r.doc_id: r for r in bigram_score_against(batch, c1, c12).collect()}
    # doc 11 has one token -> no bigrams -> absent
    assert set(rows) == {10}
    assert (rows[10].n_bigrams, rows[10].sum_q) == (4, 1_000_000)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(_doc, min_size=2, max_size=6))
def test_bigram_gate_matches_python_model(spark, docs):
    """bigram_score_against vs an independent python replay: model
    counts from the even-id half only, unseen bigrams contribute 0,
    n_bigrams counts every batch bigram regardless."""
    from collections import Counter

    from syncquill_spark.operators.text import (
        bigram_score_against,
        build_bigram_model,
    )

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    corpus = df.filter("doc_id % 2 = 0")
    batch = df.filter("doc_id % 2 = 1")
    c1, c12 = build_bigram_model(corpus)
    got = sorted(
        (r.doc_id, r.n_bigrams, r.sum_q)
        for r in bigram_score_against(batch, c1, c12).collect()
    )
    toks = {i: ((d.strip().lower().split()) or [""]) for i, d in enumerate(docs)}
    bigrams = {i: list(zip(t, t[1:])) for i, t in toks.items()}
    m12 = Counter(
        bg for i, bgs in bigrams.items() if i % 2 == 0 for bg in bgs
    )
    m1 = Counter(
        bg[0] for i, bgs in bigrams.items() if i % 2 == 0 for bg in bgs
    )
    want = sorted(
        (
            i,
            len(bgs),
            sum(
                (1_000_000 * m12[bg]) // m1[bg[0]] if m12[bg] else 0
                for bg in bgs
            ),
        )
        for i, bgs in bigrams.items()
        if bgs and i % 2 == 1
    )
    assert got == want


def test_prune_bigram_model_semantics(spark):
    """Pruned bigrams score exactly like unseen ones (q=0), survivors'
    scores never shift (c1 untouched), and min_count=1 is identity.
    Corpus: 'a b a b a c' -> c(a b)=2, c(b a)=2... actually bigrams:
    (a b),(b a),(a b),(b a),(a c): c(a b)=2, c(b a)=2, c(a c)=1;
    c(a.)=3, c(b.)=2. min_count=2 prunes only (a c)."""
    from syncquill_spark.operators.text import (
        bigram_score_against,
        build_bigram_model,
        prune_bigram_model,
    )

    corpus = spark.createDataFrame([(1, "a b a b a c")], DOCS)
    batch = spark.createDataFrame([(10, "a b a c")], DOCS)
    c1, c12 = build_bigram_model(corpus)

    # identity at min_count=1
    p1, p12 = prune_bigram_model(c1, c12, min_count=1)
    same = sorted(map(tuple, p12.collect())) == sorted(map(tuple, c12.collect()))
    assert same

    full = {r.doc_id: r for r in bigram_score_against(batch, c1, c12).collect()}
    q1, q12 = prune_bigram_model(c1, c12, min_count=2)
    pruned = {r.doc_id: r for r in bigram_score_against(batch, q1, q12).collect()}
    # batch bigrams: (a b) q=(1e6*2)//3=666666, (b a) q=(1e6*2)//2=1000000,
    # (a c) q=(1e6*1)//3=333333 -> pruned to 0
    assert (full[10].n_bigrams, full[10].sum_q) == (3, 666666 + 1000000 + 333333)
    assert (pruned[10].n_bigrams, pruned[10].sum_q) == (3, 666666 + 1000000)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_count"):
        prune_bigram_model(c1, c12, min_count=0)


def test_bigram_gate_in_foreachbatch_stream(spark, tmp_path):
    """Streaming deployment shape (same recipe as the winnowing gate):
    the per-doc sum is a streaming aggregation, so the gate runs inside
    foreachBatch against the loaded stored model — stream output must
    equal the batch run over the same rows."""
    from pyspark.sql import functions as F

    from syncquill_spark.operators.text import (
        bigram_score_against,
        build_bigram_model,
    )
    from syncquill_spark.sources.index_store import load_index, save_index

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma token{i} alpha beta") for i in range(40)],
        DOCS,
    )
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    c1, c12 = build_bigram_model(corpus)
    save_index(str(tmp_path / "bigram_lm"), unigrams=c1, bigrams=c12)
    loaded = load_index(spark, str(tmp_path / "bigram_lm"))

    batch_src = str(tmp_path / "stream_src")
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(batch_src)

    got = []

    def gate(mb, _epoch):
        got.extend(
            (r.doc_id, r.n_bigrams, r.sum_q)
            for r in bigram_score_against(
                mb, loaded["unigrams"], loaded["bigrams"]
            ).collect()
        )

    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(batch_src)
    )
    q = stream.writeStream.foreachBatch(gate).trigger(availableNow=True).start()
    q.awaitTermination(120)

    expect = sorted(
        (r.doc_id, r.n_bigrams, r.sum_q)
        for r in bigram_score_against(
            spark.read.parquet(batch_src), loaded["unigrams"], loaded["bigrams"]
        ).collect()
    )
    assert sorted(got) == expect and len(expect) == 20


# ---------------------------------------------------------------------------
# BM25 persisted inverted-index lifecycle
# ---------------------------------------------------------------------------

_BM25_Q = ("spark", "hash", "merge", "window")


def test_bm25_index_serve_equals_recompute(spark, sf_dir, tmp_path):
    """bm25_from_index over a saved+loaded index must equal bm25_scores
    recomputing from text — same decimal-rounded formula path, so
    exact equality (not approx)."""
    from syncquill_spark.operators.text import (
        bm25_from_index,
        bm25_scores,
        build_bm25_index,
    )
    from syncquill_spark.sources.index_store import load_index, save_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = build_bm25_index(docs)
    p = str(tmp_path / "bm25_idx")
    save_index(p, _partition_by={"postings": ["term_bucket"]}, **idx)
    loaded = load_index(spark, p)
    served = sorted(
        (r.doc_id, r.bm25, r.n_matched)
        for r in bm25_from_index(loaded, _BM25_Q).collect()
    )
    recomputed = sorted(
        (r.doc_id, r.bm25, r.n_matched)
        for r in bm25_scores(docs, _BM25_Q).collect()
    )
    assert served == recomputed and len(served) > 0


def test_bm25_index_merge_equals_rebuild(spark, sf_dir):
    """merge_bm25_index(corpus-half index, other half) must equal
    build_bm25_index(all docs) part-for-part: postings and doclens
    row-sets, dfreq counts, the one stats row."""
    from pyspark.sql import functions as F

    from syncquill_spark.operators.text import build_bm25_index, merge_bm25_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    merged = merge_bm25_index(build_bm25_index(half), batch)
    rebuilt = build_bm25_index(docs)
    for part in ("postings", "doclens", "dfreq", "stats"):
        got = sorted(map(tuple, merged[part].collect()))
        want = sorted(map(tuple, rebuilt[part].collect()))
        assert got == want, part
    assert len(rebuilt["stats"].collect()) == 1


def test_bm25_query_buckets_match_spark_crc32(spark):
    """The driver-side zlib.crc32 bucket of a term must equal the
    in-plan crc32 bucket the postings part was written with — the
    identity that makes the serve filter a correct partition
    predicate."""
    from pyspark.sql import functions as F

    from syncquill_spark.operators.text import BM25_BUCKETS, bm25_query_buckets

    terms = ["spark", "hash", "merge", "window", "zebra", "a", "Ünïcode"]
    df = spark.createDataFrame([(t,) for t in terms], "term string").select(
        "term",
        (F.crc32(F.col("term").cast("binary")) % BM25_BUCKETS)
        .cast("int")
        .alias("bkt"),
    )
    spark_buckets = {r.term: r.bkt for r in df.collect()}
    for t in terms:
        assert bm25_query_buckets((t,)) == [spark_buckets[t]], t


def test_bm25_serve_plan_prunes_partitions(spark, sf_dir, tmp_path):
    """With the postings part Hive-partitioned by term_bucket, the
    serve plan's parquet scan must carry the term_bucket partition
    filters (only the query's buckets are read)."""
    from syncquill_spark.operators.text import bm25_from_index, build_bm25_index
    from syncquill_spark.sources.index_store import load_index, save_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = str(tmp_path / "bm25_idx2")
    save_index(
        p, _partition_by={"postings": ["term_bucket"]}, **build_bm25_index(docs)
    )
    loaded = load_index(spark, p)
    plan = bm25_from_index(loaded, _BM25_Q)._jdf.queryExecution().executedPlan().toString()
    assert "term_bucket" in plan and "PartitionFilters: [" in plan
    scan_lines = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln and "term_bucket" in ln
    ]
    assert scan_lines, plan


def test_bm25_stamp_roundtrip_and_pruned_serve(spark, sf_dir, tmp_path):
    """save_bm25_index stamps the bucket width into the manifest;
    load_bm25_index under the SAME width keeps term_bucket, the serve
    plan still partition-prunes, and scores equal recompute."""
    from syncquill_spark.operators.text import (
        bm25_from_index,
        bm25_scores,
        build_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )
    from syncquill_spark.sources.index_store import load_index_manifest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = str(tmp_path / "bm25_stamped")
    save_bm25_index(p, build_bm25_index(docs))
    assert load_index_manifest(p)["meta"]["bm25_n_buckets"] == 64
    loaded = load_bm25_index(spark, p)
    assert "term_bucket" in loaded["postings"].columns
    plan = (
        bm25_from_index(loaded, _BM25_Q)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "term_bucket" in plan and "PartitionFilters: [" in plan
    served = sorted(
        (r.doc_id, r.bm25) for r in bm25_from_index(loaded, _BM25_Q).collect()
    )
    recomputed = sorted(
        (r.doc_id, r.bm25) for r in bm25_scores(docs, _BM25_Q).collect()
    )
    assert served == recomputed and len(served) > 0


def test_bm25_stamp_mismatch_falls_back_unpruned(spark, sf_dir, tmp_path):
    """An index written under a DIFFERENT bucket width must not be
    pruned with this serve's width (wrong buckets -> silently missing
    postings): load_bm25_index warns, drops term_bucket, and the
    unpruned serve still equals recompute exactly."""
    import warnings as _w

    from syncquill_spark.operators.text import (
        bm25_from_index,
        bm25_scores,
        build_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = str(tmp_path / "bm25_width32")
    save_bm25_index(p, build_bm25_index(docs, n_buckets=32), n_buckets=32)
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        loaded = load_bm25_index(spark, p)  # serve width: default 64
    assert any("bucket width" in str(c.message) for c in caught)
    assert "term_bucket" not in loaded["postings"].columns
    served = sorted(
        (r.doc_id, r.bm25) for r in bm25_from_index(loaded, _BM25_Q).collect()
    )
    recomputed = sorted(
        (r.doc_id, r.bm25) for r in bm25_scores(docs, _BM25_Q).collect()
    )
    assert served == recomputed and len(served) > 0


def test_bm25_unstamped_index_falls_back_unpruned(spark, sf_dir, tmp_path):
    """An index persisted before meta stamping (raw save_index, no
    _meta) has an unverifiable layout: load_bm25_index must take the
    unpruned path rather than trust the width."""
    import warnings as _w

    from syncquill_spark.operators.text import build_bm25_index, load_bm25_index
    from syncquill_spark.sources.index_store import save_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    p = str(tmp_path / "bm25_unstamped")
    save_index(
        p, _partition_by={"postings": ["term_bucket"]}, **build_bm25_index(docs)
    )
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        loaded = load_bm25_index(spark, p)
    assert any("bucket width" in str(c.message) for c in caught)
    assert "term_bucket" not in loaded["postings"].columns


def test_bm25_serve_reads_zero_doclens(spark, sf_dir, tmp_path):
    """With dl inlined on posting rows, the serve plan must not touch
    the doclens part at all — the corpus-proportional term SCALE.md
    r15 measured (2.56M doclens rows read for 4,919 matches) is gone
    by construction, not by pruning fraction."""
    from syncquill_spark.operators.text import (
        bm25_from_index,
        build_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = str(tmp_path / "bm25_nodoclens")
    save_bm25_index(p, build_bm25_index(docs))
    loaded = load_bm25_index(spark, p)
    plan = (
        bm25_from_index(loaded, _BM25_Q)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the doclens scan's ReadSchema signature (paths are elided in the
    # plan string, so match the scan's schema, not the directory name)
    assert "struct<doc_id:bigint,dl:bigint>" not in plan, plan


def test_bm25_pre_inline_dl_index_serves_via_doclens(spark, sf_dir, tmp_path):
    """Backward compat: an index whose postings predate dl inlining
    (no dl column) must still serve correct scores — bm25_from_index
    falls back to the doclens join."""
    from syncquill_spark.operators.text import (
        bm25_from_index,
        bm25_scores,
        build_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = build_bm25_index(docs)
    old["postings"] = old["postings"].drop("dl")  # the pre-r16 layout
    p = str(tmp_path / "bm25_oldfmt")
    save_bm25_index(p, old)
    loaded = load_bm25_index(spark, p)
    plan = (
        bm25_from_index(loaded, _BM25_Q)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the fallback doclens scan is in the plan (its ReadSchema — plan
    # strings elide directory paths)
    assert "struct<doc_id:bigint,dl:bigint>" in plan, plan
    served = sorted(
        (r.doc_id, r.bm25) for r in bm25_from_index(loaded, _BM25_Q).collect()
    )
    recomputed = sorted(
        (r.doc_id, r.bm25) for r in bm25_scores(docs, _BM25_Q).collect()
    )
    assert served == recomputed and len(served) > 0


def test_append_bm25_index_equals_rebuild_and_refuses_mismatch(
    spark, sf_dir, tmp_path
):
    """append_bm25_index: (a) one atomic nightly merge equals a
    one-shot rebuild part for part; (b) a width-mismatched append and
    a pre-inline-dl stored index are REFUSED with named errors before
    anything is written."""
    import pytest
    from pyspark.sql import functions as F

    from syncquill_spark.operators.text import (
        append_bm25_index,
        build_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    p = str(tmp_path / "bm25_append")
    save_bm25_index(p, build_bm25_index(half))
    append_bm25_index(p, load_bm25_index(spark, p), batch)
    loaded = load_bm25_index(spark, p)
    rebuilt = build_bm25_index(docs)
    for part in ("postings", "doclens", "dfreq", "stats"):
        cols = rebuilt[part].columns  # partitioned read reorders them
        got = sorted(map(tuple, loaded[part].select(*cols).collect()))
        want = sorted(map(tuple, rebuilt[part].collect()))
        assert got == want, part

    with pytest.raises(ValueError, match="bucket width"):
        append_bm25_index(p, loaded, batch, n_buckets=32)

    old = build_bm25_index(half)
    old["postings"] = old["postings"].drop("dl")
    p2 = str(tmp_path / "bm25_append_oldfmt")
    save_bm25_index(p2, old)
    with pytest.raises(ValueError, match="inline dl"):
        append_bm25_index(p2, load_bm25_index(spark, p2), batch)


def test_bm25_n_buckets_guard():
    """mod-by-zero/negative bucket widths raise named errors
    driver-side (the in-plan crc32 % n would ANSI-abort mid-job)."""
    import pytest

    from syncquill_spark.operators.text import bm25_query_buckets

    for bad in (0, -4):
        with pytest.raises(ValueError, match="n_buckets"):
            bm25_query_buckets(("x",), n_buckets=bad)


def test_bm25_topk_from_index(spark, sf_dir, tmp_path):
    """Top-k serve = the k best of the full serve scores under the
    (bm25 desc, doc_id asc) total order."""
    from syncquill_spark.operators.text import (
        bm25_from_index,
        bm25_topk_from_index,
        build_bm25_index,
    )
    from syncquill_spark.sources.index_store import load_index, save_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = str(tmp_path / "bm25_topk_idx")
    save_index(p, _partition_by={"postings": ["term_bucket"]}, **build_bm25_index(docs))
    loaded = load_index(spark, p)
    got = [
        (r.doc_id, r.bm25)
        for r in bm25_topk_from_index(loaded, _BM25_Q, k=7).collect()
    ]
    full = sorted(
        ((r.doc_id, r.bm25) for r in bm25_from_index(loaded, _BM25_Q).collect()),
        key=lambda t: (-t[1], t[0]),
    )
    assert got == full[:7] and len(got) == 7


def test_compression_ratios_match_zlib(spark):
    """Per-doc zlib byte counts equal direct zlib on the same bytes;
    repetitive text compresses far below prose, null text yields 0/None."""
    import zlib

    from syncquill_spark.operators.text import compression_ratios

    texts = [
        (1, "the quick brown fox jumps over the lazy dog near the river"),
        (2, "spam spam spam spam spam spam spam spam spam spam spam spam"),
        (3, None),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r.doc_id: r for r in compression_ratios(df).collect()}
    for i, t in texts:
        if t is None:
            assert got[i].n_bytes == 0 and got[i].compression_ratio is None
        else:
            raw = t.encode("utf-8")
            assert got[i].n_bytes == len(raw)
            assert got[i].n_bytes_zlib == len(zlib.compress(raw, 6))
    # repetition compresses much harder than prose
    assert got[2].compression_ratio < got[1].compression_ratio


# ---------------------------------------------------------------------------
# Cross-document line dedup
# ---------------------------------------------------------------------------


def test_dedup_lines_across_drop_mode(spark):
    """Boilerplate line shared by 3 docs is removed from ALL of them;
    unique lines and blank structure lines survive in order."""
    from syncquill_spark.operators.text import dedup_lines_across

    df = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nalpha\n\nbeta"),
            (2, "COOKIE BANNER\ngamma"),
            (3, "delta\nCOOKIE BANNER"),
        ],
        DOCS,
    )
    out = {r.doc_id: r for r in dedup_lines_across(df).collect()}
    assert out[1].text_deduped == "alpha\n\nbeta"
    assert (out[1].n_lines, out[1].n_lines_kept) == (4, 3)
    assert out[2].text_deduped == "gamma"
    assert out[3].text_deduped == "delta"
    assert (out[3].n_lines, out[3].n_lines_kept) == (2, 1)


def test_dedup_lines_across_first_mode(spark):
    """'first' keeps exactly the globally first (id, pos) occurrence."""
    from syncquill_spark.operators.text import dedup_lines_across

    df = spark.createDataFrame(
        [
            (1, "alpha\nQUOTE"),
            (2, "QUOTE\nbeta"),
            (3, "QUOTE"),
        ],
        DOCS,
    )
    out = {
        r.doc_id: r.text_deduped
        for r in dedup_lines_across(df, mode="first").collect()
    }
    assert out == {1: "alpha\nQUOTE", 2: "beta", 3: ""}


def test_dedup_lines_across_min_line_chars_and_blank(spark):
    """Lines under min_line_chars (and blanks) never count as
    duplicates: shared '-' separators and blank lines survive."""
    from syncquill_spark.operators.text import dedup_lines_across

    df = spark.createDataFrame(
        [(1, "-\nalpha\n\nend"), (2, "-\nbeta\n\nend")],
        DOCS,
    )
    out = {
        r.doc_id: r.text_deduped
        for r in dedup_lines_across(df, min_line_chars=2).collect()
    }
    # 'end' is >= 2 chars and shared -> dropped; '-' and '' kept.
    assert out == {1: "-\nalpha\n", 2: "-\nbeta\n"}


def test_dedup_lines_across_null_and_emptied_docs(spark):
    """Null text stays null (0 counts); a doc whose every line is
    boilerplate rebuilds to the empty string with n_lines_kept=0."""
    from syncquill_spark.operators.text import dedup_lines_across

    df = spark.createDataFrame(
        [(1, "SAME"), (2, "SAME"), (3, None)], DOCS
    )
    out = {r.doc_id: r for r in dedup_lines_across(df).collect()}
    assert (out[1].text_deduped, out[1].n_lines, out[1].n_lines_kept) == ("", 1, 0)
    assert (out[3].text_deduped, out[3].n_lines, out[3].n_lines_kept) == (None, 0, 0)


def test_dedup_lines_across_rejects_bad_args(spark):
    import pytest as _pytest

    from syncquill_spark.operators.text import dedup_lines_across

    df = spark.createDataFrame([(1, "a")], DOCS)
    with _pytest.raises(ValueError, match="mode"):
        dedup_lines_across(df, mode="all")
    with _pytest.raises(ValueError, match="min_docs"):
        dedup_lines_across(df, min_docs=1)


_line = st.sampled_from(["aaa", "bbb", "ccc ddd", "", " ", "x", "ee ff"])
_line_doc = st.lists(_line, min_size=1, max_size=6).map("\n".join)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(_line_doc, min_size=1, max_size=5),
       mode=st.sampled_from(["drop", "first"]))
def test_dedup_lines_across_matches_python_model(spark, docs, mode):
    """Both modes vs an independent python model: distinct-doc counts
    over countable lines, drop-all vs keep-global-first, order-
    preserving rebuild, audit counts."""
    from syncquill_spark.operators.text import dedup_lines_across

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = sorted(
        (r.doc_id, r.text_deduped, r.n_lines, r.n_lines_kept)
        for r in dedup_lines_across(df, mode=mode, min_line_chars=1).collect()
    )

    split = {i: d.split("\n") for i, d in enumerate(docs)}
    countable = lambda ln: len(ln.strip()) >= 1
    docs_with = {}
    first_occ = {}
    for i in sorted(split):
        for p, ln in enumerate(split[i]):
            if countable(ln):
                docs_with.setdefault(ln, set()).add(i)
                first_occ.setdefault(ln, (i, p))
    flagged = {ln for ln, s in docs_with.items() if len(s) >= 2}
    want = []
    for i in sorted(split):
        kept = [
            ln
            for p, ln in enumerate(split[i])
            if ln not in flagged
            or (mode == "first" and first_occ[ln] == (i, p))
        ]
        want.append((i, "\n".join(kept), len(split[i]), len(kept)))
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# Token-weight classifier
# ---------------------------------------------------------------------------


def test_token_classifier_hand_weights(spark):
    """Exact integer weights: w = (1e6*(c_pos+1)) div (c_pos+c_neg+2);
    unseen tokens contribute the neutral 500000."""
    from syncquill_spark.operators.text import (
        build_token_classifier,
        classifier_score_against,
    )

    seed = spark.createDataFrame(
        [(1, "good good fine", 1), (2, "bad bad fine", 0)],
        "doc_id long, text string, label int",
    )
    model = build_token_classifier(seed)
    counts = {r.th: (r.c_pos, r.c_neg) for r in model.collect()}
    assert sorted(counts.values()) == [(0, 2), (1, 1), (2, 0)]

    batch = spark.createDataFrame(
        [(9, "good bad fine unseen")], "doc_id long, text string"
    )
    row = classifier_score_against(batch, model).collect()[0]
    # good 750000, bad 250000, fine 500000, unseen 500000
    assert (row.n_tokens, row.sum_w) == (4, 750000 + 250000 + 500000 + 500000)


def test_token_classifier_rejects_bad_labels(spark):
    import pytest as _pytest

    from syncquill_spark.operators.text import build_token_classifier

    bad = spark.createDataFrame(
        [(1, "a b", 2)], "doc_id long, text string, label int"
    )
    with _pytest.raises(Exception, match="labels must be 0 or 1"):
        build_token_classifier(bad).collect()
    null = spark.createDataFrame(
        [(1, "a b", None)], "doc_id long, text string, label int"
    )
    with _pytest.raises(Exception, match="labels must be 0 or 1"):
        build_token_classifier(null).collect()


def test_token_classifier_merge_equals_rebuild_and_roundtrip(spark, tmp_path):
    """build(first) + merge(second) == build(all), through a persisted
    save/load cycle — the append==rebuild identity every index family
    pins, and scoring from the loaded model matches exactly."""
    from syncquill_spark.operators.text import (
        build_token_classifier,
        classifier_score_against,
        merge_token_classifier,
    )
    from syncquill_spark.sources.index_store import load_index, save_index

    rows = [
        (1, "the cat sat on the mat", 1),
        (2, "stock cheap pills now", 0),
        (3, "a fine day for the cat", 1),
        (4, "cheap cheap now now now", 0),
    ]
    schema = "doc_id long, text string, label int"
    full = spark.createDataFrame(rows, schema)
    first = spark.createDataFrame(rows[:2], schema)
    second = spark.createDataFrame(rows[2:], schema)

    path = str(tmp_path / "clf_index")
    save_index(path, token_counts=build_token_classifier(first))
    stored = load_index(spark, path)["token_counts"]
    merged = merge_token_classifier(stored, second)
    save_index(path, token_counts=merged)
    loaded = load_index(spark, path)["token_counts"]

    want = sorted(map(tuple, build_token_classifier(full).collect()))
    assert sorted(map(tuple, loaded.collect())) == want

    batch = full.select("doc_id", "text")
    got = sorted(map(tuple, classifier_score_against(batch, loaded).collect()))
    ref = sorted(
        map(tuple, classifier_score_against(batch, build_token_classifier(full)).collect())
    )
    assert got == ref


def test_token_classifier_prune_scores_like_unseen(spark):
    """Pruned hapax tokens score exactly like unseen ones; surviving
    tokens' contributions are unchanged."""
    from syncquill_spark.operators.text import (
        build_token_classifier,
        classifier_score_against,
        prune_token_classifier,
    )
    import pytest as _pytest

    seed = spark.createDataFrame(
        [(1, "common common rare1", 1), (2, "common spam spam", 0)],
        "doc_id long, text string, label int",
    )
    model = build_token_classifier(seed)
    pruned = prune_token_classifier(model, min_count=2)
    batch = spark.createDataFrame(
        [(9, "common rare1 spam")], "doc_id long, text string"
    )
    full_row = classifier_score_against(batch, model).collect()[0]
    prun_row = classifier_score_against(batch, pruned).collect()[0]
    # rare1 (1,0): w = 2e6 div 3 = 666666 full; 500000 pruned.
    assert full_row.sum_w - prun_row.sum_w == 666666 - 500000
    assert prun_row.n_tokens == full_row.n_tokens == 3
    with _pytest.raises(ValueError, match="min_count"):
        prune_token_classifier(model, min_count=0)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(st.tuples(_doc, st.integers(0, 1)),
                     min_size=1, max_size=6))
def test_token_classifier_matches_python_model(spark, docs):
    """Counts and scores vs an independent python model: per-class
    occurrence counts, add-one smoothed integer weights, neutral
    unseen, per-doc exact sums."""
    from collections import Counter

    from syncquill_spark.operators.text import (
        build_token_classifier,
        classifier_score_against,
    )

    df = spark.createDataFrame(
        [(i, d, l) for i, (d, l) in enumerate(docs)],
        "doc_id long, text string, label int",
    )
    model = build_token_classifier(df)
    got = sorted(
        (r.doc_id, r.n_tokens, r.sum_w)
        for r in classifier_score_against(df.select("doc_id", "text"), model).collect()
    )

    toks = {i: d.strip().lower().split() for i, (d, _) in enumerate(docs)}
    c_pos, c_neg = Counter(), Counter()
    for i, (_, l) in enumerate(docs):
        for t in toks[i]:
            (c_pos if l == 1 else c_neg)[t] += 1
    w = lambda t: (1_000_000 * (c_pos[t] + 1)) // (c_pos[t] + c_neg[t] + 2)
    want = sorted(
        (i, len(t), sum(w(tok) for tok in t))
        for i, t in toks.items()
        if t
    )
    assert got == want


def test_token_classifier_separates_planted_classes(spark):
    """End-to-end smoke: trained on english-vs-gibberish seeds, the
    rate sum_w/n_tokens separates held-out examples of each class."""
    from syncquill_spark.operators.text import (
        build_token_classifier,
        classifier_score_against,
    )

    pos = [
        "the cat sat on the mat and it is warm",
        "it is a fine day for the dog and the cat",
        "the house is warm and the food is good",
    ]
    neg = [
        "zxq vvk jjw qqp zxq mmn",
        "vvk zxq qqp jjw lls mmn",
        "qqp lls zxq vvk jjw jjw",
    ]
    seed = spark.createDataFrame(
        [(i, t, 1) for i, t in enumerate(pos)]
        + [(100 + i, t, 0) for i, t in enumerate(neg)],
        "doc_id long, text string, label int",
    )
    model = build_token_classifier(seed)
    held = spark.createDataFrame(
        [(1, "the dog sat on the warm mat"), (2, "jjw zxq mmn qqp vvk")],
        DOCS,
    )
    rates = {
        r.doc_id: r.sum_w / r.n_tokens
        for r in classifier_score_against(held, model).collect()
    }
    assert rates[1] > 600_000 > 400_000 > rates[2]


def test_classifier_gate_in_foreachbatch_stream(spark, tmp_path):
    """Streaming deployment shape for the token classifier (same
    recipe as the bigram gate): the per-doc sum is a streaming
    aggregation, so the gate runs inside foreachBatch against the
    loaded stored model — stream output must equal the batch run."""
    from pyspark.sql import functions as F

    from syncquill_spark.operators.text import (
        build_token_classifier,
        classifier_score_against,
    )
    from syncquill_spark.sources.index_store import load_index, save_index

    docs = spark.createDataFrame(
        [
            (i, f"alpha beta token{i} gamma", i % 2)
            for i in range(40)
        ],
        "doc_id long, text string, label int",
    )
    corpus = docs.filter(F.col("doc_id") % 4 < 2)
    save_index(
        str(tmp_path / "clf"), token_counts=build_token_classifier(corpus)
    )
    model = load_index(spark, str(tmp_path / "clf"))["token_counts"]

    batch_src = str(tmp_path / "stream_src")
    docs.filter(F.col("doc_id") % 4 >= 2).select("doc_id", "text").coalesce(
        1
    ).write.mode("overwrite").parquet(batch_src)

    got = []

    def gate(mb, _epoch):
        got.extend(
            (r.doc_id, r.n_tokens, r.sum_w)
            for r in classifier_score_against(mb, model).collect()
        )

    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(batch_src)
    )
    q = stream.writeStream.foreachBatch(gate).trigger(availableNow=True).start()
    q.awaitTermination(120)

    expect = sorted(
        (r.doc_id, r.n_tokens, r.sum_w)
        for r in classifier_score_against(
            spark.read.parquet(batch_src), model
        ).collect()
    )
    assert sorted(got) == expect and len(expect) == 20


# ---------------------------------------------------------------------------
# Unicode normalization
# ---------------------------------------------------------------------------


def test_normalize_text_nfc_composes_and_strips_invisibles(spark):
    from syncquill_spark.operators.text import normalize_text

    decomposed = "café"          # e + combining acute
    with_invis = "a​b﻿c\x07d\tok\nline"
    df = spark.createDataFrame(
        [(1, decomposed), (2, with_invis), (3, "café"), (4, None)], DOCS
    )
    out = {r.doc_id: r.text_norm for r in normalize_text(df).collect()}
    assert out[1] == "café" == out[3]  # composed == precomposed
    # ZWSP/BOM/BEL stripped; tab and newline preserved
    assert out[2] == "abcd\tok\nline"
    assert out[4] is None


def test_normalize_text_nfkc_and_collapse(spark):
    from syncquill_spark.operators.text import normalize_text

    df = spark.createDataFrame([(1, "  ﬁle   ＡＢ  ")], DOCS)
    (r,) = normalize_text(df, form="NFKC", collapse_ws=True).collect()
    assert r.text_norm == "file AB"  # ligature + fullwidth folded, ws collapsed


def test_normalize_text_zwj_stripped_before_compose(spark):
    from syncquill_spark.operators.text import normalize_text

    # a ZWJ between base and combining mark must not block composition
    df = spark.createDataFrame([(1, "e‍́")], DOCS)
    (r,) = normalize_text(df).collect()
    assert r.text_norm == "é"


def test_normalize_text_makes_dedup_see_through_encoding(spark):
    from syncquill_spark.operators.dedup import exact_dedup
    from syncquill_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [(1, "café bon"), (2, "café bon")], DOCS
    )
    from pyspark.sql import functions as SF

    assert exact_dedup(df).count() == 2  # byte-distinct without normalize
    normed = normalize_text(df).select(
        "doc_id", SF.col("text_norm").alias("text")
    )
    assert exact_dedup(normed).count() == 1


def test_normalize_text_rejects_bad_form(spark):
    import pytest as _pytest

    from syncquill_spark.operators.text import normalize_text

    df = spark.createDataFrame([(1, "x")], DOCS)
    with _pytest.raises(ValueError, match="form"):
        normalize_text(df, form="NFX")


def _spans_py(docs, k, w, min_shared, max_fp_df, merge_gap=None):
    """Pure-python model of winnowing_self_spans: selection via
    _winnow_py, pair detection with the distinct-doc hub cap, anchors
    over ALL shared fingerprints (positions are never capped — the
    operator's semantics), diagonal grouping, gaps-and-islands merge."""
    from collections import Counter, defaultdict

    if merge_gap is None:
        merge_gap = w
    pos = {i: _winnow_py(d, k, w) for i, d in enumerate(docs)}
    fps = {i: {fp for _, fp in v} for i, v in pos.items()}
    df_cnt = Counter(fp for s in fps.values() for fp in s)
    ok = (lambda f: df_cnt[f] <= max_fp_df) if max_fp_df is not None else (
        lambda f: True
    )
    out = []
    ids = sorted(fps)
    for xi in range(len(ids)):
        for yi in range(xi + 1, len(ids)):
            a, b = ids[xi], ids[yi]
            if len({f for f in fps[a] & fps[b] if ok(f)}) < min_shared:
                continue
            by_diag = defaultdict(list)
            for pa, fa in pos[a]:
                for pb, fb in pos[b]:
                    if fa == fb:
                        by_diag[pb - pa].append((pa, pb))
            for lst in by_diag.values():
                lst.sort()
                run = [lst[0]]
                for pa, pb in lst[1:]:
                    if pa - run[-1][0] > merge_gap:
                        out.append((a, b, run))
                        run = [(pa, pb)]
                    else:
                        run.append((pa, pb))
                out.append((a, b, run))
    return sorted(
        (
            a, b,
            min(p for p, _ in r), max(p for p, _ in r) + k - 1,
            min(p for _, p in r), max(p for _, p in r) + k - 1,
            len(r),
        )
        for a, b, r in out
    )


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(_doc, min_size=2, max_size=6),
    min_shared=st.sampled_from([1, 2]),
    cap=st.sampled_from([None, 2]),
)
def test_self_spans_matches_python_model(spark, docs, min_shared, cap):
    """Third independent implementation of the spans family (next to
    the Spark chain and the DuckDB oracle): detection + localization
    end to end vs a loop-based python model on hypothesis-generated
    word soup, including the hub cap's detection-only scope and the
    rightmost-tie selection feeding real anchor sets."""
    from syncquill_spark.operators._cache import release_cached_intermediates
    from syncquill_spark.streaming.text_dedup import winnowing_self_spans

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    try:
        got = sorted(
            map(
                tuple,
                winnowing_self_spans(
                    df, k=3, window=4, min_shared=min_shared, max_fp_df=cap
                ).collect(),
            )
        )
    finally:
        release_cached_intermediates()
    assert got == _spans_py(docs, 3, 4, min_shared, cap)


def test_winnowing_window_guard(spark, sf_dir):
    """window=0 used to select ZERO fingerprints silently (an empty
    ROWS frame) — wrong by construction for a caller error; the
    winnowing guarantee needs window >= 1 (r13 boundary battery)."""
    import pytest as _pytest

    from syncquill_spark.operators.text import winnowing_fingerprints

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(3)
    for bad in (0, -2):
        with _pytest.raises(ValueError, match="window must be >= 1"):
            winnowing_fingerprints(docs, k=3, window=bad)
    assert winnowing_fingerprints(docs, k=3, window=1).count() > 0
