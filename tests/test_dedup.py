"""Dedup operators: exact, n-gram Jaccard, MinHash-LSH, SimHash."""

from __future__ import annotations

import pytest

from syncquill_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_pairs,
)

DOCS = "doc_id long, text string, lang string, n_chars long"


@pytest.fixture(scope="module")
def docs(spark):
    body = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tonight"
    other = "completely different words describing some other topic entirely here now"
    rows = [
        (1, body, "en", len(body)),
        (2, body, "en", len(body)),          # exact dup of 1
        (3, near, "en", len(near)),          # near dup of 1
        (4, other, "en", len(other)),
        (5, body, "de", len(body)),          # same text, different lang block
    ]
    return spark.createDataFrame(rows, DOCS)


def test_exact_dedup(docs):
    out = {r["keeper_doc_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert out[1] == 3  # docs 1, 2, 5 share identical text
    assert out[3] == 1
    assert out[4] == 1


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jac"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5, length_band=None).collect()
    }
    assert pairs[(1, 2)] == 1.0          # exact dup
    assert 0.5 <= pairs[(1, 3)] < 1.0    # near dup
    assert (1, 4) not in pairs           # unrelated
    assert (1, 5) not in pairs           # blocked by lang


def test_minhash_lsh_finds_near_dup(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jac"]
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs  # near dup must collide in >=1 band at jac~0.85
    assert (1, 4) not in pairs


def test_simhash_identical_docs_equal(docs):
    fp = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    assert fp[1] == fp[2] == fp[5]
    assert fp[1] != fp[4]
    near = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(docs, max_hamming=5).collect()
    }
    assert near[(1, 2)] == 0
