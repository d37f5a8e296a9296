"""fuzzy_name_pairs on the PLANTED synthetic catalog (round-9 verdict
#7: every prior fixture name column was degenerate — all-distinct
tokens or quadratic pair output). tools/name_catalog.py plants a
Zipf-skewed catalog with typo twins whose recall is guaranteed by
construction (the first token stays verbatim, so every planted pair
shares a blocking token); these tests pin that contract plus the
precision and hub-cap properties, property-based over seeds."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from tools.name_catalog import TWIN_OFFSET, catalog_rows, name_for, typo_name_for


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_catalog_is_deterministic_and_zipf_skewed():
    rows_a, rows_b = catalog_rows(400, seed=3), catalog_rows(400, seed=3)
    assert rows_a == rows_b
    names = [n for _, n in rows_a]
    lasts = [n.split(" ", 1)[1] for _, n in rows_a if _ < TWIN_OFFSET]
    from collections import Counter

    freqs = Counter(lasts).most_common()
    # skew: the top surname is a real hub (several %), the median is
    # not — the property the degenerate fixtures lacked
    assert freqs[0][1] >= 8
    assert freqs[len(freqs) // 2][1] <= freqs[0][1] // 3
    # distinct-name cardinality sits between the two degenerate poles
    assert 100 < len(set(names)) <= len(names)


def test_planted_twins_are_within_two_edits():
    for i in range(0, 500, 7):
        base, twin = name_for(i, seed=1), typo_name_for(i, seed=1)
        assert base.split(" ", 1)[0] == twin.split(" ", 1)[0]
        assert 1 <= _lev(base, twin) <= 2


@settings(max_examples=4, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_fuzzy_pairs_contract_on_planted_catalog(spark, seed):
    """Recall on ALL planted twins (guaranteed by the verbatim first
    token + the length prefilter), exact distances vs the Python
    model, and nothing reported beyond max_dist."""
    from syncquill_spark.operators.dedup import fuzzy_name_pairs

    rows = catalog_rows(90, typo_every=6, seed=seed)
    names = dict(rows)
    df = spark.createDataFrame(rows, "doc_id long, name string")
    got = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_name_pairs(df, name_col="name", max_dist=2).collect()
    }
    for i in range(0, 90, 6):
        pair = (i, i + TWIN_OFFSET)
        assert pair in got, f"planted twin {pair} missed (seed={seed})"
        assert got[pair] == _lev(names[i].lower(), names[i + TWIN_OFFSET].lower())
    for (a, b), d in got.items():
        assert d <= 2
        assert d == _lev(names[a].lower(), names[b].lower())


def test_hub_cap_only_drops_hub_only_pairs(spark):
    """max_token_df removes exactly the pairs whose EVERY shared token
    is a hub — the stated lossy-insurance contract — and never
    invents pairs."""
    from collections import Counter

    from syncquill_spark.operators.dedup import fuzzy_name_pairs

    rows = catalog_rows(300, typo_every=5, seed=9)
    df = spark.createDataFrame(rows, "doc_id long, name string")
    cap = 25
    uncapped = {
        (r.id_a, r.id_b)
        for r in fuzzy_name_pairs(df, name_col="name", max_dist=2).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in fuzzy_name_pairs(
            df, name_col="name", max_dist=2, max_token_df=cap
        ).collect()
    }
    assert capped <= uncapped
    tok_df = Counter()
    toks = {i: set(n.lower().split()) for i, n in rows}
    for ts in toks.values():
        tok_df.update(ts)
    hubs = {t for t, c in tok_df.items() if c > cap}
    for pair in uncapped - capped:
        shared = toks[pair[0]] & toks[pair[1]]
        assert shared and shared <= hubs, (pair, shared - hubs)
    for pair in capped:
        shared = toks[pair[0]] & toks[pair[1]]
        assert shared - hubs, f"{pair} survived with only hub tokens"


def test_catalog_blocking_is_subquadratic(spark):
    """The selectivity number the probe tracks: candidate pairs on the
    planted catalog must be a small fraction of the cross product
    (the degenerate fixtures sat at ~100%)."""
    from pyspark.sql import functions as F

    rows = catalog_rows(600, seed=2)
    df = spark.createDataFrame(rows, "doc_id long, name string")
    toks = (
        df.select(
            F.col("doc_id").alias("_id"),
            F.explode(F.split(F.lower(F.trim("name")), r"\s+")).alias("_tok"),
        )
        .distinct()
    )
    cands = (
        toks.alias("a")
        .join(toks.alias("b"), "_tok")
        .filter(F.col("a._id") < F.col("b._id"))
        .select("a._id", "b._id")
        .distinct()
        .count()
    )
    n = len(rows)
    cross = n * (n - 1) / 2
    assert cands / cross < 0.05, f"blocking selectivity {cands/cross:.3f}"
