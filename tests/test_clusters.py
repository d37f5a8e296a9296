"""Connected components / dedup keepers over hand-built graphs."""

from __future__ import annotations

import pytest

from syncquill_spark.operators.clusters import connected_components, dedup_keepers


def test_chain_triangle_and_pair(spark):
    # chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    comp = {r["node"]: r["comp"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_keepers_survivor_set(spark):
    pairs = spark.createDataFrame([(5, 3), (3, 9)], "id_a long, id_b long")
    k = {r["node"]: r["keeper"] for r in dedup_keepers(pairs).collect()}
    assert k == {3: 3, 5: 3, 9: 3}


def test_nonconvergence_raises(spark):
    # a 6-chain cannot converge in 1 round
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(pairs, max_iter=1)


def test_apply_dedup_keeps_one_per_cluster(spark):
    from syncquill_spark.operators.clusters import apply_dedup

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(8)], "doc_id long, text string"
    )
    # clusters {1,2,3} and {5,6}; 0,4,7 singletons
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    kept = sorted(r.doc_id for r in apply_dedup(docs, pairs).collect())
    assert kept == [0, 1, 4, 5, 7]  # min id survives each cluster


def test_deep_chain_converges_via_pointer_jump(spark):
    """An 80-node path needs 79 propagation hops; 6 cycles = 12
    neighbor-min steps can only cover 12 of them, so convergence
    within max_iter=6 REQUIRES the per-step pointer jump (coverage
    doubles per step). Pins the jump: removing it turns this test
    into the nonconvergence RuntimeError."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(79)], "id_a long, id_b long"
    )
    comp = {
        r["node"]: r["comp"]
        for r in connected_components(pairs, max_iter=6).collect()
    }
    assert comp == {i: 0 for i in range(80)}
