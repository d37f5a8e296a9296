"""SCD2 history materialization tests."""

from __future__ import annotations

from syncquill_spark.operators.scd2 import scd2_history

SCHEMA = "k long, t long, status string, tie long"


def _hist(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return scd2_history(
        df, key_col="k", order_col="t", tracked_cols=["status"], tie_cols=["tie"]
    ).collect()


def test_scd2_collapses_and_versions(spark):
    rows = [
        (1, 10, "a", 0),
        (1, 20, "a", 0),   # same -> collapses into v1
        (1, 30, "b", 0),   # change -> v2
        (1, 40, "a", 0),   # back to a -> v3 (NOT merged with v1)
        (2, 10, "x", 0),
    ]
    out = {(r.k, r.version): r for r in _hist(spark, rows)}
    assert out[(1, 1)].status == "a" and out[(1, 1)].n_obs == 2
    assert out[(1, 1)].valid_from == 10 and out[(1, 1)].valid_to == 30
    assert out[(1, 2)].status == "b" and out[(1, 2)].valid_to == 40
    assert out[(1, 3)].status == "a" and out[(1, 3)].valid_to is None
    assert out[(2, 1)].valid_to is None  # single observation: current
    assert len(out) == 4


def test_scd2_null_transitions_open_versions(spark):
    rows = [
        (1, 10, "a", 0),
        (1, 20, None, 0),  # a -> NULL: new version
        (1, 30, None, 0),  # NULL -> NULL: collapses
        (1, 40, "a", 0),   # NULL -> a: new version
    ]
    out = sorted(_hist(spark, rows), key=lambda r: r.version)
    assert [(r.status, r.n_obs) for r in out] == [("a", 1), (None, 2), ("a", 1)]
    assert [r.valid_from for r in out] == [10, 20, 40]
    assert [r.valid_to for r in out] == [20, 40, None]


def test_scd2_order_ties_break_deterministically(spark):
    rows = [(1, 10, "a", 1), (1, 10, "b", 2), (1, 10, "a", 3)]
    out = sorted(_hist(spark, rows), key=lambda r: r.version)
    assert [r.status for r in out] == ["a", "b", "a"]
