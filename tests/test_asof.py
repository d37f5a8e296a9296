"""As-of join: point-in-time semantics incl. ties and no-match."""

from __future__ import annotations

from syncquill_spark.operators.asof import asof_join


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [(1, 5), (1, 9), (1, 3), (2, 7)], "u long, t long"
    )
    right = spark.createDataFrame(
        [(1, 4, "a"), (1, 8, "b"), (3, 1, "z")], "u long, t long, v string"
    )
    out = {
        (r["u"], r["t"]): r["v_asof"]
        for r in asof_join(left, right, on="u", ts="t").collect()
    }
    assert out[(1, 5)] == "a"   # latest right at/before t=5 is t=4
    assert out[(1, 9)] == "b"
    assert out[(1, 3)] is None  # nothing at/before t=3
    assert out[(2, 7)] is None  # key has no right rows


def test_asof_tie_is_inclusive(spark):
    left = spark.createDataFrame([(1, 5)], "u long, t long")
    right = spark.createDataFrame([(1, 5, "same-instant")], "u long, t long, v string")
    out = asof_join(left, right, on="u", ts="t").collect()[0]
    assert out["v_asof"] == "same-instant"


def test_asof_null_in_latest_right_row_is_preserved(spark):
    """If the most recent right row has a NULL value column, the left
    row must see that NULL — not a stale non-null value carried forward
    from an older right row (point-in-time semantics)."""
    left = spark.createDataFrame([(1, 10)], "u long, t long")
    right = spark.createDataFrame(
        [(1, 4, "old", 1.0), (1, 8, None, 2.0)],
        "u long, t long, v string, w double",
    )
    row = asof_join(left, right, on="u", ts="t").collect()[0]
    assert row["v_asof"] is None  # latest right row's NULL, not "old"
    assert row["w_asof"] == 2.0   # other columns come from the SAME row


def test_asof_keeps_left_columns(spark):
    left = spark.createDataFrame([(1, 5, "payload")], "u long, t long, note string")
    right = spark.createDataFrame([(1, 4, 42)], "u long, t long, v long")
    row = asof_join(left, right, on="u", ts="t").collect()[0]
    assert row["note"] == "payload"
    assert row["v_asof"] == 42


def test_asof_tied_right_timestamps_resolve_deterministically(spark):
    """Two DIFFERING right rows tied on (key, ts): without an explicit
    tie-break the window's sort key is identical for both, their order
    is whatever the scan produced, and last() returns a partition-
    layout-dependent answer (r15 battery find). The pinned rule: the
    greatest value struct wins, under every partitioning."""
    left = spark.createDataFrame([(1, 10)], "u long, t long")
    right = spark.createDataFrame(
        [(1, 10, "x", 1.0), (1, 10, "y", 0.5)],
        "u long, t long, v string, w double",
    )
    for parts in (1, 2, 8, 32):
        row = asof_join(left, right.repartition(parts), on="u", ts="t").collect()[0]
        # greatest struct = ("y", 0.5): first field dominates
        assert row["v_asof"] == "y" and row["w_asof"] == 0.5, (parts, row)
