"""Binned interval join: exact containment semantics without an equi
key, including bin-boundary intervals and left-join nulls."""

from __future__ import annotations

import pytest

from syncquill_spark.operators.ranges import binned_range_join


@pytest.fixture()
def data(spark):
    points = spark.createDataFrame(
        [(1, 0.5), (2, 10.0), (3, 19.99), (4, 25.0), (5, -3.0)],
        "pid long, v double",
    )
    intervals = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 9.5, 20.0), ("c", 100.0, 110.0), ("d", -5.0, -1.0)],
        "label string, lo double, hi double",
    )
    return points, intervals


def test_inner_matches_naive(spark, data):
    points, intervals = data
    got = {
        (r["pid"], r["label"])
        for r in binned_range_join(points, intervals, "v", "lo", "hi", 7.0).collect()
    }
    naive = {
        (p["pid"], i["label"])
        for p in points.collect()
        for i in intervals.collect()
        if i["lo"] <= p["v"] <= i["hi"]
    }
    assert got == naive
    assert (2, "a") in got and (2, "b") in got  # overlapping intervals
    assert (5, "d") in got                       # negative bins


def test_left_keeps_unmatched(spark, data):
    points, intervals = data
    rows = binned_range_join(points, intervals, "v", "lo", "hi", 7.0, how="left").collect()
    unmatched = [r for r in rows if r["label"] is None]
    assert {r["pid"] for r in unmatched} == {4}  # 25.0 is in no interval


@pytest.mark.parametrize("width", [0.5, 3.0, 1000.0])
def test_bin_width_invariance(spark, data, width):
    points, intervals = data
    got = {
        (r["pid"], r["label"])
        for r in binned_range_join(points, intervals, "v", "lo", "hi", width).collect()
    }
    naive = {
        (p["pid"], i["label"])
        for p in points.collect()
        for i in intervals.collect()
        if i["lo"] <= p["v"] <= i["hi"]
    }
    assert got == naive


def test_binned_range_join_bin_width_guard(spark):
    """bin_width=0 used to fail only at RUNTIME (ANSI DIVIDE_BY_ZERO
    mid-job) and a negative width silently flipped bin order; both are
    caller errors and now raise immediately (r13 boundary battery)."""
    import pytest as _pytest

    from syncquill_spark.operators.ranges import binned_range_join

    pts = spark.createDataFrame([(1, 5.0)], "pid long, p double")
    ivl = spark.createDataFrame([(10, 0.0, 10.0)], "iid long, lo double, hi double")
    for bad in (0.0, -1.0):
        with _pytest.raises(ValueError, match="bin_width must be > 0"):
            binned_range_join(pts, ivl, "p", "lo", "hi", bin_width=bad)
