"""Incremental aggregate maintenance tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from syncquill_spark.operators.incremental import (
    incremental_agg_update,
    snapshot_agg,
)

BASE = "g string, amount double"
DELTA = "op string, g string, amount double"


def test_incremental_equals_recompute(spark):
    base_rows = [("a", 10.0), ("a", 5.0), ("b", 7.0)]
    base_df = spark.createDataFrame(base_rows, BASE)
    base = snapshot_agg(base_df, ["g"], ["amount"])
    delta = spark.createDataFrame(
        [
            ("I", "a", 2.0),           # plain insert
            ("D", "a", 10.0),          # delete an existing row
            ("D", "b", 7.0), ("I", "b", 9.5),  # update = D(old)+I(new)
            ("I", "c", 1.0),           # brand-new group
        ],
        DELTA,
    )
    got = {
        r.g: (float(r.amount), r.n_rows)
        for r in incremental_agg_update(base, delta, ["g"], ["amount"]).collect()
    }
    final_rows = [("a", 5.0), ("a", 2.0), ("b", 9.5), ("c", 1.0)]
    want = {
        r.g: (float(r.amount), r.n_rows)
        for r in snapshot_agg(
            spark.createDataFrame(final_rows, BASE), ["g"], ["amount"]
        ).collect()
    }
    assert got == want


def test_incremental_drops_emptied_groups(spark):
    base = snapshot_agg(
        spark.createDataFrame([("a", 3.0)], BASE), ["g"], ["amount"]
    )
    delta = spark.createDataFrame([("D", "a", 3.0)], DELTA)
    assert incremental_agg_update(base, delta, ["g"], ["amount"]).count() == 0
