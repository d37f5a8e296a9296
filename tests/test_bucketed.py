"""Bucketed co-located joins: the layout must actually eliminate the
join shuffle, not just claim to."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from syncquill_spark.sources.bucketed import read_table, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, sf_dir):
    """orders + lineitem bucketed on the order key into the same
    bucket count (written once per session). The default in-memory
    catalog forgets tables between sessions while their warehouse
    directories persist, so stale locations are removed first."""
    import shutil

    if not spark.catalog.tableExists("b_orders"):
        warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        for t in ("b_orders", "b_lineitem"):
            shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        write_bucketed(orders, "b_orders", ("o_orderkey",), 4)
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem",
            ("o_orderkey",),
            4,
        )
    return read_table(spark, "b_orders"), read_table(spark, "b_lineitem")


def _no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    return prev


def test_bucketed_join_has_no_exchange(spark, bucketed_pair, sf_dir):
    """Join on the bucket key: neither side shuffles (no Exchange in
    the plan once broadcast is off), and the result matches the plain
    parquet join row for row."""
    b_orders, b_lineitem = bucketed_pair
    prev = _no_broadcast(spark)
    try:
        joined = b_orders.join(b_lineitem, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]

        got = joined.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    want = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {(r.o_orderstatus, r.n) for r in got} == {
        (r.o_orderstatus, r.n) for r in want
    }


def test_bucketed_groupby_on_bucket_key_has_no_exchange(spark, bucketed_pair):
    """Aggregation keyed on the bucket column is bucket-local — the
    pre-shuffle layout also pays off for groupBy, not just joins."""
    _, b_lineitem = bucketed_pair
    agg = b_lineitem.groupBy("o_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert agg.count() > 0
