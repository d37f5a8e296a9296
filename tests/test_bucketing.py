"""Bucketed tables: pre-shuffled storage layout => shuffle-free
equi-joins (no Exchange on either side of the SortMergeJoin). The
co-location strategy for repeated big-big joins at cluster scale."""

from __future__ import annotations

import contextlib
import io

import pytest


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    # warehouse.dir is a static config on the shared session; a
    # database-level LOCATION keeps the data under tmp instead.
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{tmp_path / 'warehouse'}'"
    )
    orders, lineitem = (
        spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in ("orders", "lineitem")
    )
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("bucketdb.orders_b"))
    (lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
     .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("bucketdb.lineitem_b"))
    yield "bucketdb.orders_b", "bucketdb.lineitem_b"
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_pair):
    orders_b, lineitem_b = bucketed_pair
    # disable broadcast so the join strategy decision is about layout
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(lineitem_b)
            .join(spark.table(orders_b), "o_orderkey")
            .select("o_orderkey", "l_quantity", "o_orderstatus")
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan  # both sides pre-bucketed
        assert "SortMergeJoin" in plan

        # same result as the plain (shuffling) join
        plain = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .withColumnRenamed("l_orderkey", "o_orderkey")
            .join(spark.read.parquet(f"{sf_dir}/orders.parquet"), "o_orderkey")
            .select("o_orderkey", "l_quantity", "o_orderstatus")
        )
        assert joined.count() == plain.count()
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
