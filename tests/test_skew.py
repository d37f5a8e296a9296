"""Salted join / two-phase agg: identical results to the plain forms,
including a pathologically skewed key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from syncquill_spark.operators.skew import salted_agg, salted_join


def _skewed(spark):
    # one hot key (90% of rows) + a long tail
    rows = [(1, i, float(i % 7)) for i in range(900)]
    rows += [(k, 1000 + k, float(k)) for k in range(2, 102)]
    return spark.createDataFrame(rows, "k long, rid long, v double")


def test_salted_join_equals_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 102)], "k long, label string"
    )
    plain = big.join(small, "k").select("k", "rid", "v", "label")
    salted = salted_join(big, small, key="k", salt_factor=8,
                         salt_from=["k", "rid"]).select("k", "rid", "v", "label")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([(1, "one")], "k long, label string")
    plain = big.join(small, "k", "left").select("k", "rid", "label")
    salted = salted_join(big, small, key="k", salt_factor=4,
                         salt_from=["rid"], how="left").select("k", "rid", "label")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_agg_equals_plain_agg(spark):
    df = _skewed(spark)
    plain = {
        (r["k"]): (r["n"], r["mn"], r["mx"], float(r["total"]))
        for r in df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("total"),
        ).collect()
    }
    salted = {
        (r["k"]): (r["n"], r["mn"], r["mx"], float(r["total"]))
        for r in salted_agg(
            df, "k",
            {
                "n": (F.count(F.lit(1)), "count"),
                "mn": (F.min("v"), "min"),
                "mx": (F.max("v"), "max"),
                "total": (F.sum(F.col("v").cast("decimal(18,2)")), "sum"),
            },
            salt_factor=8, salt_from=["rid"],
        ).collect()
    }
    assert salted == plain
