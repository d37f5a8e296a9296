"""The `sheetgrid` Python DataSource: schema-from-header, partitioned
reads, ragged-row handling, and end-to-end use as a sync source."""

from __future__ import annotations

import json

import pytest

from syncquill_spark.sources.sheetgrid_datasource import SheetGridDataSource


@pytest.fixture()
def grid_path(tmp_path):
    grid = {"values": [
        ["slno", "name", "amount"],
        ["1", "alice", "10.5"],
        ["2", "bob", "20.0"],
        ["3", "carol"],                      # short row -> NULL pad
        ["4", "dave", "40.0", "EXTRA"],      # long row -> truncated
        ["5", "erin", "50.0"],
    ]}
    p = tmp_path / "sheet.json"
    p.write_text(json.dumps(grid))
    return str(p)


def test_read_schema_and_rows(spark, grid_path):
    spark.dataSource.register(SheetGridDataSource)
    df = spark.read.format("sheetgrid").option("path", grid_path).load()
    assert df.schema.simpleString() == (
        "struct<slno:string,name:string,amount:string>"
    )
    rows = {r["slno"]: (r["name"], r["amount"]) for r in df.collect()}
    assert rows["1"] == ("alice", "10.5")
    assert rows["3"] == ("carol", None)      # padded
    assert rows["4"] == ("dave", "40.0")     # truncated
    assert len(rows) == 5


def test_partitioned_read_covers_all_rows(spark, grid_path):
    spark.dataSource.register(SheetGridDataSource)
    df = (spark.read.format("sheetgrid").option("path", grid_path)
          .option("numPartitions", "3").load())
    assert df.rdd.getNumPartitions() == 3
    assert sorted(r["slno"] for r in df.collect()) == ["1", "2", "3", "4", "5"]


def test_as_sync_source(spark, grid_path, tmp_path):
    """sheetgrid -> keyed diff against a parquet target: the reference's
    sheet-vs-table sync on Spark-native rails."""
    from syncquill_spark.operators import diff_keyed

    spark.dataSource.register(SheetGridDataSource)
    sheet = spark.read.format("sheetgrid").option("path", grid_path).load()
    target = spark.createDataFrame(
        [(1, "alice", 10.5), (2, "bobby", 20.0), (9, "zoe", 90.0)],
        "slno long, name string, amount double",
    )
    changes = diff_keyed(target, sheet.filter("slno <> '3' and slno <> '4'"))
    by_type = {}
    for r in changes.collect():
        by_type.setdefault(r["change_type"], []).append(r)
    assert {r["slno"] for r in by_type["extra_row"]} == {"5"}
    assert {r["slno"] for r in by_type["del_row"]} == {"9"}
    assert [(r["slno"], r["col"], r["old_value"], r["new_value"])
            for r in by_type["diff"]] == [("2", "name", "bobby", "bob")]
