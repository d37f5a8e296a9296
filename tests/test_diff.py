"""Unit tests for the CDC diff operator (reference A7 semantics).

Covers the SURVEY.md §5.3 matrix: no changes / single cell / tail
insert / tail delete / mixed / type-coercion (int 3 vs "3" must NOT
diff, per syncquill.py:110-113) / positional cascade on mid-table
insert (the reference's literal zip-by-index behavior).
"""

from __future__ import annotations

from syncquill_spark.operators import diff_keyed, diff_positional

TGT_SCHEMA = "slno long, name string, amount double"
SRC_SCHEMA = "slno string, name string, amount string"


def rows(df):
    return sorted(
        (r["change_type"], r["slno"], r["col"], r["old_value"], r["new_value"])
        for r in df.collect()
    )


def test_no_changes(spark):
    tgt = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.0)], TGT_SCHEMA)
    src = spark.createDataFrame([("1", "a", "1.5"), ("2", "b", "2.0")], SRC_SCHEMA)
    assert diff_keyed(tgt, src).count() == 0
    assert diff_positional(tgt, src).count() == 0


def test_type_coercion_no_diff(spark):
    """int 3 vs '3' and 2.0 vs '2.0' compare equal after string-cast."""
    tgt = spark.createDataFrame([(3, "x", 2.0)], TGT_SCHEMA)
    src = spark.createDataFrame([("3", "x", "2.0")], SRC_SCHEMA)
    assert diff_keyed(tgt, src).count() == 0


def test_single_cell_diff(spark):
    tgt = spark.createDataFrame([(1, "a", 1.5)], TGT_SCHEMA)
    src = spark.createDataFrame([("1", "A", "1.5")], SRC_SCHEMA)
    assert rows(diff_keyed(tgt, src)) == [("diff", "1", "name", "a", "A")]


def test_tail_insert(spark):
    tgt = spark.createDataFrame([(1, "a", 1.5)], TGT_SCHEMA)
    src = spark.createDataFrame([("1", "a", "1.5"), ("2", "b", "2.0")], SRC_SCHEMA)
    expected = [("extra_row", "2", None, None, None)]
    assert rows(diff_keyed(tgt, src)) == expected
    assert rows(diff_positional(tgt, src)) == expected


def test_tail_delete(spark):
    tgt = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.0)], TGT_SCHEMA)
    src = spark.createDataFrame([("1", "a", "1.5")], SRC_SCHEMA)
    expected = [("del_row", "2", None, None, None)]
    assert rows(diff_keyed(tgt, src)) == expected
    assert rows(diff_positional(tgt, src)) == expected


def test_mixed_changes_keyed(spark):
    tgt = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.0), (3, "c", 3.0)], TGT_SCHEMA
    )
    src = spark.createDataFrame(
        [("1", "a", "9.9"), ("2", "b", "2.0"), ("4", "d", "4.0")], SRC_SCHEMA
    )
    assert rows(diff_keyed(tgt, src)) == [
        ("del_row", "3", None, None, None),
        ("diff", "1", "amount", "1.5", "9.9"),
        ("extra_row", "4", None, None, None),
    ]


def test_positional_cascade_on_midtable_insert(spark):
    """Mid-table insert in source shifts later rows: the reference
    (zip-by-index, syncquill.py:125-128) emits spurious cell diffs on
    every shifted row plus a tail extra_row — keyed mode does not.
    Sheet order is carried by an explicit order column, exactly like
    the reference trusts the sheet's physical row order."""
    tgt = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], TGT_SCHEMA)
    src = spark.createDataFrame(
        [("1", "a", "1.0", 1), ("15", "z", "9.0", 2), ("2", "b", "2.0", 3)],
        SRC_SCHEMA + ", sheet_row int",
    )
    pos = rows(diff_positional(tgt, src, source_order=["sheet_row"]))
    # row index 1 pairs tgt(2,b,2.0) with src(15,z,9.0): 3 cell diffs
    assert ("diff", "2", "slno", "2", "15") in pos
    assert ("diff", "2", "name", "b", "z") in pos
    assert ("diff", "2", "amount", "2.0", "9.0") in pos
    assert ("extra_row", "2", None, None, None) in pos  # tail src row key "2"
    # keyed mode sees it as a clean single insert
    assert rows(diff_keyed(tgt, src)) == [("extra_row", "15", None, None, None)]


def test_diff_self_is_empty(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    assert diff_keyed(df, df, key="c_custkey").count() == 0


def test_null_vs_value_is_a_change(spark):
    tgt = spark.createDataFrame([(1, None, 1.0)], TGT_SCHEMA)
    src = spark.createDataFrame([("1", "a", "1.0")], SRC_SCHEMA)
    assert rows(diff_keyed(tgt, src)) == [("diff", "1", "name", None, "a")]
