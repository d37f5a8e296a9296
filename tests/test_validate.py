"""Validation tests (reference A2/A3, syncquill.py:66-74)."""

from __future__ import annotations

import pytest

from syncquill_spark.operators import ValidationError, validate_sync_frame

SCHEMA = "slno string, name string, amount string"


def test_valid_frame_passes(spark):
    df = spark.createDataFrame([("1", "a", "2.0")], SCHEMA)
    assert validate_sync_frame(df) is df


def test_missing_key_column(spark):
    df = spark.createDataFrame([("a", "2.0")], "name string, amount string")
    with pytest.raises(ValidationError, match="Missing 'slno' column"):
        validate_sync_frame(df)


def test_empty_key_value(spark):
    df = spark.createDataFrame([("1", "a", "2.0"), ("", "b", "3.0")], SCHEMA)
    with pytest.raises(ValidationError, match="Missing 'slno' in row"):
        validate_sync_frame(df)


def test_null_key_value(spark):
    df = spark.createDataFrame([(None, "b", "3.0")], SCHEMA)
    with pytest.raises(ValidationError, match="Missing 'slno'"):
        validate_sync_frame(df)


def test_empty_cell_names_column(spark):
    df = spark.createDataFrame([("1", "", "3.0")], SCHEMA)
    with pytest.raises(ValidationError, match="empty values in column name"):
        validate_sync_frame(df)


def test_typed_frame_passes(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    assert validate_sync_frame(df, key="c_custkey") is df


def test_referential_orphans_counts_and_null_keys(spark):
    """Orphan audit: unmatched child keys count, NULL FKs count (they
    silently vanish from every inner join — the audit's whole point),
    and a clean edge reports zero."""
    from syncquill_spark.operators.validate import referential_orphans

    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    child = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 99), (13, None), (14, 2)],
        "cid long, fk long",
    )
    (row,) = referential_orphans(child, parent, "fk", "pk").collect()
    assert (row.relation, row.n_children, row.n_orphans) == ("fk->pk", 5, 2)
    clean = spark.createDataFrame([(10, 1)], "cid long, fk long")
    (row2,) = referential_orphans(clean, parent, "fk", "pk", relation="r").collect()
    assert (row2.relation, row2.n_orphans) == ("r", 0)
