"""End-to-end engine tests: sync/upsert over parquet connectors, plus
the report sink and the sheets grid adapter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from syncquill_spark.cli import parse_arguments, table_from_uri
from syncquill_spark.engine import sync, upsert
from syncquill_spark.operators import diff_keyed, format_change_report, normalize_strings
from syncquill_spark.sources import BigQueryTable, ParquetTable, SheetsTable
from syncquill_spark.sources.sheets import grid_to_frame

TGT_SCHEMA = "slno long, name string, amount double"
SRC_SCHEMA = "slno string, name string, amount string"


def as_set(df):
    return set(map(tuple, normalize_strings(df).collect()))


@pytest.fixture
def tables(spark, tmp_path):
    tgt = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.0), (3, "c", 3.0)], TGT_SCHEMA
    )
    src = spark.createDataFrame(
        [("1", "a", "9.9"), ("2", "bb", "2.0"), ("4", "d", "4.0")], SRC_SCHEMA
    )
    tpath, spath = str(tmp_path / "tgt.pq"), str(tmp_path / "src.pq")
    tgt.write.parquet(tpath)
    src.write.parquet(spath)
    return ParquetTable(spath), ParquetTable(tpath)


def test_sync_applies_changes(spark, tables):
    source, target = tables
    result = sync(spark, source, target)
    assert result.n_changes == 4  # 2 cell diffs + 1 del + 1 extra
    assert "Row changes:" in result.report
    post = target.read(spark)
    assert as_set(post) == as_set(source.read(spark))
    # target keeps its typed schema after apply
    assert post.dtypes == [("slno", "bigint"), ("name", "string"), ("amount", "double")]


def test_sync_with_non_default_key(spark, tmp_path):
    """sync(key=...) with a key not named 'slno' (the CLI --key flag):
    the change set still names its key column 'slno', and the report /
    apply paths must read it from there."""
    tgt = spark.createDataFrame(
        [(10, "a", 1.0), (20, "b", 2.0), (30, "c", 3.0)],
        "item_id long, name string, amount double",
    )
    src = spark.createDataFrame(
        [("10", "a", "9.9"), ("20", "bb", "2.0"), ("40", "d", "4.0")],
        "item_id string, name string, amount string",
    )
    tp, sp = str(tmp_path / "t.pq"), str(tmp_path / "s.pq")
    tgt.write.parquet(tp)
    src.write.parquet(sp)
    source, target = ParquetTable(sp), ParquetTable(tp)
    result = sync(spark, source, target, key="item_id")
    assert result.n_changes == 4  # 2 cell diffs + 1 del + 1 extra
    assert "Row changes:" in result.report
    assert "Added new rows:" in result.report and "Deleted rows:" in result.report
    post = target.read(spark)
    assert as_set(post) == as_set(source.read(spark))


def test_report_collect_is_capped(spark, tmp_path):
    """A change set larger than the report cap (e.g. a full reload
    deleting every row) must not collect the whole table to the driver:
    the keys collect is bounded by engine.REPORT_LIMIT."""
    import syncquill_spark.engine as eng

    old_limit = eng.REPORT_LIMIT
    eng.REPORT_LIMIT = 50
    try:
        tgt = spark.range(500).select(
            F.col("id").alias("slno"), F.lit("x").alias("name")
        )
        src = spark.createDataFrame([("999999", "new")], "slno string, name string")
        tp, sp = str(tmp_path / "t.pq"), str(tmp_path / "s.pq")
        tgt.write.parquet(tp)
        src.write.parquet(sp)
        result = sync(spark, ParquetTable(sp), ParquetTable(tp), dry_run=True)
        assert result.n_changes == 501  # 500 deletes + 1 insert
        # the rendered "Deleted rows" table is capped, not 500 rows
        assert result.report.count("| Old") <= eng.REPORT_LIMIT
    finally:
        eng.REPORT_LIMIT = old_limit


def test_sync_dry_run_leaves_target(spark, tables):
    source, target = tables
    before = as_set(target.read(spark))
    result = sync(spark, source, target, dry_run=True)
    assert result.n_changes == 4
    assert as_set(target.read(spark)) == before


def test_sync_no_changes(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", 1.0)], TGT_SCHEMA)
    p1, p2 = str(tmp_path / "a.pq"), str(tmp_path / "b.pq")
    df.write.parquet(p1)
    df.write.parquet(p2)
    result = sync(spark, ParquetTable(p1), ParquetTable(p2))
    assert result.n_changes == 0
    assert result.report == "No changes."


def test_upsert_overwrites(spark, tables):
    source, target = tables
    upsert(spark, source, target)
    post = target.read(spark)
    assert as_set(post) == as_set(source.read(spark))
    # schema re-inferred from source (all-string), reference A11 autodetect
    assert dict(post.dtypes)["slno"] == "string"


def test_sync_validation_failure_aborts(spark, tmp_path):
    bad = spark.createDataFrame([("", "a", "1.0")], SRC_SCHEMA)
    tgt = spark.createDataFrame([(1, "a", 1.0)], TGT_SCHEMA)
    bp, tp = str(tmp_path / "bad.pq"), str(tmp_path / "t.pq")
    bad.write.parquet(bp)
    tgt.write.parquet(tp)
    from syncquill_spark.operators import ValidationError

    with pytest.raises(ValidationError):
        sync(spark, ParquetTable(bp), ParquetTable(tp))


def test_grid_to_frame(spark):
    cols, df = grid_to_frame(
        spark, [["slno", "name"], ["1", "a"], ["2"]]  # short row padded
    )
    assert cols == ["slno", "name"]
    got = {tuple(r) for r in df.collect()}
    assert got == {("1", "a"), ("2", None)}


def test_report_layout(spark):
    tgt = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.0)], TGT_SCHEMA)
    src = spark.createDataFrame([("1", "aX", "1.5")], SRC_SCHEMA)
    changes = diff_keyed(tgt, src)
    rep = format_change_report(changes, ["slno", "name", "amount"])
    assert "Deleted rows:" in rep
    assert "Row changes:" in rep
    assert "| Old" in rep and "| New" in rep
    assert "aX" in rep


def test_table_from_uri():
    assert isinstance(table_from_uri("parquet:/tmp/x"), ParquetTable)
    assert isinstance(table_from_uri("bq:ds.tbl"), BigQueryTable)
    assert isinstance(table_from_uri("sheets:abc/Sheet1"), SheetsTable)
    with pytest.raises(ValueError):
        table_from_uri("ftp:nope")


def test_parse_arguments():
    args = parse_arguments(["sync", "--source", "parquet:/s", "--target", "parquet:/t"])
    assert args.action == "sync"
    assert args.mode == "keyed"


def test_dotenv_loading(tmp_path, monkeypatch):
    """CLI loads .env before env resolution (syncquill.py:219-224);
    real environment wins over the file."""
    import os

    from syncquill_spark.cli import _load_dotenv

    env = tmp_path / ".env"
    env.write_text(
        "# comment\n"
        "SYNCQ_TEST_A=from_file\n"
        "SYNCQ_TEST_B='quoted value'\n"
        "\n"
        "not a kv line\n"
    )
    monkeypatch.delenv("SYNCQ_TEST_A", raising=False)
    monkeypatch.setenv("SYNCQ_TEST_B", "from_env")
    _load_dotenv(str(env))
    try:
        assert os.environ["SYNCQ_TEST_A"] == "from_file"
        assert os.environ["SYNCQ_TEST_B"] == "from_env"  # env var wins
    finally:
        os.environ.pop("SYNCQ_TEST_A", None)
