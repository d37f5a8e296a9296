"""PartitionedParquetTable: hive layout round-trip and proof that a
partition-column filter actually prunes at the scan (PartitionFilters
in the formatted plan, not a post-scan filter)."""

from __future__ import annotations

import contextlib
import io

from syncquill_spark.sources.parquet import PartitionedParquetTable


def test_partition_pruning(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    table = PartitionedParquetTable(str(tmp_path / "docs_by_lang"), ("lang",))
    table.overwrite(docs)

    back = table.read(spark)
    assert back.count() == docs.count()
    # partition column survives the hive layout
    assert set(back.columns) == set(docs.columns)

    one_lang = back.filter(back["lang"] == "en").select("doc_id", "n_chars")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_lang.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0], plan
    expected = docs.filter(docs["lang"] == "en").count()
    assert one_lang.count() == expected
