

def test_append_refuses_partitioned_layout(spark, tmp_path):
    """VersionedParquetTable's hardlink append is a flat-files
    contract: a
    Hive-partitioned current version must refuse with a diagnosable
    error, not silently skip underscore-named partition dirs (the
    index_store walkers' r14 conflation) or die on a raw os.link
    OSError. Partitioned parts belong in index_store.append_index."""
    import os

    import pytest

    from syncquill_spark.sources.parquet import VersionedParquetTable

    t = VersionedParquetTable(str(tmp_path / "vt"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    t.overwrite(df)
    # plant a partition subdirectory inside the current version
    cur = t._vdir(t.current_version())
    os.makedirs(os.path.join(cur, "_bucket=3"))
    with pytest.raises(ValueError, match="flat parquet layouts only"):
        t.append(df)
