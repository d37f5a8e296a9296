"""Parquet-backed Table — the tested connector implementation.

Stands in for the BigQuery side in tests (per SURVEY.md §2.1 A4); also
the natural lakehouse target at 100 TB. Overwrite is atomic via
write-to-staging + swap when ``atomic_swap`` (needed because Spark
cannot overwrite a path it is currently reading).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from syncquill_spark.sources.base import Table


class ParquetTable(Table):
    """NOTE: the atomic staging-swap in ``overwrite`` uses local-FS
    rename (os.rename) — correct for the tested local/NFS layouts. On
    object stores (s3://, gs://) a directory rename is not atomic;
    production tables there should swap via a metastore pointer or a
    table format (Delta/Iceberg) instead."""

    def __init__(self, path: str):
        self.path = path

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def overwrite(self, df: DataFrame) -> None:
        staging = f"{self.path}.__staging_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(staging)
        if os.path.exists(self.path):
            shutil.rmtree(self.path) if os.path.isdir(self.path) else os.remove(self.path)
        os.rename(staging, self.path)

    def append(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 512 * 1024 * 1024,
    min_files: int = 1,
) -> int:
    """Coalesce a small-file parquet directory into ~target-size files.

    The small-file problem is the silent killer of long-lived ingest
    layouts: a stream or per-batch append leaves thousands of KB-scale
    files, and every downstream scan pays per-file open/footer cost and
    loses row-group-level skipping. Compaction reads the table once and
    rewrites it as max(ceil(bytes / target), min_files) files via the
    atomic staging-swap overwrite (readers never see a partial table).

    Returns the number of files written. Run it from a maintenance job
    keyed on file-count/size heuristics, not on every write.

    Sizing comes from Spark's own file index + Hadoop FileSystem status,
    so any URI scheme Spark can read (file://, hdfs://, s3a://, ...)
    sizes correctly — not just the local filesystem.

    Refuses Hive-partitioned layouts: a flat rewrite would silently
    demote partition directories to data columns and lose directory
    pruning. Compact those per partition (or via
    PartitionedParquetTable.overwrite, which preserves the layout).
    """
    import math

    df = spark.read.parquet(path)
    files = df.inputFiles()

    def _rel_segments(f: str) -> list[str]:
        strip = lambda s: s.split("://", 1)[-1].lstrip("/")  # noqa: E731
        root, ff = strip(path).rstrip("/"), strip(f)
        if ff.startswith(root + "/"):
            ff = ff[len(root) + 1 :]
        return ff.split("/")

    part_dirs = {
        seg for f in files for seg in _rel_segments(f)[:-1] if "=" in seg
    }
    if part_dirs:
        raise ValueError(
            f"compact_parquet: {path} is Hive-partitioned "
            f"({sorted(part_dirs)[:3]}...); a flat rewrite would drop the "
            "partition layout. Compact each partition directory, or "
            "rewrite through PartitionedParquetTable.overwrite."
        )

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    total = 0
    for f in files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(hconf)
        total += fs.getFileStatus(p).getLen()

    n_files = max(min_files, math.ceil(total / target_file_bytes))
    table = ParquetTable(path)
    table.overwrite(df.repartition(n_files))
    return n_files


class PartitionedParquetTable(ParquetTable):
    """Hive-layout parquet table partitioned on low-cardinality columns
    (e.g. lang, date) — the 100 TB layout rule: a filter on a partition
    column prunes whole directories BEFORE any file is opened
    (PartitionFilters in the scan node), so a one-language query over a
    multi-PB corpus reads only that language's files. Keep partition
    columns low-cardinality (lang/date/source, never doc_id): small
    files from over-partitioning cost more than they save.
    """

    def __init__(self, path: str, partition_cols: tuple[str, ...]):
        super().__init__(path)
        self.partition_cols = tuple(partition_cols)

    def overwrite(self, df: DataFrame) -> None:
        staging = f"{self.path}.__staging_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").partitionBy(*self.partition_cols).parquet(staging)
        if os.path.exists(self.path):
            shutil.rmtree(self.path) if os.path.isdir(self.path) else os.remove(self.path)
        os.rename(staging, self.path)

    def append(self, df: DataFrame) -> None:
        df.write.mode("append").partitionBy(*self.partition_cols).parquet(self.path)
