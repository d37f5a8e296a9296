"""Bucketed parquet tables — co-located joins without a shuffle.

The 100 TB join strategy the scan-time layout can buy: two fact tables
bucketed (hash-partitioned at WRITE time) on their join key into the
same bucket count join bucket-to-bucket with NO Exchange on either
side — the shuffle happened once, at layout time, instead of on every
query. With ``sort_cols`` the per-bucket files are also pre-sorted, so
a sort-merge join can skip its sort phase (one file per bucket).

Spark requires a metastore table (``saveAsTable``) for bucketing
metadata — a path write cannot record bucket specs. The session's
default local warehouse (``spark-warehouse/``) works out of the box;
on a cluster this is the Hive/Glue/Unity catalog.

Scale notes:
- bucket count is fixed at write time: pick ~(table size / 1 GB),
  and keep BOTH sides of a recurring join on the same count (or
  enable spark.sql.bucketing.coalesceBucketsInJoin for mismatches).
- bucketed scans also avoid the shuffle before groupBy on the bucket
  key (aggregation runs bucket-local).
- the write itself produces one task per (input partition x bucket)
  file when the input is not pre-partitioned; repartition on the
  bucket columns first to get exactly n_buckets files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int,
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a metastore-backed parquet table bucketed on
    ``bucket_cols``. Repartitions on the bucket columns first so each
    bucket lands in one file (pre-sorted buckets are only recognized
    as sorted at read time when there is a single file per bucket).
    """
    writer = (
        df.repartition(n_buckets, *[df[c] for c in bucket_cols])
        .write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a metastore table (bucketing metadata rides along — the
    optimizer drops the Exchange for joins/aggs on the bucket key)."""
    return spark.table(table_name)
