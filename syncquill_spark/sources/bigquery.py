"""BigQuery source/sink (reference operators A4 + A8-A11).

The reference scans with ``SELECT *`` (syncquill.py:40-42) and applies
changes as per-change DML jobs (78-107) / truncate loads (131-146).
Spark-native: the spark-bigquery connector reads with column pruning +
predicate pushdown into the BigQuery Storage Read API, and writes via
the ``direct``/``indirect`` writers — one atomic job instead of N+1
DML calls. The connector jar is not present in this environment, so
this class is a thin, import-gated wrapper kept interface-compatible
with the tested ParquetTable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from syncquill_spark.sources.base import Table


class BigQueryTable(Table):
    def __init__(self, dataset_id: str, table_id: str, project: str | None = None):
        self.dataset_id = dataset_id
        self.table_id = table_id
        self.project = project

    @property
    def _table_ref(self) -> str:
        parts = [p for p in (self.project, self.dataset_id, self.table_id) if p]
        return ".".join(parts)

    def _reader(self, spark: SparkSession):
        return spark.read.format("bigquery").option("table", self._table_ref)

    def read(self, spark: SparkSession) -> DataFrame:
        try:
            return self._reader(spark).load()
        except Exception as e:  # connector jar absent in this environment
            raise NotImplementedError(
                "spark-bigquery connector not available; use ParquetTable "
                "in tests. On a cluster, add "
                "com.google.cloud.spark:spark-bigquery-with-dependencies."
            ) from e

    def overwrite(self, df: DataFrame) -> None:
        (
            df.write.format("bigquery")
            .option("table", self._table_ref)
            .option("writeMethod", "direct")
            .mode("overwrite")
            .save()
        )

    def append(self, df: DataFrame) -> None:
        (
            df.write.format("bigquery")
            .option("table", self._table_ref)
            .option("writeMethod", "direct")
            .mode("append")
            .save()
        )
