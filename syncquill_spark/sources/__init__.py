"""Source/sink connectors behind one interface.

The reference has two hard-wired connectors — Google Sheets scan
(syncquill.py:60-76) and BigQuery scan + DML sink (38-52, 78-107,
131-146). Here each side of a sync is a :class:`Table` the engine reads
to a DataFrame and writes back atomically. Parquet is the tested
implementation; Sheets and BigQuery are real implementations gated on
their (absent-in-CI) client libraries with the same interface.
SheetGridDataSource additionally exposes Sheets-API-shaped grids as a
registered Spark 4 Python DataSource (format "sheetgrid") with
partitioned executor-side reads.
"""

from syncquill_spark.sources.base import Table
from syncquill_spark.sources.bucketed import read_table, write_bucketed
from syncquill_spark.sources.parquet import ParquetTable, VersionedParquetTable
from syncquill_spark.sources.sheets import SheetsTable
from syncquill_spark.sources.bigquery import BigQueryTable
from syncquill_spark.sources.sheetgrid_datasource import SheetGridDataSource
from syncquill_spark.sources.files import CsvTable, JsonTable, OrcTable

__all__ = ["Table", "ParquetTable", "VersionedParquetTable", "SheetsTable", "BigQueryTable", "SheetGridDataSource", "CsvTable", "JsonTable", "OrcTable"]
