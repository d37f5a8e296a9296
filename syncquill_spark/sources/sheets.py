"""Google Sheets source (reference operator A1, syncquill.py:60-76).

The Sheets API returns a rectangular string grid with the header as the
first row; the reference pops the header and validates (63-74). A sheet
is inherently a small, driver-fetched source (API caps at ~10M cells),
so the Spark-native shape is: fetch on the driver, build an all-string
DataFrame via ``createDataFrame`` — then everything downstream is
distributed. The google client libraries are not installed in CI, so
the fetch is import-gated; ``from_grid`` (the pure part) is fully
tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from syncquill_spark.sources.base import Table


def grid_to_frame(
    spark: SparkSession, values: list[list[str]]
) -> tuple[list[str], DataFrame]:
    """Header grid -> (cols, all-string DataFrame).

    Mirrors syncquill.py:63-65: first row is the header; every cell is
    a string. Short rows are padded with NULL (the reference instead
    fails validation on them — run validate_sync_frame after).
    """
    if not values:
        raise ValueError("empty sheet: no header row")
    cols = [str(c) for c in values[0]]
    rows = [
        [str(cell) if cell is not None else None for cell in row[: len(cols)]]
        + [None] * max(0, len(cols) - len(row))
        for row in values[1:]
    ]
    schema = T.StructType([T.StructField(c, T.StringType()) for c in cols])
    return cols, spark.createDataFrame(rows, schema)


class SheetsTable(Table):
    """Live Sheets connector; requires google-api-python-client."""

    def __init__(self, spreadsheet_id: str, range_name: str, credentials=None):
        self.spreadsheet_id = spreadsheet_id
        self.range_name = range_name
        self.credentials = credentials

    def read(self, spark: SparkSession) -> DataFrame:
        try:
            from googleapiclient.discovery import build  # type: ignore
        except ImportError as e:  # pragma: no cover - not installed in CI
            raise NotImplementedError(
                "google-api-python-client not installed; use grid_to_frame "
                "with pre-fetched values, or the parquet connector"
            ) from e
        service = build("sheets", "v4", credentials=self.credentials)
        result = (  # pragma: no cover - live API
            service.spreadsheets()
            .values()
            .get(spreadsheetId=self.spreadsheet_id, range=self.range_name)
            .execute()
        )
        _, df = grid_to_frame(spark, result.get("values", []))
        return df
