"""`sheetgrid` — a Spark 4 Python DataSource for Sheets-API-shaped
grids (reference operator A1, syncquill.py:60-76).

The Sheets API returns ``{"values": [[header...], [row...], ...]}`` —
a rectangular string grid, header first (syncquill.py:63-65). This
DataSource makes that grid a first-class Spark format:

    spark.dataSource.register(SheetGridDataSource)
    df = (spark.read.format("sheetgrid")
          .option("path", "/data/sheet.json")
          .option("numPartitions", "8").load())

- schema(): header row -> all-StringType columns (the reference's
  schema-on-read rule: every sheet cell is a string).
- reader(): slices the data rows into numPartitions row-ranges; each
  executor task parses ONLY its slice. For a real Sheets backend the
  partition boundary becomes an A1-notation range fetch per task
  (Sheets paginates by row range), so the same partitioning logic
  applies — that seam is `_load_grid`.

Short rows pad with NULL; long rows truncate to the header width
(mirrors grid_to_frame in sources/sheets.py; the reference instead
fails validation — run validate_sync_frame downstream for A2/A3).
"""

from __future__ import annotations

import json
import math

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _load_grid(path: str) -> list[list]:
    """One grid fetch. JSON file holding either the raw values list or
    the full Sheets API payload ({"values": [...]})."""
    with open(path) as f:
        payload = json.load(f)
    values = payload.get("values", payload) if isinstance(payload, dict) else payload
    if not values:
        raise ValueError(f"empty sheet grid: {path}")
    return values


class _RowRange(InputPartition):
    """One row-range of the grid WITH its rows embedded.

    The grid is parsed exactly once, on the driver; each partition
    ships only its slice to the executor (InputPartitions are
    serialized to tasks), so numPartitions=N costs one parse, not N+1.
    Against a real Sheets backend this object would instead carry the
    A1-notation range (start/end) and the task would fetch just that
    row range over the API — same boundary, remote fetch instead of an
    embedded slice.
    """

    def __init__(self, start: int, end: int, rows: list[list]):
        self.start = start
        self.end = end
        self.rows = rows


class SheetGridReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.path = options["path"]
        self.num_partitions = int(options.get("numpartitions", 4))
        # single driver-side parse; partitions() slices it
        self._data_rows = _load_grid(self.path)[1:]
        self.n_rows = len(self._data_rows)

    def __getstate__(self):
        # The reader object itself is pickled into EVERY task; without
        # this, each task would receive the whole grid alongside its
        # partition's slice. Only the partitions carry rows.
        state = self.__dict__.copy()
        state["_data_rows"] = None
        return state

    def partitions(self):
        n = max(1, min(self.num_partitions, self.n_rows or 1))
        step = math.ceil(self.n_rows / n) if self.n_rows else 1
        return [
            _RowRange(lo, min(lo + step, self.n_rows), self._data_rows[lo : lo + step])
            for lo in range(0, max(self.n_rows, 1), step)
        ]

    def read(self, partition: _RowRange):
        width = len(self.schema.fields)
        for row in partition.rows:
            cells = [
                (str(c) if c is not None else None) for c in row[:width]
            ] + [None] * max(0, width - len(row))
            yield tuple(cells)


class SheetGridDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sheetgrid"

    def schema(self) -> T.StructType:
        header = _load_grid(self.options["path"])[0]
        return T.StructType(
            [T.StructField(str(c), T.StringType()) for c in header]
        )

    def reader(self, schema: T.StructType) -> SheetGridReader:
        return SheetGridReader(schema, dict(self.options))
