"""Type normalization (reference operator A6).

The reference casts every cell of both tables to ``str`` before diffing
so heterogeneous types compare equal (syncquill.py:110-113 — BigQuery
returns typed values, Sheets returns strings). Spark equivalent: cast
every column to StringType. This is a pure projection — Catalyst folds
it into the scan, so it costs nothing extra at 100 TB.

Cast-format notes (documented deviations, all deliberate):
- Spark renders NULL as SQL NULL (stays null); Python ``str(None)``
  would be ``'None'``. Validation (A2/A3) rejects empties upstream, so
  nulls never reach the diff in reference-shaped data.
- Floats: Spark ``CAST(double AS string)`` gives ``'10.5'`` like Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_strings(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Cast the given columns (default: all) to string, preserving names."""
    cols = columns if columns is not None else df.columns
    colset = set(cols)
    return df.select(
        *[
            F.col(c).cast("string").alias(c) if c in colset else F.col(c)
            for c in df.columns
        ]
    )
