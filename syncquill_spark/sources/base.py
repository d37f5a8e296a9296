"""Connector interface: read a DataFrame, write one back atomically."""

from __future__ import annotations

import abc

from pyspark.sql import DataFrame, SparkSession


class Table(abc.ABC):
    """One side of a sync: a named, readable, (optionally) writable table."""

    @abc.abstractmethod
    def read(self, spark: SparkSession) -> DataFrame:
        """Full scan. Implementations must allow Catalyst pushdown where
        the underlying format supports it (parquet/BQ do; Sheets cannot)."""

    def overwrite(self, df: DataFrame) -> None:
        """Truncate-and-load (reference A11 semantics). Atomic."""
        raise NotImplementedError(f"{type(self).__name__} is read-only")

    def append(self, df: DataFrame) -> None:
        """Append rows (reference A9 semantics)."""
        raise NotImplementedError(f"{type(self).__name__} is read-only")
