"""Events-table schema adaptation across pyspark runtimes.

The events fixture stores ``ts`` as parquet TIMESTAMP(NANOS, isAdjustedToUTC=false).
How Spark decodes that column changed across runtimes:

- pyspark <= 4.0: rejects nanos by default; with
  ``spark.sql.legacy.parquet.nanosAsLong=true`` it reads epoch-nanos
  int64 (LongType) — the representation all downstream integer time
  math in this repo assumes.
- pyspark >= 4.1 (current sandbox: 4.1.2): the legacy conf was DROPPED
  (setting it is silently ignored) and the column reads natively as
  TIMESTAMP_NTZ, truncated to Spark's microsecond precision.

``normalize_event_ts`` absorbs that drift in ONE place: whatever the
runtime produced, the frame it returns carries ``ts`` as epoch-nanos
LongType. The conversion is lossless for this fixture: the generator
emits microsecond-resolution values (verified: ``epoch_ns(ts) % 1000``
is 0 for every row via DuckDB), so ``unix_micros(ts) * 1000`` is
bit-identical to the original nanos. The NTZ wall-clock is converted
with ``timestampdiff(MICROSECOND, NTZ epoch, ts)`` — pure NTZ integer
math, independent of the session timezone (verified: identical output
under America/New_York), so the normalization is correct even in a
SparkSession this package did not configure. ``session.get_spark``
additionally pins the session tz to UTC for downstream date_format
determinism.

Works identically on batch and streaming DataFrames (pure projection).

Scale note: a predicate on the DERIVED epoch-nanos column cannot push
down into the parquet scan (Spark will not invert the arithmetic). At
100 TB an events table is date-partitioned, so time-range pruning
happens on the partition column (whole-directory pruning) regardless;
for fine-grained residual filters, filter on the raw timestamp column
BEFORE normalize_event_ts when reading a pre-4.1-incompatible layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Return ``df`` with ``col`` as epoch-nanos LongType, whatever the
    runtime's parquet TIMESTAMP(NANOS) decoding produced.

    Raises TypeError (naming the pyspark version) on an unrecognized
    dtype, so a future runtime drift fails loudly in one place instead
    of as scattered DATATYPE_MISMATCH analysis errors downstream.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        return df  # legacy nanosAsLong path: already epoch-nanos int64
    if isinstance(dt, TimestampNTZType):
        # tz-independent: NTZ-to-NTZ difference never consults the
        # session timezone (a cast-to-timestamp would).
        return df.withColumn(
            col,
            F.expr(
                f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', `{col}`)"
            )
            * F.lit(1000).cast("long"),
        )
    if isinstance(dt, TimestampType):
        # tz-aware timestamps are instants; unix_micros is tz-free.
        return df.withColumn(
            col, F.unix_micros(F.col(col)) * F.lit(1000).cast("long")
        )
    import pyspark

    raise TypeError(
        f"events.{col} read as unexpected dtype {dt} on pyspark "
        f"{pyspark.__version__}; normalize_event_ts knows LongType "
        "(legacy nanosAsLong) and TIMESTAMP[_NTZ] (native nanos decode). "
        "Extend syncquill_spark/sources/events.py for this runtime."
    )
