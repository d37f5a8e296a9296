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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

#: nanoseconds per day — the event_date partition derivation constant.
_DAY_NS = 86_400_000_000_000


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


def write_events_normalized(
    spark: SparkSession, src_path: str, dest_path: str, col: str = "ts"
) -> None:
    """One-time layout rewrite: raw events (TIMESTAMP(NANOS) parquet) ->
    a scan-friendly table with ``ts`` as a PLAIN epoch-nanos int64
    column plus an ``event_date`` Hive partition column.

    Why: a predicate on the DERIVED epoch-nanos projection of the raw
    layout cannot push into the parquet scan (Spark will not invert
    the timestamp arithmetic), so every time-range query reads every
    row group. After this rewrite, ``ts`` is stored data — range
    predicates reach the reader as PushedFilters (row-group skipping
    via min/max stats) — and ``event_date`` prunes whole directories
    before any file opens. This is the 100 TB events layout; run it
    once per ingest batch, not per query.

    ``event_date`` derives from ``ts`` with pure integer math
    (floor-div by nanos-per-day -> date_from_unix_date), so the
    partition value is timezone-independent and reproducible in any
    engine.
    """
    df = normalize_event_ts(spark.read.parquet(src_path), col)
    df = df.withColumn(
        "event_date",
        F.date_from_unix_date(F.expr(f"`{col}` div {_DAY_NS}").cast("int")),
    )
    df.write.mode("overwrite").partitionBy("event_date").parquet(dest_path)


def filter_time_range(df: DataFrame, start_ns: int, end_ns: int, col: str = "ts") -> DataFrame:
    """Half-open time-range filter [start_ns, end_ns) over a
    normalized-layout events frame: emits BOTH the ``event_date``
    partition predicate (directory pruning) and the fine-grained ``ts``
    residual (row-group skipping + exact rows). Callers give only the
    nanos range; the date bounds are derived driver-side with the same
    integer math that wrote the partitions."""
    start_day = start_ns // _DAY_NS
    end_day = (end_ns - 1) // _DAY_NS
    return df.filter(
        (F.col("event_date") >= F.date_from_unix_date(F.lit(start_day)))
        & (F.col("event_date") <= F.date_from_unix_date(F.lit(end_day)))
        & (F.col(col) >= start_ns)
        & (F.col(col) < end_ns)
    )
