"""Runtime-drift guard for the events fixture's timestamp column.

Round 3 burned an entire round because pyspark 4.1 silently dropped
``spark.sql.legacy.parquet.nanosAsLong`` and events.ts changed dtype
under us, surfacing as 13 scattered DATATYPE_MISMATCH failures. This
test fails LOUDLY, in one place, naming the runtime, if the contract
ever drifts again: after load_tables / read_events_stream, ts MUST be
epoch-nanos LongType with values in a sane nano range.
"""

from __future__ import annotations

import pyspark
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from syncquill_spark.plans.queries import load_tables
from syncquill_spark.sources.events import normalize_event_ts
from syncquill_spark.streaming.windows import read_events_stream


def _assert_nanos_long(df, where: str):
    dt = df.schema["ts"].dataType
    assert isinstance(dt, LongType), (
        f"{where}: events.ts is {dt}, expected epoch-nanos LongType on "
        f"pyspark {pyspark.__version__} — the parquet TIMESTAMP(NANOS) "
        "decode changed again; extend syncquill_spark/sources/events.py"
    )


def test_load_tables_events_ts_is_epoch_nanos(spark, sf_dir):
    (events,) = load_tables(spark, sf_dir, "events")
    _assert_nanos_long(events, "load_tables")
    lo, hi = events.select(F.min("ts"), F.max("ts")).first()
    # fixture horizon starts 2024-01-01; any mis-scaling (micros kept as
    # "nanos", double epoch-seconds, tz shift of hours) lands far outside
    assert 1_600_000_000 * 10**9 < lo <= hi < 2_100_000_000 * 10**9, (
        f"events.ts range [{lo}, {hi}] is not plausible epoch-NANOS "
        f"(pyspark {pyspark.__version__}) — scaling drift in normalize_event_ts?"
    )


def test_read_events_stream_ts_is_epoch_nanos(spark, sf_dir):
    _assert_nanos_long(read_events_stream(spark, sf_dir), "read_events_stream")


def test_normalize_event_ts_is_tz_independent(spark, sf_dir):
    """The NTZ->nanos conversion must not depend on the session tz (the
    driver's correctness harness builds its own SparkSession)."""
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if not isinstance(raw.schema["ts"].dataType, TimestampNTZType):
        return  # legacy runtime: nothing tz-sensitive on this path
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        shifted = normalize_event_ts(raw).select(F.min("ts")).first()[0]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    utc = normalize_event_ts(raw).select(F.min("ts")).first()[0]
    assert shifted == utc


def test_normalize_event_ts_roundtrips_arbitrary_micros(spark):
    """Property: for ANY microsecond-resolution wall-clock instant, the
    NTZ -> epoch-nanos conversion equals Python's own epoch math. Runs
    a spread of hand-picked boundary instants (epoch, leap days, DST
    transitions in other zones, far future) through one Spark job."""
    import datetime as dt

    cases = [
        dt.datetime(1970, 1, 1, 0, 0, 0),
        dt.datetime(1970, 1, 1, 0, 0, 0, 1),
        dt.datetime(1999, 12, 31, 23, 59, 59, 999999),
        dt.datetime(2000, 2, 29, 12, 0, 0, 500000),
        dt.datetime(2024, 3, 10, 2, 30, 0),   # nonexistent in US/Eastern
        dt.datetime(2024, 11, 3, 1, 30, 0),   # ambiguous in US/Eastern
        dt.datetime(2038, 1, 19, 3, 14, 8),   # past 32-bit rollover
        dt.datetime(2099, 12, 31, 23, 59, 59, 123456),
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, ts timestamp_ntz"
    )
    got = {r.i: r.ts for r in normalize_event_ts(df).collect()}
    epoch = dt.datetime(1970, 1, 1)
    for i, c in enumerate(cases):
        micros = (c - epoch) // dt.timedelta(microseconds=1)
        assert got[i] == micros * 1000, (i, c, got[i])
