"""Watermarked window aggregations + streaming dedup over event streams.

The events fixture stores ts as TIMESTAMP(NANOS) (read as epoch-nanos
int64); streaming ops need a real timestamp column, derived with
timestamp_micros(ts div 1000) — integer math, no precision surprises.

Scale notes: watermark bounds state (late rows beyond it are dropped
and their state evicted); the shuffle key is (window, event_type) so
state is evenly spread; AvailableNow processes a backlog incrementally
with bounded per-batch memory — the 100 TB replay story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from syncquill_spark.sources.events import normalize_event_ts


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-stream over the events parquet (schema pinned from a batch
    read — required by readStream; file sources replay incrementally).
    ts is normalized to epoch-nanos long whatever the runtime decoded
    (see sources/events.py — pyspark 4.1 dropped nanosAsLong)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # File streams need a DIRECTORY; events.parquet is a single file,
    # so stream the sf dir with a glob filter selecting just it.
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    reader = spark.readStream.schema(schema).option(
        "pathGlobFilter", "events.parquet"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return normalize_event_ts(reader.parquet(sf_dir))


def with_event_time(events: DataFrame) -> DataFrame:
    return events.withColumn(
        "event_time", F.expr("timestamp_micros(ts div 1000)")
    )


def tumbling_window_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts+sums per event_type with late-data bound.

    Streaming twin of plans/queries_ext.q_events_tumbling_window: same
    grouping, watermarked so state is evicted once event time passes
    window_end + watermark.
    """
    return (
        with_event_time(events)
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window counts+sums per event_type (each event lands in
    window/slide overlapping windows — Spark replicates rows into
    their windows before the shuffle). Streaming twin of
    plans/queries_ext.q_events_sliding_window."""
    return (
        with_event_time(events)
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window, slide).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("win.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: dropDuplicatesWithinWatermark keeps state
    only inside the watermark horizon — bounded memory on unbounded
    streams (vs. dropDuplicates whose state grows forever)."""
    return (
        with_event_time(events)
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(list(key_cols))
    )


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    stream_key: str = "user_id",
    dim_key: str = "c_custkey",
) -> DataFrame:
    """Stream-static enrichment join: each microbatch of the stream
    joins against the (re-read per batch, so updatable) static dim.
    The dim side is broadcast — no shuffle of the stream, no state
    store; this is the scale shape for attaching reference data to a
    100 TB/day event stream (dims are small; facts never repartition)."""
    return events.join(
        F.broadcast(dim), events[stream_key] == dim[dim_key], "left"
    ).drop(dim_key)


def stream_stream_funnel(
    clicks: DataFrame,
    purchases: DataFrame,
    max_lag_minutes: int = 10,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join — the conversion-funnel shape: each
    click joined to same-user purchases within ``max_lag_minutes``
    after it.

    Both sides carry watermarks and the join condition bounds event
    time in BOTH directions, so Spark can size the state store: a
    click's state is evicted once the purchase-side watermark passes
    click_time + max_lag; an unbounded condition would grow state
    forever. Shuffle key is user_id on both sides — co-partitioned
    once, then the range predicate evaluates within partitions.

    Batch twin: plans/queries_ext.q_funnel_click_purchase (oracle-
    checked); the stream-vs-batch test proves they emit the same rows.
    """
    c = (
        with_event_time(clicks)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("event_time").alias("click_time"),
        )
        .withWatermark("click_time", watermark)
    )
    p = (
        with_event_time(purchases)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("event_time").alias("purchase_time"),
        )
        .withWatermark("purchase_time", watermark)
    )
    joined = c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_time") >= F.col("click_time"))
        & (
            F.col("purchase_time")
            < F.col("click_time") + F.expr(f"INTERVAL {max_lag_minutes} MINUTES")
        ),
    )
    return joined.select(
        "user_id",
        "click_id",
        "purchase_id",
        # integer `div`, not float `/`: float-then-cast rounds half-up in
        # some engines and truncates in others — div is portable.
        F.expr("(unix_micros(purchase_time) - unix_micros(click_time)) div 1000000")
        .cast("long")
        .alias("lag_seconds"),
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Per-user dynamic-gap sessions via the BUILT-IN
    ``F.session_window`` (vs streaming/sessionize.py's custom
    applyInPandasWithState operator — same semantics, two primitives).
    A session extends while consecutive events are <= gap apart
    (boundary-inclusive: Spark merges sessions when next_start <=
    prev_end with end = last + gap — empirically pinned by
    tests/test_streaming.py::test_session_gap_boundary_is_inclusive);
    a new session starts only when the gap is strictly exceeded.

    Batch and streaming share this plan: pass ``watermark`` under a
    readStream source and state is evicted once event time passes
    session_end + watermark. Session merging is Spark-native (partial
    sessions merge across partitions/batches) — one shuffle on user_id.

    Output: (user_id, session_start_us, n_events, sum_value) with
    session_start as epoch-MICROS int64 (the fixture's native
    precision) and the value sum in decimal until the final cast.
    """
    df = with_event_time(events)
    if watermark is not None:
        df = df.withWatermark("event_time", watermark)
    return (
        df.groupBy(
            F.col("user_id"), F.session_window("event_time", gap).alias("win")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros("win.start").alias("session_start_us"),
            "n_events",
            "sum_value",
        )
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> list:
    """Execute a streaming frame over the current backlog
    (Trigger.AvailableNow) into an in-memory sink; return the rows.

    output_mode: 'complete' for aggregations on a finite backlog (in
    append mode un-finalized windows would never emit because the
    watermark stops advancing at end-of-input); 'append' for row-wise
    streams like dedup. Production writes to a real sink with
    checkpointLocation instead.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}").collect()
