"""Sessionization: split each user's event stream into sessions closed
by an inactivity gap. Two twins over one semantic:

- batch: lag() + cumulative-sum session numbering — pure window
  functions, shuffles once on user_id, DuckDB-oracle-checkable.
- streaming: applyInPandasWithState — per-user GroupState holds the
  open session (start, last-ts, count); an event-time timeout flushes
  sessions whose gap has passed. State is bounded by active users, the
  shuffle key is user_id, and late rows beyond the watermark are
  dropped by the runtime. This is the custom-stateful-operator pattern
  for anything the built-in window aggs can't express (session windows
  with per-group mutable state).

The events fixture stores ts as epoch-nanos int64 (TIMESTAMP(NANOS)
parquet read with nanosAsLong); both paths do integer nano math and
emit int64 nanos, so results are engine-portable with no float or
timezone wobble.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

GAP_NANOS = 30 * 60 * 1_000_000_000  # 30 min inactivity closes a session

SESSION_SCHEMA = (
    "user_id long, session_id long, session_start long, session_end long, "
    "n_events long, sum_value double"
)


def sessionize_batch(events: DataFrame, gap_nanos: int = GAP_NANOS) -> DataFrame:
    """Batch sessionization via window functions.

    A session starts where the gap from the previous event of the same
    user EXCEEDS gap_nanos (boundary-inclusive: an event at exactly
    last_ts + gap still extends the session — verified to match
    ``F.session_window``'s merge rule, which merges when next_start <=
    prev_end with end = last + gap); session_id is the running count of
    starts (1-based). Deterministic tie-break (ts, event_id) makes the
    numbering reproducible cross-engine.
    """
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    is_start = F.when(
        F.lag("ts").over(by_user).isNull()
        | ((F.col("ts") - F.lag("ts").over(by_user)) > gap_nanos),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        events.withColumn("_start", is_start)
        .withColumn("session_id", F.sum("_start").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


def sessionize_stream(events: DataFrame, gap_nanos: int = GAP_NANOS) -> DataFrame:
    """Streaming sessionization with applyInPandasWithState.

    Input must be a streaming frame with an `event_time` timestamp
    column and a watermark already applied (see windows.with_event_time).
    Per user_id group: fold the batch's events into the open session,
    emitting every session closed by a gap; the open session survives in
    GroupState and is flushed when the event-time timeout fires (the
    watermark passed last_ts + gap — no more in-order rows can extend
    it).
    """
    import pandas as pd  # noqa: F401 — required by applyInPandasWithState

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    state_schema = "session_id long, start long, last long, n long, sv double"

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                sid, start, last, n, sv = state.get
                state.remove()
                yield pd.DataFrame(
                    [[user_id, sid, start, last, n, sv]],
                    columns=["user_id", "session_id", "session_start",
                             "session_end", "n_events", "sum_value"],
                )
            return

        if state.exists:
            sid, start, last, n, sv = state.get
        else:
            sid, start, last, n, sv = 0, None, None, 0, 0.0

        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, val in zip(pdf["ts"], pdf["value"]):
                ts = int(ts)
                if start is None:
                    sid, start, last, n, sv = sid + 1, ts, ts, 1, float(val)
                elif ts - last > gap_nanos:
                    out.append([user_id, sid, start, last, n, sv])
                    sid, start, last, n, sv = sid + 1, ts, ts, 1, float(val)
                else:
                    last, n, sv = max(last, ts), n + 1, sv + float(val)
        state.update((sid, start, last, n, sv))
        # flush when the watermark passes the gap horizon (ns -> ms)
        state.setTimeoutTimestamp(last // 1_000_000 + gap_nanos // 1_000_000)
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "session_id", "session_start",
                         "session_end", "n_events", "sum_value"],
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
