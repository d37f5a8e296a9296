"""Arbitrary stateful streaming on Spark 4's transformWithStateInPandas
(the state-v2 successor to applyInPandasWithState used in
sessionize.py — typed state handles, timers, TTL; both custom-stateful
templates live in this package side by side).

Running per-key totals: every micro-batch emits each seen key's
cumulative (n_events, sum_value) — the canonical monotone-state
operator (live counters, rate trackers, budget meters). State is one
small ValueState row per key; the shuffle key is user_id; TTL is the
knob that bounds state for keys that go quiet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

TOTALS_SCHEMA = "user_id long, n_events long, sum_value double"


def state_v2_available() -> bool:
    """transformWithState's driver worker speaks protobuf to the state
    server; without the `protobuf` package the worker crashes at
    startup (ImportError in StateMessage_pb2). Gate, don't crash."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_totals_stream(events: DataFrame, ttl_idle: str | None = None) -> DataFrame:
    """Cumulative per-user event count + value sum, updated per batch.

    Emits one row per (user, batch-with-activity) carrying the running
    totals; the LAST row per user over a finite backlog equals the
    plain batch aggregate (proved in tests/test_streaming.py).
    ``ttl_idle`` (e.g. "1 hour") evicts state for idle keys —
    cumulative counters for returning keys then restart, which is the
    documented trade for bounded state on unbounded key spaces.
    """
    if not state_v2_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the `protobuf` package for its "
            "state-server protocol (and a RocksDB state store: set "
            "spark.sql.streaming.stateStore.providerClass to "
            "RocksDBStateStoreProvider). Install protobuf, or use the "
            "applyInPandasWithState operators (streaming/sessionize.py) which "
            "have no such dependency."
        )
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [StructField("n", LongType()), StructField("sv", DoubleType())]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            ttl_ms = None
            if ttl_idle is not None:
                amount, unit = ttl_idle.split()
                ttl_ms = int(amount) * {
                    "second": 1000, "seconds": 1000,
                    "minute": 60_000, "minutes": 60_000,
                    "hour": 3_600_000, "hours": 3_600_000,
                }[unit]
            self._totals = handle.getValueState("totals", state_schema, ttl_ms)

        def handleInputRows(self, key, rows, timerValues):
            n, sv = (self._totals.get() or (0, 0.0)) if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                sv += float(pdf["value"].sum())
            self._totals.update((n, sv))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [sv]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
