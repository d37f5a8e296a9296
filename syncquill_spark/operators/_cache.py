"""Tracked multi-consumer persists with a deterministic release.

Several operators persist an intermediate frame that feeds MULTIPLE
consumers in the returned plan (a self-join's two sides, an inverted
index's three part aggregations, an order statistic's five branches).
The function cannot unpersist before returning — the returned plan
still reads the cache — so in a long-lived session that calls such an
operator per batch (the nightly ``merge_*_index`` loop, a streaming
``foreachBatch`` gate) the cached blocks accumulate until executor
storage evicts under pressure (ADVICE r09).

``spark.catalog.clearCache()`` between batches works but also drops
every frame the CALLER persisted. This registry is the surgical
alternative: operators persist through :func:`tracked_persist`, and a
batch driver calls :func:`release_cached_intermediates` after each
batch's terminal action to unpersist exactly the operator-internal
caches — nothing else.

Contract: release only AFTER the consuming action (writing the index
part, collecting the report, finishing the batch). Releasing earlier
is safe for correctness (Spark recomputes the subtree) but forfeits
the persist's entire purpose. Strong references are kept on purpose:
a weakly-held DataFrame the caller dropped would be un-unpersistable
while its JVM cache entry lived on.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LOCK = threading.Lock()
_TRACKED: list[DataFrame] = []


def _still_cached(df: DataFrame) -> bool:
    # NOT DataFrame.is_cached: that flag stays True after
    # spark.catalog.clearCache() (measured on 4.1); the cache
    # manager's actual answer is the storage level it still holds
    try:
        lvl = df.storageLevel
        return bool(lvl.useMemory or lvl.useDisk or lvl.useOffHeap)
    except Exception:  # stopped session: nothing left to hold
        return False


def tracked_persist(
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """``df.persist(level)``, recorded for later bulk release. The
    returned frame and its plan are identical to a plain ``persist``
    call — only the Python-side registry entry is added.

    Each call also sweeps entries that are no longer cached (a caller
    that cleans with ``spark.catalog.clearCache()`` instead of
    :func:`release_cached_intermediates` would otherwise grow the
    registry's strong references — and through them JVM plan objects —
    without bound over a long-lived session)."""
    df = df.persist(level)
    with _LOCK:
        _TRACKED[:] = [d for d in _TRACKED if _still_cached(d)]
        _TRACKED.append(df)
    return df


def release_cached_intermediates() -> int:
    """Unpersist every tracked operator-internal cache and clear the
    registry. Returns the number of frames actually unpersisted. Call
    between ingest batches / after the consuming action; caller-owned
    persists are untouched."""
    with _LOCK:
        tracked, _TRACKED[:] = list(_TRACKED), []
    released = 0
    for df in tracked:
        try:
            if _still_cached(df):
                df.unpersist()
                released += 1
        except Exception:
            # a stopped SparkSession has nothing left to release
            pass
    return released
