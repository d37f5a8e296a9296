"""Structured Streaming tier (EXT — the reference is batch-only;
its poll-and-diff CDC pattern, README.md:48-51, becomes an incremental
pipeline here).

- windows: watermarked tumbling/sliding aggregations over event
  streams, sharing grouping logic with the batch twin
  (plans/queries_ext.q_events_tumbling_window).
- incremental_sync: the batch diff/apply operators run per micro-batch
  via foreachBatch with Trigger.AvailableNow — identical semantics,
  incremental execution.
- stream_dedup: dropDuplicatesWithinWatermark over a content hash.
- sessionize: custom stateful operator (applyInPandasWithState) —
  inactivity-gap sessions with per-user GroupState and event-time
  timeout, plus the window-function batch twin.
"""

from syncquill_spark.streaming.windows import (
    enrich_with_dim,
    read_events_stream,
    sliding_window_counts,
    stream_dedup,
    tumbling_window_counts,
)
from syncquill_spark.streaming.incremental_sync import incremental_sync
from syncquill_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)
from syncquill_spark.streaming.vector_dedup import (
    build_embedding_index,
    load_embedding_index,
    save_embedding_index,
    stream_embedding_near_dups,
)
from syncquill_spark.streaming.text_dedup import (
    build_text_hash_index,
    build_text_minhash_index,
    stream_drop_seen_text,
    stream_text_near_dups,
)

__all__ = [
    "enrich_with_dim",
    "read_events_stream",
    "tumbling_window_counts",
    "sliding_window_counts",
    "stream_dedup",
    "incremental_sync",
    "sessionize_batch",
    "sessionize_stream",
    "build_embedding_index",
    "load_embedding_index",
    "save_embedding_index",
    "stream_embedding_near_dups",
    "build_text_hash_index",
    "stream_drop_seen_text",
    "build_text_minhash_index",
    "stream_text_near_dups",
]
