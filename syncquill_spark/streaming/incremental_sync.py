"""Incremental sync: the reference's poll-and-diff CDC loop
(README.md:48-51 — run manually after edits) as a Structured Streaming
pipeline. Each micro-batch of source changes runs the SAME batch
diff/apply operators via foreachBatch — one code path, two execution
modes. Trigger.AvailableNow drains the backlog incrementally and
stops; a clock trigger turns it into a continuous sync service.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from syncquill_spark.operators.apply import apply_changes
from syncquill_spark.operators.diff import diff_keyed
from syncquill_spark.sources.base import Table


def incremental_sync(
    spark: SparkSession,
    source_stream: DataFrame,
    target: Table,
    key: str = "slno",
    checkpoint_dir: str | None = None,
    on_batch=None,
    full_snapshot_batches: bool = False,
):
    """Start a streaming sync of source_stream into ``target``.

    Per micro-batch: diff(batch source snapshot, target) -> apply ->
    atomic overwrite. Returns the StreamingQuery; caller awaits/stops it.

    A micro-batch is generally a PARTIAL view of the source (file
    backlogs split across triggers, ``maxFilesPerTrigger``, rate
    limits). Diffing a partial batch against the full target would
    produce a ``del_row`` for every target row absent from that batch —
    and silently delete them. So by default deletes are DROPPED from
    the change set: updates and inserts apply, absent rows are left
    alone. Pass ``full_snapshot_batches=True`` only when each batch is
    guaranteed to be a complete source snapshot (e.g. one-snapshot-file
    per trigger); then deletes propagate like the batch sync.
    """

    def process_batch(src_batch: DataFrame, batch_id: int) -> None:
        if src_batch.isEmpty():
            return
        tgt = target.read(spark)
        changes = diff_keyed(tgt, src_batch, key=key)
        if not full_snapshot_batches:
            changes = changes.filter(F.col("change_type") != "del_row")
        changes = changes.localCheckpoint(eager=True)
        if changes.isEmpty():
            return
        post = apply_changes(tgt, changes, source=src_batch, key=key)
        target.overwrite(post)
        if on_batch is not None:
            on_batch(batch_id, changes)

    writer = source_stream.writeStream.foreachBatch(process_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
