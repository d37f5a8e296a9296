"""SCD2 history materialization: an ordered change stream per key ->
versioned rows with [valid_from, valid_to) ranges.

The reference's pipeline emits point-in-time change sets
(/root/reference/syncquill.py:109-129 — its diff is the "what changed
now" half of CDC); SCD2 is the other half a warehouse needs: the full
history of each key's tracked attributes as slowly-changing-dimension
type-2 rows. A new version starts whenever any tracked column differs
from the key's previous observation; consecutive identical
observations collapse into one row.

Scale shape: one shuffle (partitionBy key), two window passes (lag to
mark changes, lead to close ranges) and one aggregation — the standard
gaps-and-islands plan. No state beyond the window sort; at 100 TB the
per-key history is the only memory-resident unit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_history(
    df: DataFrame,
    key_col: str,
    order_col: str,
    tracked_cols: list[str],
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse an observation stream into SCD2 version rows.

    Output: (key, *tracked, version, valid_from, valid_to, n_obs)
    where version numbers from 1 per key, valid_from = first
    observation of the version, valid_to = start of the next version
    (NULL for the current one — the half-open [from, to) convention),
    and n_obs counts the collapsed observations.

    Change detection is null-safe (``eqNullSafe``): NULL -> value and
    value -> NULL transitions open new versions; NULL -> NULL does not.
    ``tie_cols`` breaks order ties deterministically.

    Observations tied on (key, order, *tie_cols) with DIFFERING
    tracked values additionally order by the tracked-value struct
    (ascending, Spark's field-lexicographic struct order) — an
    explicit deterministic rule, the asof_join tie-break's twin (r16
    battery probe): without it the tie group's sequence is whatever
    the scan produced, and the emitted VERSIONS differ run to run —
    the probe showed the same 4-observation stream collapsing to 3
    versions under one partition layout and 4 under another. Fully
    identical tied observations were already indistinguishable; only
    the arbitrary sequence among DIFFERING ones is pinned. Narrowed
    contract (same as asof_join): tracked columns must be orderable
    types, enforced at analysis time by the sort.
    """
    ties = tie_cols or []
    tie_break = F.struct(*[F.col(c) for c in tracked_cols])
    w = Window.partitionBy(key_col).orderBy(
        order_col, *ties, tie_break.asc()
    )
    changed = F.lag(order_col).over(w).isNull()
    for c in tracked_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    versions = (
        df.withColumn("_chg", F.when(changed, 1).otherwise(0))
        .withColumn("version", F.sum("_chg").over(run).cast("long"))
        .groupBy(key_col, "version", *tracked_cols)
        .agg(
            F.min(order_col).alias("valid_from"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    by_version = Window.partitionBy(key_col).orderBy("version")
    return versions.withColumn(
        "valid_to", F.lead("valid_from").over(by_version)
    ).select(
        key_col, *tracked_cols, "version", "valid_from", "valid_to", "n_obs"
    )
