"""As-of join — an operator Spark lacks natively (EXT tier).

For each left row, attach the latest right row whose ``ts <= left.ts``
within the same key (inclusive; classic point-in-time lookup).

Spark-native formulation: UNION the two sides with a side tag, one
shuffle+sort on (key, ts, side), then ``last(value, ignorenulls)`` over
an unbounded-preceding window carries the most recent right-side
payload forward onto each left row. This is the merge-join shape: at
100 TB it costs exactly one shuffle of each side on the key — no
range-condition join explosion, no per-key collect. Equal timestamps
order the right row first, so a left row matches a right row at the
same instant (DuckDB ASOF JOIN semantics, its oracle twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row + latest right values at or
    before its timestamp. Right value columns come back suffixed.

    Right rows TIED on (on, ts) resolve to the greatest value struct
    (Spark's field-lexicographic struct order) — an explicit
    deterministic rule. Without it the window's sort key is identical
    for tied rows, their relative order is whatever the scan produced,
    and `last()` silently returns a partition-layout-dependent answer:
    same query, different results across runs — found by the r15
    battery probing duplicate right timestamps, the shape any real
    point-in-time feed (quotes, sensor reads) contains at scale.
    (Fully identical tied rows were already indistinguishable; only
    the arbitrary choice among DIFFERING tied rows is pinned down.)

    Contract narrowed by the tie-break (ADVICE r15): right VALUE
    columns must be orderable types — the value struct is a window
    sort key now, so a map-typed (or otherwise unorderable) right
    value column fails at ANALYSIS time, loudly, where it previously
    joined with the layout-dependent answer. Project a map column to
    orderable fields (or map_entries) before the join if you need one
    carried."""
    vals = right_value_cols or [c for c in right.columns if c not in (on, ts)]

    # The right-side payload rides as ONE struct so last(ignorenulls)
    # carries the whole most-recent right ROW forward — a NULL field of
    # that row stays NULL on the matched left row (point-in-time
    # semantics), instead of being papered over by a stale non-null
    # value from an older right row (which per-column last() would do).
    r_struct_type = right.select(
        F.struct(*[F.col(v) for v in vals]).alias("__r")
    ).schema["__r"].dataType

    l_tag = left.select(
        F.col(on), F.col(ts), F.lit(0).alias("__side"),
        F.lit(None).cast(r_struct_type).alias("__r"),
        F.struct(*left.columns).alias("__l"),
    )
    r_tag = right.select(
        F.col(on), F.col(ts), F.lit(1).alias("__side"),
        F.struct(*[F.col(v) for v in vals]).alias("__r"),
        F.lit(None).cast(l_tag.schema["__l"].dataType).alias("__l"),
    )
    merged = l_tag.unionByName(r_tag)

    w = (
        Window.partitionBy(on)
        # __r asc_nulls_first: among right rows tied on ts, the
        # GREATEST value struct sorts last and wins last(); left rows
        # (__r NULL) keep their position at the front of each tie
        # group, unaffected by the extra key
        .orderBy(
            F.col(ts).asc(),
            F.col("__side").desc(),
            F.col("__r").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "__side",
        "__l",
        F.last("__r", ignorenulls=True).over(w).alias("__c"),
    )
    return carried.filter(F.col("__side") == 0).select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__c.{v}").alias(f"{v}{suffix}") for v in vals],
    )
