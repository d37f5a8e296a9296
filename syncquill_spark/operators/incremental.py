"""Incremental aggregate maintenance: update grouped SUM/COUNT
aggregates from a row-level change feed WITHOUT rescanning the base
table — classic incremental view maintenance, and the analytical
payoff of a CDC engine: the sync pipeline (operators/diff.py) captures
what changed; this keeps downstream rollups current for the cost of
the delta.

Delta model: one row per changed base-table row with an op column
('I' insert / 'D' delete); an update is D(old row) + I(new row) — the
standard decomposition, exact for distributive aggregates.

Scale shape: the delta aggregates first (map-side combine on the
typically-tiny changed set), then one outer join against the base
aggregate on the group key. The base FACTS are never read — only the
materialized aggregate, which is |groups| not |rows|. SUM columns must
be decimal-accumulated for the update to be exactly associative
(float sums would drift from the recomputed truth).

The merge join is sort-merge by necessity: Spark's broadcast hash join
does not support FULL OUTER (needed because groups can appear on
either side only). Both inputs are group-cardinality aggregates, so
the SMJ shuffles |groups| + |changed groups| rows, not facts — the
explain_audit "sort-merge only" flag on cdc_incremental_agg is this,
and it is the right plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_agg_update(
    base_agg: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
    op_col: str = "op",
) -> DataFrame:
    """Return the aggregate as if recomputed over base ± delta.

    ``base_agg`` has columns: *group_cols, *sum_cols (decimal), and
    ``count_col`` (long). ``delta`` has *group_cols, the MEASURE
    columns matching ``sum_cols`` by name, and ``op_col`` in
    {'I', 'D'}. Groups whose maintained count reaches 0 are dropped
    (all their rows were deleted); new groups appear. A negative
    maintained count means the delta deleted rows the base never had —
    raise-worthy upstream, surfaced here by keeping the row (caller
    can assert count >= 0).
    """
    sign = F.when(F.col(op_col) == "I", F.lit(1)).otherwise(F.lit(-1))
    d = delta.groupBy(*group_cols).agg(
        *[
            F.sum(sign * F.col(c).cast("decimal(18,2)")).alias(f"_d_{c}")
            for c in sum_cols
        ],
        F.sum(sign).cast("long").alias("_d_n"),
    )
    base = base_agg.select(
        *group_cols,
        *[F.col(c).alias(f"_b_{c}") for c in sum_cols],
        F.col(count_col).alias("_b_n"),
    )
    merged = base.join(d, list(group_cols), "full_outer").select(
        *group_cols,
        *[
            (
                F.coalesce(F.col(f"_b_{c}"), F.lit(0).cast("decimal(18,2)"))
                + F.coalesce(F.col(f"_d_{c}"), F.lit(0).cast("decimal(18,2)"))
            ).alias(c)
            for c in sum_cols
        ],
        (
            F.coalesce(F.col("_b_n"), F.lit(0).cast("long"))
            + F.coalesce(F.col("_d_n"), F.lit(0).cast("long"))
        ).alias(count_col),
    )
    return merged.filter(F.col(count_col) != 0)


def snapshot_agg(
    df: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """The base aggregate shape ``incremental_agg_update`` maintains:
    decimal SUM per measure + row count, grouped."""
    return df.groupBy(*group_cols).agg(
        *[F.sum(F.col(c).cast("decimal(18,2)")).alias(c) for c in sum_cols],
        F.count(F.lit(1)).alias(count_col),
    )
