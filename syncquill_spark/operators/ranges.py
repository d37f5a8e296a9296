"""Binned interval join — a range join with NO equi key.

Spark plans `point BETWEEN lo AND hi` with no equi condition as a
broadcast-nested-loop or cartesian join: O(n·m) comparisons, the
classic 100 TB killer. The standard fix is binning: map every interval
to the fixed-width bins it overlaps (bounded explode), map every point
to its single bin, and equi-join on the bin — each candidate pair is
then verified with the exact range predicate. Work becomes
O(n + m·(avg_interval_width/bin_width) + true_matches), one shuffle on
the bin key, and a point falls in exactly ONE bin so no post-join
dedup is needed.

Pick bin_width ~ the typical interval width: too small replicates
intervals across many bins; too large degrades toward per-bin
cartesian. Both inputs keyed by doubles: bins are computed with
floor(x / width) in DOUBLE (IEEE-exact for the oracle twin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with lo <= p <= hi.

    Returns points columns + intervals columns (names must not clash).
    `how` supports 'inner' and 'left' (unmatched points kept with null
    interval columns).
    """
    # guard at call time: width 0 only fails at RUNTIME (ANSI
    # DIVIDE_BY_ZERO mid-job) and a negative width silently flips bin
    # order, dropping matches — both are plain caller errors (r13
    # boundary battery)
    if not bin_width > 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width}")

    def bin_of(c: Column) -> Column:
        return F.floor(c.cast("double") / F.lit(float(bin_width))).cast("long")

    ivals = intervals.withColumn(
        "__ibin",
        F.explode(F.sequence(bin_of(F.col(lo_col)), bin_of(F.col(hi_col)))),
    )
    pts = points.withColumn("__pbin", bin_of(F.col(point_col)))
    cond = (
        (pts["__pbin"] == ivals["__ibin"])
        & (pts[point_col] >= ivals[lo_col])
        & (pts[point_col] <= ivals[hi_col])
    )
    if how == "inner":
        return pts.join(ivals, cond).drop("__pbin", "__ibin")
    if how == "left":
        return pts.join(ivals, cond, "left").drop("__pbin", "__ibin")
    raise ValueError(f"binned_range_join supports inner/left, got {how!r}")
