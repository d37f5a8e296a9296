"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual implementations live in ``syncquill_spark/plans/queries.py``
(one Spark DataFrame program + one DuckDB oracle per operator from
SURVEY.md §2); this module just re-exports the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from syncquill_spark.plans import QUERIES, ORACLES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the keyed CDC table diff (reference operator A7,
    syncquill.py:109-129) on sf0.001; driver checks rows>0."""
    return QUERIES["sync_diff_keyed"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omissions => rows-only)."""
    return {k: v for k, v in ORACLES.items() if v is not None}
