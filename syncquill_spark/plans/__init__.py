"""Query registry: every oracle-checked query the engine claims.

Each entry pairs a Spark DataFrame program with an equivalent DuckDB
SQL oracle (or None for non-SQL-expressible operators, which get a
rows-only check). ``__spark_entry__.py`` at the repo root re-exports
this registry for the driver.
"""

from syncquill_spark.plans.queries import QUERIES as _CORE_QUERIES
from syncquill_spark.plans.queries import ORACLES as _CORE_ORACLES
from syncquill_spark.plans.queries import load_tables
from syncquill_spark.plans.queries_ext import EXT_QUERIES, EXT_ORACLES

QUERIES = {**_CORE_QUERIES, **EXT_QUERIES}
ORACLES = {**_CORE_ORACLES, **EXT_ORACLES}

__all__ = ["QUERIES", "ORACLES", "load_tables"]
