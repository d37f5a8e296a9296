"""Query registry: every oracle-checked query the engine claims.

Each entry pairs a Spark DataFrame program with an equivalent DuckDB
SQL oracle (or None for non-SQL-expressible operators, which get a
rows-only check). ``__spark_entry__.py`` at the repo root re-exports
this registry for the driver.
"""

from syncquill_spark.plans.queries import QUERIES, ORACLES, load_tables

__all__ = ["QUERIES", "ORACLES", "load_tables"]
