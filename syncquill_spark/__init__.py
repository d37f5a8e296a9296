"""syncquill_spark — PySpark-native sync & analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of
KittyBorgX/syncquill (reference: /root/reference/syncquill.py, a Google
Sheets -> BigQuery batch-CDC sync tool) on Apache Spark, plus an
LLM-data-pipeline extension tier (dedup, similarity search, text
analysis, multimodal columns) designed for 100 TB scale.

Architecture: everything is declarative DataFrame/SQL — no custom
Catalyst rules, no RDDs in the hot path. Custom semantics (keyed /
positional table diff, MinHash, SimHash, cosine top-k) are compositions
of built-in functions so Catalyst/Tungsten/AQE optimize them freely.
"""

from syncquill_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
