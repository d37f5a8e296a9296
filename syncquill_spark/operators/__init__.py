"""Composable DataFrame -> DataFrame operators.

Core tier (reference parity, syncquill.py citations in each module):
normalize, validate, diff, apply, upsert, report.

EXT tier (LLM-data-pipeline, mandated by BASELINE.json north_star):
dedup, similarity, text, multimodal.
"""

from syncquill_spark.operators.normalize import normalize_strings
from syncquill_spark.operators.validate import validate_sync_frame, ValidationError
from syncquill_spark.operators.diff import diff_keyed, diff_positional, CHANGE_SET_SCHEMA
from syncquill_spark.operators.apply import apply_changes
from syncquill_spark.operators.report import format_change_report

__all__ = [
    "normalize_strings",
    "validate_sync_frame",
    "ValidationError",
    "diff_keyed",
    "diff_positional",
    "CHANGE_SET_SCHEMA",
    "apply_changes",
    "format_change_report",
]
