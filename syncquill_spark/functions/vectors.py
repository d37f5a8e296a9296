"""Vector expressions over array<float|double> columns — built-in
higher-order functions only (zip_with/aggregate run in codegen; no
Python, no UDF serialization on the similarity hot path)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a|*|b|); sequential left-to-right accumulation in
    double — the same op order DuckDB's list aggregates use, so scores
    compare (and order) identically cross-engine."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# Perf note (measured, don't revisit): unrolling a known-dim dot
# product into an explicit element_at sum chain to escape interpreted
# higher-order evaluation is ~7x SLOWER than the folds above — the
# 64-term-per-plane expression trees (1000+ nodes/projection) choke
# Catalyst optimization and codegen. The lambda folds are the right
# form for array math; cut per-ROW work (normalize once, fewer folds
# per pair) rather than per-ELEMENT overhead.
