"""Vector expressions over array<float|double> columns.

Two equivalent families, bit-identical by construction:

- `dot` / `l2_norm` / `cosine_similarity`: built-in higher-order
  functions (zip_with/aggregate). NOTE these are CodegenFallback in
  Spark — they evaluate INTERPRETED, one lambda call per element —
  so they are the right form only off the hot path (tiny frames,
  centroid tables).
- `dot_arrow` / `cosine_similarity_arrow`: Arrow-batched numpy
  kernels that replay the SAME left-to-right fold — vectorized over
  ROWS, sequential over DIMENSIONS — so every intermediate rounding
  step matches the HOF fold (and DuckDB's list_reduce) bit for bit,
  while running at numpy speed. Use these wherever the fold is per
  corpus row. (A plain numpy dot/einsum would pairwise-sum and drift
  in the last ulp — enough to flip near-tie rankings cross-engine.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType


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


def _stack_f64(series):
    """(n, dim) float64 from an Arrow array column. float32 -> float64
    widening is exact (same as the fold's x.cast('double'))."""
    import numpy as np

    return np.stack([np.asarray(e, dtype=np.float64) for e in series])


@pandas_udf(DoubleType())
def dot_arrow(a, b):
    """Bit-identical Arrow replacement for `dot`: per-element product
    then LEFT-TO-RIGHT accumulation (loop over dims, vectorized over
    rows) — every rounding step matches the interpreted fold and
    DuckDB's list_reduce. Arrays must be equal-length and null-free
    (the fixture embeddings are)."""
    import numpy as np
    import pandas as pd

    if len(a) == 0:
        return pd.Series([], dtype="float64")
    xa, xb = _stack_f64(a), _stack_f64(b)
    acc = np.zeros(len(a), dtype=np.float64)
    for j in range(xa.shape[1]):
        acc = acc + xa[:, j] * xb[:, j]
    return pd.Series(acc)


@pandas_udf(DoubleType())
def cosine_similarity_arrow(a, b):
    """Bit-identical Arrow replacement for `cosine_similarity`:
    dot/(|a|*|b|) with all three folds replayed left-to-right and the
    final sqrt/multiply/divide in the same order as the HOF form."""
    import numpy as np
    import pandas as pd

    if len(a) == 0:
        return pd.Series([], dtype="float64")
    xa, xb = _stack_f64(a), _stack_f64(b)
    n = len(a)
    d = np.zeros(n, dtype=np.float64)
    na = np.zeros(n, dtype=np.float64)
    nb = np.zeros(n, dtype=np.float64)
    for j in range(xa.shape[1]):
        ca, cb = xa[:, j], xb[:, j]
        d = d + ca * cb
        na = na + ca * ca
        nb = nb + cb * cb
    return pd.Series(d / (np.sqrt(na) * np.sqrt(nb)))


@pandas_udf(DoubleType())
def squared_l2_arrow(a, b):
    """Bit-identical Arrow replacement for the squared-L2 fold
    aggregate(zip_with(a, b, (x-m)*(x-m)), 0.0, +): per element one
    subtract then one multiply, accumulated left-to-right."""
    import numpy as np
    import pandas as pd

    if len(a) == 0:
        return pd.Series([], dtype="float64")
    xa, xb = _stack_f64(a), _stack_f64(b)
    acc = np.zeros(len(a), dtype=np.float64)
    for j in range(xa.shape[1]):
        t = xa[:, j] - xb[:, j]
        acc = acc + t * t
    return pd.Series(acc)


@pandas_udf(ArrayType(DoubleType()))  # DataType object: a DDL string
def unit_vector_arrow(a):  #     would need an active context at import
    """Bit-identical Arrow replacement for the HOF unit-normalize
    (transform(v, x -> x.cast/l2_norm(v))): the norm replays the
    left-to-right sum-of-squares fold, then one IEEE sqrt and one
    divide per element — the same rounding sequence as the expression
    form. Zero vectors yield +-inf/nan components exactly as the
    division does."""
    import numpy as np
    import pandas as pd

    if len(a) == 0:
        return pd.Series([], dtype=object)
    xa = _stack_f64(a)
    acc = np.zeros(len(a), dtype=np.float64)
    for j in range(xa.shape[1]):
        c = xa[:, j]
        acc = acc + c * c
    with np.errstate(divide="ignore", invalid="ignore"):
        u = xa / np.sqrt(acc)[:, None]
    return pd.Series(list(u))


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


# Perf notes (measured, don't revisit):
# - Unrolling a known-dim dot into an explicit element_at sum chain to
#   escape interpreted higher-order evaluation is ~7x SLOWER than the
#   folds — 64-term expression trees (1000+ nodes/projection) choke
#   Catalyst optimization and codegen.
# - The right escape is the *_arrow kernels above: same fold order
#   (bit-identical), numpy speed. Mind the Python-UDF plan hazard:
#   a filter referencing a UDF output that Catalyst can push below
#   the projection DUPLICATES the ArrowEvalPython node — keep UDF
#   consumers above a cache barrier or out of pushable predicates
#   (see operators/similarity.py::lsh_topk).


@pandas_udf(ArrayType(DoubleType()))
def subtract_arrow(a, b):
    """Element-wise a - b over array columns (float widened to double
    first, like every kernel here). Each element is ONE IEEE subtract —
    no fold, so no ordering concerns; exact in any engine."""
    import pandas as pd

    if len(a) == 0:
        return pd.Series([], dtype="object")
    xa, xb = _stack_f64(a), _stack_f64(b)
    return pd.Series(list(xa - xb))
