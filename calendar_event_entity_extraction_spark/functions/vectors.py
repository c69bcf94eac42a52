"""Vector math over array<float> embedding columns — pure Column exprs.

``F.zip_with`` + ``F.aggregate`` keep the dot products JVM-side; casts to
double make results comparable with SQL engines that compute in float64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def quantize_int8_col(vec: Column) -> Column:
    """Symmetric per-vector int8 quantization (the standard embedding
    compression before an ANN index ships): q_i = round_half_up(v_i /
    max_abs × 127), zeros for an all-zero vector. Engine-exact by
    construction — max_abs is an exact fold of exact |casts|, the scale
    expression is the same IEEE op sequence in any engine, and
    floor(x + 0.5) pins the rounding mode, so the quantized integers are
    bit-identical in Spark and SQL (no float ever reaches the compared
    output)."""
    v = _to_double(vec)
    maxab = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.transform(v, lambda x: F.floor(x / maxab * 127 + F.lit(0.5)).cast("int"))
    return F.when(maxab == 0, F.transform(v, lambda x: F.lit(0))).otherwise(q)
