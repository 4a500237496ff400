"""Embedding-column transforms for training/serving pipelines:
L2 normalization and symmetric int8 quantization.

Everything is built-in array expressions (transform/aggregate) — JVM
whole-stage codegen, map-only, zero shuffle: the operators scale as pure
scans. Arithmetic is float64 (matching the engines/oracles that compute
in double) with results rounded to 6 decimals so accumulation order can
never flip a comparison hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dvec(col):
    return col.cast("array<double>")


def l2_normalize(df: DataFrame, vec_col: str = "embedding",
                 out_col: str = "unit") -> DataFrame:
    """Append ``out_col``: the L2-normalized vector (rounded to 6
    decimals), plus ``norm``. Zero vectors pass through unchanged with
    norm 0 — never a NaN."""
    v = _dvec(F.col(vec_col))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    unit = F.when(
        norm > 0, F.transform(v, lambda x: F.round(x / norm, 6))
    ).otherwise(F.transform(v, lambda x: F.round(x, 6)))
    return df.withColumn("norm", F.round(norm, 6)).withColumn(out_col, unit)


def quantize_int8(df: DataFrame, vec_col: str = "embedding",
                  out_col: str = "q8") -> DataFrame:
    """Append ``out_col``: symmetric int8 quantization — q = floor(x *
    127/amax + 0.5) (round-half-up, engine-independent, unlike
    banker's-rounding round()), plus the ``scale`` to dequantize
    (x ≈ q * amax/127). Zero vectors quantize to zeros with scale 0."""
    v = _dvec(F.col(vec_col))
    amax = F.array_max(F.transform(v, F.abs))
    s = F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(0.0))
    q = F.transform(v, lambda x: F.floor(x * s + F.lit(0.5)).cast("int"))
    return df.withColumn("scale", F.round(F.when(amax > 0, amax / F.lit(127.0))
                                          .otherwise(F.lit(0.0)), 6)) \
             .withColumn(out_col, q)
