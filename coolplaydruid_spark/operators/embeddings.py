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


def rademacher_signs(in_dim: int, out_dim: int, seed: str = "rp") -> list[list[int]]:
    """Deterministic ±1 projection matrix (out_dim × in_dim): sign (i, j)
    is the top bit of md5(seed|j|i). Pure Python — the matrix is a
    compile-time literal folded into the plan (and into the SQL oracle),
    never data."""
    import hashlib

    return [
        [
            1 if hashlib.md5(f"{seed}|{j}|{i}".encode()).digest()[0] >= 128 else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(df: DataFrame, in_dim: int, out_dim: int,
                      seed: str = "rp", vec_col: str = "embedding",
                      out_col: str = "proj") -> DataFrame:
    """Append ``out_col``: the vector projected to ``out_dim`` dims with
    a deterministic Rademacher (±1/√d) random projection — the
    Johnson-Lindenstrauss dimensionality reduction that shrinks
    embedding storage and ANN cost while approximately preserving
    pairwise distances. out_j = (1/√out_dim) Σ_i v_i · s_ji with the
    sign matrix a pure function of ``seed`` (rademacher_signs), so
    re-runs, retries, and the SQL oracle all project identically.

    Scale: the matrix folds into the plan as literals; each output
    coordinate is one zip_with/aggregate fold over the vector —
    map-only, whole-stage codegen, zero shuffle, no Python at run time.
    Components are rounded to 6 decimals (fold order is the array
    order, so even that is deterministic)."""
    signs = rademacher_signs(in_dim, out_dim, seed)
    raw = _dvec(F.col(vec_col))
    # A vector shorter/longer than in_dim would zip_with against nulls
    # and silently yield all-null projections — fail loudly instead.
    v = F.when(F.size(raw) == in_dim, raw).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"random_projection: expected {in_dim}-dim vector, got "),
                F.size(raw).cast("string"),
            )
        )
    )
    inv = 1.0 / (out_dim ** 0.5)
    comps = [
        F.round(
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(s)) for s in signs[j]]),
                    lambda x, s: x * s,
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            * F.lit(inv),
            6,
        )
        for j in range(out_dim)
    ]
    return df.withColumn(out_col, F.array(*comps))


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
