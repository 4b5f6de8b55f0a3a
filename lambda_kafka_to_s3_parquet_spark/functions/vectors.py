"""Vector math over ``array<float>`` embedding columns (SURVEY.md §2.9).

All expressions are JVM-side higher-order functions (``zip_with`` +
``aggregate``) over ``array<double>`` — no Python in the hot path, no UDF
serialization. Floats are widened to double *before* any arithmetic and
folds run strictly left-to-right, which keeps results bit-comparable with
engines that evaluate the same fold (the DuckDB oracles round to 6 decimals
on both sides).

At 100 TB scale these run inside whole-stage codegen per row; the expensive
parts of similarity search are the candidate-generation joins in
``operators/similarity.py``, not these kernels.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(col: Column | str) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold of the element-wise product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; null-safe on zero vectors (returns NULL)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def unit(a: Column) -> Column:
    """L2-normalized copy of the vector (NULL for zero vectors).

    Normalizing ONCE per vector on the narrow side of a pairwise-scoring
    join turns each pair's cosine into a single dot-product fold instead
    of three (dot + two norms) — the standard pre-normalization trick for
    similarity search at scale.
    """
    n = l2_norm(a)
    return F.when(n != 0, F.transform(a, lambda x: x / n))


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bit signature as a BIGINT.

    Bit ``j`` is set when ``dot(vec, planes[j]) >= 0``. With P planes, two
    vectors at angle θ share a given bit with probability 1 - θ/π — the
    SimHash/ANN bucketing primitive. ``planes`` are driver-side constants
    (deterministic seed), embedded as array literals so the signature is
    computed entirely JVM-side. Up to 64 planes fit the BIGINT signature;
    plane 63 contributes Long.MIN_VALUE (two's complement — ``1 << 63``
    would overflow LongType under ANSI mode).
    """
    if len(planes) > 64:
        raise ValueError(f"at most 64 planes fit a 64-bit signature (got {len(planes)})")
    sig = F.lit(0).cast("bigint")
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bit_val = (1 << j) if j < 63 else -(1 << 63)
        bit = F.when(dot(vec, p) >= 0, F.lit(bit_val).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sig = sig.bitwiseOR(bit)
    return sig
