"""Vector expressions over array<float>/array<double> embedding columns.

Dot products and norms via zip_with + aggregate — JVM-side
higher-order functions, no Python, no UDF. At 100 TB of embeddings the
brute-force path is a single scan + these projections; the IVF/LSH
variants in operators/similarity.py cut the candidate set before any
of this arithmetic runs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in double precision."""
    pair = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(pair, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    """‖a‖₂ in double precision."""
    col = _col(a)
    sq = F.aggregate(
        col, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b); NULL-safe: 0.0 when either norm is zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)
