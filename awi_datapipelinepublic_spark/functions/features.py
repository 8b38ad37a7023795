"""Feature engineering primitives: the deterministic hashing trick.

``feature_hash_index`` maps a categorical value to a bucket in
[0, dim) via md5 — the classic hashing-trick encoder for unbounded
vocabularies (no fitted dictionary, no OOV problem, no driver state).
md5 rather than xxhash64 for the same reason as operators/sampling.py:
the assignment is reproducible in ANY engine that can hash a string,
so feature pipelines re-run elsewhere produce bit-identical features
and the driver gate can verify the exact indices against DuckDB.

Everything is a Column expression — JVM-side, codegen-resident, a pure
projection with zero shuffle at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def feature_hash_index(col: Column | str, dim: int, salt: str = "") -> Column:
    """Bucket index in [0, dim): first 8 hex chars of
    md5(salt || name || '=' || value), mod dim. The ``salt`` lets
    several logical feature spaces share one table without collisions
    being correlated across spaces. NULL values hash the literal
    string 'NULL' so missingness is itself a (stable) feature.
    """
    c = F.col(col) if isinstance(col, str) else col
    tagged = F.concat(F.lit(salt), F.coalesce(c.cast("string"), F.lit("NULL")))
    return (
        F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10).cast("long") % dim
    ).alias("feature_index")


def hash_features(
    df: DataFrame,
    feature_cols: list[str],
    dim: int = 1024,
    out_col: str = "feature_indices",
) -> DataFrame:
    """Hash several categorical columns into one sparse index array
    (sorted for determinism). Each column is salted with its own name,
    so 'status=F' and 'priority=F' land in independent buckets.
    """
    idxs = [
        feature_hash_index(c, dim, salt=f"{c}=") for c in feature_cols
    ]
    return df.withColumn(out_col, F.array_sort(F.array(*idxs)))
