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


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: int = 20,
    target_scale: int = 100,
    round_dp: int = 6,
    out_col: str = "te",
) -> DataFrame:
    """Leave-one-out smoothed target encoding — the standard
    high-cardinality categorical encoder for gradient-boosted /
    linear models, with the two production safeguards built in:
    each row's OWN target is excluded from its category mean (the
    leakage fix) and the mean is shrunk toward the global mean by
    ``smoothing`` pseudo-observations (the rare-category fix):

        te_i = ((S_cat − y_i)·N + m·S) / ((n_cat − 1 + m)·N)

    with S_cat/n_cat the category target-sum/count, S/N the global
    ones, m = smoothing. The formula is the textbook
    (S_cat − y_i + m·μ)/(n_cat − 1 + m) cleared of the float global
    mean: every product is an exact integer (targets pre-scaled by
    ``target_scale`` via floor(v·scale + 0.5)), so the single double
    division replays bit-for-bit in any engine. Integer range:
    (S_cat − y_i)·N < 2⁶³ holds to ~10⁸ rows at cent scale; cast the
    two products to DECIMAL(38,0) beyond (documented escape hatch).

    Plan: ONE groupBy on the category (map-side combine, exchange is
    category-sized) joined back (AQE broadcasts when the category
    table measures small — never forced: target encoding exists FOR
    high-cardinality categoricals, where the stats table is big and
    must shuffle), plus a 1-row global aggregate broadcast. A
    singleton category (n_cat = 1) has no leave-one-out evidence:
    te = pure prior m·S/(m·N), which the formula yields naturally.
    """
    y = F.floor(F.col(target_col) * target_scale + F.lit(0.5)).cast("bigint")
    base = df.withColumn("__y", y)
    cat = base.groupBy(F.col(cat_col).alias("__cat")).agg(
        F.sum("__y").alias("__S_cat"), F.count(F.lit(1)).alias("__n_cat")
    )
    glob = base.agg(F.sum("__y").alias("__S"), F.count(F.lit(1)).alias("__N"))
    m = int(smoothing)
    num = (
        (F.col("__S_cat") - F.col("__y")) * F.col("__N") + F.lit(m) * F.col("__S")
    ).cast("double")
    den = (
        (F.col("__n_cat") - 1 + F.lit(m)) * F.col("__N")
    ).cast("double") * F.lit(float(target_scale))
    return (
        base.join(cat, F.col(cat_col) == F.col("__cat"))
        .crossJoin(F.broadcast(glob))
        .withColumn(out_col, F.round(F.try_divide(num, den), round_dp))
        .drop("__y", "__cat", "__S_cat", "__n_cat", "__S", "__N")
    )
