"""Approximate-nearest-neighbor search over an embedding column.

Two tiers (SURVEY.md §7 step 7 / task brief):

- ``knn_brute_force``: exact cosine top-k. One scan + projection +
  TakeOrderedAndProject (true top-k, never a full sort). This is the
  baseline and the verify oracle for the approximate path.
- ``lsh_bucket`` + ``knn_lsh``: random-hyperplane (sign) LSH. Each
  vector gets an h-bit bucket id from the signs of h fixed
  hyperplane dot products; queries probe their own bucket (optionally
  multi-probe neighbors). At 100 TB the bucket id is a partition key:
  candidate generation touches 1/2^h of the data per probe.

Hyperplanes are generated from a fixed numpy seed and inlined as
array literals — deterministic across runs/engines, no fit/state.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from awi_datapipelinepublic_spark.functions.vectors import cosine_similarity, dot


def _hyperplanes(dim: int, h: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((h, dim)).tolist()


def knn_brute_force(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a single query vector.

    orderBy(...).limit(k) plans as TakeOrderedAndProject: each
    partition keeps a k-heap, driver merges — no global sort, no
    single-partition shuffle. Ties broken by id for determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cos"),
    )
    return scored.orderBy(F.col("cos").desc(), F.col(id_col).asc()).limit(k)


def lsh_bucket(
    emb: DataFrame,
    dim: int,
    h: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Append an h-bit sign-LSH bucket id (0 .. 2^h−1).

    Pure projection: h fixed dot products + sign bits, all JVM-side.
    Writing the table partitioned/bucketed by this column makes ANN
    probes partition-pruned scans.
    """
    planes = _hyperplanes(dim, h, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(F.col(vec_col), plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + F.shiftleft(bit, i)
    return emb.withColumn(out_col, bucket)


def knn_lsh(
    emb: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    h: int = 8,
    seed: int = 42,
    multiprobe_bits: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket
    (plus single-bit-flip neighbor buckets for recall).

    The bucket filter arrives before any vector arithmetic, so the
    expensive cosine runs on ~ (1+h)/2^h of the corpus.
    """
    planes = _hyperplanes(dim, h, seed)
    qv = np.asarray(query_vec, dtype=float)
    qbucket = 0
    for i, p in enumerate(planes):
        if float(np.dot(qv, np.asarray(p))) >= 0:
            qbucket |= 1 << i
    probes = {qbucket}
    if multiprobe_bits >= 1:
        probes.update(qbucket ^ (1 << i) for i in range(h))
    if multiprobe_bits >= 2:
        probes.update(qbucket ^ (1 << i) ^ (1 << j) for i in range(h) for j in range(i + 1, h))
    bucketed = lsh_bucket(emb, dim, h, seed, vec_col=vec_col)
    candidates = bucketed.filter(F.col("bucket").isin(*[int(b) for b in probes]))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = candidates.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cos"),
    )
    return scored.orderBy(F.col("cos").desc(), F.col(id_col).asc()).limit(k)
