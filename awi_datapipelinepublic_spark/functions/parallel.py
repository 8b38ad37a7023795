"""Input-parallelism repair for Arrow-UDF stages.

A small parquet file arrives as 1-2 input splits, so any
compute-heavy mapInPandas/pandas_udf stage placed directly on the
scan runs on 1-2 Python workers while the rest of the cluster idles —
the profiled cause of the shingle/gram UDFs dominating the minhash
and span-profile queries (5.5 s of a 7.5 s signature at sf1 on ONE
worker). At real corpus scale the scan already has more splits than
cores and this helper is a no-op; it only ever adds a shuffle when
the input's partition count is below the cluster's parallelism, and
what it shuffles is by definition small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(
    df: DataFrame, slices_per_core: int = 2, rows_per_slice: int = 512
) -> DataFrame:
    """Round-robin ``df`` across the cluster iff it has fewer
    partitions than cores, targeting ~``rows_per_slice`` rows per
    slice (capped at ``slices_per_core``·cores) so tiny inputs are
    not shattered into per-task overhead.

    The helper only ever INCREASES parallelism: when the computed
    slice count would be at or below the input's current partition
    count (e.g. 300 rows already in 2 partitions), it returns ``df``
    unchanged — a repartition(1) there would serialize the downstream
    UDF onto one worker AND add a shuffle, a strict regression.

    The count this takes is a parquet-metadata read on bare scans;
    for filtered/joined inputs it executes the upstream plan, so the
    input is persisted first — the count materializes the cache and
    every downstream consumer reads it instead of re-running the
    upstream pipeline. The cache is small by construction (this path
    only fires when the input has fewer partitions than cores) and is
    MEMORY_ONLY deliberately: the default MEMORY_AND_DISK level spills
    evicted blocks to local disk instead of dropping them, so a
    long-lived session (or a streaming job calling this per
    micro-batch) would accumulate disk unboundedly — with MEMORY_ONLY
    the LRU eviction actually frees the space. Partitioning never
    affects row-wise UDF results."""
    from pyspark.storagelevel import StorageLevel

    spark = df.sparkSession
    cores = max(spark.sparkContext.defaultParallelism, 1)
    cur = df.rdd.getNumPartitions()
    if cur >= cores:
        return df
    df = df.persist(StorageLevel.MEMORY_ONLY)
    n = df.count()
    slices = max(1, min(cores * slices_per_core, n // rows_per_slice))
    if slices <= cur:
        return df
    return df.repartition(slices)
