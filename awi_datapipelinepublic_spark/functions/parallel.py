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
    not shattered into per-task overhead. The count this takes is a
    parquet-metadata read on the scan shapes that hit this path; the
    repartition moves raw input rows pre-UDF, and partitioning never
    affects row-wise UDF results."""
    spark = df.sparkSession
    cores = max(spark.sparkContext.defaultParallelism, 1)
    if df.rdd.getNumPartitions() >= cores:
        return df
    n = df.count()
    slices = max(1, min(cores * slices_per_core, n // rows_per_slice))
    return df.repartition(slices)
