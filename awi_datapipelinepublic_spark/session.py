"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same config
block is what we would ship to a 1000-executor cluster — AQE on
(runtime re-plan, skew-join splitting, partition coalescing),
broadcast threshold sized for dimension tables, Arrow enabled for the
few Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At 100 TB these would be cluster-level (spark-defaults.conf); they are
# centralized here so every entry point (tests, bench, driver) agrees.
_CONF = {
    # AQE: runtime partition coalescing, skew-join splitting, and
    # dynamic join-strategy switching. Non-negotiable at scale.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dimension tables (nation/region/metadata.* lookups) are tiny;
    # 64 MB covers any realistic dim while facts stay sort-merge.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Arrow for the pandas_udf / toPandas edges.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Lenient casts (to_date → NULL on failure), matching the
    # reference's errors='coerce' semantics (SURVEY.md §1.2).
    "spark.sql.ansi.enabled": "false",
    # Parquet scans: vectorized reader + pushdown are defaults, pinned
    # here so a misconfigured cluster can't silently lose them.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Partition sizing: 128 MB input splits; shuffle width set per
    # session below (cores-based locally, data-based on a cluster).
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Runtime bloom-filter join pruning (off by default): builds a
    # bloom filter from the small side of a selective join and pushes
    # it into the big side's scan — a large shuffle-volume win for
    # selective fact-fact joins at scale.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Spark 4 rejects TIMESTAMP(NANOS) parquet outright; surface nanos
    # as int64 instead (sources/readers.read_events converts to
    # timestamp_micros). Session-wide and intentional: every nanos
    # column in this engine is int64-then-convert, never an error.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(app_name: str = "awi-dp-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the session.

    ``shuffle_partitions`` defaults to the local core count — on a real
    cluster this would be ~2-3× total executor cores or AQE-coalesced
    from a high initial value.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    )
    for k, v in _CONF.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
