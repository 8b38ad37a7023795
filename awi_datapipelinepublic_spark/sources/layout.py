"""Table layout for scale: partitioning and bucketing policies.

At 100 TB the dominant cost of repeated fact-fact joins is the shuffle
of both sides on every query. Bucketing fixes the physical layout so
the shuffle happens ONCE at write time: two tables bucketed by the
same key into the same bucket count join with zero Exchange — the
co-located (shuffle-free) sort-merge join. This module wraps the
write- and read-side halves of that contract.

Policy summary (applied by the pipeline writer):
- base fact tables: partitionBy month(date_col) — merge pruning
  (operators/merge.py) and time-range queries prune at scan.
- join-heavy facts: bucketBy(join_key, N) + sortBy(join_key) —
  co-located joins; N sized so a bucket ≈ 128-512 MB at target scale.
- dimensions: plain parquet; they broadcast, layout is irrelevant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Write a managed bucketed table (bucketing requires saveAsTable —
    the metastore carries the bucket spec that lets the planner elide
    the Exchange)."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    w = w.sortBy(sort_col or bucket_col)
    w.format("parquet").saveAsTable(table)


def write_range_sorted(
    df: DataFrame, path: str, sort_col: str, partitions: int | None = None
) -> None:
    """Range-partition + sort-within-partitions write: rows are
    clustered by ``sort_col`` across files AND within parquet row
    groups, so range predicates prune at two levels — Spark skips
    whole files via footer min/max, and the reader skips row groups.
    The cheap non-Delta rendition of clustering/Z-ordering for the
    dominant (time-range) access path.
    """
    parts = [F.col(sort_col)]
    out = (
        df.repartitionByRange(partitions, *parts) if partitions else df.repartitionByRange(*parts)
    )
    out.sortWithinPartitions(sort_col).write.mode("overwrite").parquet(path)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables. With matching bucket specs the
    plan contains no Exchange on either side (verified in
    tests/test_plans.py) — the join cost is a local merge per bucket."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key], how)
