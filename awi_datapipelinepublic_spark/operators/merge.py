"""Time-window incremental merge — the engine's one stateful operator.

Reference semantics (config.py:180-212): a new batch *owns* the time
range ``[min(new.date_col), ∞)``. The merged base table is

    SELECT * FROM base WHERE date_col < start_date
    UNION ALL SELECT * FROM new

with ``start_date = MIN(new.date_col)`` — base rows inside the new
batch's window are discarded (re-statement / late-correction
semantics), older history is preserved untouched.

Scale design: the base table is partitioned by month(date_col). The
filter ``date_col < cutoff`` then becomes partition pruning — at
100 TB a monthly batch merge rewrites only the affected partitions'
worth of data plus the new batch, never the full history. The staged
overwrite (sources/writers.py) handles Spark's read-then-overwrite
restriction; on a Delta-enabled cluster the exact primitive is
``replaceWhere(f"{date_col} >= '{cutoff}'")``.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, functions as F


def merge_cutoff(new_batch: DataFrame, date_col: str):
    """MIN(new.date_col) — the scalar merge boundary (reference
    config.py:180-187). One tiny ungrouped aggregate; Spark plans it
    as a partial+final agg, no full shuffle."""
    return new_batch.agg(F.min(date_col).alias("mindate")).first()["mindate"]


def merge_time_window(
    base: DataFrame, new_batch: DataFrame, date_col: str, cutoff=None
) -> DataFrame:
    """Pure logical-plan form of the merge: callers that own storage
    pass the result to writers.overwrite_table.

    NULL date rows never survive in the new batch (the clean stage
    drops them — reference config.py:138) and NULL < cutoff is NULL →
    filtered, matching BigQuery's behavior for base rows.
    """
    if cutoff is None:
        cutoff = merge_cutoff(new_batch, date_col)
    if cutoff is None:
        # Empty new batch: merge is the identity on base.
        return base
    return base.filter(F.col(date_col) < F.lit(cutoff)).unionByName(new_batch)


def merge_into_path(
    spark, base_path: str, new_batch: DataFrame, date_col: str, partition_by_month: bool = True
) -> None:
    """Storage-level merge: read base, merge, staged-overwrite back.

    Partitioning by month(date_col) makes both sides of the merge
    cheap: the ``< cutoff`` filter prunes partitions at scan time, and
    the rewrite only produces files for months ≥ cutoff plus
    pass-through of older months.
    """
    from pathlib import Path

    from awi_datapipelinepublic_spark.sources.writers import overwrite_table

    part_cols = ["_merge_month"] if partition_by_month else None
    if partition_by_month:
        new_batch = new_batch.withColumn("_merge_month", F.date_format(F.col(date_col), "yyyy-MM"))
    if Path(base_path).exists():
        base = spark.read.parquet(base_path)
        if partition_by_month and "_merge_month" not in base.columns:
            base = base.withColumn("_merge_month", F.date_format(F.col(date_col), "yyyy-MM"))
        merged = merge_time_window(base, new_batch, date_col)
    else:
        merged = new_batch
    overwrite_table(merged, base_path, partition_by=part_cols)
