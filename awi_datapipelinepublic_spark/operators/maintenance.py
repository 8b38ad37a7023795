"""Table-maintenance operators: small-file compaction and
range-clustered (sort-ordered) write layout.

Neither has a reference twin (the reference delegates storage layout
to its warehouse — load_table, config.py:163-176); both are the
operations a 100 TB parquet lake needs continuously:

- :func:`compact_path` — streaming/incremental merges leave thousands
  of small files per partition; scans then pay one task + one footer
  read per file. Compaction rewrites a directory to ~target-sized
  files. Expressed as one repartition (round-robin, the cheapest even
  rebalance) + an atomic directory swap, so readers never observe a
  half-written table.
- :func:`clustered_write` / :func:`file_key_ranges` — range-cluster
  rows across files by the query predicate's columns so parquet
  min/max (and engine file-skipping) prune scans. repartitionByRange
  gives disjoint per-file key ranges; sortWithinPartitions tightens
  row-group stats inside each file. file_key_ranges audits the layout
  distributedly (input_file_name + groupBy — no driver file listing).

At 100 TB both are rewrite-bounded: cost scales with the data
rewritten, shuffle is one exchange, and nothing touches the driver
but the final directory rename.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def compact_path(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int,
) -> dict:
    """Rewrite the parquet directory at ``path`` into
    ceil(rows / target_rows_per_file) files of ~equal row count.

    The rewrite lands in a staging directory next to the target and
    replaces it with two renames (old → trash, staged → live), the
    same staged-swap discipline as merge_time_window's overwrite
    (operators/merge.py) — a reader holding the old listing keeps
    reading the old files until the swap, never a mix.

    Returns {"files_before", "files_after", "rows"} for the caller's
    audit log. Round-robin repartition is deliberate: compaction must
    be cheap and even, not clustered — use :func:`clustered_write`
    when the rewrite should ALSO establish sort order.
    """
    df = spark.read.parquet(path)
    rows = df.count()
    files_before = df.select(F.input_file_name()).distinct().count()
    n_files = max(1, math.ceil(rows / max(1, target_rows_per_file)))
    staged = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    df.repartition(n_files).write.mode("overwrite").parquet(staged)
    trash = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, trash)
    os.rename(staged, path)
    shutil.rmtree(trash)
    after = spark.read.parquet(path)
    files_after = after.select(F.input_file_name()).distinct().count()
    return {"files_before": files_before, "files_after": files_after, "rows": rows}


def clustered_write(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int,
) -> None:
    """Write ``df`` range-clustered on ``cluster_cols``: files cover
    disjoint key ranges (repartitionByRange's sampled range exchange)
    and rows are sorted within each file, so parquet column stats are
    tight and any engine's min/max file skipping prunes predicates on
    the cluster columns — the poor man's Z-order for the 1-D case
    that covers most time/id-predicate scans."""
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_key_ranges(
    spark: SparkSession,
    path: str,
    key_col: str,
) -> DataFrame:
    """Per-file min/max of ``key_col`` — the distributed audit that a
    clustered layout actually holds (disjoint ranges) without a
    driver-side file listing: one scan, groupBy(input_file_name)."""
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(key_col).alias("key_min"),
            F.max(key_col).alias("key_max"),
            F.count(F.lit(1)).alias("rows"),
        )
    )
