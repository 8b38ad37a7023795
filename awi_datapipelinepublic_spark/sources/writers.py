"""Sinks: parquet (engine-native), CSV (edge parity), staged overwrite.

The reference's warehouse writes are BigQuery WRITE_TRUNCATE loads and
CREATE OR REPLACE TABLE CTAS (config.py:161-172, 190-199). The Spark
analogs here write Parquet; ``overwrite_table`` stages to a temp dir
and swaps so a plan that *reads* the target can still produce it
(Spark cannot overwrite a path it is reading — the read-then-overwrite
hazard called out in SURVEY.md §7).
"""

from __future__ import annotations

import os
import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str) -> None:
    """Cleaned staging file sink (reference config.py:146). CSV only at
    the edge — inter-stage data is always Parquet."""
    df.write.mode("overwrite").option("header", True).csv(path)


def overwrite_table(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Staged overwrite: materialize to a temp sibling, then swap.

    This is the engine's CREATE OR REPLACE TABLE: ``df`` may read from
    ``path`` (as the time-window merge does — it unions old history
    with the new batch, reference config.py:193-198), so we must fully
    materialize before touching the target.
    """
    target = Path(path)
    tmp = target.parent / f".{target.name}.staging-{uuid.uuid4().hex[:8]}"
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(str(tmp))
    # Swap: atomic-enough for a single-writer pipeline (the reference's
    # Cloud Functions are single-writer per data type too).
    backup = target.parent / f".{target.name}.old-{uuid.uuid4().hex[:8]}"
    if target.exists():
        os.rename(target, backup)
    os.rename(tmp, target)
    if backup.exists():
        shutil.rmtree(backup, ignore_errors=True)


def compact_table(spark, path: str, target_file_mb: int = 256, partition_by: list[str] | None = None) -> int:
    """Small-files compaction: rewrite a parquet table at a target file
    size. Streaming merges and incremental loads accrete small files;
    at 100 TB an uncompacted table turns every scan into metadata
    churn. Sizing uses the table's on-disk bytes; the rewrite keeps
    partition columns. Returns the file count after compaction.
    """
    from pathlib import Path as _P

    total_bytes = sum(f.stat().st_size for f in _P(path).rglob("*.parquet"))
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if partition_by:
        compacted = df.repartition(n_files, *[df[c] for c in partition_by])
    else:
        compacted = df.repartition(n_files)
    overwrite_table(compacted, path, partition_by=partition_by)
    return len(list(_P(path).rglob("*.parquet")))


def quarantine(src_path: str, error_dir: str) -> str:
    """Failed-input quarantine (reference failed_func, config.py:223-234):
    move the raw file to an errors dir so the pipeline never re-ingests
    a poison input. Returns the quarantined path."""
    src = Path(src_path)
    dst_dir = Path(error_dir)
    dst_dir.mkdir(parents=True, exist_ok=True)
    dst = dst_dir / src.name
    shutil.move(str(src), str(dst))
    return str(dst)
