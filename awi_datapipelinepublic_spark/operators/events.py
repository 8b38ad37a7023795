"""Event-stream analytics over the events table (batch + streaming-ready).

The reference's pipeline is event-driven but has no stream operators
(SURVEY.md §2.I); these are the engine's own surface. Each batch form
below has a direct Structured Streaming twin (same expression over
``readStream`` + watermark), wired in streaming/file_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def tumbling_window_agg(
    events: DataFrame, ts_col: str = "ts", width: str = "1 hour"
) -> DataFrame:
    """Per-window event counts / value sums. F.window is the canonical
    tumbling bucketing; group keys are (window, event_type) so the
    shuffle is keyed on both — no hot single-window partition."""
    return (
        events.groupBy(F.window(F.col(ts_col), width).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type"),
            F.col("n_events"),
            F.col("sum_value"),
        )
    )


def sliding_window_agg(
    events: DataFrame, ts_col: str = "ts", width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding windows: each event lands in width/slide windows; the
    duplication factor is explicit and bounded."""
    return (
        events.groupBy(F.window(F.col(ts_col), width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), F.col("n_events"))
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is
    idle longer than the gap. Lag + cumulative-sum-of-boundaries — one
    shuffle on user_id, windows stay within that partition. (The
    streaming twin is F.session_window / applyInPandasWithState.)

    Returns one row per session: user, session_start, session_end,
    n_events.
    """
    w_user = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    gap_s = float(gap_minutes * 60)
    # timestamp → double keeps fractional seconds; unix_timestamp would
    # truncate to whole seconds and misclassify sub-second boundary gaps.
    secs = F.col(ts_col).cast("double")
    with_gap = events.withColumn("__prev", F.lag(ts_col).over(w_user)).withColumn(
        "__new_session",
        F.when(
            F.col("__prev").isNull() | (secs - F.col("__prev").cast("double") > gap_s),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    with_id = with_gap.withColumn(
        "session_no", F.sum("__new_session").over(w_user.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_id.groupBy(F.col(user_col), F.col("session_no"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("session_no")
    )
