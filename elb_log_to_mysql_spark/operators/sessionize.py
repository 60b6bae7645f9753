"""Sessionization of an event stream by inactivity gap (SURVEY §2.3).

Classic gap-and-island: a session break is an event whose time since
the previous event of the same user exceeds the gap; session ids are
the running count of breaks. Two window passes over the same
(user_id)-partitioned sort — one shuffle total, no state on the
driver, scales linearly in events per user. The batch twin of
streaming session windows (see streaming/)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from elb_log_to_mysql_spark.functions.eventtime import normalize_event_time
from elb_log_to_mysql_spark.functions.numeric import dsum


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Assign session ids and aggregate one row per session."""
    # Defensive: unix_micros below requires native TIMESTAMP; accept
    # any of the physical ts layouts (see functions/eventtime.py).
    events = normalize_event_time(events, "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000  # exact integer µs, no float/second truncation

    flagged = events.withColumn(
        "prev_ts", F.lag("ts").over(w)
    ).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.unix_micros("ts") - F.unix_micros("prev_ts") > F.lit(gap_us)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    with_ids = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_ids.groupBy("user_id", "session_seq")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("session_value"),
        )
    )


def resample_events(
    events: DataFrame, bucket_minutes: int = 15
) -> DataFrame:
    """Gap-filled resampling: per-user event counts on a complete
    fixed-interval grid (empty buckets present with zeros) — the
    time-series densification step before rolling models.

    The grid generates per user from their own [min, max] span via
    `sequence` + explode: grid size is bounded by each user's activity
    span, not the global corpus span, and builds distributed (no
    driver-side date loop). One shuffle for the per-user span, one for
    the bucket counts; the grid join is on (user_id, bucket) — both
    sides pre-bucketed, so it is a plain equi-join.
    """
    step = bucket_minutes * 60
    bucket = (
        (F.col("ts").cast("timestamp").cast("long") / step).cast("long") * step
    ).cast("timestamp")
    counts = events.select(
        "user_id", bucket.alias("bucket"), "value"
    ).groupBy("user_id", "bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,8)")).cast("double").alias("sum_value"),
    )
    spans = counts.groupBy("user_id").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL {bucket_minutes} MINUTES"))
        ).alias("bucket"),
    )
    return (
        grid.join(counts, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
    )
