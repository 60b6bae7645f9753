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

from elb_log_to_mysql_spark.functions.numeric import dsum


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Assign session ids and aggregate one row per session."""
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
