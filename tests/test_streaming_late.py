"""Watermark semantics: late events beyond the watermark must be
dropped, and finalized windows must never be re-emitted (append mode).

Two real micro-batches through a file source — the only way to
observe watermark state advancing; a single AvailableNow pass never
finalizes anything mid-stream.
"""

from __future__ import annotations

import datetime as dt
import uuid

from pyspark.sql import functions as F

from elb_log_to_mysql_spark.streaming.windows import tumbling_counts

BASE = dt.datetime(2024, 3, 1, 10, 0, 0)


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        [(i, BASE + dt.timedelta(minutes=m), et, 1.0) for i, (m, et) in enumerate(rows)],
        "event_id long, ts timestamp, event_type string, value double",
    ).coalesce(1).write.mode("append").parquet(path)


def test_watermark_drops_late_events(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    name = f"late_{uuid.uuid4().hex[:8]}"

    # batch 1: events in [10:00, 11:00) plus one at 12:30 that pushes
    # the max event time to 12:30 -> watermark cutoff 12:20, so the
    # 10:00 window (end 11:00 <= cutoff) is finalized and emitted.
    _write_batch(
        spark, src, [(0, "click"), (20, "click"), (40, "click"), (150, "click")]
    )

    schema = "event_id long, ts timestamp, event_type string, value double"
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        tumbling_counts(stream, window_dur="1 hour", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            (r.window_start, r.event_type): r.n_events
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        assert first[("2024-03-01 10:00:00", "click")] == 3

        # batch 2: one event at 10:30 — 110 minutes older than the
        # watermark cutoff, must be DROPPED — and one fresh event at
        # 14:30 that advances the watermark past 12:30's window so it
        # finalizes with only its original event.
        _write_batch(spark, src, [(30, "click"), (270, "click")])
        q.processAllAvailable()
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        final = {}
        for r in rows:
            key = (r.window_start, r.event_type)
            assert key not in final, f"window {key} emitted twice"
            final[key] = r.n_events
        # late event did not resurrect or alter the finalized window
        assert final[("2024-03-01 10:00:00", "click")] == 3
        # the 12:00 window finalized without the late 10:30 event
        assert final[("2024-03-01 12:00:00", "click")] == 1
    finally:
        q.stop()
