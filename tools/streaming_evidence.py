"""Committed evidence artifact for streaming semantics.

Runs two scenarios that the oracle gate cannot express (they need
multiple real micro-batches so watermark state advances) and writes
STREAMING_r02-style JSON:

1. watermark_drop — a late event behind the watermark is dropped, a
   finalized window is never re-emitted, and the late event does not
   alter its (already finalized) window.
2. batch_equivalence — each stream_* registry entry's AvailableNow
   execution equals the batch plan over the same input (rowcounts +
   value sets), independently of the DuckDB oracle.

Usage: python tools/streaming_evidence.py [out.json]
"""

from __future__ import annotations

import datetime as dt
import json
import sys
import tempfile
import uuid


def watermark_scenario(spark) -> dict:
    from pyspark.sql import functions as F  # noqa: F401

    from elb_log_to_mysql_spark.streaming.windows import tumbling_counts

    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    src = tempfile.mkdtemp(prefix="wm_src_")
    name = f"wm_{uuid.uuid4().hex[:8]}"

    def write(rows):
        spark.createDataFrame(
            [
                (i, base + dt.timedelta(minutes=m), et, 1.0)
                for i, (m, et) in enumerate(rows)
            ],
            "event_id long, ts timestamp, event_type string, value double",
        ).coalesce(1).write.mode("append").parquet(src)

    write([(0, "click"), (20, "click"), (40, "click"), (150, "click")])
    schema = "event_id long, ts timestamp, event_type string, value double"
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        tumbling_counts(stream, window_dur="1 hour", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    out: dict = {}
    try:
        q.processAllAvailable()
        first = {
            (r.window_start, r.event_type): r.n_events
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        out["window_10h_finalized_with"] = first.get(
            ("2024-03-01 10:00:00", "click")
        )
        # late event 110 min behind the cutoff + a fresh event that
        # finalizes the 12:00 window
        write([(30, "click"), (270, "click")])
        q.processAllAvailable()
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        emits: dict = {}
        dupes = 0
        for r in rows:
            key = (r.window_start, r.event_type)
            if key in emits:
                dupes += 1
            emits[key] = r.n_events
        out["finalized_window_re_emitted"] = dupes > 0
        out["late_event_altered_finalized_window"] = (
            emits.get(("2024-03-01 10:00:00", "click")) != 3
        )
        out["window_12h_excludes_late_event"] = (
            emits.get(("2024-03-01 12:00:00", "click")) == 1
        )
        out["passed"] = (
            out["window_10h_finalized_with"] == 3
            and not out["finalized_window_re_emitted"]
            and not out["late_event_altered_finalized_window"]
            and out["window_12h_excludes_late_event"]
        )
    finally:
        q.stop()
    return out


def batch_equivalence(spark, sf_dir: str) -> dict:
    """stream_* entries vs their batch twins on identical input."""
    import os

    from pyspark.sql import functions as F

    from elb_log_to_mysql_spark.sources.tables import load_table, raw_parquet_schema
    from elb_log_to_mysql_spark.streaming.windows import (
        ensure_event_time,
        run_stream_to_batch,
        sliding_counts,
        tumbling_counts,
    )

    ev = load_table(spark, sf_dir, "events")
    raw_schema = raw_parquet_schema(spark, os.path.join(sf_dir, "events.parquet"))
    path = os.path.join(sf_dir, "events.parquet")

    cases = {
        "stream_tumbling": (
            lambda s: tumbling_counts(ensure_event_time(s)),
            tumbling_counts(ev),
        ),
        "stream_sliding": (
            lambda s: sliding_counts(ensure_event_time(s)),
            sliding_counts(ev),
        ),
    }
    results = {}
    for name, (transform, batch_df) in cases.items():
        streamed = run_stream_to_batch(spark, path, transform, raw_schema)
        s_rows = {tuple(r) for r in streamed.collect()}
        b_rows = {tuple(r) for r in batch_df.collect()}
        results[name] = {
            "stream_rows": len(s_rows),
            "batch_rows": len(b_rows),
            "equal": s_rows == b_rows,
        }
    return results


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "STREAMING_r02.json"
    sys.path.insert(0, "/root/repo")
    from elb_log_to_mysql_spark.session import build_session

    spark = build_session(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    artifact = {
        "watermark_drop": watermark_scenario(spark),
        "batch_equivalence": batch_equivalence(spark, "/root/testdata/sf0.01"),
    }
    artifact["all_passed"] = artifact["watermark_drop"]["passed"] and all(
        v["equal"] for v in artifact["batch_equivalence"].values()
    )
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact, indent=2))
    spark.stop()
    return 0 if artifact["all_passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
