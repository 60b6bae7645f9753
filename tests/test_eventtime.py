"""Event-time layout normalization: the events.ts column must load as
a native TIMESTAMP — with identical rendered values — under every
physical parquet layout the testdata generator has shipped
(TIMESTAMP(NANOS), µs-naive/NTZ, µs-UTC). Round 3 regression guard:
the generator silently switched NANOS -> NTZ and broke five
operators; this file fails if any consumer stops normalizing."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from elb_log_to_mysql_spark.functions.eventtime import (
    event_time_micros_col,
    normalize_event_time,
)
from elb_log_to_mysql_spark.sources.tables import _load_events

TS = [
    datetime.datetime(2025, 5, 26, 10, 0, 0),
    datetime.datetime(2025, 5, 26, 10, 45, 30, 123456),
    datetime.datetime(2025, 5, 27, 0, 0, 1),
]


def _write_events(tmp_path, name: str, ts_type) -> str:
    path = str(tmp_path / f"{name}.parquet")
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(TS, ts_type),
            "user_id": pa.array([10, 10, 11], pa.int64()),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    pq.write_table(table, path)
    return path


LAYOUTS = {
    "nanos": pa.timestamp("ns"),
    "ntz_us": pa.timestamp("us"),
    "utc_us": pa.timestamp("us", tz="UTC"),
}


@pytest.mark.parametrize("layout", sorted(LAYOUTS))
def test_load_events_normalizes_every_layout(spark, tmp_path, layout):
    path = _write_events(tmp_path, layout, LAYOUTS[layout])
    df = _load_events(spark, path)
    assert dict(df.dtypes)["ts"] == "timestamp"
    rendered = [
        r[0]
        for r in df.orderBy("event_id")
        .select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        .collect()
    ]
    assert rendered == [
        "2025-05-26 10:00:00.000000",
        "2025-05-26 10:45:30.123456",
        "2025-05-27 00:00:01.000000",
    ]


def test_event_time_micros_col_every_layout(spark, tmp_path):
    micros = {}
    for layout, ts_type in LAYOUTS.items():
        path = _write_events(tmp_path, f"us_{layout}", ts_type)
        # Raw read (no loader normalization) exercises each dtype branch:
        # nanos needs the legacy conf to even load; NTZ/UTC read directly.
        if layout == "nanos":
            from elb_log_to_mysql_spark.sources.tables import nanos_as_long

            with nanos_as_long(spark):
                df = spark.read.parquet(path)
            assert dict(df.dtypes)["ts"] == "bigint"
        else:
            df = spark.read.parquet(path)
        micros[layout] = [
            r[0]
            for r in df.orderBy("event_id")
            .select(event_time_micros_col(df, "ts"))
            .collect()
        ]
    assert micros["nanos"] == micros["ntz_us"] == micros["utc_us"]


def test_normalize_event_time_noop_on_native(spark):
    df = spark.createDataFrame([(1, TS[0])], "event_id long, ts timestamp")
    out = normalize_event_time(df, "ts")
    assert out is df  # no extra projection on the already-native path


def test_sessionize_accepts_ntz(spark, tmp_path):
    """sessionize must be defensive: NTZ input (the round-3 crash)."""
    from elb_log_to_mysql_spark.operators.sessionize import sessionize

    path = _write_events(tmp_path, "sess_ntz", pa.timestamp("us"))
    df = spark.read.parquet(path)
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    rows = sessionize(df, gap_minutes=30).orderBy("user_id", "session_seq").collect()
    # user 10: 10:00 -> 10:45 is a 45-min gap => two sessions; user 11: one.
    assert [(r.user_id, r.n_events) for r in rows] == [(10, 1), (10, 1), (11, 1)]
