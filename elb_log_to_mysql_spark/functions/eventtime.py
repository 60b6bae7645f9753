"""Event-time layout normalization.

The `events.ts` column has shipped in three physical parquet layouts
across testdata generations:

- parquet TIMESTAMP(NANOS) read as raw int64 ns under the legacy
  reader conf (``spark.sql.legacy.parquet.nanosAsLong``) -> `bigint`;
- plain microsecond-naive timestamp -> Spark ``TIMESTAMP_NTZ``;
- timezone-adjusted microsecond timestamp -> native ``TIMESTAMP``.

Event-time operators (watermarks, `unix_micros`, window functions)
require native TIMESTAMP. Every consumer normalizes through this one
helper so a layout drift upstream can never break a single operator
silently again (it broke sessionize + 4 streaming ops in round 3).

The session timezone is pinned to UTC (session.py), so the
NTZ -> TIMESTAMP cast is value-identical to the naive wall-clock the
DuckDB oracle reads; the int64-ns branch truncates to µs with INTEGER
division (a double division loses precision above 2^53; epoch ns is
~1.7e18). All branches are per-row scan-stage expressions — fully
distributed, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Return `df` with `col` as a native TIMESTAMP, whatever the
    physical layout it arrived in. No-op for already-native columns."""
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    if dtype == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def event_time_micros_col(df: DataFrame, col: str = "ts", out: str = "ts_us") -> Column:
    """Event time as raw int64 microseconds (for integer state),
    handling int64-nanos, TIMESTAMP_NTZ, and native-timestamp inputs."""
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return F.expr(f"{col} div 1000").alias(out)
    if dtype == "timestamp_ntz":
        return F.unix_micros(F.col(col).cast("timestamp")).alias(out)
    return F.unix_micros(F.col(col)).alias(out)
