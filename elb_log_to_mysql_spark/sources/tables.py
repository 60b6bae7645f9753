"""Loader for the driver-generated parquet test tables (TESTDATA.md)."""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from elb_log_to_mysql_spark.schema import TEST_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


@contextmanager
def nanos_as_long(spark: SparkSession):
    """Scope the TIMESTAMP(NANOS)-as-bigint legacy conf to a block.

    The conf is session-global; leaking it would silently change how
    every later parquet read materializes NANOS columns, so every user
    in this package sets it through here and the caller's value is
    restored on exit."""
    prev = spark.conf.get(_NANOS_CONF, None)
    spark.conf.set(_NANOS_CONF, "true")
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(_NANOS_CONF)
        else:
            spark.conf.set(_NANOS_CONF, prev)


def raw_parquet_schema(spark: SparkSession, path: str):
    """Footer schema of a parquet source that may carry TIMESTAMP(NANOS)
    columns (read under the scoped conf; ts arrives as bigint)."""
    with nanos_as_long(spark):
        return spark.read.parquet(path).schema


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.ts has shipped as parquet TIMESTAMP(NANOS) — which
    Spark's reader rejects (PARQUET_TYPE_ILLEGAL) unless read as raw
    int64 ns via the legacy conf — and as plain µs-naive timestamps
    (Spark TIMESTAMP_NTZ). Normalize either to a native TIMESTAMP
    through functions.eventtime (see its docstring for the precision
    and timezone reasoning). Fully distributed: the conversion is a
    per-row expression in the scan stage.
    """
    from elb_log_to_mysql_spark.functions.eventtime import normalize_event_time

    # The conf is consulted at read()/schema-inference time only
    # (verified: execution succeeds after restore), so it is scoped to
    # the read and the caller's value restored.
    with nanos_as_long(spark):
        df = spark.read.parquet(path)
    return normalize_event_time(df, "ts")


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load tables and register them as temp views (for spark.sql use).

    Parquet scans carry the footer schema; filters/projections push
    down into the scan (verify with .explain -> PushedFilters/ReadSchema).
    """
    out = {}
    for name in names or TEST_TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
