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
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
    rejects (PARQUET_TYPE_ILLEGAL). Read it as raw int64 nanoseconds
    via the legacy conf, then truncate to Spark's native microsecond
    timestamps with INTEGER division (`div`) — a double division would
    lose precision above 2^53 (~epoch ns is ~1.7e18). Matches DuckDB's
    own ns->us truncation exactly. Fully distributed: the conversion
    is a per-row expression in the scan stage.
    """
    from pyspark.sql import functions as F

    # The conf is consulted at read()/schema-inference time only
    # (verified: execution succeeds after restore), so it is scoped to
    # the read and the caller's value restored.
    with nanos_as_long(spark):
        df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


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
