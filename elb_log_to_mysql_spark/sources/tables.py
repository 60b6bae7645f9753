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


# Per-session DataFrame cache. Building a scan frame is pure driver
# work — footer/schema reads plus a dozen py4j round-trips — repeated
# identically by every query that touches the table; under concurrent
# streams that construction serializes on the driver (THROUGHPUT_r07
# measured a 29% serial planning fraction). DataFrames are immutable,
# so handing every caller the same object is safe; the cache key
# includes the source's mtime so an overwritten path (sweep replicas,
# sink round-trip tests) never serves a stale file listing. Keyed
# weakly by the session so a stopped session's entries vanish with it.
from weakref import WeakKeyDictionary

_TABLE_CACHE: "WeakKeyDictionary[SparkSession, dict]" = WeakKeyDictionary()


def _source_stamp(path: str) -> float | None:
    try:
        return os.stat(path).st_mtime_ns
    except OSError:
        return None


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (path, spread, _source_stamp(path))
    per_session = _TABLE_CACHE.setdefault(spark, {})
    if key in per_session:
        return per_session[key]
    df = (
        _load_events(spark, path) if name == "events"
        else spark.read.parquet(path)
    )
    if spread:
        df = _spread_if_narrow(spark, df, path)
    per_session[key] = df
    return df


# A parquet file's scan parallelism is bounded by its ROW GROUPS, not
# its byte size: Spark assigns each row group to the byte split holding
# its midpoint, so a single-row-group file runs every downstream
# operator single-task until the first exchange — broadcast joins and
# partial aggregations included. (The driver's regenerated testdata
# ships exactly that layout; round-3 measured scan-bound aggregates
# 3.8× slower on it.) `spread=True` lets a SCAN-BOUND consumer — one
# whose per-row post-scan work dominates (wide aggregate expressions)
# — ask for a post-scan repartition when the layout under-parallelizes
# a meaningfully-sized table. It is deliberately opt-in: measured
# head-to-head at sf0.1 (min-of-4, one warm session), spreading wins
# ~35% for hash_agg/tpch_q1 but LOSES ~2× for join-shaped plans
# (tpch_q3/q9), whose extra full-table exchange isn't amortized by the
# cheap hash-probe work after it. Filters and column pruning still
# push through the repartition into the scan (Catalyst moves
# Filter/Project below Repartition), and at real scale a 100 TB table
# has thousands of row groups, so the guard makes this a no-op — it
# never adds a shuffle to a well-laid-out read.
_SPREAD_MIN_ROWS = 50_000


def _parquet_layout(path: str) -> tuple[int, int] | None:
    """(row_groups, rows) from local parquet footers; None when the
    path is remote/unreadable (object stores: trust the writer's
    layout)."""
    if _LAYOUT_CACHE.get(path, "miss") != "miss":
        return _LAYOUT_CACHE[path]
    out = None
    try:
        import pyarrow.parquet as pq

        files = (
            [os.path.join(path, f) for f in os.listdir(path)
             if f.endswith(".parquet")]
            if os.path.isdir(path)
            else [path]
        )
        groups = rows = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            groups += md.num_row_groups
            rows += md.num_rows
        out = (groups, rows)
    except Exception:
        out = None
    _LAYOUT_CACHE[path] = out
    return out


_LAYOUT_CACHE: dict[str, tuple[int, int] | None] = {}


def _spread_if_narrow(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    layout = _parquet_layout(path)
    if layout is None:
        return df
    groups, rows = layout
    cores = spark.sparkContext.defaultParallelism
    if groups >= cores or rows < _SPREAD_MIN_ROWS:
        return df
    return df.repartition(cores)


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


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Expose the test-table star schema to the SQL front end: one
    temp view per table (through `load_table`, so every layout
    normalization — nanos-as-long, NTZ, spread — applies to SQL users
    identically to DataFrame users). Returns the view names. This is
    the catalog-registration step a `spark.sql(...)`-only consumer
    calls once per session."""
    names = []
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names
