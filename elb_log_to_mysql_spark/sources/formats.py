"""Generic format sources/sinks: parquet, CSV, JSON-lines, text.

The reference reads exactly one format (gzip text, sources/alb.py).
An engine replacing it needs symmetric read/write for the common lake
formats with explicit schemas — schema inference is a convenience for
exploration and a bug at scale (a sampling job over 100 TB, and
type drift between runs), so `read_*` here require a schema unless
explicitly opted out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _require_schema(schema: T.StructType | str | None) -> T.StructType | str:
    if schema is None:
        raise ValueError(
            "schema is required: inference samples the data (a second scan "
            "at 100 TB) and drifts between runs; pass a StructType or DDL "
            "string, e.g. 'id long, s string'"
        )
    return schema


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    **options,
) -> DataFrame:
    return spark.read.options(header=str(header).lower(), **options).csv(
        path, schema=_require_schema(schema)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str, **options
) -> DataFrame:
    return spark.read.options(**options).json(path, schema=_require_schema(schema))


def write_csv(df: DataFrame, path: str, header: bool = True, **options) -> None:
    df.write.options(header=str(header).lower(), **options).mode("overwrite").csv(path)


def write_jsonl(df: DataFrame, path: str, **options) -> None:
    df.write.options(**options).mode("overwrite").json(path)


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Parquet writer; `partition_by` produces hive-style directory
    partitioning — the layout that turns date/tenant predicates into
    partition pruning on read (the 100 TB table layout)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
