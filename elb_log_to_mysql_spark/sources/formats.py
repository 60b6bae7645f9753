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


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | str, **options
) -> DataFrame:
    """ORC read (built-in Spark source, same pushdown/pruning story as
    parquet) — the other columnar lake format a drop-in engine must
    accept without conversion jobs."""
    return (
        spark.read.schema(_require_schema(schema)).options(**options).orc(path)
    )


def write_orc(df: DataFrame, path: str, **options) -> None:
    df.write.options(**options).mode("overwrite").orc(path)


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw media ingest via Spark's `binaryFile` source: one row per
    file with (path, modificationTime, length, content: binary) — the
    actual entry point of the multimodal pipeline (operators/
    multimodal.py consumes the `content` column as its payload).

    Scale posture: the source parallelizes by file (one task per file
    up to maxPartitionBytes grouping), filters on path/length are
    pushed to the listing, and `max_bytes` guards against a single
    giant asset dominating a task — oversized files are filtered OUT
    (predicate on the `length` metadata column, evaluated before
    content is read), to be routed to a chunked path instead.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        from pyspark.sql import functions as F

        df = df.filter(F.col("length") <= max_bytes)
    return df
