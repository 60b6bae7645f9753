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
from pyspark.sql import functions as F
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


def read_jsonl_with_deadletter(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines ingest with corrupt-record routing: returns
    (good, dead) DataFrames from ONE source definition.

    The reference absorbs bad rows by dropping them inside the parse
    map (etl:129-131) — at scale that silently loses data you cannot
    audit. Here every unparseable line is routed, verbatim, to a
    dead-letter frame: `good` carries the typed columns, `dead` the
    raw line for quarantine/replay. Both are projections over the
    same text scan.

    Implemented as text + `from_json` (PERMISSIVE with an in-schema
    corrupt field) rather than `spark.read.json`: the JSON source
    forbids plans that reference only its internal corrupt column
    (SPARK-26159 guard), which makes exactly the dead-letter count an
    analysis error; from_json has no such restriction and parses in
    the scan's codegen stage either way.
    """
    base = _require_schema(schema)
    if isinstance(base, str):
        base = T._parse_datatype_string(base)
    full = T.StructType(
        list(base.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    lines = spark.read.text(path)
    parsed = lines.select(
        "value",
        F.from_json(
            "value",
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ).alias("j"),
    )
    good = parsed.filter(F.col(f"j.{corrupt_col}").isNull()).select(
        *[F.col(f"j.{f.name}").alias(f.name) for f in base.fields]
    )
    dead = parsed.filter(F.col(f"j.{corrupt_col}").isNotNull()).select(
        F.col("value").alias("raw_line")
    )
    return good, dead
