"""Table-layout management: partitioned idempotent ingest, bucketed
tables, and small-file compaction.

The reference achieves idempotent re-ingest by deleting a file's rows
before appending them (reference etl.py:152-160, per-source-file
DELETE + INSERT). At 100 TB the unit of idempotency is the partition,
not the row: `write_partitioned_idempotent` uses Spark's dynamic
partition overwrite so re-running an ingest atomically replaces only
the partitions the batch touches — no read-modify-write, no tombstone
scan, and concurrent readers of untouched partitions are unaffected.

Bucketed tables are the shuffle-free-join layout: two tables bucketed
by the same key into the same bucket count join without either side
shuffling (the exchange happens once, at write time, and is amortized
over every subsequent join). At 100 TB the fact-to-fact join is the
single most expensive exchange in the pipeline; bucketing removes it
from the steady state.

Compaction is the maintenance half of a streaming/partitioned layout:
many small appends produce many small files, and scan parallelism
degrades into per-file task overhead (and 100 TB of 1 MB files is a
metadata DoS). `compact_small_files` rewrites a parquet directory into
size-targeted files using the actual on-disk byte census.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from elb_log_to_mysql_spark.session import scoped_conf


def write_partitioned_idempotent(
    df: DataFrame,
    path: str,
    partition_by: list[str],
) -> None:
    """Overwrite ONLY the partitions present in `df` (dynamic partition
    overwrite); other partitions are untouched.

    This is the at-scale analog of the reference's per-file
    delete-then-append idempotency (etl.py:152-160): re-running an
    ingest batch replaces exactly the partitions it produces, so a
    retry after partial failure converges to the same table state.

    The conf is scoped: STATIC (the default) would truncate the whole
    table on overwrite, and leaving DYNAMIC set session-wide silently
    changes unrelated writers' overwrite semantics.
    """
    spark = df.sparkSession
    with scoped_conf(spark, "spark.sql.sources.partitionOverwriteMode", "dynamic"):
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist `df` as a bucketed (and optionally sorted) table.

    Joins and aggregations keyed on `bucket_by` between tables with the
    same bucket count read co-located buckets and skip the exchange
    entirely — the write-time shuffle is paid once and amortized over
    every downstream join. sort_by additionally pre-sorts within
    buckets, turning sort-merge joins into merge-only (no per-query
    sort).

    Bucket metadata lives in the session catalog, so consumers address
    the table by name (`spark.table(table)`), not path — path reads
    can't see bucketing and would silently re-shuffle.
    """
    if path is None:
        _drop_orphan_table_location(df.sparkSession, table)
    w = df.write.bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path is not None:
        w = w.option("path", path)
    w.mode("overwrite").format("parquet").saveAsTable(table)


def _drop_orphan_table_location(spark: SparkSession, table: str) -> None:
    """Remove a stale managed-table directory left by a previous
    process. The session catalog is per-process (in-memory / fresh
    Derby), but the warehouse dir on disk is not: saveAsTable of a
    table the catalog has never seen fails with LOCATION_ALREADY_EXISTS
    if `<warehouse>/<table>` survived an earlier run. Only fires when
    the catalog does NOT know the table (overwrite mode handles the
    known-table case), and only for default-database names."""
    if "." in table or spark.catalog.tableExists(table):
        return
    jvm = spark.sparkContext._jvm
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    jpath = jvm.org.apache.hadoop.fs.Path(warehouse, table.lower())
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(jpath):
        fs.delete(jpath, True)


def _list_parquet_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every data file under `path`, via the JVM
    Hadoop FileSystem — works for any supported scheme (file://, s3a://,
    hdfs://), no Python filesystem assumptions."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(jpath, True)  # recursive
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, hidden/staging files
        out.append((st.getPath().toString(), st.getLen()))
    return out


def compaction_stats(spark: SparkSession, path: str) -> dict:
    """File census for a parquet directory: count, total bytes,
    min/max/mean file size. Metadata-only (a filesystem listing, no
    data scan) — at 100 TB this is the cheap signal that decides
    whether a rewrite is worth scheduling."""
    files = _list_parquet_files(spark, path)
    sizes = [s for _, s in files]
    return {
        "num_files": len(sizes),
        "total_bytes": sum(sizes),
        "min_bytes": min(sizes) if sizes else 0,
        "max_bytes": max(sizes) if sizes else 0,
        "mean_bytes": (sum(sizes) / len(sizes)) if sizes else 0.0,
    }


def compact_small_files(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite a parquet directory into ~target-size files.

    The output file count comes from the REAL on-disk byte census
    (ceil(total/target)), not a row-count guess — parquet compression
    ratios vary too much across tables for rows-per-file heuristics.
    Rewrites to a new directory: compaction that overwrites its own
    input is un-retryable (a mid-rewrite failure loses data), so the
    swap is the caller's atomic-rename/metastore-repoint step.

    Uses coalesce, not repartition: compaction must not pay a full
    shuffle — coalesce merges input splits map-side (no exchange).
    Returns before/after stats.
    """
    before = compaction_stats(spark, src_path)
    n_out = max(1, math.ceil(before["total_bytes"] / target_file_bytes))
    df = spark.read.parquet(src_path)
    df.coalesce(n_out).write.mode("overwrite").parquet(dest_path)
    after = compaction_stats(spark, dest_path)
    return {"before": before, "after": after, "target_files": n_out}


def _zvalue(cx, cy, bits: int = 16):
    """Morton (Z-order) interleave of two normalized integer columns —
    a pure codegen expression chain (2*bits shift/mask/or terms), no
    UDF. 2*bits <= 62 keeps the result in a signed long."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(cx, i).bitwiseAND(F.lit(1)).cast("long"), 2 * i)
        )
        z = z.bitwiseOR(
            F.shiftleft(
                F.shiftright(cy, i).bitwiseAND(F.lit(1)).cast("long"), 2 * i + 1
            )
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    num_files: int = 16,
    bits: int = 16,
) -> None:
    """Cluster a table on the Z-order (Morton) curve of two columns and
    write it as range-partitioned, internally sorted parquet.

    Why this matters at 100 TB: parquet scans prune row groups / files
    whose [min, max] column statistics exclude the predicate. A layout
    sorted on ONE column makes only that column's stats selective; a
    2-D query on (x, y) still reads every file for the y predicate.
    Z-ordering interleaves the bits of both dimensions so files cover
    compact rectangles of (x, y) space — BOTH columns' min/max ranges
    become narrow, and a 2-D range predicate skips ~everything outside
    its rectangle (the same mechanism as Delta OPTIMIZE ZORDER BY,
    re-derived here with plain expressions).

    The two normalization scalars per column (min/max) are the only
    driver-side values — a bounded 4-scalar aggregate, not a collect.
    The write is one range shuffle on the z-value (repartitionByRange
    samples the distribution, giving equal-sized files even under
    skew) + an in-partition sort; the z column is projected away
    before write, which preserves row order.
    """
    from pyspark.sql import functions as F

    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(col_x), F.max(col_x), F.min(col_y), F.max(col_y)
    ).first()
    span = (1 << bits) - 1

    def norm(c, lo, hi):
        width = max(1, int(hi) - int(lo))
        return ((F.col(c).cast("long") - int(lo)) * span / width).cast("int")

    z = _zvalue(norm(col_x, lo_x, hi_x), norm(col_y, lo_y, hi_y), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def pruning_stats(path: str, predicates: dict[str, tuple]) -> dict:
    """Data-skipping census from parquet footer statistics only: how
    many row groups could a reader skip for a conjunctive range
    predicate {col: (lo, hi)}? Metadata-only (no data pages read) —
    the same stats a 100 TB scan's row-group pruning consults."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    files = sorted(
        f
        for f in _glob.glob(_os.path.join(path, "*.parquet"))
        + _glob.glob(_os.path.join(path, "part-*"))
        if not _os.path.basename(f).startswith("_")
    )
    total = 0
    matching = 0
    for f in set(files):
        md = _pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            total += 1
            row_group = md.row_group(rg)
            cols = {
                row_group.column(i).path_in_schema: row_group.column(i).statistics
                for i in range(row_group.num_columns)
            }
            hit = True
            for col, (lo, hi) in predicates.items():
                st = cols.get(col)
                if st is None or not st.has_min_max:
                    continue  # no stats -> cannot skip
                if st.max < lo or st.min > hi:
                    hit = False
                    break
            matching += int(hit)
    return {"row_groups": total, "matching": matching, "skipped": total - matching}
