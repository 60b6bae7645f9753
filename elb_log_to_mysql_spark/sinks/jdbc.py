"""JDBC sink (reference L3: pandas.to_sql append to MySQL, etl:152-160).

Spark-native replacement: `df.write.jdbc` writes partitions in
parallel with batched inserts. The reference's append-only semantics
duplicate rows on re-run (etl:155, SURVEY §7e); for idempotent
re-ingest the engine offers file-scoped replacement: delete rows for
the `log_source_file` values in this batch, then append — re-running
a file replaces it instead of duplicating it.

No MySQL exists in this sandbox, so the connection is exercised in
tests via a local in-memory fallback (collect-side sqlite3) behind
the same interface; against a real cluster, pass a jdbc:mysql:// URL
and the mysql-connector-j jar via spark.jars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_TABLE = "elb_log_data"  # etl:153


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str = DEFAULT_TABLE,
    mode: str = "append",
    user: str | None = None,
    password: str | None = None,
    num_partitions: int | None = None,
    batch_size: int = 10_000,
    isolation_level: str = "READ_COMMITTED",
) -> None:
    """Parallel JDBC write. numPartitions bounds concurrent
    connections to the database (each partition = one connection);
    batchsize amortizes round-trips. At 100 TB the DB, not Spark, is
    the bottleneck — coalesce to what the DB can absorb."""
    writer = df
    if num_partitions is not None:
        writer = df.coalesce(num_partitions)
    opts = {
        "url": url,
        "dbtable": table,
        "batchsize": str(batch_size),
        "isolationLevel": isolation_level,
    }
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    writer.write.format("jdbc").options(**opts).mode(mode).save()


def write_sqlite_fallback(df: DataFrame, db_path: str, table: str = DEFAULT_TABLE) -> int:
    """Sandbox sink: round-trip the DataFrame into sqlite3 via Arrow.

    Collects in Arrow batches — test-scale only; it exists so the sink
    schema mapping and append semantics are exercised without a JDBC
    driver jar. Returns rows written.
    """
    import sqlite3

    pdf = df.toPandas()
    with sqlite3.connect(db_path) as con:
        pdf.to_sql(table, con, if_exists="append", index=False)
    return len(pdf)


def distinct_source_files(df: DataFrame, source_col: str = "log_source_file") -> list[str]:
    """The batch's lineage keys — one per ingested file, so the list is
    small (it is the unit of re-ingest) and safe to collect."""
    return [r[0] for r in df.select(source_col).distinct().collect()]


def write_idempotent(
    df: DataFrame,
    delete_files,
    append,
    source_col: str = "log_source_file",
) -> list[str]:
    """File-scoped replace: delete-then-append keyed on lineage.

    The reference's append-only `to_sql` duplicates every row on
    re-run (etl:155). Re-ingest is always file-scoped (a log file is
    re-delivered or re-parsed), so idempotence = delete the rows of
    exactly this batch's `log_source_file` values, then append the
    batch. `delete_files(files)` and `append(df)` are sink callables:
    JDBC DELETE + df.write.jdbc in production (wrap both in one
    transaction where the DB allows), sqlite in the sandbox.

    Returns the replaced file list (for audit logging).
    """
    files = distinct_source_files(df, source_col)
    delete_files(files)
    append(df)
    return files


def write_sqlite_idempotent(
    df: DataFrame,
    db_path: str,
    table: str = DEFAULT_TABLE,
    source_col: str = "log_source_file",
) -> list[str]:
    """Sandbox twin of the JDBC delete-then-append flow (one sqlite
    transaction: a failed append rolls the delete back)."""
    import sqlite3

    pdf = df.toPandas()
    files = sorted(pdf[source_col].dropna().unique().tolist())
    with sqlite3.connect(db_path) as con:
        exists = con.execute(
            "SELECT name FROM sqlite_master WHERE type='table' AND name=?", (table,)
        ).fetchone()
        if exists and files:
            marks = ",".join("?" * len(files))
            con.execute(
                f"DELETE FROM {table} WHERE {source_col} IN ({marks})", files
            )
        pdf.to_sql(table, con, if_exists="append", index=False)
    return files
