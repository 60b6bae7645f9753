"""MySQL-dialect sink verification without a MySQL server.

The reference's actual sink is MySQL (etl:152-160). No MySQL server or
connector jar exists in this sandbox, but the DIALECT — the component
that decides DDL types, identifier quoting, and error classification —
ships inside Spark itself (org.apache.spark.sql.jdbc.MySQLDialect).
These tests exercise that real dialect object against the real parsed
ALB schema, pinning exactly what `df.write.jdbc` would emit at a
jdbc:mysql:// URL, so the only untested residue is the wire protocol
(connector jar + server), which is Spark's code, not ours.
"""

from __future__ import annotations

from types import SimpleNamespace

from pyspark.sql import functions as F

from elb_log_to_mysql_spark.sinks.jdbc import (
    _missing_table_sqlstate,
    jdbc_delete_files,
)
from elb_log_to_mysql_spark.sources.alb import parse_alb_lines

MYSQL_URL = "jdbc:mysql://db.example.internal:3306/elb"


def _dialect(spark):
    return spark._jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(MYSQL_URL)


def _jvm_type(spark, field):
    return spark._jvm.org.apache.spark.sql.types.DataType.fromJson(
        field.dataType.json()
    )


def _mysql_ddl_type(spark, dialect, field) -> str:
    """The type `JdbcUtils.schemaString` would emit for this field:
    dialect override first, common JDBC type otherwise."""
    jdt = _jvm_type(spark, field)
    opt = dialect.getJDBCType(jdt)
    if not opt.isDefined():
        opt = spark._jvm.org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils.getCommonJDBCType(
            jdt
        )
    assert opt.isDefined(), f"no JDBC type for {field}"
    return opt.get().databaseTypeDefinition()


def test_mysql_identifier_quoting_matches_delete_statement(spark):
    """MySQLDialect quotes identifiers with backticks; our lineage
    DELETE derives its quote char from connection metadata at runtime,
    so this pins that a mysql URL resolves to the backtick dialect."""
    d = _dialect(spark)
    assert d.quoteIdentifier("log_source_file") == "`log_source_file`"


def test_mysql_ddl_for_parsed_alb_schema(spark):
    """Pin the CREATE TABLE column types MySQL would get for the full
    13-column parsed record + lineage column (reference DDL parity:
    the pandas to_sql target table, etl:152-160)."""
    df = parse_alb_lines(
        spark.range(1).select(F.lit("x").alias("value")),
        source_file=F.lit("s3://b/f.gz"),
    )
    d = _dialect(spark)
    ddl = {f.name: _mysql_ddl_type(spark, d, f) for f in df.schema.fields}
    # Spark 4 MySQLDialect: TimestampType (with-TZ) -> TIMESTAMP;
    # only TimestampNTZType gets the DATETIME override. Our parsed
    # log_timestamp is session-TZ (matches the reference's tz-aware
    # pandas column, etl:117-121), so TIMESTAMP is the correct DDL.
    assert ddl["log_timestamp"] == "TIMESTAMP"
    ntz = spark._jvm.org.apache.spark.sql.types.DataType.fromDDL("timestamp_ntz")
    assert d.getJDBCType(ntz).get().databaseTypeDefinition() == "DATETIME"
    assert ddl["backend_status_code"] == "INTEGER"
    assert ddl["received_bytes"] == "BIGINT"
    assert ddl["total_processing_time_ms"] == "DOUBLE PRECISION"
    # Spark 4 MySQLDialect maps StringType -> LONGTEXT (SPARK-44886
    # lineage; older Sparks emitted TEXT).
    string_cols = {k for k, v in ddl.items() if v == "LONGTEXT"}
    assert {
        "client_ip", "http_method", "requested_path",
        "ua_browser_family", "log_source_file",
    } <= string_cols


def test_mysql_table_exists_probe_query(spark):
    """The dialect's existence probe is a LIMIT-1 SELECT — portable to
    MySQL — and our metadata-based probe is dialect-independent; pin
    the dialect side so a Spark upgrade changing it is visible."""
    q = _dialect(spark).getTableExistsQuery("elb_log_data")
    assert "elb_log_data" in q and "1=0" in q.replace(" ", "")


def test_missing_table_sqlstate_detection(spark):
    """MySQL error 1146 carries SQLState 42S02 with message "Table
    'db.t' doesn't exist" — the message does NOT contain 'does not
    exist', which is exactly why substring matching was wrong. The
    detector must find the SQLState anywhere in the cause chain."""
    jvm = spark._jvm
    mysql_ex = jvm.java.sql.SQLException(
        "Table 'elb.elb_log_data' doesn't exist", "42S02", 1146
    )
    assert _missing_table_sqlstate(SimpleNamespace(java_exception=mysql_ex))
    wrapped = jvm.java.lang.RuntimeException("batch failed", mysql_ex)
    assert _missing_table_sqlstate(SimpleNamespace(java_exception=wrapped))
    derby_ex = jvm.java.sql.SQLException("Table/View 'T' does not exist.", "42X05")
    assert _missing_table_sqlstate(SimpleNamespace(java_exception=derby_ex))
    other = jvm.java.sql.SQLException("Deadlock found", "40001", 1213)
    assert not _missing_table_sqlstate(SimpleNamespace(java_exception=other))
    assert not _missing_table_sqlstate(SimpleNamespace(java_exception=None))


def test_mysql_delete_statement_exact_sql():
    """Pin the exact DELETE the idempotent sink issues under MySQL's
    backtick quoting (and Derby/ANSI double quotes), including the
    doubled-single-quote value escape — the statement that makes
    re-ingesting a file replace rows instead of duplicating them
    (reference etl:155 duplicates on rerun; this is the fix's core)."""
    from elb_log_to_mysql_spark.sinks.jdbc import build_delete_sql

    files = ["s3://b/2025/05/26/f1.gz", "s3://b/it's.gz"]
    assert build_delete_sql("elb_log_data", "log_source_file", files, "`") == (
        "DELETE FROM elb_log_data WHERE `log_source_file` IN "
        "('s3://b/2025/05/26/f1.gz','s3://b/it''s.gz')"
    )
    assert build_delete_sql("t", "c", ["x"], '"') == (
        'DELETE FROM t WHERE "c" IN (\'x\')'
    )


def test_duplicate_key_sqlstate_is_not_swallowed(spark):
    """MySQL duplicate-entry (error 1062, SQLState 23000) must NOT be
    classified as missing-table: the delete-then-append contract
    relies on integrity violations surfacing loudly, never being
    folded into the first-ingest fall-through."""
    jvm = spark._jvm
    dup = jvm.java.sql.SQLException(
        "Duplicate entry 's3://b/f.gz' for key 'uniq_src'", "23000", 1062
    )
    assert not _missing_table_sqlstate(SimpleNamespace(java_exception=dup))
    wrapped = jvm.java.lang.RuntimeException("write aborted", dup)
    assert not _missing_table_sqlstate(SimpleNamespace(java_exception=wrapped))


def test_lineage_varchar_bound_covers_maximal_s3_uri(spark, tmp_path):
    """The lineage column's VARCHAR bound must admit the longest legal
    s3:// URI (5 + 63-char bucket + '/' + 1024-byte key = 1093) —
    VARCHAR(1000) was a real boundary bug: MySQL in strict mode
    REJECTS the oversized insert and the ingest of a maximal key
    fails. Pins the constant and proves a maximal-length lineage
    value round-trips through the real delete-then-append path
    (Derby enforces VARCHAR bounds just as strictly)."""
    from elb_log_to_mysql_spark.sinks.jdbc import (
        LINEAGE_VARCHAR_LEN,
        write_jdbc_idempotent,
    )

    max_uri = "s3://" + "b" * 63 + "/" + "k" * 1024
    assert len(max_uri) == 1093 <= LINEAGE_VARCHAR_LEN
    lines = spark.createDataFrame(
        [(
            'h2 2025-05-26T12:00:00.000123Z app/demo/x 10.0.0.1:443 '
            '10.1.0.1:80 0.001 0.01 0.000 200 200 10 100 '
            '"GET https://example.com/api HTTP/2.0" "curl/8.4.0" '
            'TLS_AES_128_GCM_SHA256 TLSv1.3 arn:xxx',
        )],
        "value string",
    )
    df = parse_alb_lines(lines, source_file=F.lit(max_uri))
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    # first ingest creates the table with the VARCHAR(1200) override;
    # the rerun exercises the DELETE over the maximal-length key
    write_jdbc_idempotent(df, url, driver=driver, num_partitions=1)
    write_jdbc_idempotent(df, url, driver=driver, num_partitions=1)
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "elb_log_data")
        .option("driver", driver)
        .load()
    )
    rows = back.select("log_source_file").collect()
    assert len(rows) == 1  # idempotent: rerun replaced, not duplicated
    assert rows[0][0] == max_uri  # no truncation


def test_delete_files_with_credentials_and_absent_table(spark, tmp_path):
    """jdbc_delete_files authenticates with user/password (Derby
    embedded accepts any) and returns False via the metadata probe when
    the table does not exist — the first-ingest path that used to rely
    on dialect-specific error messages."""
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    ok = jdbc_delete_files(
        spark,
        url,
        ["s3://b/f.gz"],
        table="never_created",
        driver="org.apache.derby.iapi.jdbc.AutoloadedDriver",
        user="app",
        password="secret",
    )
    assert ok is False
