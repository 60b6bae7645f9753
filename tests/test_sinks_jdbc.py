"""Real-JDBC sink tests (reference L3, etl:152-160).

Runs `df.write.format("jdbc")` against Apache Derby embedded — the
driver is part of Spark's bundled jars, so this is the genuine JDBC
code path (DriverManager, JdbcUtils type mapping, batched inserts),
not the sqlite fallback. MySQL in production differs only by URL +
driver jar.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from elb_log_to_mysql_spark.sinks.jdbc import (
    write_jdbc,
    write_jdbc_idempotent,
)
from elb_log_to_mysql_spark.sources.alb import parse_alb_lines

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _derby_url() -> str:
    return f"jdbc:derby:{tempfile.mkdtemp(prefix='derby_')}/db;create=true"


def _read_back(spark, url, table):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DERBY_DRIVER)
        .load()
    )


def _alb_df(spark, n, source):
    line = F.format_string(
        'h2 2025-05-26T10:%02d:%02d.000123Z app/x/y 1.2.3.%d:443 5.6.7.8:80 '
        '0.001 0.020 0.000 200 200 %d 2000 "GET https://ex.com/p/%d HTTP/2.0" '
        '"curl/8.5.0" CIPHER TLSv1.3 arn',
        (F.col("id") % 60).cast("int"),
        ((F.col("id") * 7) % 60).cast("int"),
        (F.col("id") % 250).cast("int"),
        (F.col("id") % 1000).cast("int"),
        F.col("id").cast("int"),
    )
    lines = spark.range(0, n).select(line.alias("value"))
    return parse_alb_lines(lines, source_file=F.lit(source))


def test_jdbc_roundtrip_schema_and_rows(spark):
    """The full parsed ALB table goes through real JDBC and comes back
    with the same rowcount and column set (L3 end-to-end)."""
    url = _derby_url()
    df = _alb_df(spark, 57, "s3://bucket/a.gz")
    write_jdbc(df, url, driver=DERBY_DRIVER, num_partitions=2)
    back = _read_back(spark, url, "elb_log_data")
    assert back.count() == 57
    assert sorted(back.columns) == sorted(df.columns)
    r = back.orderBy("requested_path").first()
    assert r.http_method == "GET"
    assert r.ua_browser_family == "curl"


def test_jdbc_append_mode_duplicates_like_reference(spark):
    """mode='append' reproduces the reference's duplicate-on-rerun
    behavior (etl:155) — the contract write_jdbc_idempotent fixes."""
    url = _derby_url()
    df = _alb_df(spark, 10, "s3://bucket/a.gz")
    write_jdbc(df, url, driver=DERBY_DRIVER)
    write_jdbc(df, url, driver=DERBY_DRIVER)
    assert _read_back(spark, url, "elb_log_data").count() == 20


def test_jdbc_idempotent_reingest_replaces_file(spark):
    """Re-running one file's ingest replaces exactly that file's rows;
    other files' rows are untouched."""
    url = _derby_url()
    a1 = _alb_df(spark, 10, "s3://bucket/a.gz")
    b = _alb_df(spark, 7, "s3://bucket/b.gz")
    # first ingest (table auto-created on first append)
    assert write_jdbc_idempotent(a1, url, driver=DERBY_DRIVER) == [
        "s3://bucket/a.gz"
    ]
    write_jdbc_idempotent(b, url, driver=DERBY_DRIVER)
    assert _read_back(spark, url, "elb_log_data").count() == 17
    # re-deliver file a with more rows: replaces, never duplicates
    a2 = _alb_df(spark, 12, "s3://bucket/a.gz")
    write_jdbc_idempotent(a2, url, driver=DERBY_DRIVER)
    back = _read_back(spark, url, "elb_log_data")
    assert back.count() == 19
    per_file = {
        r.log_source_file: r.n
        for r in back.groupBy("log_source_file").agg(F.count("*").alias("n")).collect()
    }
    assert per_file == {"s3://bucket/a.gz": 12, "s3://bucket/b.gz": 7}


def test_stream_ingest_jdbc_exactly_once_and_incremental(spark, tmp_path):
    """The reference pipeline as a stream against real JDBC: gzip log
    dir -> readStream -> parse -> foreachBatch delete-then-append into
    Derby. Checkpoint replay must converge (no duplicates); a
    late-arriving file is picked up incrementally."""
    import gzip

    from elb_log_to_mysql_spark.streaming.windows import stream_ingest_jdbc

    line = (
        "h2 2025-05-26T10:00:{sec:02d}Z app/x/y 10.0.0.{i}:443 10.1.1.1:80 "
        '0.001 0.020 0.000 200 200 100 2000 "GET https://ex.com/p HTTP/2.0" '
        '"Mozilla/5.0 (X11; Linux x86_64) Firefox/127.0" CIPHER TLSv1.3 arn'
    )
    src = tmp_path / "logs"
    src.mkdir()
    for f in range(2):
        with gzip.open(src / f"f{f}.log.gz", "wt") as fh:
            for i in range(5):
                fh.write(line.format(sec=i, i=i) + "\n")

    url = _derby_url()

    def rows() -> int:
        return _read_back(spark, url, "elb_log_data").count()

    stream_ingest_jdbc(spark, str(src), url, str(tmp_path / "ck1"), driver=DERBY_DRIVER)
    assert rows() == 10
    # checkpoint LOSS: full replay through a fresh checkpoint must
    # converge to the same table state via the file-scoped replace
    stream_ingest_jdbc(spark, str(src), url, str(tmp_path / "ck2"), driver=DERBY_DRIVER)
    assert rows() == 10
    # late third file: original checkpoint skips committed files,
    # ingests only the new one
    with gzip.open(src / "f2.log.gz", "wt") as fh:
        for i in range(3):
            fh.write(line.format(sec=i, i=i) + "\n")
    stream_ingest_jdbc(spark, str(src), url, str(tmp_path / "ck1"), driver=DERBY_DRIVER)
    assert rows() == 13
    # lineage column preserved through the stream: one row-set per file
    per_file = (
        _read_back(spark, url, "elb_log_data")
        .groupBy("log_source_file")
        .count()
        .collect()
    )
    assert len(per_file) == 3 and all(r["count"] in (5, 3) for r in per_file)


def test_streaming_ingest_to_jdbc_idempotent(spark, tmp_path):
    """The reference ETL as an always-on pipeline: readStream over the
    log directory -> identical parse chain -> foreachBatch idempotent
    JDBC append (streaming/ingest.py). Covers both replay layers:
    checkpointed restart adds nothing new, and a re-delivered file
    (fresh checkpoint — invisible to the engine) is replaced, not
    duplicated."""
    from elb_log_to_mysql_spark.streaming.ingest import stream_alb_to_jdbc

    src = tmp_path / "logs"
    src.mkdir()
    line = (
        'h2 2025-05-26T10:00:{s:02d}.000123Z app/x/y 1.2.3.4:443 5.6.7.8:80 '
        '0.001 0.020 0.000 200 200 100 2000 "GET https://ex.com/p/{i} HTTP/2.0" '
        '"curl/8.5.0" CIPHER TLSv1.3 arn'
    )
    for f in range(2):
        (src / f"file{f}.log").write_text(
            "\n".join(line.format(s=i % 60, i=f * 100 + i) for i in range(50)) + "\n"
        )
    url = _derby_url()
    ckpt = str(tmp_path / "ckpt")
    stream_alb_to_jdbc(
        spark, str(src), url, driver=DERBY_DRIVER, checkpoint=ckpt
    )
    back = _read_back(spark, url, "elb_log_data")
    assert back.count() == 100
    # restart with the SAME checkpoint: nothing to do, no duplicates
    stream_alb_to_jdbc(
        spark, str(src), url, driver=DERBY_DRIVER, checkpoint=ckpt
    )
    assert _read_back(spark, url, "elb_log_data").count() == 100
    # re-delivery: fresh checkpoint reprocesses both files — the
    # file-scoped delete-then-append converges instead of doubling
    stream_alb_to_jdbc(
        spark, str(src), url, driver=DERBY_DRIVER,
        checkpoint=str(tmp_path / "ckpt2"),
    )
    back2 = _read_back(spark, url, "elb_log_data")
    assert back2.count() == 100
    # and the content matches the batch parse of the same directory
    from elb_log_to_mysql_spark.sources.alb import read_alb_logs

    batch = read_alb_logs(spark, str(src) + "/*.log")
    assert back2.count() == batch.count()
    assert (
        back2.agg(F.sum("elb_status_code")).first()[0]
        == batch.agg(F.sum("elb_status_code")).first()[0]
    )


def test_streaming_ingest_picks_up_only_new_files(spark, tmp_path):
    """Incremental semantics: after the first drain, a NEW file in the
    watched directory is the only thing the next run processes (the
    checkpoint skips completed files), and its rows append."""
    from elb_log_to_mysql_spark.streaming.ingest import stream_alb_to_jdbc

    src = tmp_path / "logs"
    src.mkdir()
    line = (
        'h2 2025-05-26T11:00:{s:02d}.000123Z app/x/y 1.2.3.4:443 5.6.7.8:80 '
        '0.001 0.020 0.000 200 200 100 2000 "GET https://ex.com/q/{i} HTTP/2.0" '
        '"curl/8.5.0" CIPHER TLSv1.3 arn'
    )

    def write(fname, n, base):
        (src / fname).write_text(
            "\n".join(line.format(s=i % 60, i=base + i) for i in range(n)) + "\n"
        )

    url = _derby_url()
    ckpt = str(tmp_path / "ckpt")
    write("f0.log", 30, 0)
    stream_alb_to_jdbc(spark, str(src), url, driver=DERBY_DRIVER, checkpoint=ckpt)
    assert _read_back(spark, url, "elb_log_data").count() == 30
    write("f1.log", 12, 1000)
    stream_alb_to_jdbc(spark, str(src), url, driver=DERBY_DRIVER, checkpoint=ckpt)
    back = _read_back(spark, url, "elb_log_data")
    assert back.count() == 42
    # lineage shows both files, 30/12 split preserved
    per_file = {
        r["log_source_file"].rsplit("/", 1)[-1]: r["n"]
        for r in back.groupBy("log_source_file")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_file == {"f0.log": 30, "f1.log": 12}
