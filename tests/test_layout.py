"""Table-layout management: partitioned idempotent ingest, bucketed
shuffle-free joins, small-file compaction (sinks/layout.py).

The partition-overwrite tests mirror the reference's idempotency
contract (etl.py:152-160: re-ingesting a source file must not
duplicate rows) at partition granularity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from elb_log_to_mysql_spark.sinks.layout import (
    compact_small_files,
    compaction_stats,
    write_bucketed,
    write_partitioned_idempotent,
)


@pytest.fixture(scope="module")
def days_df(spark):
    return spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 4).alias("day"),
        (F.col("id") * 7 % 100).alias("v"),
    )


def test_dynamic_overwrite_replaces_only_touched_partitions(spark, tmp_path, days_df):
    path = str(tmp_path / "tbl")
    write_partitioned_idempotent(days_df, path, ["day"])
    assert spark.read.parquet(path).count() == 1000

    # re-ingest day=2 with DIFFERENT content: half the rows, bumped v
    day2 = (
        days_df.filter((F.col("day") == 2) & (F.col("id") < 500))
        .withColumn("v", F.col("v") + 1000)
    )
    write_partitioned_idempotent(day2, path, ["day"])

    got = spark.read.parquet(path)
    # untouched partitions intact
    assert got.filter(F.col("day") != 2).count() == 750
    # touched partition fully replaced, not appended
    d2 = got.filter(F.col("day") == 2)
    assert d2.count() == 125
    assert d2.agg(F.min("v")).first()[0] >= 1000


def test_dynamic_overwrite_reingest_is_idempotent(spark, tmp_path, days_df):
    path = str(tmp_path / "tbl")
    write_partitioned_idempotent(days_df, path, ["day"])
    # exact re-run: same batch twice must converge, not duplicate
    write_partitioned_idempotent(days_df, path, ["day"])
    got = spark.read.parquet(path)
    assert got.count() == 1000
    assert got.select(F.sum("v")).first()[0] == days_df.select(F.sum("v")).first()[0]


def test_dynamic_overwrite_conf_restored(spark, tmp_path, days_df):
    key = "spark.sql.sources.partitionOverwriteMode"
    before = spark.conf.get(key, None)
    write_partitioned_idempotent(days_df, str(tmp_path / "t2"), ["day"])
    assert spark.conf.get(key, None) == before


def test_bucketed_join_has_no_shuffle_exchange(spark, tmp_path):
    left = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("a")
    )
    right = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("b")
    )
    write_bucketed(
        left, "t_left_bkt", ["k"], 8, sort_by=["k"],
        path=str(tmp_path / "left"),
    )
    write_bucketed(
        right, "t_right_bkt", ["k"], 8, sort_by=["k"],
        path=str(tmp_path / "right"),
    )
    try:
        # force the non-broadcast path so the exchange would be visible
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("t_left_bkt").join(spark.table("t_right_bkt"), "k")
            assert joined.count() == 10_000
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_left_bkt")
        spark.sql("DROP TABLE IF EXISTS t_right_bkt")


def test_bucketed_agg_has_no_shuffle_exchange(spark, tmp_path):
    df = spark.range(10_000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("v")
    )
    write_bucketed(df, "t_agg_bkt", ["k"], 8, path=str(tmp_path / "agg"))
    try:
        agg = spark.table("t_agg_bkt").groupBy("k").agg(F.sum("v").alias("s"))
        assert agg.count() == 500
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_agg_bkt")


def test_compaction_reduces_file_count_and_preserves_data(spark, tmp_path):
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    df = spark.range(50_000).select(
        F.col("id"), (F.col("id") % 13).alias("g")
    )
    # fragment: 40 small files
    df.repartition(40).write.parquet(src)
    before = compaction_stats(spark, src)
    assert before["num_files"] == 40

    # target = total size -> single output file
    res = compact_small_files(spark, src, dst, target_file_bytes=before["total_bytes"] + 1)
    assert res["after"]["num_files"] == 1

    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert b.count() == 50_000
    assert (
        a.select(F.sum("id"), F.sum("g")).first()
        == b.select(F.sum("id"), F.sum("g")).first()
    )


def test_compaction_is_shuffle_free(spark, tmp_path):
    src = str(tmp_path / "frag2")
    spark.range(10_000).repartition(16).write.parquet(src)
    df = spark.read.parquet(src).coalesce(2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_zorder_skips_more_than_linear_sort_on_second_dim(spark, tmp_path):
    """The point of the Morton layout: a 2-D predicate prunes files on
    BOTH columns, while a 1-D sort leaves the second column's stats
    wide. Compare footer-stats skipping for the same predicate."""
    from elb_log_to_mysql_spark.sinks.layout import pruning_stats, write_zordered
    from elb_log_to_mysql_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zordered(li, zpath, "l_partkey", "l_suppkey", num_files=16)
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    # predicate on the SECOND dimension only: the 1-D (l_partkey) sort
    # leaves l_suppkey stats full-width in every file (skips nothing),
    # while z-order files cover compact (x, y) rectangles
    pred = {"l_suppkey": (1, 2)}
    z = pruning_stats(zpath, pred)
    lin = pruning_stats(lpath, pred)
    assert z["row_groups"] == lin["row_groups"] == 16
    assert lin["skipped"] == 0
    assert z["skipped"] >= 4
    # and the clustered copy is lossless
    assert spark.read.parquet(zpath).count() == li.count()


def test_zorder_scan_results_equal_original(spark):
    from elb_log_to_mysql_spark.queries import QUERIES

    out = QUERIES["zorder_scan"](spark, "/root/testdata/sf0.001")
    from elb_log_to_mysql_spark.functions.numeric import dsum
    from elb_log_to_mysql_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    want = (
        load_table(spark, "/root/testdata/sf0.001", "lineitem")
        .filter(
            F.col("l_partkey").between(10, 150)
            & F.col("l_suppkey").between(1, 8)
        )
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum("l_extendedprice").alias("sum_price"))
    )
    got = {tuple(r) for r in out.collect()}
    exp = {tuple(r) for r in want.collect()}
    assert got == exp and len(exp) > 0
