"""Bucketed-table joins: pre-shuffling both fact tables into the same
bucket layout removes the exchange from every subsequent join on the
bucket key — the warehouse-layout decision that saves one full
shuffle of the big table per query at 100 TB."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from elb_log_to_mysql_spark.plans.inspect import plan_report
from elb_log_to_mysql_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    for name, df, key in [("li_b", li, "l_orderkey"), ("od_b", od, "o_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .format("parquet")
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield spark
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS od_b")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    # disable broadcast so the join strategy question is shuffle vs
    # bucket layout (at real fact-fact scale broadcast is off the table)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("li_b")
        od = spark.table("od_b")
        joined = (
            li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        joined.collect()
        rep = plan_report(joined)
        # the join runs shuffle-free on the bucket layout; the only
        # exchange is the final 5-group aggregate
        assert rep["sortmerge_joins"] + rep["shuffled_hash_joins"] >= 1
        assert rep["exchanges"] <= 1, rep["nodes"]

        # same join on unbucketed parquet must shuffle both sides
        li_raw = load_table(spark, "/root/testdata/sf0.001", "lineitem")
        od_raw = load_table(spark, "/root/testdata/sf0.001", "orders")
        raw = (
            li_raw.join(od_raw, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        raw.collect()
        rep_raw = plan_report(raw)
        assert rep_raw["exchanges"] >= 3, rep_raw["nodes"]
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
