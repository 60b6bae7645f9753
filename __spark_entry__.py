"""Driver contract for the spark-graft builder (PySpark target).

entry()   — flagship query (shipping-priority revenue top-k: the
            join+agg+topk spine of the engine) on sf0.001.
queries() — every implemented operator from SURVEY.md §2, bound to
            the test tables (elb_log_to_mysql_spark/queries.py).
oracle_sql() — DuckDB twins for the SQL-expressible subset; sketch-,
            stream-, and UDF-based operators are rows-only by design.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elb_log_to_mysql_spark.functions.numeric import dsum
from elb_log_to_mysql_spark.queries import ORACLE_SQL, QUERIES
from elb_log_to_mysql_spark.session import tune_session
from elb_log_to_mysql_spark.sources.tables import load_table

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: revenue top-10 of BUILDING-segment orders with open
    lineitems (TPC-H Q3 shape) — broadcast dim filter, fact join,
    decimal-exact agg, deterministic top-k."""
    tune_session(spark)
    customer = load_table(spark, SF0001, "customer")
    orders = load_table(spark, SF0001, "orders")
    lineitem = load_table(spark, SF0001, "lineitem")

    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") > "1996-01-01")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(building), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue).alias("revenue"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
