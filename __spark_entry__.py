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


# Round 1's driver run verified the FIRST 50 registry entries (in
# registration order) and stopped — CORRECTNESS_r01.json. This round,
# entries without a driver row yet go first so the same budget lands
# on them: §2-critical oracle-checked queries (flagship elb_parse,
# the dedup/similarity/text/sessionize/streaming families, remaining
# TPC-H), then rows-only sketches (their driver row carries the least
# information — every entry ALSO has a committed local oracle run in
# CORRECTNESS_LOCAL_r02.json), then round-1-verified entries.
_R1_CHECKED = [
    "filter_project", "inner_join", "left_join", "semi_join", "anti_join",
    "broadcast_join", "range_join", "hash_agg", "tpch_q1", "distinct_agg",
    "approx_distinct", "rollup_agg", "cube_agg", "window_rank",
    "window_analytic", "scalar_subquery", "window_range",
    "group_map_profile", "topk", "topk_per_group", "set_ops",
    "scalar_funcs", "tpch_q3", "tpch_q5", "tpch_q4", "tpch_q6", "tpch_q10",
    "tpch_q13", "tpch_q18", "tpch_q19", "full_outer_join", "cross_join",
    "array_funcs", "tpch_q7", "tpch_q17", "asof_join", "skew_salted_agg",
    "pivot_agg", "stats_agg", "json_funcs", "date_funcs", "string_funcs",
    "percentile_agg", "percentile_approx", "grouping_sets",
    "collect_sorted", "map_funcs", "unpivot", "text_chunking",
    "deterministic_sample",
]


def _driver_order(names) -> list[str]:
    r1 = set(_R1_CHECKED)
    new_oracle = [n for n in names if n not in r1 and n in ORACLE_SQL]
    new_rows_only = [n for n in names if n not in r1 and n not in ORACLE_SQL]
    rest = [n for n in names if n in r1]
    return new_oracle + new_rows_only + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _driver_order(QUERIES)}


def oracle_sql() -> dict[str, str]:
    return {n: ORACLE_SQL[n] for n in _driver_order(QUERIES) if n in ORACLE_SQL}
