"""TPC-H-shaped analytical query battery (Q4/Q6/Q10/Q13/Q18/Q19),
adapted to the driver's test schema (FIXTURES.md §3 — no partsupp,
no commit/receipt dates or shipmode, so predicates use the columns
that exist while keeping each query's canonical plan shape).

Reference scope note: the reference engine answers no analytical
queries at all (SURVEY.md §2.1 — its one pipeline is scan→parse→
project→sink); this battery is the extension surface that makes the
engine a usable analytics replacement.

Together with Q1 (relational.hash_agg) and Q3/Q5 (advanced.py) the
battery covers the canonical physical shapes: selective scan-agg
(Q6), exists/semi-join (Q4), fact-fact join + top-k (Q10, Q18),
outer-join histogram (Q13), and disjunctive multi-predicate join
(Q19). Every double aggregate uses the exact-decimal contract
(functions/numeric.py) so results are partition-order independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from elb_log_to_mysql_spark.functions.numeric import dsum


def tpch_q4(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Order-priority checking: count 1996 orders having at least one
    lineitem shipped after the order date. EXISTS compiles to a left
    SEMI join — per-key early-out, no fact-side duplication, and the
    aggregate input is at most |orders| rows."""
    has_late_ship = orders.join(
        lineitem,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        has_late_ship.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def tpch_q6(lineitem: DataFrame) -> DataFrame:
    """Forecasting-revenue-change: single selective scan + global agg.
    The whole query is one codegen stage over the parquet scan with
    every predicate pushed; the canonical vectorization benchmark."""
    return lineitem.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.coalesce(dsum(F.col("l_extendedprice") * F.col("l_discount")), F.lit(0.0)).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


def tpch_q10(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, nation: DataFrame
) -> DataFrame:
    """Returned-item reporting: top-20 customers by revenue lost to
    returns in 1996. lineitem⋈orders shuffles once on orderkey; the
    customer and nation dimensions broadcast."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1997-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def tpch_q13(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Customer order-count distribution: left outer join keeps
    zero-order customers, then a two-level aggregation. The join
    condition's extra predicate (priority filter) must live in the
    join clause, not a WHERE — a WHERE would silently turn the outer
    join inner."""
    per_customer = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_customer.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def tpch_q18(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, min_qty: float = 180.0
) -> DataFrame:
    """Large-volume customers: orders whose total quantity exceeds a
    threshold. The HAVING subquery is a self-contained aggregate over
    lineitem whose (small) result semi-joins back — Spark evaluates
    it once, and AQE converts the key-list join to broadcast."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > min_qty)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


def tpch_q19(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Discounted revenue under a disjunction of brand/size/quantity
    bands. The OR-of-ANDs cannot prune the scan by itself, but the
    shared p_partkey equi-key still hash-joins; the per-band residual
    evaluates post-join in one codegen stage."""
    joined = lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#18")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.filter(band).agg(
        F.coalesce(dsum(revenue), F.lit(0.0)).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )
