"""Query registry: every implemented operator bound to the driver's
test tables, with a DuckDB-oracle SQL twin where SQL-expressible.

Contract (driver harness): `QUERIES[name](spark, sf_dir) -> DataFrame`
and `ORACLE_SQL[name]` = ANSI SQL over the same parquet views
producing the same column NAMES and values (order-insensitive).
Determinism rules used throughout:

- double aggregates go through the exact-decimal contract
  (functions/numeric.py) so values are partition-order independent
  and bit-equal to the oracle;
- every ranking/limit carries a unique tiebreaker;
- timestamps are rendered to strings explicitly (never via host TZ);
- float-derived scores (cosine) are excluded from oracle-checked
  output (rank positions are checked instead) — ~1e-7 engine noise
  vs rounding boundaries would otherwise flake.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elb_log_to_mysql_spark.functions.numeric import DAVG_SQL, DSUM_SQL, dsum
from elb_log_to_mysql_spark.operators import advanced, analytics, asof, dedup, relational
from elb_log_to_mysql_spark.operators import multimodal, sessionize, similarity, skew
from elb_log_to_mysql_spark.operators import textops, tpch, windows
from elb_log_to_mysql_spark.session import (
    carry_caches,
    tune_session,
    unpersist_on_gc,
)
from elb_log_to_mysql_spark.sources.alb import parse_alb_lines
from elb_log_to_mysql_spark.sources.tables import (
    load_table,
    load_tables,
    raw_parquet_schema,
)
from elb_log_to_mysql_spark.streaming.windows import run_stream_to_batch, tumbling_counts

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        import functools

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return wrapped

    return deco


def _t(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    # spread=True: scan-bound aggregate consumers opt into a post-scan
    # repartition when the parquet layout is single-row-group (see
    # sources/tables.py for the measured win/loss split).
    return load_table(spark, sf_dir, name, spread=spread)


def _dsum(expr: str) -> str:
    return DSUM_SQL.format(expr=expr)


def _davg(expr: str) -> str:
    return DAVG_SQL.format(expr=expr)


def _work_dir(kind: str) -> str:
    """Per-invocation unique scratch dir for queries that materialize
    an alternate layout (hive-partitioned copy, ORC round trip).

    A FIXED shared path would race under concurrency: two overlapping
    invocations (concurrent throughput streams, overlapping driver
    processes) rmtree each other's in-flight scans. mkdtemp gives each
    call its own directory; cleanup is deferred to process exit via
    atexit because the returned DataFrame is lazy — the caller scans
    the directory AFTER the query function returns."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=f"spark-graft-{kind}-")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


# ===========================================================================
# Relational core
# ===========================================================================

@_q(
    "filter_project",
    f"""
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_extendedprice * (1 - l_discount) AS net_price,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_date
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_quantity < 30
    """,
)
def q_filter_project(spark, sf_dir):
    """Scan–filter–project with pushdown: date-range filter reaches the parquet reader, projection prunes the read schema."""
    return relational.filter_project(_t(spark, sf_dir, "lineitem"))


@_q(
    "inner_join",
    """
    SELECT o_orderkey, o_custkey, c_name, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    """,
)
def q_inner_join(spark, sf_dir):
    """Plain equi inner join orders↔customer projected to the join columns."""
    return relational.inner_join(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    )


@_q(
    "left_join",
    f"""
    WITH per_cust AS (
      SELECT o_custkey, COUNT(*) AS order_cnt,
             {_dsum('o_totalprice')} AS total_spent
      FROM orders GROUP BY o_custkey
    )
    SELECT c_custkey, c_name,
           COALESCE(order_cnt, 0) AS order_cnt,
           COALESCE(total_spent, 0.0) AS total_spent
    FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
    """,
)
def q_left_join(spark, sf_dir):
    """Left outer join keeping orderless customers with null order columns."""
    return relational.left_join(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


@_q(
    "semi_join",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    """,
)
def q_semi_join(spark, sf_dir):
    """Customers WITH at least one order (left semi join — the relational EXISTS)."""
    return relational.semi_join(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


@_q(
    "anti_join",
    """
    SELECT c_custkey, c_name, c_nationkey
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 250000)
    """,
)
def q_anti_join(spark, sf_dir):
    """Customers with NO orders (left anti join — the relational NOT EXISTS)."""
    return relational.anti_join(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


@_q(
    "broadcast_join",
    f"""
    SELECT r_name, COUNT(*) AS customers,
           {_dsum('c_acctbal')} AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_broadcast_join(spark, sf_dir):
    """Fact–dim join with the dim side explicitly broadcast: zero fact shuffle (operators/relational.py)."""
    return relational.broadcast_dim_join(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )


@_q(
    "range_join",
    f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           COUNT(*) AS late_lines,
           {_dsum('l_extendedprice')} AS late_value
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY 1
    """,
)
def q_range_join(spark, sf_dir):
    """Equi + range (theta-residual) join: late shipments per month — the equi key keeps it a hash join (operators/relational.py:range_join)."""
    return relational.range_join(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    )


@_q(
    "hash_agg",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum('l_quantity')} AS sum_qty,
           {_dsum('l_extendedprice')} AS sum_base_price,
           {_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {_dsum('l_quantity')} / COUNT(*) AS avg_qty,
           {_dsum('l_extendedprice')} / COUNT(*) AS avg_price,
           {_dsum('l_discount')} / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_hash_agg(spark, sf_dir):
    """TPC-H Q1 pricing summary — the canonical wide hash aggregate with map-side partial combine and decimal-exact sums (operators/relational.py:hash_agg_q1)."""
    # spread: wide decimal aggregate over the bare fact scan — the
    # measured winner case for the narrow-layout repartition (~35%).
    return relational.hash_agg_q1(_t(spark, sf_dir, "lineitem", spread=True))


# canonical-name alias: hash_agg IS the TPC-H Q1 pricing summary
QUERIES["tpch_q1"] = QUERIES["hash_agg"]
ORACLE_SQL["tpch_q1"] = ORACLE_SQL["hash_agg"]


@_q(
    "distinct_agg",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(DISTINCT l_suppkey) AS distinct_supps,
           COUNT(*) AS rows_total
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_distinct_agg(spark, sf_dir):
    """COUNT(DISTINCT) per group — Spark's Expand-based exact distinct aggregation."""
    return relational.distinct_agg(_t(spark, sf_dir, "lineitem"))


@_q(
    "approx_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           TRUE AS parts_in_bound,
           TRUE AS orders_in_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_approx_distinct(spark, sf_dir):
    """HLL estimate under an error-bound contract: the oracle checks
    the exact counts and that every in-bound flag is TRUE (|approx −
    exact| ≤ 5·rsd·exact) — the sketch is verified without requiring
    estimator-identical bits across engines."""
    return relational.approx_distinct(_t(spark, sf_dir, "lineitem"))


@_q(
    "rollup_agg",
    f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           {_dsum('l_quantity')} AS sum_qty,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q_rollup_agg(spark, sf_dir):
    """ROLLUP over (returnflag, linestatus): hierarchy subtotals + grand total in one pass."""
    return relational.rollup_agg(_t(spark, sf_dir, "lineitem"))


@_q(
    "cube_agg",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {_dsum('o_totalprice')} AS sum_price,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def q_cube_agg(spark, sf_dir):
    """CUBE over (returnflag, linestatus): all 4 grouping combinations, decimal-exact sums."""
    return relational.cube_agg(_t(spark, sf_dir, "orders"))


@_q(
    "window_rank",
    """
    SELECT * FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER w AS rn,
             RANK() OVER w AS rnk,
             DENSE_RANK() OVER w AS drnk
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    ) WHERE rn <= 5
    """,
)
def q_window_rank(spark, sf_dir):
    """Ranking windows: row_number/rank/dense_rank with deterministic orders per group."""
    return windows.window_rank(_t(spark, sf_dir, "customer"))


@_q(
    "window_analytic",
    """
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_totalprice,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,8))) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS STRING) AS DOUBLE)
             AS running_spend,
           ROW_NUMBER() OVER w AS order_seq
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_analytic(spark, sf_dir):
    """Analytic window battery: lag/lead/running sums over per-customer order sequences."""
    return windows.window_analytic(_t(spark, sf_dir, "orders"))


@_q(
    "scalar_subquery",
    f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > (SELECT {_dsum('o_totalprice')} / COUNT(*)
                          FROM orders)
      AND o_totalprice > (SELECT {_dsum('o2.o_totalprice')} / COUNT(*)
                          FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """,
)
def q_scalar_subquery(spark, sf_dir):
    """Scalar + correlated scalar subqueries (orders above both the
    global and the customer's own average). Spark SQL is the engine's
    query language — Catalyst rewrites the correlated subquery into an
    aggregate + join, no driver-side loop. Both averages use the
    exact-decimal image so the predicate boundary is bit-identical to
    the oracle's."""
    from elb_log_to_mysql_spark.sources.tables import load_tables

    load_tables(spark, sf_dir, ["orders"])
    return spark.sql(
        f"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > (SELECT {_dsum('o_totalprice')} / COUNT(*)
                              FROM orders)
          AND o_totalprice > (SELECT {_dsum('o2.o_totalprice')} / COUNT(*)
                              FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        """
    )


@_q(
    "window_range",
    f"""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           COUNT(*) OVER w AS trailing_n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,8))) OVER w
                AS STRING) AS DOUBLE)
             AS trailing_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL '90 days' PRECEDING AND CURRENT ROW)
    """,
)
def q_window_range(spark, sf_dir):
    """RANGE-frame windows: value-based frames (preceding amounts, unbounded) distinct from row frames."""
    return windows.window_range_trailing(_t(spark, sf_dir, "orders"))


@_q(
    "group_map_profile",
    """
    SELECT user_id, COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types,
           CAST(median(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
             AS median_cents
    FROM events GROUP BY user_id
    """,
)
def q_group_map_profile(spark, sf_dir):
    """Holistic per-group profile (exact integer-cents median) via
    built-in `percentile` — JVM-side ObjectHashAggregate, no Python in
    the hot path. The applyInPandas twin (same output, bit-equal) is
    registered as group_map_profile_pandas."""
    from elb_log_to_mysql_spark.operators.groupmap import user_profile_builtin

    return user_profile_builtin(_t(spark, sf_dir, "events"))


@_q(
    "group_map_profile_pandas",
    """
    SELECT user_id, COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types,
           CAST(median(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
             AS median_cents
    FROM events GROUP BY user_id
    """,
)
def q_group_map_profile_pandas(spark, sf_dir):
    """applyInPandas grouped-map demonstrator: arbitrary per-group
    Python over one Arrow frame per group — kept off the bench
    headline path (the built-in percentile twin is there instead)."""
    from elb_log_to_mysql_spark.operators.groupmap import user_profile_groupmap

    return user_profile_groupmap(_t(spark, sf_dir, "events"))


@_q(
    "topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_topk(spark, sf_dir):
    """Global deterministic top-k by revenue with full tiebreak (TakeOrdered, no global sort)."""
    return relational.topk(_t(spark, sf_dir, "orders"))


@_q(
    "topk_per_group",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, price_rank
    FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
               AS price_rank
      FROM lineitem
    ) WHERE price_rank <= 3
    """,
)
def q_topk_per_group(spark, sf_dir):
    """Per-group top-k via rank window with unique tiebreak (WindowGroupLimit pushdown)."""
    return windows.topk_per_group(_t(spark, sf_dir, "lineitem"))


@_q(
    "set_ops",
    """
    WITH with_orders AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
         building AS (SELECT c_custkey AS custkey FROM customer
                      WHERE c_mktsegment = 'BUILDING')
    SELECT custkey, 'union' AS op
    FROM (SELECT custkey FROM with_orders UNION SELECT custkey FROM building)
    UNION ALL
    SELECT custkey, 'intersect' AS op
    FROM (SELECT custkey FROM with_orders INTERSECT SELECT custkey FROM building)
    UNION ALL
    SELECT custkey, 'except' AS op
    FROM (SELECT custkey FROM building EXCEPT SELECT custkey FROM with_orders)
    """,
)
def q_set_ops(spark, sf_dir):
    """UNION / INTERSECT / EXCEPT battery over customer key sets with deterministic tagging."""
    return relational.set_ops(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


@_q(
    "scalar_funcs",
    """
    SELECT o_orderkey,
           UPPER(c_name) AS name_upper,
           CAST(LENGTH(c_name) AS INT) AS name_len,
           SUBSTRING(c_mktsegment, 1, 4) AS seg4,
           CONCAT_WS('|', o_orderstatus, o_orderpriority) AS status_prio,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(day(o_orderdate) AS INT) AS order_day,
           o_totalprice / 1000.0 AS price_k,
           ABS(c_acctbal) AS abs_bal,
           o_orderkey % 7 AS key_mod7,
           CASE WHEN o_totalprice > 150000 THEN 'high'
                WHEN o_totalprice > 50000 THEN 'mid'
                ELSE 'low' END AS price_band
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def q_scalar_funcs(spark, sf_dir):
    """Scalar expression battery: string/math/conditional functions evaluated per row inside codegen."""
    return relational.scalar_funcs(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


# ===========================================================================
# Advanced relational
# ===========================================================================

@_q(
    "tpch_q3",
    f"""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_orderpriority,
           {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING' AND l_shipdate > TIMESTAMP '1996-01-01'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 adapted to the test schema (operators/tpch.py; decimal-exact aggregates, broadcast dims)."""
    return advanced.tpch_q3(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@_q(
    "tpch_q5",
    f"""
    SELECT n_name,
           {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 adapted to the test schema (operators/tpch.py; decimal-exact aggregates, broadcast dims)."""
    return advanced.tpch_q5(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )


@_q(
    "tpch_q4",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 adapted to the test schema (operators/tpch.py; decimal-exact aggregates, broadcast dims)."""
    return tpch.tpch_q4(_t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem"))


@_q(
    "tpch_q6",
    f"""
    SELECT COALESCE({_dsum('l_extendedprice * l_discount')}, 0.0) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 adapted to the test schema (operators/tpch.py; decimal-exact aggregates, broadcast dims)."""
    return tpch.tpch_q6(_t(spark, sf_dir, "lineitem"))


@_q(
    "tpch_q10",
    f"""
    SELECT c_custkey, c_name, n_name, c_acctbal,
           {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 adapted to the test schema (operators/tpch.py; decimal-exact aggregates, broadcast dims)."""
    return tpch.tpch_q10(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "nation"),
    )


@_q(
    "tpch_q13",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 adapted to the test schema (operators/tpch.py; decimal-exact aggregates, broadcast dims)."""
    return tpch.tpch_q13(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


@_q(
    "tpch_q18",
    f"""
    WITH big AS (
      SELECT l_orderkey, {_dsum('l_quantity')} AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING {_dsum('l_quantity')} > 180.0
    )
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_totalprice, sum_qty
    FROM orders
    JOIN big ON o_orderkey = l_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 adapted to the test schema (operators/tpch.py; decimal-exact aggregates, broadcast dims)."""
    return tpch.tpch_q18(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@_q(
    "tpch_q19",
    f"""
    SELECT COALESCE({_dsum('l_extendedprice * (1 - l_discount)')}, 0.0) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#18' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19 adapted to the test schema (operators/tpch.py; decimal-exact aggregates, broadcast dims)."""
    return tpch.tpch_q19(_t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part"))


@_q(
    "full_outer_join",
    """
    WITH c AS (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer
               GROUP BY c_nationkey),
         s AS (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier
               GROUP BY s_nationkey)
    SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
    """,
)
def q_full_outer_join(spark, sf_dir):
    """Per-nation customer and supplier counts stitched with a FULL OUTER join (both-side nulls coalesced)."""
    return relational.full_outer_join(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")
    )


@_q(
    "cross_join",
    """
    SELECT r_regionkey, r_name, n_nationkey, n_name,
           CAST(n_regionkey = r_regionkey AS INT) AS same_region
    FROM region CROSS JOIN nation
    """,
)
def q_cross_join(spark, sf_dir):
    """Explicit cartesian of two SMALL inputs with a same-region flag (operators/relational.py:cross_join_small)."""
    return relational.cross_join_small(
        _t(spark, sf_dir, "region"), _t(spark, sf_dir, "nation")
    )


@_q(
    "array_funcs",
    """
    WITH per_cust AS (
      SELECT o_custkey,
             list_sort(list(o_orderkey)) AS keys,
             list_sort(list_distinct(list(o_orderpriority))) AS prios
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           len(keys) AS n_orders,
           keys[1] AS first_key,
           keys[len(keys)] AS last_key,
           array_to_string(prios, ',') AS priorities,
           CAST(list_contains(prios, '1-URGENT') AS INT) AS has_urgent,
           len(list_filter(keys, k -> k % 2 = 0)) AS n_even_keys
    FROM per_cust
    """,
)
def q_array_funcs(spark, sf_dir):
    """Array-function battery over per-customer collected arrays:
    sort/distinct/element_at/contains/filter — all JVM collection
    expressions on arrays built by one aggregation."""
    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.array_sort(F.collect_list("o_orderkey")).alias("keys"),
        F.array_sort(F.collect_set("o_orderpriority")).alias("prios"),
    )
    return per_cust.select(
        "o_custkey",
        F.size("keys").alias("n_orders"),
        F.element_at("keys", 1).alias("first_key"),
        F.element_at("keys", -1).alias("last_key"),
        F.concat_ws(",", "prios").alias("priorities"),
        F.array_contains("prios", "1-URGENT").cast("int").alias("has_urgent"),
        F.size(F.filter("keys", lambda k: k % 2 == 0)).alias("n_even_keys"),
    )


@_q(
    "tpch_q7",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name < n2.n_name
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark, sf_dir):
    """Volume shipping between nation pairs (TPC-H Q7 shape): two
    broadcast joins against the same dimension under different keys,
    a cross-nation inequality, per-year rollup."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supplier = _t(spark, sf_dir, "supplier")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("timestamp")).alias("l_year"),
        )
        .agg(dsum(revenue).alias("revenue"))
    )


@_q(
    "tpch_q17",
    f"""
    WITH part_avg AS (
      SELECT l_partkey AS pk,
             {_dsum('l_quantity')} / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT COALESCE({_dsum('l_extendedprice')}, 0.0) / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN part_avg ON pk = l_partkey
    WHERE p_brand = 'Brand#12' AND l_quantity < 0.2 * avg_qty
    """,
)
def q_tpch_q17(spark, sf_dir):
    """Small-quantity-order revenue (TPC-H Q17 shape): the correlated
    per-part average decorrelates into an aggregate + self-join on
    partkey — one extra shuffle of (partkey, avg), not a per-row
    subquery. Exact-decimal average keeps the 0.2·avg boundary
    bit-identical to the oracle."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    part_avg = lineitem.groupBy(F.col("l_partkey").alias("pk")).agg(
        (dsum("l_quantity") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_brand") == "Brand#12")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(part_avg, F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.coalesce(dsum("l_extendedprice"), F.lit(0.0)) / 7.0).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_q(
    "asof_join",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS side
      FROM events WHERE event_type IN ('click', 'purchase')
    ), merged AS (
      SELECT user_id, ts, event_id, side,
             last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
               OVER w AS purchase_event_id,
             last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS)
               OVER w AS purchase_value
      FROM tagged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, side
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id AS click_event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           purchase_event_id, purchase_value
    FROM merged WHERE side = 1
    """,
)
def q_asof_join(spark, sf_dir):
    """Backward as-of join: each click matched to the user's most
    recent preceding purchase (union-merge, one shuffle, no join
    operator — operators/asof.py)."""
    events = _t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    return asof.asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_values={"event_id": "purchase_event_id", "value": "purchase_value"},
    ).select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        "purchase_event_id",
        "purchase_value",
    )


@_q(
    "skew_salted_agg",
    f"""
    SELECT l_suppkey,
           {_dsum('l_extendedprice')} AS value_sum,
           COUNT(*) AS n_rows,
           MIN(l_extendedprice) AS value_min,
           MAX(l_extendedprice) AS value_max
    FROM lineitem GROUP BY l_suppkey
    """,
)
def q_skew_salted_agg(spark, sf_dir):
    """Two-stage salted aggregation (operators/skew.py): bit-identical
    to the plain GROUP BY oracle because partials are exact decimals."""
    return skew.salted_agg(
        _t(spark, sf_dir, "lineitem"), key="l_suppkey", value="l_extendedprice"
    )


@_q(
    "pivot_agg",
    """
    SELECT o_orderpriority,
           COALESCE(CAST(CAST(SUM(CASE WHEN o_orderstatus = 'F'
             THEN CAST(o_totalprice AS DECIMAL(28,8)) END) AS STRING) AS DOUBLE), 0.0)
             AS total_f,
           COALESCE(CAST(CAST(SUM(CASE WHEN o_orderstatus = 'O'
             THEN CAST(o_totalprice AS DECIMAL(28,8)) END) AS STRING) AS DOUBLE), 0.0)
             AS total_o,
           COALESCE(CAST(CAST(SUM(CASE WHEN o_orderstatus = 'P'
             THEN CAST(o_totalprice AS DECIMAL(28,8)) END) AS STRING) AS DOUBLE), 0.0)
             AS total_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_pivot_agg(spark, sf_dir):
    """Pivot on order priority: one row per month, one column per priority, decimal-exact sums."""
    return advanced.pivot_agg(_t(spark, sf_dir, "orders"))


@_q(
    "stats_agg",
    f"""
    WITH sums AS (
      SELECT l_returnflag, COUNT(*) AS n,
             {_dsum('l_extendedprice')} AS sx,
             {_dsum('l_extendedprice * l_extendedprice')} AS sxx,
             {_dsum('l_quantity')} AS sy,
             {_dsum('l_quantity * l_quantity')} AS syy,
             {_dsum('l_extendedprice * l_quantity')} AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           sx / n AS mean_price,
           ROUND((n * sxx - sx * sx) / (n * (n - 1)), 2) AS var_price,
           ROUND(sqrt((n * sxx - sx * sx) / (n * (n - 1))), 4) AS std_price,
           ROUND(((n * sxy - sx * sy) / (n * (n - 1)))
             / sqrt(((n * sxx - sx * sx) / (n * (n - 1)))
                  * ((n * syy - sy * sy) / (n * (n - 1)))), 8) AS corr_price_qty
    FROM sums
    """,
)
def q_stats_agg(spark, sf_dir):
    """Moment statistics per group: stddev/variance/skewness/kurtosis from decimal-exact power sums."""
    # spread: moment computations over the bare fact scan (2.1 s ->
    # 0.87 s at sf0.1 on the single-row-group layout).
    return advanced.stats_agg(_t(spark, sf_dir, "lineitem", spread=True))


@_q(
    "json_funcs",
    """
    SELECT event_id, event_type,
           json_extract_string(props, '$.k') AS k_str,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod10
    FROM events
    """,
)
def q_json_funcs(spark, sf_dir):
    """JSON function battery over the events props column: get_json_object, from_json struct access, schema_of_json semantics."""
    return advanced.json_funcs(_t(spark, sf_dir, "events"))


@_q(
    "date_funcs",
    """
    SELECT o_orderkey,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS quarter_start,
           CAST(isodow(o_orderdate) AS INT) AS iso_dow,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(date_diff('day', o_orderdate, DATE '1998-12-31') AS INT)
             AS days_to_end,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3mo
    FROM orders
    """,
)
def q_date_funcs(spark, sf_dir):
    """Date/time function battery: trunc, extract, datediff, add_months, last_day over order dates."""
    return advanced.date_funcs(_t(spark, sf_dir, "orders"))


@_q(
    "string_funcs",
    """
    SELECT p_partkey,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
           reverse(p_brand) AS brand_rev,
           repeat(p_brand, 2) AS brand_twice,
           translate(p_type, 'aeiou', 'AEIOU') AS type_vowels_up,
           split_part(p_type, ' ', 1) AS type_first_word,
           CAST(strpos(p_name, 'a') AS INT) AS first_a,
           CAST(levenshtein(p_brand, 'Brand#00') AS INT) AS brand_dist,
           left(p_name, 5) AS name5,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_masked
    FROM part
    """,
)
def q_string_funcs(spark, sf_dir):
    """String function battery: split/substring/regexp_extract/levenshtein/soundex over part names."""
    return advanced.string_funcs(_t(spark, sf_dir, "part"))


@_q(
    "percentile_agg",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.5) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75,
           MIN(l_quantity) AS q_min,
           MAX(l_quantity) AS q_max
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentile_agg(spark, sf_dir):
    """Exact percentiles (median/p90) per group via the sort-based percentile aggregate."""
    return advanced.percentile_agg(_t(spark, sf_dir, "lineitem"))


@_q(
    "percentile_approx",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS p50_exact,
           TRUE AS p50_in_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentile_approx(spark, sf_dir):
    """GK-sketch median under an error-bound contract: the oracle
    checks the exact median and that the approx value fell inside the
    exact [p48, p52] envelope — sketch verified, no estimator bits
    compared."""
    return advanced.percentile_approx_agg(_t(spark, sf_dir, "lineitem"))


@_q(
    "grouping_sets",
    f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           {_dsum('l_extendedprice')} AS sum_price,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_grouping_sets(spark, sf_dir):
    """GROUPING SETS aggregation: chosen subtotal combinations with grouping-id disambiguation."""
    # spread: the grouping-set Expand multiplies the scan output, so
    # parallelizing the map side pays (1.12 s -> 0.87 s at sf0.1).
    return advanced.grouping_sets_agg(
        spark, _t(spark, sf_dir, "lineitem", spread=True)
    )


@_q(
    "collect_sorted",
    """
    SELECT n_name,
           array_to_string(list_sort(list_distinct(list(c_mktsegment))), '|')
             AS segments,
           COUNT(DISTINCT c_mktsegment) AS n_segments
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_collect_sorted(spark, sf_dir):
    """Per-group ordered collection (sort_array over collect_list) — deterministic array emission."""
    return advanced.collect_sorted(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation")
    )


@_q(
    "map_funcs",
    """
    WITH per_status AS (
      SELECT o_custkey, o_orderstatus, COUNT(*) AS cnt
      FROM orders GROUP BY o_custkey, o_orderstatus
    )
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderstatus)), ',') AS status_keys,
           array_to_string(list_sort(list(o_orderstatus || ':' || CAST(cnt AS VARCHAR))), ',')
             AS status_counts,
           COALESCE(MAX(CASE WHEN o_orderstatus = 'F' THEN cnt END), 0) AS f_count
    FROM per_status
    GROUP BY o_custkey
    """,
)
def q_map_funcs(spark, sf_dir):
    """Map-typed column battery: build a per-customer status->count map
    (map_from_entries over sorted entries), then map_keys / transform /
    element_at — projected to strings so the oracle compares exact
    text rather than engine-specific map renderings."""
    orders = _t(spark, sf_dir, "orders")
    per_status = orders.groupBy("o_custkey", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    with_map = per_status.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("o_orderstatus", "cnt")))
        ).alias("status_map")
    )
    return with_map.select(
        "o_custkey",
        F.concat_ws(",", F.map_keys("status_map")).alias("status_keys"),
        F.concat_ws(
            ",",
            F.transform(
                F.map_entries("status_map"),
                lambda e: F.concat_ws(
                    ":", e.getField("key"), e.getField("value").cast("string")
                ),
            ),
        ).alias("status_counts"),
        F.coalesce(
            F.element_at(F.col("status_map"), F.lit("F")), F.lit(0)
        ).alias("f_count"),
    )


@_q(
    "unpivot",
    """
    WITH totals AS (
      SELECT o_orderpriority, o_orderstatus,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,8))) AS STRING) AS DOUBLE) AS total
      FROM orders GROUP BY o_orderpriority, o_orderstatus
    ), p AS (SELECT DISTINCT o_orderpriority FROM orders),
       s AS (SELECT unnest(['F','O','P']) AS st)
    SELECT p.o_orderpriority,
           'total_' || lower(s.st) AS status_col,
           COALESCE(t.total, 0.0) AS total
    FROM p CROSS JOIN s
    LEFT JOIN totals t ON t.o_orderpriority = p.o_orderpriority
                      AND t.o_orderstatus = s.st
    """,
)
def q_unpivot(spark, sf_dir):
    """Wide->long reshaping: the pivot result melted back to rows
    (unpivot/melt — the inverse relational reshape)."""
    wide = advanced.pivot_agg(_t(spark, sf_dir, "orders"))
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["total_f", "total_o", "total_p"],
        variableColumnName="status_col",
        valueColumnName="total",
    )


@_q(
    "text_chunking",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ), sized AS (
      SELECT doc_id, t, len(t) AS n,
             CAST(FLOOR((GREATEST(len(t) - 16, 1) + 47) / 48.0) AS BIGINT)
               AS n_chunks
      FROM toks WHERE len(t) >= 1
    ), idx AS (
      SELECT doc_id, t, n,
             unnest(range(0, n_chunks)) AS chunk_idx
      FROM sized
    )
    SELECT doc_id,
           chunk_idx,
           chunk_idx * 48 AS start_tok,
           LEAST(n - chunk_idx * 48, 64) AS n_tokens,
           array_to_string(t[chunk_idx*48 + 1 : chunk_idx*48 + 64], ' ')
             AS chunk_text
    FROM idx
    """,
)
def q_text_chunking(spark, sf_dir):
    """Overlapping token-window chunking at the pre-embedding
    configuration (64-token windows, 16-token overlap, stride 48) —
    same operator as chunk_documents' 32/8 gate entry, certified at a
    second window geometry with exact chunk text."""
    return textops.chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=64, overlap=16
    )


@_q(
    "deterministic_sample",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 2) < '1a'
    """,
)
def q_deterministic_sample(spark, sf_dir):
    """Hash-prefix sampling (~10%): membership is a pure function of
    the key — reproducible across runs/engines and joinable across
    tables, unlike rand()-based sampling."""
    return textops.deterministic_sample(
        _t(spark, sf_dir, "customer"), key="c_custkey"
    ).select("c_custkey", "c_name", "c_mktsegment")


# ===========================================================================
# Dedup family
# ===========================================================================

@_q(
    "exact_dedup",
    """
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_exact_dedup(spark, sf_dir):
    """Deterministic keep-one-per-key dedup on events: the row_number formulation pins the survivor under any partitioning (operators/dedup.py:exact_dedup)."""
    ev = _t(spark, sf_dir, "events")
    out = dedup.exact_dedup(ev, ["user_id", "event_type"], ["ts", "event_id"])
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "value",
    )


@_q(
    "dedup_docs_exact",
    """
    SELECT MIN(doc_id) AS doc_id,
           md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
           COUNT(*) AS dup_count
    FROM documents
    GROUP BY 2
    """,
)
def q_dedup_docs_exact(spark, sf_dir):
    """Exact content dedup over documents: one min-id survivor per canonical md5 fingerprint with duplicate counts (operators/dedup.py:dedup_documents_exact)."""
    return dedup.dedup_documents_exact(_t(spark, sf_dir, "documents"))


@_q(
    "incremental_dedup",
    r"""
    WITH newd AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8),
    exd AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 < 8),
    fpn AS (
      SELECT doc_id,
             md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
      FROM newd
    ),
    fpe AS (
      SELECT DISTINCT
             md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
      FROM exd
    ),
    tn AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS t FROM newd
    ),
    te AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS t FROM exd
    ),
    shn AS (
      SELECT doc_id,
             list_distinct(list_transform(range(0, greatest(len(t)-2, 0)),
                    i -> concat_ws(' ', t[i+1], t[i+2], t[i+3]))) AS shingles
      FROM tn
    ),
    she AS (
      SELECT doc_id,
             list_distinct(list_transform(range(0, greatest(len(t)-2, 0)),
                    i -> concat_ws(' ', t[i+1], t[i+2], t[i+3]))) AS shingles
      FROM te
    ),
    sn AS (SELECT doc_id, unnest(shingles) AS shingle
           FROM shn WHERE len(shingles) > 0),
    se AS (SELECT doc_id, unnest(shingles) AS shingle
           FROM she WHERE len(shingles) > 0),
    szn AS (SELECT doc_id, COUNT(*) AS n_sh FROM sn GROUP BY doc_id),
    sze AS (SELECT doc_id, COUNT(*) AS n_sh FROM se GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_n, b.doc_id AS id_e, COUNT(*) AS n_inter
      FROM sn a JOIN se b ON a.shingle = b.shingle
      GROUP BY 1, 2
    ),
    near AS (
      SELECT DISTINCT id_n AS doc_id
      FROM inter
      JOIN szn ON szn.doc_id = id_n
      JOIN sze ON sze.doc_id = id_e
      WHERE n_inter / (szn.n_sh + sze.n_sh - n_inter) >= 0.6
    ),
    exact AS (
      SELECT DISTINCT doc_id FROM fpn WHERE fp IN (SELECT fp FROM fpe)
    )
    SELECT newd.doc_id,
           COALESCE(e.m, FALSE) AS exact_dup,
           COALESCE(nr.m, FALSE) AS near_dup,
           (NOT COALESCE(e.m, FALSE)) AND (NOT COALESCE(nr.m, FALSE)) AS keep
    FROM newd
    LEFT JOIN (SELECT doc_id, TRUE AS m FROM exact) e USING (doc_id)
    LEFT JOIN (SELECT doc_id, TRUE AS m FROM near) nr USING (doc_id)
    """,
)
def q_incremental_dedup(spark, sf_dir):
    """Dedup a new ingest batch (doc_id%10 >= 8) against the existing
    corpus (doc_id%10 < 8): per new doc, exact-fingerprint and
    cross-corpus near-dup verdicts plus the keep decision
    (operators/dedup.py:incremental_dedup). Cost scales with the
    batch — both checks are new×existing probes, never a corpus
    self-join."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.incremental_dedup(
        docs.filter(F.col("doc_id") % 10 >= 8),
        docs.filter(F.col("doc_id") % 10 < 8),
    )


@_q(
    "ngram_jaccard",
    r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS t FROM documents
    ), shingled AS (
      SELECT doc_id,
             list_distinct(list_transform(range(0, greatest(len(t)-2, 0)),
                    i -> concat_ws(' ', t[i+1], t[i+2], t[i+3]))) AS shingles
      FROM toks
    ), sh AS (
      SELECT doc_id, unnest(shingles) AS shingle
      FROM shingled WHERE len(shingles) > 0
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_id_a, doc_id_b,
           n_inter / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_id_a
    JOIN sizes sb ON sb.doc_id = doc_id_b
    WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    """,
)
def q_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard pairs >= 0.5 via inverted-index shared-shingle join — the exact verification twin of near_dedup (operators/dedup.py:ngram_jaccard_pairs)."""
    return dedup.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"))


@_q(
    "ngram_jaccard_prefix",
    r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS t FROM documents
    ), shingled AS (
      SELECT doc_id,
             list_distinct(list_transform(range(0, greatest(len(t)-2, 0)),
                    i -> concat_ws(' ', t[i+1], t[i+2], t[i+3]))) AS shingles
      FROM toks
    ), sh AS (
      SELECT doc_id, unnest(shingles) AS shingle
      FROM shingled WHERE len(shingles) > 0
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_id_a, doc_id_b,
           n_inter / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_id_a
    JOIN sizes sb ON sb.doc_id = doc_id_b
    WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    """,
)
def q_ngram_jaccard_prefix(spark, sf_dir):
    """Prefix-filtered exact Jaccard pairs (AllPairs/PPJoin candidate
    generation, operators/dedup.py:ngram_jaccard_pairs_prefix). Output
    is identical to `ngram_jaccard` — the prefix filter is lossless —
    so it shares the same DuckDB oracle; what differs is the candidate
    volume at scale (measured in SCALE.md)."""
    return dedup.ngram_jaccard_pairs_prefix(_t(spark, sf_dir, "documents"))


@_q(
    "ngram_jaccard_auto",
    r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS t FROM documents
    ), shingled AS (
      SELECT doc_id,
             list_distinct(list_transform(range(0, greatest(len(t)-2, 0)),
                    i -> concat_ws(' ', t[i+1], t[i+2], t[i+3]))) AS shingles
      FROM toks
    ), sh AS (
      SELECT doc_id, unnest(shingles) AS shingle
      FROM shingled WHERE len(shingles) > 0
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_id_a, doc_id_b,
           n_inter / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_id_a
    JOIN sizes sb ON sb.doc_id = doc_id_b
    WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    """,
)
def q_ngram_jaccard_auto(spark, sf_dir):
    """Exact Jaccard pairs with the STRATEGY CHOSEN FROM CORPUS STATS
    (operators/dedup.py:choose_jaccard_strategy — VERDICT r7 item 4):
    one eager df-table aggregation estimates the inverted join's
    candidate volume (Σ df·(df−1)/2) and its hottest posting list;
    the inverted index runs while candidates fit the shuffle budget,
    prefix filtering beyond it or under posting-list skew. Both twins
    are lossless, so the oracle is the same regardless of which the
    chooser picks — this entry certifies the SEMANTICS are invariant
    under the choice; the chooser's decisions themselves are pinned
    by tests/test_dedup_chooser.py and calibrated in SCALE.md."""
    return dedup.ngram_jaccard_pairs_auto(_t(spark, sf_dir, "documents"))


# Shared CTE chain: positional 8-gram structs -> df cap -> shared-gram
# self-join -> diagonal islands-and-gaps run merge (the
# substring_dup_spans oracle, reused by the apply twin).
_SUBSTRING_SPANS_CTES = r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS t FROM documents
    ), shingled AS (
      SELECT doc_id,
             list_transform(range(0, greatest(len(t) - 7, 0)),
                i -> struct_pack(pos := i,
                                 gram := array_to_string(t[i+1 : i+8], ' '))) AS gs
      FROM toks
    ), sh AS (
      SELECT doc_id, u.pos AS pos, u.gram AS gram
      FROM (SELECT doc_id, unnest(gs) AS u FROM shingled WHERE len(gs) > 0)
    ), kept AS (
      SELECT gram FROM sh GROUP BY gram HAVING COUNT(DISTINCT doc_id) <= 50
    ), shc AS (
      SELECT sh.* FROM sh JOIN kept USING (gram)
    ), m AS (
      SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb,
             a.pos - b.pos AS diag
      FROM shc a JOIN shc b ON a.gram = b.gram AND a.doc_id < b.doc_id
    ), runs AS (
      SELECT da, db, diag, pa, pb,
             pa - ROW_NUMBER() OVER (PARTITION BY da, db, diag ORDER BY pa) AS rid
      FROM m
    ), span_rows AS (
      SELECT da AS doc_id_a, db AS doc_id_b,
             MIN(pa) AS start_a, MIN(pb) AS start_b,
             CAST(COUNT(*) + 7 AS BIGINT) AS span_tokens
      FROM runs GROUP BY da, db, diag, rid
      HAVING COUNT(*) + 7 >= 20
    )
"""


@_q(
    "substring_dup_spans",
    _SUBSTRING_SPANS_CTES
    + """
    SELECT doc_id_a, doc_id_b, start_a, start_b, span_tokens
    FROM span_rows
    """,
)
def q_substring_dup_spans(spark, sf_dir):
    """Maximal exact duplicated token spans (Lee et al. 2022
    suffix-array dedup, re-expressed as positional k-shingles +
    diagonal run merge — operators/dedup.py:substring_dup_spans at the
    registered defaults k=8, min_len=20, max_df=50). The oracle
    replays every stage including the df cap: positional 8-gram
    structs, HAVING count(distinct doc) <= 50, the shared-gram
    self-join, and the islands-and-gaps run id (pos - row_number per
    (pair, diagonal)) — so a wrong cap, a wrong diagonal, or an
    off-by-one in the m + k - 1 span arithmetic all hash-mismatch."""
    return dedup.substring_dup_spans(_t(spark, sf_dir, "documents"))


@_q(
    "winnow_fingerprints",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
    ), grams AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(t) - 3, 0) + 1),
                i -> md5(array_to_string(t[i : i+3], ' '))) AS h
      FROM toks
    ), picks AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(h) - 4, 0) + 1),
               i -> struct_pack(
                 pos := i + len(h[i : i+4])
                        - list_position(list_reverse(h[i : i+4]),
                                        list_min(h[i : i+4])) - 1,
                 fp := list_min(h[i : i+4]))) AS p
      FROM grams
    )
    SELECT DISTINCT doc_id, CAST(u.pos AS BIGINT) AS pos, u.fp AS fp
    FROM (SELECT doc_id, unnest(p) AS u FROM picks WHERE len(p) > 0)
    """,
)
def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken
    2003, the MOSS scheme — operators/textops.py:winnow_fingerprints,
    k=4 w=5): rightmost-minimum md5 per sliding hash window,
    deduplicated. The oracle replays the SELECTION itself (min +
    reversed-list position for the rightmost tie), which is why the
    fingerprints are md5 strings — they order identically in both
    engines, where xxhash64 would not exist on the oracle side. A
    wrong window bound, tie rule, or position offset moves a pick and
    hash-mismatches."""
    from elb_log_to_mysql_spark.operators.textops import winnow_fingerprints

    return winnow_fingerprints(_t(spark, sf_dir, "documents"))


@_q(
    "train_eval_split",
    r"""
    WITH banded AS (
      SELECT doc_id, source,
             CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|split1'),
                                      1, 3) AS INTEGER) AS INT) AS band
      FROM documents
    )
    SELECT doc_id, source,
           CASE WHEN band < 41 THEN 'eval'
                WHEN band < 82 THEN 'test'
                ELSE 'train' END AS split
    FROM banded
    """,
)
def q_train_eval_split(spark, sf_dir):
    """Deterministic hash-band train/eval/test split (operators/
    pipeline.py:train_eval_split): the first 3 md5 hex chars define
    4096 bands, 41 each to eval/test (~1%), rest train. Integer band
    arithmetic, so the oracle replay is exact; the assignment is a
    pure function of (doc_id, salt) — reproducible and join-free
    consistent across tables sharing the key."""
    from elb_log_to_mysql_spark.operators.pipeline import train_eval_split

    return train_eval_split(
        _t(spark, sf_dir, "documents").select("doc_id", "source"), "doc_id"
    )


@_q(
    "contamination_frac",
    r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS t FROM documents
    ), g AS (
      SELECT doc_id,
             list_distinct(list_transform(range(0, greatest(len(t)-4, 0)),
                    i -> array_to_string(t[i+1 : i+5], ' '))) AS grams
      FROM toks
    ), bench AS (
      SELECT list(DISTINCT gram) AS b
      FROM (SELECT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0)
    ), scored AS (
      SELECT doc_id,
             CAST(len(grams) AS BIGINT) AS n_grams,
             CAST(COALESCE(len(list_intersect(grams, b)), 0) AS BIGINT) AS n_hit
      FROM g, bench WHERE doc_id % 97 <> 0
    )
    SELECT doc_id, n_grams, n_hit,
           CASE WHEN n_grams > 0
                THEN CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE)
                ELSE 0.0 END AS contamination_frac,
           (CASE WHEN n_grams > 0
                 THEN CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE)
                 ELSE 0.0 END) <= 0.05 AS keep
    FROM scored
    """,
)
def q_contamination_frac(spark, sf_dir):
    """Fraction-based decontamination scoring (operators/pipeline.py:
    contamination_score): distinct 5-gram overlap fraction of every
    training doc against the broadcast benchmark gram set, keep =
    frac <= 0.05 — the production-grade refinement of the binary
    any-overlap rule. The fraction is one IEEE double division of two
    int counts, so the oracle replay is bit-exact."""
    from elb_log_to_mysql_spark.operators.pipeline import contamination_score

    return contamination_score(_t(spark, sf_dir, "documents"))


@_q(
    "substring_dedup_apply",
    _SUBSTRING_SPANS_CTES
    + """
    , cuts AS (
      SELECT doc_id_b AS doc_id,
             list(struct_pack(st := start_b, ln := span_tokens)) AS cuts
      FROM span_rows GROUP BY doc_id_b
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens_before,
           CAST(len(kept) AS BIGINT) AS n_tokens_after,
           COALESCE(array_to_string(kept, ' '), '') AS clean_text
    FROM (
      SELECT toks.doc_id, t,
             list_filter(
               list_transform(range(0, len(t)),
                 i -> CASE WHEN c.cuts IS NOT NULL AND len(list_filter(
                             c.cuts, s -> i >= s.st AND i < s.st + s.ln)) > 0
                      THEN NULL ELSE t[i+1] END),
               x -> x IS NOT NULL) AS kept
      FROM toks LEFT JOIN cuts c ON toks.doc_id = c.doc_id
    )
    """,
)
def q_substring_dedup_apply(spark, sf_dir):
    """The second half of suffix-array dedup (Lee et al. 2022): CUT
    every duplicated span from the later (higher-id) document and
    rebuild its text (operators/dedup.py:substring_dedup_apply). The
    oracle re-derives the span set through the shared CTE chain and
    replays the cut itself — per-token coverage against the doc's
    span list, earliest-document-keeps — so a wrong victim side, an
    off-by-one span boundary, or a missed overlapping-span union all
    change clean_text and hash-mismatch."""
    return dedup.substring_dedup_apply(_t(spark, sf_dir, "documents"))


@_q(
    "near_dedup",
    r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS t FROM documents
    ), shingled AS (
      SELECT doc_id,
             list_distinct(list_transform(range(0, greatest(len(t)-2, 0)),
                    i -> concat_ws(' ', t[i+1], t[i+2], t[i+3]))) AS shingles
      FROM toks
    ), sh AS (
      SELECT doc_id, unnest(shingles) AS shingle
      FROM shingled WHERE len(shingles) > 0
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(0 AS BIGINT) AS false_pairs,
           TRUE AS recall_floor_met
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_id_a
    JOIN sizes sb ON sb.doc_id = doc_id_b
    WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.6
    """,
)
def q_near_dedup(spark, sf_dir):
    """MinHash-LSH near-dup audit against the EXACT Jaccard pair set.

    Three driver-checked values: `n_exact` (the oracle recomputes the
    exact threshold-0.6 pair count independently in DuckDB — a full
    value check of the shingling/Jaccard ground truth), `false_pairs`
    (must be exactly 0: LSH only generates candidates, every candidate
    is verified with exact Jaccard, so precision is STRUCTURAL), and a
    0.9 recall floor. Recall is asserted as a floor, not set equality:
    with 64 hashes / 16 bands the collision probability for a pair at
    exactly j=0.6 is ~0.89 (1-(1-0.6^4)^16), so total recall is an
    empirical property of the corpus (measured 1.0 at sf0.001/sf0.01 —
    the qualifying pairs are all high-j); a regenerated corpus with a
    borderline pair must not fail the gate when the operator behaves
    as designed."""
    docs = _t(spark, sf_dir, "documents")
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.6)
    found = dedup.near_dedup_minhash(docs)
    out = _near_dedup_audit(exact, found)
    # Keep both operators' shingle caches alive until this derived
    # audit plan executes (unpersist_on_gc parents would otherwise be
    # released at plan-build time).
    return carry_caches(out, exact, found)


def _overlap_materialize(df):
    """Materialize `df` (noop sink) on a driver thread and return the
    thread (guide §2.6: overlap independent jobs).

    The stream audit entries run a BLOCKING bounded stream whose
    stateful stages cannot use every core; the exact-Jaccard ground
    truth is an independent batch leg, so materializing it
    concurrently hides its wall under the stream's. Callers persist
    `df` first so the audit reuses the materialized result instead of
    recomputing. Failures are swallowed: the overlap is an
    optimization only — the audit plan still computes `df` lazily if
    the warm-up died (the persist makes that a recompute, never a
    wrong answer)."""
    import threading

    def _run():
        try:
            df.write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    t = threading.Thread(target=_run, daemon=True)
    t.start()
    return t


def _near_dedup_audit(exact, found):
    """The near-dedup family's shared audit frame: `n_exact` (the
    oracle recomputes it independently), `false_pairs` (must be 0 —
    precision is structural), and the 0.9 recall floor. ONE
    definition, reused by `near_dedup`, `stream_near_dedup`, and
    `stream_near_dedup_join` (all three share
    ORACLE_SQL["near_dedup"]), so a change to the audit contract can
    never silently diverge between the batch and stream entries."""
    # ONE pass over `found` (r15, guide §2.4): the former left-join +
    # separate found-count formulation consumed the found pipeline in
    # two plan branches; the full-outer join derives n_exact / n_hit /
    # n_found from the same joined rows (both pair sets are unique by
    # construction, so the join is 1:1 and the sums are exact counts).
    # Values and dtypes are identical to the two-branch form (verified
    # cell-equal at sf0.1 before adoption).
    e = F.coalesce("e", F.lit(0))
    f = F.coalesce("f", F.lit(0))
    joined = exact.select("doc_id_a", "doc_id_b", F.lit(1).alias("e")).join(
        found.select("doc_id_a", "doc_id_b", F.lit(1).alias("f")),
        ["doc_id_a", "doc_id_b"],
        "full_outer",
    )
    # The outer coalesce covers the EMPTY-join edge (r16, VERDICT r15
    # item 4): sum() over zero rows is NULL, and the pre-r15 two-branch
    # form used count(*) — 0 on empty inputs, recall_floor_met true. A
    # corpus with no near-dup pairs at all must reproduce that row
    # (n_exact=0, false_pairs=0, recall_floor_met=true), not NULLs.
    n_exact = F.coalesce(F.sum(e), F.lit(0))
    n_hit = F.coalesce(F.sum(e * f), F.lit(0))
    return joined.agg(
        n_exact.alias("n_exact"),
        F.coalesce(F.sum(f * (F.lit(1) - e)), F.lit(0)).alias("false_pairs"),
        ((n_exact == 0) | (n_hit >= F.lit(0.9) * n_exact)).alias(
            "recall_floor_met"
        ),
    )


ORACLE_SQL["near_dedup_two_phase"] = ORACLE_SQL["near_dedup"].replace(
    "TRUE AS recall_floor_met",
    "TRUE AS recall_floor_met,\n           TRUE AS same_as_single_shot,"
    "\n           TRUE AS recovery_restores_cap",
)


@_q("near_dedup_two_phase")
def q_near_dedup_two_phase(spark, sf_dir):
    """The spill-friendly two-phase near-dedup (VERDICT r13 item 5;
    operators/dedup.py:near_dedup_minhash_two_phase) certified
    equivalent to the single-shot operator AND against the exact
    ground truth. Phase 1 writes the banded candidate id pairs to
    slice-partitioned zstd parquet; phase 2 verifies per slice in
    bounded jobs — the design that turns the 640x single-shuffle
    transient (> free disk, SCALE.md round-13) into n_slices bounded
    transients. Audited values: the near_dedup family contract
    (n_exact recomputed by the oracle, structural false_pairs=0, 0.9
    recall floor) plus `same_as_single_shot` — the two-phase pair set
    must equal near_dedup_minhash's exactly (same bands, same skew
    cap, same Jaccard arithmetic; only the execution schedule
    differs). Eager by design (a materializing pipeline over a /tmp
    workdir) — the entry certifies semantics at gate SF; the 640x
    execution evidence lives in SCALE.md.

    Round 15 adds `recovery_restores_cap` (VERDICT r14 item 3): the
    pipeline runs AGAIN with max_bucket=1 — the degenerate worst case
    where the skew cap drops EVERY pair-bearing bucket — and
    recover_max_bucket=1000, asserting the dedicated bounded recovery
    path alone reproduces the default-cap pair set exactly (the
    first-processed-collision ownership makes main+recovery a
    partition of one pair set, so this is equality, not a floor) with
    nothing left in the dropped accounting."""
    import tempfile

    docs = _t(spark, sf_dir, "documents")
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.6)
    single = dedup.near_dedup_minhash(docs)
    with tempfile.TemporaryDirectory(prefix="nd2p_") as work:
        found, _stats = dedup.near_dedup_minhash_two_phase(
            docs, os.path.join(work, "plain"), n_slices=4
        )
        recovered, rec_stats = dedup.near_dedup_minhash_two_phase(
            docs,
            os.path.join(work, "rec"),
            n_slices=4,
            max_bucket=1,
            recover_max_bucket=1000,
        )
        audit = _near_dedup_audit(exact, found)
        sym_diff = (
            found.select("doc_id_a", "doc_id_b")
            .join(
                single.select("doc_id_a", "doc_id_b"),
                ["doc_id_a", "doc_id_b"],
                "full_outer",
            )
            .agg(F.count(F.lit(1)).alias("n_union"))
        )
        rec_diff = (
            recovered.select("doc_id_a", "doc_id_b")
            .join(
                found.select("doc_id_a", "doc_id_b"),
                ["doc_id_a", "doc_id_b"],
                "full_outer",
            )
            .agg(F.count(F.lit(1)).alias("n_runion"))
        )
        n_single = single.agg(F.count(F.lit(1)).alias("n_single"))
        n_found = found.agg(F.count(F.lit(1)).alias("n_found"))
        out = (
            audit.crossJoin(F.broadcast(sym_diff))
            .crossJoin(F.broadcast(rec_diff))
            .crossJoin(F.broadcast(n_single))
            .crossJoin(F.broadcast(n_found))
            .select(
                "n_exact",
                "false_pairs",
                "recall_floor_met",
                (
                    (F.col("n_union") == F.col("n_single"))
                    & (F.col("n_union") == F.col("n_found"))
                ).alias("same_as_single_shot"),
                (
                    (F.col("n_runion") == F.col("n_found"))
                    & F.lit(rec_stats["dropped_buckets"] == 0)
                ).alias("recovery_restores_cap"),
            )
        )
        # materialize before the TemporaryDirectory vanishes (the
        # result frame reads the verified-pair parquet inside it)
        rows = out.collect()
    return spark.createDataFrame(rows, out.schema)


@_q(
    "simhash_pairs",
    r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS t FROM documents
    ), shingled AS (
      SELECT doc_id,
             list_distinct(list_transform(range(0, greatest(len(t)-2, 0)),
                    i -> concat_ws(' ', t[i+1], t[i+2], t[i+3]))) AS shingles
      FROM toks
    ), sh AS (
      SELECT doc_id, unnest(shingles) AS shingle
      FROM shingled WHERE len(shingles) > 0
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, TRUE AS recall_floor_met
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_id_a
    JOIN sizes sb ON sb.doc_id = doc_id_b
    WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.9
    """,
)
def q_simhash_pairs(spark, sf_dir):
    """SimHash recall audit: near-identical pairs (exact 3-gram
    Jaccard >= 0.9, the similarity regime SimHash targets) must be
    captured at >= 0.9 recall by Hamming <= 6 blocking. The oracle
    recomputes n_exact independently (exact value check) and pins the
    floor; measured recall is 0.96/1.00 at sf0.001/sf0.01 — the floor
    has regeneration margin. SimHash itself is not SQL-expressible
    (xxhash64 fingerprints), so the audit verifies the property that
    matters: the sketch does not drop near-identical duplicates."""
    docs = _t(spark, sf_dir, "documents")
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.9)
    found = dedup.simhash_near_pairs(docs, max_hamming=6)
    joined = exact.select("doc_id_a", "doc_id_b").join(
        found.select("doc_id_a", "doc_id_b", F.lit(1).alias("f")),
        ["doc_id_a", "doc_id_b"],
        "left",
    )
    out = joined.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.sum(F.coalesce("f", F.lit(0))).alias("n_hit"),
    ).select(
        F.col("n_exact"),
        (
            (F.col("n_exact") == 0)
            | (F.col("n_hit") >= F.lit(0.9) * F.col("n_exact"))
        ).alias("recall_floor_met"),
    )
    # Pin the operators' GC-scoped caches to the derived audit plan.
    return carry_caches(out, exact, found)


# ===========================================================================
# Similarity search
# ===========================================================================

@_q(
    "similarity_topk",
    """
    SELECT query_id, neighbor_id, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      WHERE q.vec_id < 20
    ) WHERE rank <= 10
    """,
)
def q_similarity_topk(spark, sf_dir):
    """Brute-force cosine top-k: broadcast query block against the corpus, exact ranking — the ANN baseline (operators/similarity.py:similarity_topk_bruteforce)."""
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.similarity_topk_bruteforce(
        emb, emb.filter(F.col("vec_id") < 20), k=10
    )
    return out.select("query_id", "neighbor_id", "rank")


_ANN_RECALL_ORACLE = """
    WITH topk AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      WHERE q.vec_id < 20
    )
    SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           TRUE AS recall_floor_met
    FROM topk WHERE rank <= 10
"""


def _ann_recall_audit(exact, approx, floor: float):
    """Corpus-level ANN recall audit: exact top-k set size (oracle
    recomputes it independently in DuckDB) + a recall floor the
    approximate result must meet. Both inputs are (query_id,
    neighbor_id) sets; the join and aggregation stay in one plan —
    no driver-side set math."""
    joined = exact.join(
        approx.select("query_id", "neighbor_id", F.lit(1).alias("f")),
        ["query_id", "neighbor_id"],
        "left",
    )
    return joined.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_exact"),
        F.sum(F.coalesce("f", F.lit(0))).alias("n_hit"),
    ).select(
        "n_queries",
        "n_exact",
        (
            (F.col("n_exact") == 0)
            | (F.col("n_hit") >= F.lit(floor) * F.col("n_exact"))
        ).alias("recall_floor_met"),
    )


@_q("similarity_topk_lsh", _ANN_RECALL_ORACLE)
def q_similarity_topk_lsh(spark, sf_dir):
    """Hyperplane-LSH ANN recall audit vs the brute-force exact top-k
    (which is itself value-checked against DuckDB under the
    `similarity_topk` key). The 3-plane × 24-table config has measured
    recall 1.0 at sf0.001 and sf0.01; the driver-checked floor is 0.95,
    leaving regeneration margin. n_queries and n_exact are exact value
    checks (the oracle recomputes the ground-truth neighbor set)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    exact = similarity.similarity_topk_bruteforce(emb, q, k=10)
    approx = similarity.similarity_topk_lsh(
        emb, q, k=10, n_planes=3, n_tables=24
    )
    out = _ann_recall_audit(
        exact.select("query_id", "neighbor_id"), approx, floor=0.95
    )
    return carry_caches(out, exact, approx)


@_q(
    "embedding_near_dup",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
    """,
)
def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, exact twin. The 0.45
    threshold has >5e-4 margin to the nearest pair at sf0.01, so
    float32 (DuckDB) vs double (Spark) accumulation cannot flip
    membership."""
    return similarity.embedding_near_dup(
        _t(spark, sf_dir, "embeddings"), threshold=0.45
    )


_IVF_CENTROIDS: dict[str, object] = {}


@_q("similarity_topk_ivf", _ANN_RECALL_ORACLE)
def q_similarity_topk_ivf(spark, sf_dir):
    """IVF ANN recall audit vs the brute-force exact top-k. The
    quantizer is trained ONCE per corpus (offline in production;
    memoized here) — the query path itself is pure plan construction:
    no driver-side action, no ML job. nprobe=12 of 16 cells has
    measured recall 0.985 at both sf0.001 and sf0.01 (min 9/10 hits
    per query); the driver-checked floor is 0.95."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    if sf_dir not in _IVF_CENTROIDS:
        _IVF_CENTROIDS[sf_dir] = similarity.train_ivf_centroids(emb)
    exact = similarity.similarity_topk_bruteforce(emb, q, k=10)
    approx = similarity.similarity_topk_ivf(
        emb, q, k=10, nprobe=12, centroids=_IVF_CENTROIDS[sf_dir]
    )
    out = _ann_recall_audit(
        exact.select("query_id", "neighbor_id"), approx, floor=0.95
    )
    return carry_caches(out, exact, approx)


_PQ_CODEBOOKS: dict[str, object] = {}


@_q("similarity_topk_pq", _ANN_RECALL_ORACLE)
def q_similarity_topk_pq(spark, sf_dir):
    """Product-quantization ANN recall audit vs the brute-force exact
    top-k. Codebooks are trained ONCE per corpus (offline in
    production; memoized here); the search scans 16-byte PQ codes with
    a per-query asymmetric-distance LUT (JVM-side m-element fold),
    fetches raw vectors only for the top k*4 ADC candidates, and
    reranks by exact cosine — the 16x-compression memory path for
    corpus-scale ANN (operators/similarity.py:similarity_topk_pq).
    Measured recall 1.0 at sf0.001 and 0.995 at sf0.01; the
    driver-checked floor is 0.95."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    if sf_dir not in _PQ_CODEBOOKS:
        _PQ_CODEBOOKS[sf_dir] = similarity.train_pq_codebooks(emb)
    exact = similarity.similarity_topk_bruteforce(emb, q, k=10)
    approx = similarity.similarity_topk_pq(
        emb, q, k=10, codebooks=_PQ_CODEBOOKS[sf_dir]
    )
    out = _ann_recall_audit(
        exact.select("query_id", "neighbor_id"), approx, floor=0.95
    )
    return carry_caches(out, exact, approx)


@_q("similarity_topk_ivfpq", _ANN_RECALL_ORACLE)
def q_similarity_topk_ivfpq(spark, sf_dir):
    """IVF+PQ composed (the FAISS-IVFADC serving shape as a DataFrame
    plan): probe 12 of 16 IVF cells per query, rank the in-cell
    candidates by asymmetric distance over 16-byte PQ codes (no
    raw-vector reads in the scan), fetch + exact-cosine-rerank only
    the top k*4 — sublinear AND compressed
    (operators/similarity.py:similarity_topk_ivfpq). Both index
    artifacts (coarse centroids, PQ codebooks) are offline/memoized;
    the query path is pure plan construction. Measured recall 0.985
    at sf0.001 and 0.98 at sf0.01 — cell-probe-bound, identical to
    IVF alone, so the PQ+rerank stage is lossless here; the
    driver-checked floor is 0.95."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    if sf_dir not in _IVF_CENTROIDS:
        _IVF_CENTROIDS[sf_dir] = similarity.train_ivf_centroids(emb)
    if sf_dir not in _PQ_CODEBOOKS:
        _PQ_CODEBOOKS[sf_dir] = similarity.train_pq_codebooks(emb)
    exact = similarity.similarity_topk_bruteforce(emb, q, k=10)
    approx = similarity.similarity_topk_ivfpq(
        emb,
        q,
        k=10,
        nprobe=12,
        centroids=_IVF_CENTROIDS[sf_dir],
        codebooks=_PQ_CODEBOOKS[sf_dir],
    )
    out = _ann_recall_audit(
        exact.select("query_id", "neighbor_id"), approx, floor=0.95
    )
    return carry_caches(out, exact, approx)


_ANN_DENSE_ORACLE = """
    WITH dense AS (
      SELECT e.vec_id * 100 + (c.copy * 37) % 80 AS vec_id,
             list_transform(e.embedding, x -> x + c.copy * 0.0001)
               AS embedding
      FROM embeddings e, (SELECT unnest(range(80)) AS copy) c
    ), topk AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id) AS rank
      FROM dense q JOIN dense c ON q.vec_id != c.vec_id
      WHERE q.vec_id % 100 = 0 AND q.vec_id < 2000
    )
    SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           TRUE AS recall_floor_met
    FROM topk WHERE rank <= 10
"""


@_q("ann_rerank_auto", _ANN_DENSE_ORACLE)
def q_ann_rerank_auto(spark, sf_dir):
    """Near-dup-aware exact-rerank depth, the 320x-probe law as a gate
    entry (SCALE.md round-12; operators/similarity.py:
    derive_pq_rerank_factor). The corpus is the embeddings table made
    DELIBERATELY duplicate-dense in-plan: 80 copies per vector, each
    shifted by copy*1e-4 per element — far below the PQ quantization
    cell size, so every clone cluster shares one code word and ADC
    ties 80 wide, while exact cosines stay distinct; copy ids are
    permuted (x37 mod 80) so id order is decorrelated from proximity.
    At the frozen default depth 4 the shortlist (k*4=40) cannot cover
    an 80-wide tie cluster; rerank_factor=None derives the depth from
    the measured max code multiplicity and the shortlist covers the
    cluster, so the audit's 0.95 floor holds. The oracle recomputes
    the exact neighbor-set counts over the SAME constructed corpus in
    DuckDB. Codebooks are the BASE corpus's memoized artifacts — the
    production shape, where the index is trained before the dup-flood
    arrives."""
    emb = _t(spark, sf_dir, "embeddings")
    copies = spark.range(80).select(F.col("id").cast("int").alias("copy"))
    dense = emb.crossJoin(F.broadcast(copies)).select(
        (F.col("vec_id") * 100 + (F.col("copy") * 37) % 80).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x + F.col("copy") * F.lit(1e-4)
        ).alias("embedding"),
    )
    q = dense.filter(
        ((F.col("vec_id") % 100) == 0) & (F.col("vec_id") < 2000)
    )
    if sf_dir not in _PQ_CODEBOOKS:
        _PQ_CODEBOOKS[sf_dir] = similarity.train_pq_codebooks(emb)
    exact = similarity.similarity_topk_bruteforce(dense, q, k=10)
    approx = similarity.similarity_topk_pq(
        dense, q, k=10, rerank_factor=None, codebooks=_PQ_CODEBOOKS[sf_dir]
    )
    out = _ann_recall_audit(
        exact.select("query_id", "neighbor_id"), approx, floor=0.95
    )
    return carry_caches(out, exact, approx)


_ANN_NOISY_ORACLE = """
    WITH dense AS (
      SELECT e.vec_id * 100 + (c.copy * 37) % 100 AS vec_id,
             list_transform(range(1, len(e.embedding) + 1),
               i -> e.embedding[i]
                    + 0.05 * ((hash(e.vec_id, c.copy, i) % 2048) / 1024.0
                              - 1.0)) AS embedding
      FROM embeddings e, (SELECT unnest(range(100)) AS copy) c
    ), topk AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id) AS rank
      FROM dense q JOIN dense c ON q.vec_id != c.vec_id
      WHERE q.vec_id % 100 = 0 AND q.vec_id < 2000
    )
    SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           TRUE AS recall_floor_met,
           TRUE AS band_required,
           TRUE AS cut_active,
           FALSE AS cap_hit
    FROM topk WHERE rank <= 10
"""


@_q("ann_band_auto", _ANN_NOISY_ORACLE)
def q_ann_band_auto(spark, sf_dir):
    """The adaptive ADC cut as a gate entry — the NOISY twin of
    ann_rerank_auto (SCALE.md round-13/14; operators/similarity.py:
    _shortlist_rerank — since round 14 the two-phase per-candidate
    lower/upper-bound cut, unconditionally sound, replacing the
    round-13 global-p99 band; same derived-default entry point,
    rerank_factor=None). The corpus is
    the embeddings table made noisy-duplicate-dense in-plan: 100
    copies per vector, each element shifted by a hash-derived
    pseudo-random offset in ±0.05 (xxhash64 of (vec_id, copy,
    element) — deterministic, large enough to cross PQ quantization
    cells). Copies therefore quantize to DIFFERENT code sequences, so
    max code multiplicity stays tiny and the multiplicity-derived
    depth sits at its floor — the regime where ann_rerank_auto's
    exact-tie statistic is blind — while ADC still cannot rank within
    a cluster (quantization error >> intra-cluster rank gaps;
    measured recall 0.66 at the fixed floor depth). The audit gates
    BOTH properties: `recall_floor_met` — the banded default
    (rerank_factor=None) keeps the 0.95 floor — and `band_required` —
    the fixed floor depth WITHOUT the band measurably fails it, so
    the entry certifies the band is necessary, not merely harmless.
    `band_required` is a DELIBERATE tripwire (kept asserted after
    ADVICE r13 flagged the trade): if a codebook-training or
    noise-construction change ever lets the fixed floor depth pass,
    the necessity evidence this entry certifies is stale and MUST be
    re-measured — a loud gate failure prompting re-certification is
    preferred over silently carrying an unsupported necessity claim.
    Round 14 adds the admission telemetry (VERDICT r13 item 2):
    `cut_active` — the adaptive cut admitted candidates beyond the
    depth floor on this corpus (it must, or the recall pass would be
    depth's doing and band_required contradicted) — and `cap_hit` —
    no query's cut was truncated by the k*cap safety valve (if it
    ever trips, recall is at risk and the corpus needs dedup first).
    The oracle mirrors the construction with DuckDB's hash() (counts
    are construction-invariant: 20 queries x top-10 over a >=11-row
    corpus) and recomputes the exact neighbor-set counts. Codebooks
    are the BASE corpus's memoized artifacts — the production shape,
    where the index is trained before the noisy dup-flood arrives."""
    emb = _t(spark, sf_dir, "embeddings")
    copies = spark.range(100).select(F.col("id").cast("int").alias("copy"))
    dense = emb.crossJoin(F.broadcast(copies)).select(
        (F.col("vec_id") * 100 + (F.col("copy") * 37) % 100).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            + F.lit(0.05)
            * (
                F.pmod(
                    F.xxhash64(F.col("vec_id"), F.col("copy"), i),
                    F.lit(2048),
                )
                / F.lit(1024.0)
                - F.lit(1.0)
            ),
        ).alias("embedding"),
    )
    q = dense.filter(
        ((F.col("vec_id") % 100) == 0) & (F.col("vec_id") < 2000)
    )
    if sf_dir not in _PQ_CODEBOOKS:
        _PQ_CODEBOOKS[sf_dir] = similarity.train_pq_codebooks(emb)
    cb = _PQ_CODEBOOKS[sf_dir]
    exact = similarity.similarity_topk_bruteforce(dense, q, k=10)
    banded, adm = similarity.similarity_topk_pq(
        dense, q, k=10, rerank_factor=None, codebooks=cb, with_stats=True
    )
    fixed = similarity.similarity_topk_pq(
        dense, q, k=10, rerank_factor=4, codebooks=cb
    )
    exact_ids = exact.select("query_id", "neighbor_id")
    floor_row = _ann_recall_audit(exact_ids, banded, floor=0.95)
    fixed_row = _ann_recall_audit(exact_ids, fixed, floor=0.95).select(
        (~F.col("recall_floor_met")).alias("band_required")
    )
    adm_row = adm.agg(
        (F.sum("cut_admitted") > 0).alias("cut_active"),
        (F.sum("cap_dropped") > 0).alias("cap_hit"),
    )
    out = floor_row.crossJoin(F.broadcast(fixed_row)).crossJoin(
        F.broadcast(adm_row)
    )
    return carry_caches(out, exact, banded, fixed)


_IVF_CENTROIDS_NORM: dict[str, object] = {}

_ANN_SCATTER_ORACLE = """
    WITH dense AS (
      SELECT e.vec_id * 100 + (c.copy * 37) % 100 AS vec_id,
             list_transform(range(1, len(e.embedding) + 1),
               i -> e.embedding[i]
                    + 0.90 * ((hash(e.vec_id, c.copy, i) % 2048) / 1024.0
                              - 1.0)) AS embedding
      FROM embeddings e, (SELECT unnest(range(100)) AS copy) c
    ), topk AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id) AS rank
      FROM dense q JOIN dense c ON q.vec_id != c.vec_id
      WHERE q.vec_id % 100 = 0 AND q.vec_id < 2000
    )
    SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           TRUE AS recall_floor_met,
           TRUE AS nprobe_auto_required
    FROM topk WHERE rank <= 10
"""


@_q("ann_nprobe_auto", _ANN_SCATTER_ORACLE)
def q_ann_nprobe_auto(spark, sf_dir):
    """Derived nprobe as a gate entry (VERDICT r13 item 3 — nprobe was
    the last fixed ANN search constant). The corpus is the embeddings
    table made SCATTER-dense in-plan: 100 copies per vector with
    hash-derived offsets in ±0.90 per element — large enough that the
    copies of one base vector land across MANY IVF cells (unlike
    ann_band_auto's ±0.05, which stays within a cell), so each query's
    true top-10 is spread over the cell partition and any fixed nprobe
    below n_centroids structurally loses whichever cells it skipped.
    The audit gates BOTH properties: `recall_floor_met` — the derived
    probe set (operators/similarity.py:similarity_topk_ivf_auto — the
    triangle-inequality cell prune, whose coverage is provable, so the
    measured recall is 1.0 by construction and the 0.95 floor is pure
    regeneration margin) — and `nprobe_auto_required` — the certified
    fixed config (nprobe=12 of 16, the similarity_topk_ivf gate
    default) measurably fails the same floor on this corpus, so the
    derivation is necessary, not merely harmless. The oracle mirrors
    the construction in DuckDB (counts are construction-invariant)
    and recomputes the exact neighbor-set counts. Coarse centroids
    are trained on the BASE corpus (memoized; normalized space for
    the derived path, raw for the fixed path — each operator's own
    index contract), the production shape where the index predates
    the flood."""
    emb = _t(spark, sf_dir, "embeddings")
    copies = spark.range(100).select(F.col("id").cast("int").alias("copy"))
    dense = emb.crossJoin(F.broadcast(copies)).select(
        (F.col("vec_id") * 100 + (F.col("copy") * 37) % 100).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            + F.lit(0.90)
            * (
                F.pmod(
                    F.xxhash64(F.col("vec_id"), F.col("copy"), i),
                    F.lit(2048),
                )
                / F.lit(1024.0)
                - F.lit(1.0)
            ),
        ).alias("embedding"),
    )
    q = dense.filter(
        ((F.col("vec_id") % 100) == 0) & (F.col("vec_id") < 2000)
    )
    if sf_dir not in _IVF_CENTROIDS:
        _IVF_CENTROIDS[sf_dir] = similarity.train_ivf_centroids(emb)
    if sf_dir not in _IVF_CENTROIDS_NORM:
        from elb_log_to_mysql_spark.functions.vectorops import with_unit_norm

        _IVF_CENTROIDS_NORM[sf_dir] = similarity.train_ivf_centroids(
            with_unit_norm(emb.select(F.col("embedding").alias("_v")), "_v"),
            vec_col="_nv",
        )
    exact = similarity.similarity_topk_bruteforce(dense, q, k=10)
    derived = similarity.similarity_topk_ivf_auto(
        dense, q, k=10, centroids=_IVF_CENTROIDS_NORM[sf_dir]
    )
    fixed = similarity.similarity_topk_ivf(
        dense, q, k=10, nprobe=12, centroids=_IVF_CENTROIDS[sf_dir]
    )
    exact_ids = exact.select("query_id", "neighbor_id")
    floor_row = _ann_recall_audit(exact_ids, derived, floor=0.95)
    fixed_row = _ann_recall_audit(exact_ids, fixed, floor=0.95).select(
        (~F.col("recall_floor_met")).alias("nprobe_auto_required")
    )
    out = floor_row.crossJoin(F.broadcast(fixed_row))
    return carry_caches(out, exact, derived, fixed)


def _dense_corpus_25(spark, emb, jitter: float = 0.05):
    """Cluster-dense ANN corpus: 25 noisy copies per base vector
    (hash-deterministic +-jitter; 0.05 -> theta ~ 19deg clusters, the
    LSH geometry; 0.02 -> ~8deg, tight enough for the IVF prune's
    phase-1 bound to bite) — mirrored verbatim in the DuckDB oracles
    (ann_lsh_auto, ann_index_persist)."""
    copies = spark.range(25).select(F.col("id").cast("int").alias("copy"))
    return emb.crossJoin(F.broadcast(copies)).select(
        (F.col("vec_id") * 25 + (F.col("copy") * 7) % 25).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            + F.lit(jitter)
            * (
                F.pmod(
                    F.xxhash64(F.col("vec_id"), F.col("copy"), i),
                    F.lit(2048),
                )
                / F.lit(1024.0)
                - F.lit(1.0)
            ),
        ).alias("embedding"),
    )


_ANN_LSH_AUTO_ORACLE = """
    WITH dense AS (
      SELECT e.vec_id * 25 + (c.copy * 7) % 25 AS vec_id,
             list_transform(range(1, len(e.embedding) + 1),
               i -> e.embedding[i]
                    + 0.05 * ((hash(e.vec_id, c.copy, i) % 2048) / 1024.0
                              - 1.0)) AS embedding
      FROM embeddings e, (SELECT unnest(range(25)) AS copy) c
    ), topk AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id) AS rank
      FROM dense q JOIN dense c ON q.vec_id != c.vec_id
      WHERE q.vec_id % 25 = 0 AND q.vec_id < 500
    )
    SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           TRUE AS recall_floor_met,
           TRUE AS lsh_branch,
           TRUE AS derived_cheaper,
           TRUE AS fixed_scan_unsound,
           TRUE AS base_refuses
    FROM topk WHERE rank <= 10
"""


@_q("ann_lsh_auto", _ANN_LSH_AUTO_ORACLE)
def q_ann_lsh_auto(spark, sf_dir):
    """Derived LSH search controls as a gate entry (closes the
    derived-controls program across every ANN leg: PQ depth r12, ADC
    band r13, IVF nprobe r14, LSH planes/tables here). Unlike the
    nprobe gate the necessity evidence is a COST proof, because the
    certified fixed config (3 planes x 24 tables,
    `similarity_topk_lsh`'s gate shape) cannot be made to fail a
    recall floor at all: at 3 planes even theta=90deg neighbors
    collide per table with p >= 0.125, so 24 tables give recall
    >= 0.96 on ANY corpus — by expecting to scan 24/2^3 = 3x the
    corpus per query batch (derive_lsh_params' scan_fraction under
    the MEASURED random-pair angle: `fixed_scan_unsound` asserts
    >= 1.0). No recall gate can flag that; only cost arithmetic can.

    The corpus is the embeddings table made CLUSTER-dense in-plan
    (ann_band_auto's +-0.05 construction at 25 copies): true top-10 =
    noisy siblings at theta ~ 19deg, the geometry LSH exists for.
    Audited, one row: `recall_floor_met` — the derived config meets
    the 0.95 floor vs brute-force exact (measured 0.985/0.995 at
    sf0.01/sf0.001; design floor (1+floor)/2 plus the sample
    estimator's conservatism is the regeneration margin);
    `lsh_branch` — the derivation chose a real LSH config with
    modeled scan fraction < 1 (measured: 16 planes, ~21 tables, frac
    3.3e-4); `derived_cheaper` — MEASURED candidate volume
    (with_stats pre-dedup bucket-join rows) strictly below the fixed
    config's on the same corpus (measured ~375x less); `base_refuses`
    — on the RAW embeddings corpus (k-th neighbor at ~76deg,
    indistinguishable from the ~90deg random-pair angle) the
    derivation's refusal arithmetic returns method='brute' instead of
    emitting any config that would scan more than the corpus. The
    derivation samples the full 12.5k dense corpus (sample_rows
    covers it): a sparser sample cannot catch >= k cluster siblings
    per query and errs conservatively toward brute — sound, priced in
    the docstring. The oracle mirrors the construction in DuckDB
    (counts are construction-invariant) and recomputes the exact
    neighbor-set counts."""
    emb = _t(spark, sf_dir, "embeddings")
    dense = _dense_corpus_25(spark, emb)
    q = dense.filter(((F.col("vec_id") % 25) == 0) & (F.col("vec_id") < 500))
    # Coverage law (tools/lsh_scale_probe.py): each query must see
    # >= k cluster siblings in the sample, so the required rate is
    # safety*k/cluster_size = 2*10/25 = 0.8 of the corpus — at this
    # construction subsampling cannot help (cluster_size ~ 2k), so
    # pass sample_rows=None: the corpus is the sample, WITHOUT the
    # global hash-order+limit or the eager count() the old
    # 25*emb.count() sizing paid (ADVICE r14). A constant would
    # silently flip the derivation to the brute branch at larger SFs.
    params = similarity.derive_lsh_params(
        dense,
        q,
        k=10,
        floor=0.95,
        sample_rows=None,
        query_sample=64,
    )
    import warnings

    with warnings.catch_warnings():
        # The refusal warning is the point of this leg; the gate
        # asserts it as base_refuses instead of logging it.
        warnings.simplefilter("ignore", RuntimeWarning)
        base_params = similarity.derive_lsh_params(
            emb, emb.filter(F.col("vec_id") < 20), k=10, floor=0.95
        )
    exact = similarity.similarity_topk_bruteforce(dense, q, k=10)
    derived, dstats = similarity.similarity_topk_lsh_auto(
        dense, q, k=10, with_stats=True, params=params
    )
    fixed, fstats = similarity.similarity_topk_lsh(
        dense, q, k=10, n_planes=3, n_tables=24, with_stats=True
    )
    floor_row = _ann_recall_audit(
        exact.select("query_id", "neighbor_id"), derived, floor=0.95
    )
    cost_row = (
        dstats.agg(F.sum("candidates").alias("_d"))
        .crossJoin(F.broadcast(fstats.agg(F.sum("candidates").alias("_f"))))
        .select((F.col("_d") < F.col("_f")).alias("derived_cheaper"))
    )
    out = floor_row.crossJoin(F.broadcast(cost_row)).select(
        "n_queries",
        "n_exact",
        "recall_floor_met",
        F.lit(params["method"] == "lsh").alias("lsh_branch"),
        "derived_cheaper",
        F.lit(
            similarity.lsh_scan_fraction(params["p_rand"], 3, 24) >= 1.0
        ).alias("fixed_scan_unsound"),
        F.lit(base_params["method"] == "brute").alias("base_refuses"),
    )
    return carry_caches(out, exact, derived, fixed)


_IVF_INDEX: dict[str, dict] = {}


def _ivf_index_for(spark, sf_dir, emb):
    """Memoized build_ivf_index per sf_dir (the production shape: the
    index predates queries), with a LIVENESS guard (ADVICE r14):
    unlike the _PQ_CODEBOOKS precedent this cache holds a persisted,
    session-bound DataFrame, so a hit from a stopped or sibling
    SparkSession would serve a dead frame opaquely. Rebuild — and
    release the stale frame — whenever the cached corpus does not
    belong to the CURRENT live session."""
    cached = _IVF_INDEX.get(sf_dir)
    if cached is not None:
        try:
            alive = (
                cached["corpus"].sparkSession is spark
                and not spark.sparkContext._jsc.sc().isStopped()
            )
        except Exception:
            alive = False
        if alive:
            return cached
        try:
            cached["corpus"].unpersist()
        except Exception:
            pass
    idx = similarity.build_ivf_index(emb)
    _IVF_INDEX[sf_dir] = idx
    return idx


_ANN_INDEX_HANDOFF_ORACLE = _ANN_RECALL_ORACLE.replace(
    "TRUE AS recall_floor_met",
    "TRUE AS recall_floor_met,\n"
    "           TRUE AS handoff_row_equal,\n"
    "           TRUE AS derived_cells_ok",
)


@_q("ann_index_handoff", _ANN_INDEX_HANDOFF_ORACLE)
def q_ann_index_handoff(spark, sf_dir):
    """The IVF production handoff driver-certified (round 14): the
    index — centroids at derive_ivf_cells(n) + the persisted
    corpus→cell assignment — is built ONCE (build_ivf_index, memoized
    per sf_dir like the PQ codebooks: the production shape where the
    index predates queries) and the query batch is served through
    `similarity_topk_ivf_auto(index=...)`, paying only the marginal
    probe + pruned scan. Three asserted properties: the 0.95 recall
    floor vs the brute-force exact twin (the sound prune makes true
    recall 1.0 by construction — the floor is regeneration margin);
    `handoff_row_equal` — the prebuilt path's result rows are
    EXACTLY the inline path's on the same centroids (exceptAll both
    ways, rank and rounded cosine included: the handoff changes where
    the assignment cost is paid, never the answer); and
    `derived_cells_ok` — the build defaulted its cell count to
    derive_ivf_cells over the corpus statistics (= the certified 16
    at gate scale, where the clamps land on the fixed default). At
    320× the same split serves 3.7× faster than the fixed-cell index
    (IVF_CELLS_PROBE_320x_prebuilt.json; SCALE.md round-14). The
    oracle recomputes the exact neighbor counts in DuckDB."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    idx = _ivf_index_for(spark, sf_dir, emb)
    exact = similarity.similarity_topk_bruteforce(emb, q, k=10)
    inline = similarity.similarity_topk_ivf_auto(
        emb, q, k=10, centroids=idx["centers"]
    )
    prebuilt = similarity.similarity_topk_ivf_auto(emb, q, k=10, index=idx)
    floor_row = _ann_recall_audit(
        exact.select("query_id", "neighbor_id"), prebuilt, floor=0.95
    )
    d1 = inline.exceptAll(prebuilt).agg(F.count(F.lit(1)).alias("_a"))
    d2 = prebuilt.exceptAll(inline).agg(F.count(F.lit(1)).alias("_b"))
    eq_row = d1.crossJoin(F.broadcast(d2)).select(
        ((F.col("_a") == 0) & (F.col("_b") == 0)).alias(
            "handoff_row_equal"
        )
    )
    out = floor_row.crossJoin(F.broadcast(eq_row)).select(
        "n_queries",
        "n_exact",
        "recall_floor_met",
        "handoff_row_equal",
        F.lit(
            len(idx["centers"])
            == similarity.derive_ivf_cells(emb.count())
        ).alias("derived_cells_ok"),
    )
    return carry_caches(out, exact, inline, prebuilt)


_ANN_INDEX_PERSIST_ORACLE = """
    WITH dense AS (
      SELECT e.vec_id * 25 + (c.copy * 7) % 25 AS vec_id,
             list_transform(range(1, len(e.embedding) + 1),
               i -> e.embedding[i]
                    + 0.02 * ((hash(e.vec_id, c.copy, i) % 2048) / 1024.0
                              - 1.0)) AS embedding
      FROM embeddings e, (SELECT unnest(range(25)) AS copy) c
    ), topk AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id) AS rank
      FROM dense q JOIN dense c ON q.vec_id != c.vec_id
      WHERE q.vec_id % 25 = 0 AND q.vec_id < 500
    )
    SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           TRUE AS recall_floor_met,
           TRUE AS reload_row_equal,
           TRUE AS scan_pruned,
           TRUE AS manifest_ok
    FROM topk WHERE rank <= 10
"""


@_q("ann_index_persist", _ANN_INDEX_PERSIST_ORACLE)
def q_ann_index_persist(spark, sf_dir):
    """The DURABLE half of the IVF production story (VERDICT r15
    item 1): build_ivf_index's session-persisted frame is written to
    cell-partitioned parquet + a cells table (exact float64
    centroids, per-cell radii, member counts) + a manifest
    (persist_ivf_index), reloaded from disk (load_ivf_index — the
    fresh-session path: nothing from the in-memory index is reused;
    tests/test_operators.py additionally reloads in a
    spark.newSession() to pin session-state independence), and the
    query batch is served through similarity_topk_ivf_auto(index=
    <reloaded>) where the probe decisions become STATIC partition
    filters on the corpus scan. Corpus: the cluster-dense 25-copy
    construction (so the prune has structure to bite on — on the raw
    noisy table the sound answer is a full scan and nothing would be
    pruned). Asserted, one row: the 0.95 recall floor vs brute force
    on the reloaded artifacts; `reload_row_equal` — disk serving ≡
    in-memory-index serving, exceptAll both ways (rank and rounded
    cosine included: durability changes where the index lives, never
    the answer); `scan_pruned` — the executed probe set covered
    strictly fewer cells than the index holds (the partition-pruned
    scan's work bound; the FileSourceScan numPartitions metric is
    pinned to exactly this list by tests/test_plans.py); and
    `manifest_ok` — the reloaded manifest/cells agree with what was
    written (cell count, row count). The oracle recomputes the exact
    neighbor counts on the mirrored construction in DuckDB."""
    emb = _t(spark, sf_dir, "embeddings")
    dense = _dense_corpus_25(spark, emb, jitter=0.02)
    q = dense.filter(((F.col("vec_id") % 25) == 0) & (F.col("vec_id") < 500))
    # fixed 64 cells: the derived-cell default is ann_index_handoff's
    # certified property; here 64 keeps the KMeans build bounded while
    # leaving the prune room to show (clusters >> cells probed)
    idx = similarity.build_ivf_index(dense, n_centroids=64)
    path = os.path.join(_work_dir("ivfidx"), "index")
    info = similarity.persist_ivf_index(idx, path)
    idx2 = similarity.load_ivf_index(spark, path)
    exact = similarity.similarity_topk_bruteforce(dense, q, k=10)
    mem = similarity.similarity_topk_ivf_auto(dense, q, k=10, index=idx)
    disk = similarity.similarity_topk_ivf_auto(dense, q, k=10, index=idx2)
    floor_row = _ann_recall_audit(
        exact.select("query_id", "neighbor_id"), disk, floor=0.95
    )
    d1 = mem.exceptAll(disk).agg(F.count(F.lit(1)).alias("_a"))
    d2 = disk.exceptAll(mem).agg(F.count(F.lit(1)).alias("_b"))
    eq_row = d1.crossJoin(F.broadcast(d2)).select(
        ((F.col("_a") == 0) & (F.col("_b") == 0)).alias("reload_row_equal")
    )
    out = floor_row.crossJoin(F.broadcast(eq_row)).select(
        "n_queries",
        "n_exact",
        "recall_floor_met",
        "reload_row_equal",
        F.lit(
            len(disk._ivf_probed_cells) < len(idx2["centers"])
        ).alias("scan_pruned"),
        F.lit(
            info["n_cells"] == len(idx2["centers"])
            and info["n_rows"] == idx2["n_rows"]
            and len(idx2["radii"]) > 0
        ).alias("manifest_ok"),
    )
    return unpersist_on_gc(
        carry_caches(out, exact, mem, disk), idx["corpus"]
    )


_ANN_FILTERED_ORACLE_SELECTIVE = """
    WITH topk AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id) AS rank
      FROM embeddings q JOIN embeddings c
        ON q.vec_id != c.vec_id AND c.label = 3
      WHERE q.vec_id < 20
    )
    SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           TRUE AS recall_floor_met,
           TRUE AS branch_pre
    FROM topk WHERE rank <= 10
"""


@_q("similarity_topk_filtered", _ANN_FILTERED_ORACLE_SELECTIVE)
def q_similarity_topk_filtered(spark, sf_dir):
    """Filtered ANN, SELECTIVE regime (VERDICT r13 item 4 — the
    production RAG shape: top-k cosine among corpus rows matching a
    metadata predicate). Predicate label = 3 keeps ~12% of the corpus,
    under the 0.25 selectivity threshold, so the chooser
    (operators/similarity.py:choose_filter_strategy — one eager count
    agg) must pick the PRE-filter branch: predicate pushed into the
    scan, exact brute-force over the survivors — recall 1.0 by
    construction; the 0.95 floor is regeneration margin. `branch_pre`
    asserts the chooser's decision itself: naive always-post
    under-fills k here (k/s over-fetch explodes at low selectivity).
    The oracle recomputes the exact under-predicate neighbor counts in
    DuckDB."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    pred = F.col("label") == 3
    strategy, _s = similarity.choose_filter_strategy(emb, pred)
    res = similarity.similarity_topk_filtered(
        emb, q, pred, k=10, method=strategy
    )
    exact = similarity.similarity_topk_bruteforce(
        emb.filter(pred), q, k=10
    ).select("query_id", "neighbor_id")
    out = _ann_recall_audit(exact, res, floor=0.95).select(
        "n_queries",
        "n_exact",
        "recall_floor_met",
        F.lit(strategy == "pre").alias("branch_pre"),
    )
    return carry_caches(out, res)


_ANN_FILTERED_ORACLE_BROAD = """
    WITH dense AS (
      SELECT e.vec_id * 25 + (c.copy * 7) % 25 AS vec_id,
             list_transform(range(1, len(e.embedding) + 1),
               i -> e.embedding[i]
                    + 0.05 * ((hash(e.vec_id, c.copy, i) % 2048) / 1024.0
                              - 1.0)) AS embedding
      FROM embeddings e, (SELECT unnest(range(25)) AS copy) c
    ), topk AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id) AS rank
      FROM dense q JOIN dense c
        ON q.vec_id != c.vec_id AND c.vec_id % 8 != 0
      WHERE q.vec_id % 25 = 0 AND q.vec_id < 500
    )
    SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           TRUE AS recall_floor_met,
           TRUE AS branch_post,
           TRUE AS derived_leg
    FROM topk WHERE rank <= 10
"""


@_q("similarity_topk_filtered_broad", _ANN_FILTERED_ORACLE_BROAD)
def q_similarity_topk_filtered_broad(spark, sf_dir):
    """Filtered ANN, BROAD regime, re-certified on the DERIVED leg
    (VERDICT r14 item 4): the corpus is the cluster-dense 25-copy
    construction (the geometry where a sublinear index genuinely
    exists), the predicate keeps 7/8 of it, and the post branch runs
    the corpus-DERIVED LSH config (derive_lsh_params — the old fixed
    (3, 24) pin here was exactly the config ann_lsh_auto priced
    cost-unsound at 320x, scan fraction 3.0). The chooser compares
    the predicate's selectivity against the derived config's REAL
    modeled scan fraction (est_scan_fraction ~ 3e-4 here) instead of
    a fixed 0.25 — post wins because the indexed scan reads orders of
    magnitude less than the 87.5% survivor set. Over-fetch
    k' = ceil(4k/s), semi-join survivors, cut to k; the 0.95 floor
    audits the under-fill risk. `branch_post` asserts the cost-based
    decision, `derived_leg` that the derivation actually chose an LSH
    config (not the refusal path). The oracle recomputes the exact
    under-predicate counts on the mirrored construction in DuckDB."""
    emb = _t(spark, sf_dir, "embeddings")
    dense = _dense_corpus_25(spark, emb)
    q = dense.filter(((F.col("vec_id") % 25) == 0) & (F.col("vec_id") < 500))
    pred = F.col("vec_id") % 8 != 0
    # production shape: derive once at index build (corpus-as-sample,
    # the ann_lsh_auto coverage law), store, pass back per query batch
    params = similarity.derive_lsh_params(
        dense, q, k=10, floor=0.95, sample_rows=None, query_sample=64
    )
    post_frac = (
        params["est_scan_fraction"] if params["method"] == "lsh" else 1.0
    )
    strategy, s = similarity.choose_filter_strategy(
        dense, pred, post_scan_fraction=post_frac
    )
    res = similarity.similarity_topk_filtered(
        dense, q, pred, k=10, method=strategy, selectivity=s,
        lsh_params=params,
    )
    exact = similarity.similarity_topk_bruteforce(
        dense.filter(pred), q, k=10
    ).select("query_id", "neighbor_id")
    out = _ann_recall_audit(exact, res, floor=0.95).select(
        "n_queries",
        "n_exact",
        "recall_floor_met",
        F.lit(strategy == "post").alias("branch_post"),
        F.lit(params["method"] == "lsh").alias("derived_leg"),
    )
    return carry_caches(out, res)


@_q(
    "incremental_ann_index",
    """
    WITH t AS (
      SELECT CAST(FLOOR((MIN(vec_id) + MAX(vec_id)) / 2.0) AS BIGINT) AS thr
      FROM embeddings
    )
    SELECT CAST(SUM(CASE WHEN vec_id <= thr THEN 1 ELSE 0 END) AS BIGINT)
             AS n_base,
           CAST(SUM(CASE WHEN vec_id > thr THEN 1 ELSE 0 END) AS BIGINT)
             AS n_batch,
           CAST(COUNT(*) AS BIGINT) AS n_union,
           CAST(0 AS BIGINT) AS assign_mismatches,
           FALSE AS drift_tripped
    FROM embeddings, t
    """,
)
def q_incremental_ann_index(spark, sf_dir):
    """Incremental ANN index maintenance — the missing member of the
    incremental-cadence family (incremental_dedup,
    incremental_corpus_pipeline): the embeddings corpus splits into
    an id-ordered base and a new batch; IVF centroids + PQ codebooks
    are trained ONCE on the base (offline artifacts, memoized); the
    batch is accepted by assigning its vectors to the EXISTING
    cells/codes in one O(|batch|) pass
    (operators/similarity.py:incremental_ann_index), with codebook
    drift watched via the mean coarse-quantization-error statistic
    (ann_index_drift) — re-derive artifacts only when it trips.

    The oracle proves the equivalence contract the
    incremental_corpus_pipeline way: assign_mismatches pins
    base-index UNION batch-assignment row-for-row equal (cell AND
    codes) to a full reassignment pass over the union with the same
    frozen artifacts, and drift_tripped pins the same-distribution
    batch below the trip line; n_base/n_batch/n_union are exact
    value checks DuckDB recomputes independently. A nondeterministic
    assignment, a batch row lost or doubled by the union, or a drift
    statistic that trips on in-distribution data all hash-mismatch."""
    emb = _t(spark, sf_dir, "embeddings")
    thr = emb.agg(
        F.floor((F.min("vec_id") + F.max("vec_id")) / 2).alias("thr")
    )
    with_thr = emb.crossJoin(F.broadcast(thr))
    base = with_thr.filter(F.col("vec_id") <= F.col("thr")).drop("thr")
    batch = with_thr.filter(F.col("vec_id") > F.col("thr")).drop("thr")
    key = (sf_dir, "incremental_base")
    if key not in _IVF_CENTROIDS:
        _IVF_CENTROIDS[key] = similarity.train_ivf_centroids(base)
    if key not in _PQ_CODEBOOKS:
        _PQ_CODEBOOKS[key] = similarity.train_pq_codebooks(base)
    centers, cb = _IVF_CENTROIDS[key], _PQ_CODEBOOKS[key]

    # The audit fans out over the assignment subtrees (counts,
    # mismatch join, drift) — persist them once or every branch
    # re-runs the Arrow assignment UDFs (the curation_audit lesson).
    base_index = similarity.ann_index_assign(base, centers, cb).persist()
    updated = similarity.incremental_ann_index(
        base_index, batch, centers, cb
    ).persist()
    full = similarity.ann_index_assign(emb, centers, cb).select(
        "vec_id",
        F.col("cell").alias("f_cell"),
        F.col("codes").alias("f_codes"),
    )
    counts = updated.agg(
        F.sum(F.when(~F.col("is_new"), 1).otherwise(0)).alias("n_base"),
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).alias("n_batch"),
        F.count(F.lit(1)).alias("n_union"),
    )
    mismatches = (
        updated.join(full, "vec_id", "full")
        .agg(
            F.sum(
                F.when(
                    F.col("cell").isNull()
                    | F.col("f_cell").isNull()
                    | (F.col("cell") != F.col("f_cell"))
                    | (F.col("codes") != F.col("f_codes")),
                    1,
                ).otherwise(0)
            ).alias("assign_mismatches")
        )
        .select(F.coalesce("assign_mismatches", F.lit(0)).alias("assign_mismatches"))
    )
    drift = similarity.ann_index_drift(
        base_index, updated.filter(F.col("is_new"))
    ).select("drift_tripped")
    out = counts.crossJoin(mismatches).crossJoin(drift)
    return unpersist_on_gc(out, base_index, updated)


@_q(
    "ann_index_retrain",
    """
    WITH t AS (
      SELECT CAST(FLOOR((MIN(vec_id) + MAX(vec_id)) / 2.0) AS BIGINT) AS thr
      FROM embeddings
    ), u AS (
      SELECT vec_id, embedding FROM embeddings, t WHERE vec_id <= thr
      UNION ALL
      SELECT vec_id, list_transform(embedding, x -> x * 0.2 + 3.0) AS embedding
      FROM embeddings, t WHERE vec_id > thr
    ), topk AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id) AS rank
      FROM u q JOIN u c ON q.vec_id != c.vec_id
      WHERE q.vec_id < 20
    )
    SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           TRUE AS drift_tripped,
           TRUE AS recall_floor_met
    FROM topk WHERE rank <= 10
    """,
)
def q_ann_index_retrain(spark, sf_dir):
    """The drift-TRIPPED branch of the incremental-index cadence
    (VERDICT r9 item 4) — incremental_ann_index proves batch-update ≡
    full-rebuild when the batch is in-distribution; this entry proves
    the OTHER path: a deliberately-shifted batch (x*0.2 + 3.0 per
    coordinate — a new embedding model's output landing far from the
    frozen centroids) trips ann_index_drift's gate (measured
    batch_err/base_err ≈ 670x at sf0.01 against the 2x trip line),
    and the response — re-deriving the IVF centroids + PQ codebooks
    on the updated corpus and rebuilding — passes the SAME
    recall-floor audit every serving entry carries
    (_ann_recall_audit, floor 0.95; measured 1.0 at sf0.01). The
    oracle recomputes the post-retrain ground-truth neighbor set over
    the shifted union independently (base kept verbatim, batch
    shifted with the identical affine map) and pins both verdicts:
    a drift statistic that fails to trip on out-of-distribution
    data, or a retrained index that can't serve the new corpus,
    hash-mismatches."""
    emb = _t(spark, sf_dir, "embeddings")
    thr = emb.agg(
        F.floor((F.min("vec_id") + F.max("vec_id")) / 2).alias("thr")
    )
    with_thr = emb.crossJoin(F.broadcast(thr))
    base = with_thr.filter(F.col("vec_id") <= F.col("thr")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    batch = with_thr.filter(F.col("vec_id") > F.col("thr")).select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x * F.lit(0.2) + F.lit(3.0)
        ).alias("embedding"),
    )
    key = (sf_dir, "incremental_base")
    if key not in _IVF_CENTROIDS:
        _IVF_CENTROIDS[key] = similarity.train_ivf_centroids(base)
    if key not in _PQ_CODEBOOKS:
        _PQ_CODEBOOKS[key] = similarity.train_pq_codebooks(base)

    # the gate: shifted batch assigned against the FROZEN artifacts
    drift = similarity.ann_index_drift(
        similarity.ann_index_assign(base, _IVF_CENTROIDS[key], _PQ_CODEBOOKS[key]),
        similarity.ann_index_assign(batch, _IVF_CENTROIDS[key], _PQ_CODEBOOKS[key]),
    ).select("drift_tripped")

    # the response: offline re-derive on the updated corpus (memoized
    # like every other index artifact), then the standard audit
    union = base.unionByName(batch)
    rkey = (sf_dir, "retrain")
    if rkey not in _IVF_CENTROIDS:
        _IVF_CENTROIDS[rkey] = similarity.train_ivf_centroids(union)
    if rkey not in _PQ_CODEBOOKS:
        _PQ_CODEBOOKS[rkey] = similarity.train_pq_codebooks(union)
    q = union.filter(F.col("vec_id") < 20)
    exact = similarity.similarity_topk_bruteforce(union, q, k=10)
    approx = similarity.similarity_topk_ivfpq(
        union,
        q,
        k=10,
        nprobe=12,
        centroids=_IVF_CENTROIDS[rkey],
        codebooks=_PQ_CODEBOOKS[rkey],
    )
    audit = _ann_recall_audit(
        exact.select("query_id", "neighbor_id"), approx, floor=0.95
    )
    out = audit.crossJoin(F.broadcast(drift)).select(
        "n_queries", "n_exact", "drift_tripped", "recall_floor_met"
    )
    return carry_caches(out, exact, approx)


@_q(
    "embedding_near_dup_lsh",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
    """,
)
def q_embedding_near_dup_lsh(spark, sf_dir):
    """The 100 TB near-dup path: hyperplane-LSH bucketed candidates +
    exact rerank. At the sandbox corpus the 2-plane × 16-table config
    has empirically total recall on the 0.45-threshold pair set (every
    true pair collides in ≥1 table), so it shares the exact oracle;
    the probabilistic recall floor (≥0.98 per pair) is asserted
    separately in tests/test_operators.py."""
    return similarity.embedding_near_dup(
        _t(spark, sf_dir, "embeddings"), threshold=0.45, method="lsh"
    )


@_q(
    "embedding_stats",
    f"""
    WITH norms AS (
      SELECT label,
             sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
      FROM embeddings
    )
    SELECT label, COUNT(*) AS n_vectors,
           ROUND(MIN(norm), 6) AS min_norm,
           ROUND(MAX(norm), 6) AS max_norm,
           ROUND({_davg('norm')}, 6) AS avg_norm
    FROM norms GROUP BY label
    """,
)
def q_embedding_stats(spark, sf_dir):
    """Per-row norms are left-to-right double accumulation in BOTH
    engines (F.aggregate / list_sum), so even the float path is
    bit-reproducible; the mean uses the decimal contract."""
    return similarity.embedding_stats(_t(spark, sf_dir, "embeddings"))


# ===========================================================================
# Text analysis
# ===========================================================================

@_q(
    "text_stats",
    """
    WITH base AS (
      SELECT doc_id, lang,
             string_split(lower(trim(text)), ' ') AS toks,
             CAST(LENGTH(text) AS INT) AS n_chars_m,
             CAST(LENGTH(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS INT) AS punct
      FROM documents
    ), m AS (
      SELECT doc_id, lang,
             CAST(len(toks) AS INT) AS n_tokens, n_chars_m,
             CASE WHEN len(toks) > 0
                  THEN (n_chars_m - (len(toks) - 1)) / len(toks)
                  ELSE 0.0 END AS avg_token_len,
             punct / greatest(n_chars_m, 1) AS punct_ratio,
             len(list_filter(toks, t -> list_contains(
                 ['the','and','of','to','in','is','that','for','with','a'], t)))
                 / greatest(len(toks), 1) AS stopword_ratio
      FROM base
    )
    SELECT doc_id, lang, n_tokens, n_chars_m, avg_token_len, punct_ratio,
           stopword_ratio,
           CASE WHEN n_tokens BETWEEN 5 AND 5000 THEN 0.4 ELSE 0.0 END
             + CASE WHEN punct_ratio < 0.2 THEN 0.3 ELSE 0.0 END
             + CASE WHEN stopword_ratio > 0.05 THEN 0.3 ELSE 0.0 END
             AS quality_score
    FROM m
    """,
)
def q_text_stats(spark, sf_dir):
    """Per-document quality metrics (token counts, punctuation/stopword ratios) + the composite cheap-filter score (operators/textops.py:text_stats)."""
    return textops.text_stats(_t(spark, sf_dir, "documents"))


@_q(
    "token_count",
    """
    WITH per_doc AS (
      SELECT doc_id, lang,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS ws_tokens,
             CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INT)
               AS bpe_tokens
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(ws_tokens) AS BIGINT) AS total_ws_tokens,
           CAST(SUM(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
           MIN(bpe_tokens) AS min_bpe_tokens,
           MAX(bpe_tokens) AS max_bpe_tokens
    FROM per_doc GROUP BY lang
    """,
)
def q_token_count(spark, sf_dir):
    """Whitespace and BPE-ish token counts per doc rolled up per language — the corpus token-budget pass (operators/textops.py:token_count)."""
    return textops.token_count(_t(spark, sf_dir, "documents"))


@_q(
    "lang_id",
    """
    WITH base AS (
      SELECT doc_id, lang AS labeled_lang,
             string_split(lower(trim(text)), ' ') AS toks
      FROM documents
    ), hits AS (
      SELECT doc_id, labeled_lang,
        CAST(len(list_filter(toks, t -> list_contains(
          ['the','and','of','to','in','is','that','for','with','a'], t))) AS INT) AS h_en,
        CAST(len(list_filter(toks, t -> list_contains(
          ['el','la','de','que','y','en','un','por','con','los'], t))) AS INT) AS h_es,
        CAST(len(list_filter(toks, t -> list_contains(
          ['le','la','de','et','les','des','en','un','du','que'], t))) AS INT) AS h_fr,
        CAST(len(list_filter(toks, t -> list_contains(
          ['der','die','und','das','von','zu','mit','den','ist','im'], t))) AS INT) AS h_de
      FROM base
    )
    SELECT doc_id, labeled_lang,
           CASE WHEN greatest(h_en, h_es, h_fr, h_de) = 0 THEN 'unknown'
                WHEN h_en = greatest(h_en, h_es, h_fr, h_de) THEN 'en'
                WHEN h_es = greatest(h_en, h_es, h_fr, h_de) THEN 'es'
                WHEN h_fr = greatest(h_en, h_es, h_fr, h_de) THEN 'fr'
                ELSE 'de' END AS predicted_lang,
           greatest(h_en, h_es, h_fr, h_de) AS stopword_hits
    FROM hits
    """,
)
def q_lang_id(spark, sf_dir):
    """N-gram/stopword-heuristic language identification per document (operators/textops.py:lang_id)."""
    return textops.lang_id(_t(spark, sf_dir, "documents"))


@_q(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS md5_fp
    FROM documents
    """,
)
def q_doc_fingerprint(spark, sf_dir):
    """Per-document canonical content fingerprints: whitespace-collapsed lowercase md5 + rolling-hash sketch (operators/textops.py:doc_fingerprint)."""
    return textops.doc_fingerprint(_t(spark, sf_dir, "documents")).select(
        "doc_id", "md5_fp"
    )


@_q(
    "tfidf",
    """
    WITH terms AS (
      SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2
    ), df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1 HAVING COUNT(*) >= 2
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
    """,
)
def q_tfidf(spark, sf_dir):
    """Corpus TF-IDF per (doc, term) with document-frequency pruning — expression-only, no MLlib fit (operators/textops.py:tfidf)."""
    return textops.tfidf(_t(spark, sf_dir, "documents"))


@_q(
    "chunk_documents",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ), sized AS (
      SELECT doc_id, t, len(t) AS n,
             CAST(FLOOR((GREATEST(len(t) - 8, 1) + 23) / 24.0) AS BIGINT)
               AS n_chunks
      FROM toks WHERE len(t) >= 1
    ), idx AS (
      SELECT doc_id, t, n,
             unnest(range(0, n_chunks)) AS chunk_idx
      FROM sized
    )
    SELECT doc_id,
           chunk_idx,
           chunk_idx * 24 AS start_tok,
           LEAST(n - chunk_idx * 24, 32) AS n_tokens,
           array_to_string(t[chunk_idx*24 + 1 : chunk_idx*24 + 32], ' ')
             AS chunk_text
    FROM idx
    """,
)
def q_chunk_documents(spark, sf_dir):
    """Sliding token-window chunking (here 32-token windows with
    8-token overlap, stride 24, so the sf0.01 corpus — ~40-150-token
    docs — genuinely produces multi-chunk documents, short final
    windows, AND single-chunk short docs in one gate; the production
    default is 128/16) — the pre-tokenization map every LLM corpus
    build or RAG indexer applies before packing/embedding
    (operators/textops.py:chunk_documents). The oracle rebuilds every
    chunk STRING independently (DuckDB list slicing + join), so the
    window arithmetic (ceil chunk count, short final window,
    one-chunk short docs, token-less docs dropped) and the exact
    chunk text are all hash-checked. Plan shape: pure map — codegen
    tokenization bound to a column, one array-per-row HOF building
    the windows, one Generate; no shuffle at any scale."""
    return textops.chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=32, overlap=8
    )


@_q(
    "repetition_filter",
    r"""
    WITH toks AS (
      SELECT doc_id, lang, n_chars,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ), g2 AS (
      SELECT doc_id, unnest(list_transform(range(0, greatest(len(t)-1, 0)),
             i -> concat_ws(' ', t[i+1], t[i+2]))) AS g FROM toks
    ), c2 AS (
      SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2
    ), m2 AS (
      SELECT doc_id, MAX(c) AS top_c, SUM(c) AS tot FROM c2 GROUP BY 1
    ), g3 AS (
      SELECT doc_id, unnest(list_transform(range(0, greatest(len(t)-2, 0)),
             i -> concat_ws(' ', t[i+1], t[i+2], t[i+3]))) AS g FROM toks
    ), c3 AS (
      SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2
    ), m3 AS (
      SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_c,
             SUM(c) AS tot FROM c3 GROUP BY 1
    )
    SELECT toks.doc_id, lang, n_chars,
           COALESCE(CAST(m2.top_c AS DOUBLE) / m2.tot, 0.0) AS frac_top_bigram,
           COALESCE(CAST(m3.dup_c AS DOUBLE) / m3.tot, 0.0) AS frac_dup_trigrams,
           COALESCE(CAST(m2.top_c AS DOUBLE) / m2.tot, 0.0) <= 0.20
             AND COALESCE(CAST(m3.dup_c AS DOUBLE) / m3.tot, 0.0) <= 0.30 AS keep
    FROM toks
    LEFT JOIN m2 ON toks.doc_id = m2.doc_id
    LEFT JOIN m3 ON toks.doc_id = m3.doc_id
    """,
)
def q_repetition_filter(spark, sf_dir):
    """Gopher-style repetition metrics (top-bigram fraction, duplicate-
    trigram fraction) + keep flag — the within-document repetition
    filter every web-corpus build runs (operators/textops.py)."""
    return textops.repetition_filter(_t(spark, sf_dir, "documents"))


@_q(
    "quality_filter",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t,
             length(text) - length(replace(text, '#', '')) AS hashes,
             (length(text) - length(replace(text, '...', ''))) / 3 AS ellipses
      FROM documents
    ), base AS (
      SELECT doc_id,
             len(t) AS n_words,
             COALESCE(list_sum(list_transform(t, x -> length(x))), 0)
               / greatest(len(t), 1) AS mean_word_len,
             len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
               / greatest(len(t), 1) AS alpha_word_frac,
             (hashes + ellipses) / greatest(len(t), 1) AS symbol_word_ratio,
             len(list_intersect(list_distinct(t),
                 ['the','and','of','to','in','is','that','for','with','a']))
               AS stopword_hits
      FROM toks
    ), g2 AS (
      SELECT doc_id, unnest(list_transform(range(0, greatest(len(t)-1, 0)),
             i -> concat_ws(' ', t[i+1], t[i+2]))) AS g FROM toks
    ), c2 AS (
      SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2
    ), m2 AS (
      SELECT doc_id, MAX(c) AS top_c, SUM(c) AS tot FROM c2 GROUP BY 1
    ), g3 AS (
      SELECT doc_id, unnest(list_transform(range(0, greatest(len(t)-2, 0)),
             i -> concat_ws(' ', t[i+1], t[i+2], t[i+3]))) AS g FROM toks
    ), c3 AS (
      SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2
    ), m3 AS (
      SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_c,
             SUM(c) AS tot FROM c3 GROUP BY 1
    ), rep AS (
      SELECT toks.doc_id,
             COALESCE(CAST(m2.top_c AS DOUBLE) / m2.tot, 0.0) <= 0.20
               AND COALESCE(CAST(m3.dup_c AS DOUBLE) / m3.tot, 0.0) <= 0.30
               AS repetition_ok
      FROM toks
      LEFT JOIN m2 ON toks.doc_id = m2.doc_id
      LEFT JOIN m3 ON toks.doc_id = m3.doc_id
    )
    SELECT base.doc_id, n_words, mean_word_len, alpha_word_frac,
           symbol_word_ratio, stopword_hits,
           n_words >= 5 AND n_words <= 5000 AS word_count_ok,
           mean_word_len >= 2.0 AND mean_word_len <= 12.0 AS word_len_ok,
           alpha_word_frac >= 0.8 AS alpha_ok,
           symbol_word_ratio <= 0.1 AS symbol_ok,
           stopword_hits >= 2 AS stopword_ok,
           repetition_ok,
           n_words >= 5 AND n_words <= 5000
             AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
             AND alpha_word_frac >= 0.8
             AND symbol_word_ratio <= 0.1
             AND stopword_hits >= 2
             AND repetition_ok AS keep
    FROM base JOIN rep ON base.doc_id = rep.doc_id
    """,
)
def q_quality_filter(spark, sf_dir):
    """Composite Gopher-rule quality gate (operators/textops.py:
    quality_filter): per-document keep/drop with every rule verdict
    exposed. The oracle recomputes all metrics and rule booleans —
    int/int IEEE divisions and literal thresholds, so the whole gate
    is bit-checkable, repetition rules included."""
    return textops.quality_filter(_t(spark, sf_dir, "documents"))


@_q(
    "corpus_ngrams",
    r"""
    WITH toks AS (
      SELECT list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ), grams AS (
      SELECT unnest(list_transform(range(0, greatest(len(t)-2, 0)),
             i -> concat_ws(' ', t[i+1], t[i+2], t[i+3]))) AS gram FROM toks
    )
    SELECT gram, COUNT(*) AS n_occurrences
    FROM grams GROUP BY gram
    ORDER BY n_occurrences DESC, gram
    LIMIT 100
    """,
)
def q_corpus_ngrams(spark, sf_dir):
    """Corpus-level top-100 trigrams (vocabulary/boilerplate pass) —
    map-side partial counts, one shuffle keyed by gram, deterministic
    top-k (operators/textops.py)."""
    return textops.corpus_ngrams(_t(spark, sf_dir, "documents"))


# ===========================================================================
# Sessionization + streaming
# ===========================================================================

@_q(
    "sessionize",
    f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), ids AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events,
           {_dsum('value')} AS session_value
    FROM ids GROUP BY user_id, session_seq
    """,
)
def q_sessionize(spark, sf_dir):
    """Batch gap-and-island sessionization: 30-minute inactivity splits per-user sessions with per-session aggregates (operators/sessionize.py)."""
    return sessionize.sessionize(_t(spark, sf_dir, "events"))


@_q(
    "stream_tumbling",
    f"""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {_dsum('value')} AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark, sf_dir):
    """Tumbling window counts as real Structured Streaming over the events table, AvailableNow, stream == batch (streaming/windows.py:tumbling_counts)."""
    # Execute genuinely under Structured Streaming (AvailableNow) —
    # identical plan to a continuous deployment; see streaming/windows.py.
    raw_schema = raw_parquet_schema(spark, os.path.join(sf_dir, "events.parquet"))

    def transform(stream):
        from elb_log_to_mysql_spark.streaming.windows import ensure_event_time

        return tumbling_counts(ensure_event_time(stream))

    return run_stream_to_batch(
        spark, os.path.join(sf_dir, "events.parquet"), transform, raw_schema
    )


@_q(
    "stream_static_join",
    f"""
    WITH ranked AS (
      SELECT user_id, event_type AS channel,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), profile AS (
      SELECT user_id, channel FROM ranked WHERE rn = 1
    )
    SELECT p.channel, e.event_type,
           COUNT(*) AS n_events,
           {_dsum('e.value')} AS sum_value
    FROM events e JOIN profile p USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_stream_static_join(spark, sf_dir):
    """Stream-static enrichment under real Structured Streaming: the
    event stream joins a BATCH-derived static profile (each user's
    first event_type — min ts with event_id tiebreak) per micro-batch
    (streaming/windows.py:stream_static_enrich), then aggregates.
    The DuckDB twin recomputes profile derivation, join, and
    aggregation in one batch query — stream ≡ batch for stateless
    stream-static joins."""
    from pyspark.sql import Window

    from elb_log_to_mysql_spark.streaming.windows import stream_static_enrich

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    profile = (
        _t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("channel"))
    )
    raw_schema = raw_parquet_schema(spark, os.path.join(sf_dir, "events.parquet"))

    def transform(stream):
        from elb_log_to_mysql_spark.streaming.windows import ensure_event_time

        return stream_static_enrich(ensure_event_time(stream), profile)

    return run_stream_to_batch(
        spark, os.path.join(sf_dir, "events.parquet"), transform, raw_schema
    )


@_q(
    "stream_sliding",
    f"""
    WITH expanded AS (
      SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE
               AS window_start,
             event_type, value
      FROM events CROSS JOIN unnest([0, 1, 2, 3]) AS t(k)
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {_dsum('value')} AS sum_value
    FROM expanded GROUP BY 1, 2
    """,
)
def q_stream_sliding(spark, sf_dir):
    """Sliding (hopping) window counts as real Structured Streaming, AvailableNow, watermark-bounded state (streaming/windows.py:sliding_counts)."""
    from elb_log_to_mysql_spark.streaming.windows import sliding_counts

    raw_schema = raw_parquet_schema(spark, os.path.join(sf_dir, "events.parquet"))

    def transform(stream):
        from elb_log_to_mysql_spark.streaming.windows import ensure_event_time

        return sliding_counts(ensure_event_time(stream))

    return run_stream_to_batch(
        spark, os.path.join(sf_dir, "events.parquet"), transform, raw_schema
    )


@_q(
    "session_window",
    f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), ids AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
             AS session_end_gap,
           COUNT(*) AS n_events,
           {_dsum('value')} AS session_value
    FROM ids GROUP BY user_id, session_seq
    """,
)
def q_session_window(spark, sf_dir):
    """Streaming session windows (dynamic gap close) over event times, run AvailableNow and finalized by watermark (streaming/windows.py:session_window_agg)."""
    # Spark's native merging session-window operator, cross-checked
    # against the independent gap-and-island SQL formulation.
    from elb_log_to_mysql_spark.streaming.windows import session_window_agg

    return session_window_agg(_t(spark, sf_dir, "events"))


@_q(
    "stream_stateful",
    """
    WITH gaps AS (
      SELECT user_id, value,
             epoch_us(ts) - epoch_us(lag(ts) OVER
               (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           COALESCE(MAX(gap_us), 0) AS max_gap_us
    FROM gaps GROUP BY user_id
    """,
)
def q_stream_stateful(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running profile; final state checked against a batch SQL
    oracle (integer cents/µs state makes it order-independent)."""
    from elb_log_to_mysql_spark.streaming.stateful import user_profile_stream

    raw_schema = raw_parquet_schema(spark, os.path.join(sf_dir, "events.parquet"))

    def transform(stream):
        from elb_log_to_mysql_spark.streaming.windows import event_time_micros

        prepared = stream.select(
            "user_id", "event_id", event_time_micros(stream), "value"
        )
        return user_profile_stream(prepared)

    updates = run_stream_to_batch(
        spark,
        os.path.join(sf_dir, "events.parquet"),
        transform,
        raw_schema,
        output_mode="update",
    )
    # update mode emits one row per (user, micro-batch); the final
    # profile is the row with the highest running count.
    return updates.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("sum_cents", "n_events").alias("sum_cents"),
        F.max_by("max_gap_us", "n_events").alias("max_gap_us"),
    )


@_q(
    "udtf_sentences",
    """
    WITH parts AS (
      SELECT doc_id, string_split(text, '. ') AS p FROM documents
    ), e AS (
      SELECT doc_id, p, unnest(generate_series(1, len(p))) AS i FROM parts
    )
    SELECT doc_id, i - 1 AS sentence_idx, p[i] AS sentence,
           len(p[i]) AS n_chars
    FROM e
    """,
)
def q_udtf_sentences(spark, sf_dir):
    """Python UDTF (table function): one input row fans out to one row
    per sentence — the UDTF surface the reference lacks (SURVEY §2.1),
    registered and invoked through LATERAL in Spark SQL."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence_idx int, sentence string, n_chars int")
    class SentenceSplit:
        def eval(self, text: str):
            for i, s in enumerate((text or "").split(". ")):
                yield i, s, len(s)

    spark.udtf.register("sentence_split", SentenceSplit)
    load_tables(spark, sf_dir, ["documents"])
    return spark.sql(
        """
        SELECT d.doc_id, s.sentence_idx, s.sentence, s.n_chars
        FROM documents d, LATERAL sentence_split(d.text) s
        """
    )


@_q(
    "udaf_gini",
    """
    WITH cents AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY CAST(round(value * 100) AS BIGINT)) AS i
      FROM events
    )
    SELECT event_type, COUNT(*) AS n_events,
           (2.0 * SUM(i * c)) / (COUNT(*) * SUM(c))
             - (COUNT(*) + 1.0) / COUNT(*) AS gini_cents
    FROM cents GROUP BY event_type
    """,
)
def q_udaf_gini(spark, sf_dir):
    """Custom holistic aggregate (pandas grouped-agg UDF): Gini
    coefficient over integer cents — exact integer sums make the one
    double division bit-checkable against window SQL."""
    from elb_log_to_mysql_spark.operators.groupmap import gini_by_type

    return gini_by_type(_t(spark, sf_dir, "events"))


@_q(
    "resample_gapfill",
    f"""
    WITH counts AS (
      SELECT user_id,
             to_timestamp(CAST(floor(epoch(ts) / 900) AS BIGINT) * 900) AS bucket,
             COUNT(*) AS n_events,
             {_dsum('value')} AS sum_value
      FROM events GROUP BY user_id, bucket
    ), spans AS (
      SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi FROM counts
      GROUP BY user_id
    ), grid AS (
      SELECT user_id,
             unnest(generate_series(lo, hi, INTERVAL '15 minutes')) AS bucket
      FROM spans
    )
    SELECT g.user_id,
           strftime(g.bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           COALESCE(c.n_events, 0) AS n_events,
           COALESCE(c.sum_value, 0.0) AS sum_value
    FROM grid g LEFT JOIN counts c
      ON c.user_id = g.user_id AND c.bucket = g.bucket
    """,
)
def q_resample_gapfill(spark, sf_dir):
    """Per-user 15-minute resampling with gap fill (empty buckets
    emitted as zeros) — grid generated distributed from each user's
    own span."""
    return sessionize.resample_events(_t(spark, sf_dir, "events"))


@_q(
    "stream_stream_join",
    """
    SELECT c.user_id, c.event_id AS click_event_id,
           p.event_id AS purchase_event_id
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts <= c.ts
     AND p.ts >= c.ts - INTERVAL '1 hour'
    """,
)
def q_stream_stream_join(spark, sf_dir):
    """Stream-stream inner join with watermarks and a two-sided time
    bound (bounded buffer state); result equals the batch time-window
    join exactly."""
    from elb_log_to_mysql_spark.streaming.windows import (
        stream_stream_click_purchase_join,
    )

    raw_schema = raw_parquet_schema(spark, os.path.join(sf_dir, "events.parquet"))

    def transform(stream):
        from elb_log_to_mysql_spark.streaming.windows import ensure_event_time

        ev = ensure_event_time(stream)
        clicks = ev.filter(F.col("event_type") == "click")
        purchases = ev.filter(F.col("event_type") == "purchase")
        return stream_stream_click_purchase_join(clicks, purchases)

    return run_stream_to_batch(
        spark,
        os.path.join(sf_dir, "events.parquet"),
        transform,
        raw_schema,
        output_mode="append",
    )


@_q(
    "stream_dedup",
    """
    SELECT DISTINCT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def q_stream_dedup(spark, sf_dir):
    """Streaming exact dedup: the distinct-fingerprint set emitted by
    a watermark-bounded dropDuplicates over the document stream equals
    the batch DISTINCT (state keyed on fingerprint)."""
    from elb_log_to_mysql_spark.streaming.windows import stream_exact_dedup

    raw_schema = raw_parquet_schema(spark, os.path.join(sf_dir, "documents.parquet"))
    return run_stream_to_batch(
        spark,
        os.path.join(sf_dir, "documents.parquet"),
        lambda s: stream_exact_dedup(s),
        raw_schema,
        output_mode="append",
    )


# ===========================================================================
# Multimodal plumbing
# ===========================================================================

@_q(
    "multimodal_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           sha256(text) AS sha,
           CASE WHEN text LIKE 'the%' THEN 'text/en-start'
                ELSE 'text/other' END AS sniffed_format
    FROM documents
    """,
)
def q_multimodal_meta(spark, sf_dir):
    """Typed metadata projection over synthetic binary media payloads: format tag, declared dims, byte length — no decode (operators/multimodal.py)."""
    return multimodal.binary_metadata(_t(spark, sf_dir, "documents")).select(
        "doc_id", "byte_len", "sha", "sniffed_format"
    )


@_q(
    "multimodal_decode",
    """
    SELECT doc_id,
           CASE WHEN text LIKE 'RIFF%' THEN 'riff'
                WHEN text LIKE 'fLaC%' THEN 'flac'
                ELSE 'unknown' END AS fmt,
           CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
           CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def q_multimodal_decode(spark, sf_dir):
    """mapInPandas decode over the documented stub codec. The stub is
    a pure function of the payload bytes (magic sniff + length-derived
    dimensions), so the oracle recomputes it exactly in SQL — the
    Arrow batch plumbing, schema, and per-row kernel are all value-
    checked even though the codec itself is fake. PNG/JPEG magics are
    non-UTF8 byte sequences that cannot occur in text payloads, so the
    SQL sniff only needs the ASCII magics (RIFF/fLaC)."""
    media = multimodal.binary_metadata(_t(spark, sf_dir, "documents"))
    return multimodal.decode_media(media)


@_q(
    "media_dir_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           sha256(text) AS sha
    FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 64)
    """,
)
def q_media_dir_meta(spark, sf_dir):
    """binaryFile-source ingest e2e (sources/formats.py:read_media_dir):
    the first 64 documents are materialized as real files on disk, read
    back through the binaryFile source (path-glob pushed to the
    listing), and profiled with JVM-only expressions — id from the
    file name, byte length and sha2 of the raw content. The oracle
    recomputes both from the source table, so the digest proves the
    bytes survived the write→list→scan round trip intact. The 64-row
    driver-side materialization is the test harness, not the operator:
    at scale the media dir already exists."""
    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(64)
        .collect()
    )
    out_dir = _work_dir("media")
    for r in docs:
        with open(os.path.join(out_dir, f"doc_{r.doc_id}.bin"), "wb") as fh:
            fh.write(r.text.encode("utf-8"))
    from elb_log_to_mysql_spark.sources.formats import read_media_dir

    media = read_media_dir(spark, out_dir, glob="*.bin")
    return multimodal.media_metadata(media)


@_q(
    "multimodal_decode_real",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'bmp' END AS kind,
           CASE WHEN doc_id % 2 = 0
                THEN CAST(8000 + (doc_id % 4) * 2000 AS BIGINT) END
             AS sample_rate,
           CASE WHEN doc_id % 2 = 0
                THEN CAST(1 + (doc_id // 2) % 2 AS BIGINT) END AS n_channels,
           CASE WHEN doc_id % 2 = 0
                THEN CAST(100 + (n_chars % 100) AS BIGINT) END AS n_frames,
           CASE WHEN doc_id % 2 = 1
                THEN CAST(16 + doc_id % 16 AS BIGINT) END AS width,
           CASE WHEN doc_id % 2 = 1
                THEN CAST(8 + doc_id % 8 AS BIGINT) END AS height
    FROM (SELECT doc_id, n_chars FROM documents ORDER BY doc_id LIMIT 32)
    """,
)
def q_multimodal_decode_real(spark, sf_dir):
    """REAL-codec decode e2e — no stub arithmetic in the checked
    values: WAV and BMP containers are written with table-derived
    parameters (rate/channels/frames from doc_id and n_chars),
    ingested through the binaryFile source, and the decode
    (operators/multimodal.py:_decode_real_one) parses the ACTUAL
    container bytes — stdlib `wave` for the RIFF fmt chunk, the
    BITMAPINFOHEADER offsets for BMP. The oracle recomputes every
    field from the generation parameters, so a decoder that misreads
    any header field hash-mismatches. PNG is covered by
    multimodal_png_real (stdlib zlib DEFLATE + full unfiltering) and
    JPEG — since r8 — by multimodal_jpeg_real (vendored T.81
    baseline codec, operators/jpegcodec.py). This entry upgrades the
    family's evidence from replayed-stub to real-bytes for the
    formats the sandbox can decode."""
    from elb_log_to_mysql_spark.sources.formats import read_media_dir

    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
        .limit(32)
        .collect()
    )
    out_dir = _work_dir("media-real")
    for r in docs:
        if r.doc_id % 2 == 0:
            payload = multimodal.make_wav_bytes(
                sample_rate=8000 + (r.doc_id % 4) * 2000,
                n_channels=1 + (r.doc_id // 2) % 2,
                n_frames=100 + (r.n_chars % 100),
            )
        else:
            payload = multimodal.make_bmp_bytes(
                width=16 + r.doc_id % 16, height=8 + r.doc_id % 8
            )
        with open(os.path.join(out_dir, f"doc_{r.doc_id}.bin"), "wb") as fh:
            fh.write(payload)
    media = read_media_dir(spark, out_dir, glob="*.bin").select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    return multimodal.decode_media_real(media)


@_q(
    "multimodal_audio_real",
    """
    SELECT doc_id,
           CAST((50 + doc_id % 50) * (1 + doc_id % 2) AS BIGINT) AS n_samples,
           CAST(doc_id % 100 AS BIGINT) AS peak,
           CAST(doc_id % 100 AS BIGINT) AS rms
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 32)
    """,
)
def q_multimodal_audio_real(spark, sf_dir):
    """REAL audio sample decoding e2e: WAV fixtures carry a constant
    table-derived amplitude, so peak and RMS over the ACTUAL decoded
    int16 PCM frames are exactly predictable (rms of a constant |A|
    is A, bit-exact through IEEE sqrt of a perfect square). A decoder
    that misreads frame count, channel interleave, sample width, or
    byte order produces different statistics and hash-mismatches —
    this checks the payload bytes, where multimodal_decode_real checks
    the headers."""
    from elb_log_to_mysql_spark.sources.formats import read_media_dir

    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .orderBy("doc_id")
        .limit(32)
        .collect()
    )
    out_dir = _work_dir("media-audio")
    for r in docs:
        payload = multimodal.make_wav_bytes(
            sample_rate=16000,
            n_channels=1 + r.doc_id % 2,
            n_frames=50 + r.doc_id % 50,
            amplitude=r.doc_id % 100,
        )
        with open(os.path.join(out_dir, f"doc_{r.doc_id}.bin"), "wb") as fh:
            fh.write(payload)
    media = read_media_dir(spark, out_dir, glob="*.bin").select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    return multimodal.audio_features_real(media)


@_q(
    "multimodal_resize_real",
    """
    WITH f AS (
      SELECT doc_id, 16 + doc_id % 16 AS w, 8 + doc_id % 8 AS h
      FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 32)
    ), s AS (
      SELECT doc_id,
             GREATEST((w * 16) // GREATEST(w, h), 1) AS ow,
             GREATEST((h * 16) // GREATEST(w, h), 1) AS oh
      FROM f
    )
    SELECT doc_id,
           CAST(ow AS BIGINT) AS out_width,
           CAST(oh AS BIGINT) AS out_height,
           CAST(54 + oh * (3 * ow + (4 - (3 * ow) % 4) % 4) AS BIGINT)
             AS n_bytes,
           TRUE AS redecodes
    FROM s
    """,
)
def q_multimodal_resize_real(spark, sf_dir):
    """REAL image resize e2e: BMP fixtures with table-derived
    dimensions are ingested through the binaryFile source, their pixel
    arrays parsed from the actual container bytes, downscaled with
    integer nearest-neighbor indexing, and re-encoded as valid BMPs
    (operators/multimodal.py:resize_images_real). The oracle replays
    the integer scale arithmetic AND the BMP layout math (54-byte
    header + 4-byte-padded rows), and the operator re-decodes its own
    output in-plan — so wrong pixel geometry, wrong padding, or an
    unparseable output all hash-mismatch."""
    from elb_log_to_mysql_spark.sources.formats import read_media_dir

    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .orderBy("doc_id")
        .limit(32)
        .collect()
    )
    out_dir = _work_dir("media-resize")
    for r in docs:
        payload = multimodal.make_bmp_bytes(
            width=16 + r.doc_id % 16,
            height=8 + r.doc_id % 8,
            fill=r.doc_id % 256,
        )
        with open(os.path.join(out_dir, f"doc_{r.doc_id}.bin"), "wb") as fh:
            fh.write(payload)
    media = read_media_dir(spark, out_dir, glob="*.bin").select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    return multimodal.resize_images_real(media, max_side=16)


@_q(
    "partition_pruning",
    f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {DSUM_SQL.format(expr="value")} AS sum_value
    FROM events
    WHERE CAST(ts AS DATE) = DATE '2024-01-15'
    GROUP BY event_type
    """,
)
def q_partition_pruning(spark, sf_dir):
    """Hive-partitioned-layout pruning e2e (SURVEY §4.2's mapping of
    the reference's S3 prefix filter, etl:55-56, to partition
    elimination): events are written as an `event_date=.../` hive
    layout (sinks/layout.py:write_partitioned_idempotent — the same
    dynamic-overwrite sink the idempotent-ingest test exercises),
    read back through the partition-discovering reader, and filtered
    to ONE day before aggregating. The oracle recomputes the same
    day's rollup from the original unpartitioned parquet, so value
    equality proves the layout round trip; the companion plan test
    (tests/test_plans.py:test_hive_partition_pruning) proves the scan
    touched only the one matching partition directory — at 100 TB the
    difference between reading a day and reading a month. The copy is
    written to a fresh per-invocation directory (no stale partition
    directories to leak into the scan, and no shared-path race under
    concurrent invocation — see _work_dir)."""
    from elb_log_to_mysql_spark.sinks.layout import write_partitioned_idempotent

    events = _t(spark, sf_dir, "events")
    out_dir = os.path.join(_work_dir("hive"), "events")
    write_partitioned_idempotent(
        events.withColumn("event_date", F.to_date("ts")), out_dir, ["event_date"]
    )
    df = spark.read.parquet(out_dir).filter(
        F.col("event_date") == F.lit("2024-01-15").cast("date")
    )
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("sum_value"),
    )


@_q(
    "orc_source_agg",
    f"""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {{dsum_price}} AS sum_price,
           strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_order
    FROM orders GROUP BY o_orderstatus
    """.format(dsum_price=DSUM_SQL.format(expr="o_totalprice")),
)
def q_orc_source_agg(spark, sf_dir):
    """ORC source e2e (sources/formats.py:read_orc/write_orc): the
    orders table is round-tripped through our ORC sink, scanned back
    through the ORC source with an explicit schema, and aggregated;
    the oracle aggregates the original parquet — value equality proves
    the ORC round trip preserves every column it touches (decimal sum
    included). The fresh per-invocation directory keeps the copy in
    lockstep with regenerated testdata and race-free under
    concurrency (see _work_dir)."""
    from elb_log_to_mysql_spark.sources.formats import read_orc, write_orc

    orders = _t(spark, sf_dir, "orders")
    out_dir = os.path.join(_work_dir("orc"), "orders")
    write_orc(orders, out_dir)
    df = read_orc(spark, out_dir, orders.schema)
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("sum_price"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_order"),
    )


@_q(
    "multimodal_frames",
    """
    WITH sized AS (
      SELECT doc_id, octet_length(encode(text)) AS n,
             GREATEST(LEAST(4, octet_length(encode(text))), 1) AS k
      FROM documents
    )
    SELECT doc_id, k AS n_frames,
           k * GREATEST(n // k, 1) AS sampled_bytes
    FROM sized
    """,
)
def q_multimodal_frames(spark, sf_dir):
    """Frame sampling fan-out (1 payload -> k chunk rows), aggregated
    per doc so the oracle checks the fan-out arity and sampled byte
    accounting without shipping binary columns through the compare."""
    media = multimodal.binary_metadata(_t(spark, sf_dir, "documents"))
    frames = multimodal.sample_frames(media, n_frames=4)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("frame_len").alias("sampled_bytes"),
    )


@_q(
    "multimodal_features",
    """
    SELECT doc_id, CAST(16 AS INTEGER) AS dim, TRUE AS unit_norm
    FROM documents
    """,
)
def q_multimodal_features(spark, sf_dir):
    """Pseudo-embeddings from payload bytes; output feeds the
    similarity operators unchanged (same array<float> contract).
    Oracle checks the structural contract per row: every document
    yields a vector of the configured width with unit L2 norm (the
    payloads are non-empty, so the normalization always applies) —
    the well-formedness properties a real encoder swap must also
    preserve. The byte-histogram values themselves are stub artifacts
    and deliberately not pinned cross-engine."""
    media = multimodal.binary_metadata(_t(spark, sf_dir, "documents"))
    feats = multimodal.extract_features(media, dim=16)
    sq_norm = F.aggregate(
        F.transform("feature", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return feats.select(
        "doc_id",
        F.size("feature").alias("dim"),
        (F.abs(sq_norm - F.lit(1.0)) < F.lit(1e-6)).alias("unit_norm"),
    )


# ===========================================================================
# Reference-surface ALB parse. The generator is a pure function of
# the row index, so the oracle REGENERATES the expected rollup from
# the same index arithmetic — the parse chain (tokenize, safe casts,
# UA ladder) is thereby checked end-to-end against first principles:
# statuses cycle n%4 with '-'→0 (the to_int sentinel quirk, etl:43),
# method and UA cycle together on n%3 (Chrome/Safari/Unknown is the
# regex ladder's output for the three fixed UA strings).
# ===========================================================================

_ELB_PARSE_ORACLE = """
    WITH g AS (SELECT range AS n FROM range(0, 5000)),
    r AS (
      SELECT
        CASE n % 4 WHEN 0 THEN 200 WHEN 1 THEN 404 WHEN 2 THEN 500
                   ELSE 0 END AS elb_status_code,
        CASE n % 3 WHEN 0 THEN 'GET' WHEN 1 THEN 'POST'
                   ELSE 'PUT' END AS http_method,
        CASE n % 3 WHEN 0 THEN 'Chrome' WHEN 1 THEN 'Safari'
                   ELSE 'Unknown' END AS ua_browser_family,
        n % 1000 AS rcv,
        CAST('10' || CAST(n % 89 AS VARCHAR) AS BIGINT) AS snt
      FROM g
    )
    SELECT elb_status_code, http_method, ua_browser_family,
           COUNT(*) AS n_requests,
           CAST(SUM(rcv) AS BIGINT) AS total_received,
           CAST(SUM(snt) AS BIGINT) AS total_sent
    FROM r GROUP BY elb_status_code, http_method, ua_browser_family
    """


def _synthetic_alb_lines(spark, n_lines: int = 5000):
    """The deterministic ALB line generator shared by the elb_parse
    family: every field derives from the row index, so oracles can
    regenerate expectations from the same index arithmetic."""
    methods = F.array(F.lit("GET"), F.lit("POST"), F.lit("PUT"))
    uas = F.array(
        F.lit("Mozilla/5.0 (Windows NT 10.0; Win64; x64) Chrome/136.0.0.0 Safari/537.36"),
        F.lit("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Version/17.4 Safari/605.1.15"),
        F.lit("-"),
    )
    statuses = F.array(F.lit("200"), F.lit("404"), F.lit("500"), F.lit("-"))
    n = F.col("id")
    line = F.format_string(
        'h2 2025-05-26T%02d:%02d:%02d.000123Z app/demo/x 10.0.%d.%d:443 10.1.0.1:80 '
        '0.001 0.0%d 0.000 %s 200 %d 10%d "%s https://example.com/api/item/%d HTTP/2.0" '
        '"%s" TLS_AES_128_GCM_SHA256 TLSv1.3 arn:xxx',
        (n % 24).cast("int"),
        (n % 60).cast("int"),
        ((n * 7) % 60).cast("int"),
        (n % 256).cast("int"),
        ((n * 3) % 256).cast("int"),
        (n % 10).cast("int"),
        statuses[(n % 4).cast("int")],
        (n % 1000).cast("int"),
        (n % 89).cast("int"),
        methods[(n % 3).cast("int")],
        (n % 50).cast("int"),
        uas[(n % 3).cast("int")],
    )
    return spark.range(0, n_lines).select(line.alias("value"))


def _elb_parse_rollup(parsed):
    return parsed.groupBy(
        "elb_status_code", "http_method", "ua_browser_family"
    ).agg(
        F.count(F.lit(1)).alias("n_requests"),
        F.sum("received_bytes").alias("total_received"),
        F.sum("sent_bytes").alias("total_sent"),
    )


@_q("elb_parse", _ELB_PARSE_ORACLE)
def q_elb_parse(spark, sf_dir):
    """Flagship reference pipeline on deterministic synthetic ALB lines:
    generate -> parse (full P1-P16 chain) -> status/browser rollup."""
    lines = _synthetic_alb_lines(spark)
    parsed = parse_alb_lines(lines, source_file=F.lit("synthetic://alb"))
    return _elb_parse_rollup(parsed)


@_q("elb_parse_ua_join", _ELB_PARSE_ORACLE)
def q_elb_parse_ua_join(spark, sf_dir):
    """The SAME flagship pipeline through the streaming micro-batch
    shape (streaming/ingest.py): parse with deferred UA columns,
    persist the parsed frame, classify the DISTINCT agent strings
    with the Arrow evaluator and broadcast-join the families back
    (functions/ua.py:classify_ua_join — the dimension-join strategy
    that fixed the r8 ingest throughput dip, SCALE.md round-9).
    Sharing elb_parse's oracle makes ladder ≡ dimension-join a
    driver-certified identity, not only a local test: any divergence
    in null handling, join alignment, or evaluator-vs-ladder family
    naming hash-mismatches here. The persisted frame's lifetime is
    tied to the returned result via unpersist_on_gc (the gate
    consumes the plan lazily, then drops the frame) so repeated gate
    runs in one long-lived session don't accumulate cached blocks —
    matching the bounded foreachBatch lifetime in the real ingest."""
    from elb_log_to_mysql_spark.functions.ua import classify_ua_join

    lines = _synthetic_alb_lines(spark)
    parsed = parse_alb_lines(
        lines, source_file=F.lit("synthetic://alb"), ua_strategy="defer"
    ).persist()
    return unpersist_on_gc(
        _elb_parse_rollup(classify_ua_join(parsed)), parsed
    )


@_q("elb_parse_ua_auto", _ELB_PARSE_ORACLE)
def q_elb_parse_ua_auto(spark, sf_dir):
    """The flagship pipeline through ua_strategy="auto" (VERDICT r9
    item 6): parse_alb_lines probes the input (bounded count +
    approx-distinct over the first UA_PROBE_ROWS agents,
    functions/ua.py:choose_ua_strategy) and picks the CASE ladder or
    the dimension join from the measured duplication factor. The
    synthetic corpus is 5000 rows over 3 distinct agents (dup factor
    ~1667x), so the chooser selects the dimension join here — sharing
    elb_parse's oracle makes probe + decision + chosen plan one
    driver-certified identity; the decision table itself and the
    ladder selection on low-duplication input are pinned by
    tests/test_alb_parse.py."""
    lines = _synthetic_alb_lines(spark)
    parsed = parse_alb_lines(
        lines, source_file=F.lit("synthetic://alb"), ua_strategy="auto"
    )
    return _elb_parse_rollup(parsed)


@_q(
    "elb_url_stats",
    """
    WITH g AS (SELECT range AS n FROM range(0, 5000)),
    r AS (
      SELECT
        '/api/item/' || CAST(n % 50 AS VARCHAR) AS requested_path,
        CASE n % 4 WHEN 0 THEN 200 WHEN 1 THEN 404 WHEN 2 THEN 500
                   ELSE 0 END AS status,
        ROUND((CAST('0.001' AS DOUBLE)
               + CAST('0.0' || CAST(n % 10 AS VARCHAR) AS DOUBLE)
               + CAST('0.000' AS DOUBLE)) * 1000, 3) AS t_ms,
        n % 1000 AS rcv,
        CAST('10' || CAST(n % 89 AS VARCHAR) AS BIGINT) AS snt
      FROM g
    ), ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY requested_path
                                ORDER BY t_ms) AS rn,
             COUNT(*) OVER (PARTITION BY requested_path) AS cnt
      FROM r
    )
    SELECT requested_path,
           CAST(COUNT(*) AS BIGINT) AS n_requests,
           CAST(SUM(CASE WHEN status >= 500 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_errors,
           CAST(SUM(CASE WHEN status >= 500 THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS error_rate,
           CAST(SUM(rcv + snt) AS BIGINT) AS total_bytes,
           CAST(CAST(SUM(CAST(t_ms AS DECIMAL(28,8))) AS STRING)
                AS DOUBLE) / COUNT(*) AS mean_time_ms,
           MAX(CASE WHEN rn = CAST(ceil(0.95 * cnt) AS BIGINT)
                    THEN t_ms END) AS p95_time_ms
    FROM ranked GROUP BY requested_path
    """,
)
def q_elb_url_stats(spark, sf_dir):
    """The dashboard rollup a reference user runs against the loaded
    MySQL table (reference etl: the whole point of landing parsed
    rows in a database): per requested_path, request count, 5xx
    error rate, byte volume, mean latency, and p95 latency. The p95
    is the exact value-at-integer-rank (ceil(0.95·n)-th smallest —
    percentile_disc semantics replayed literally in the oracle as
    row_number + COUNT windows, so no cross-engine interpolation
    formula is trusted; ties share a value, making the rank pick
    deterministic). The mean goes through the decimal-image sum.

    Physical shape: the synthetic-parse chain is pure codegen; ONE
    shuffle on requested_path serves both the rank window and the
    final hash agg (same key, partitioning reused), so the rollup
    adds a single exchange to the parse — at real volume this is the
    log-analytics query shape: scan-heavy, one narrow-key shuffle."""
    from pyspark.sql import Window

    methods = F.array(F.lit("GET"), F.lit("POST"), F.lit("PUT"))
    uas = F.array(
        F.lit("Mozilla/5.0 (Windows NT 10.0; Win64; x64) Chrome/136.0.0.0 Safari/537.36"),
        F.lit("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Version/17.4 Safari/605.1.15"),
        F.lit("-"),
    )
    statuses = F.array(F.lit("200"), F.lit("404"), F.lit("500"), F.lit("-"))
    n = F.col("id")
    line = F.format_string(
        'h2 2025-05-26T%02d:%02d:%02d.000123Z app/demo/x 10.0.%d.%d:443 10.1.0.1:80 '
        '0.001 0.0%d 0.000 %s 200 %d 10%d "%s https://example.com/api/item/%d HTTP/2.0" '
        '"%s" TLS_AES_128_GCM_SHA256 TLSv1.3 arn:xxx',
        (n % 24).cast("int"),
        (n % 60).cast("int"),
        ((n * 7) % 60).cast("int"),
        (n % 256).cast("int"),
        ((n * 3) % 256).cast("int"),
        (n % 10).cast("int"),
        statuses[(n % 4).cast("int")],
        (n % 1000).cast("int"),
        (n % 89).cast("int"),
        methods[(n % 3).cast("int")],
        (n % 50).cast("int"),
        uas[(n % 3).cast("int")],
    )
    lines = spark.range(0, 5000).select(line.alias("value"))
    parsed = parse_alb_lines(lines, source_file=F.lit("synthetic://alb"))

    w_rank = Window.partitionBy("requested_path").orderBy(
        "total_processing_time_ms"
    )
    w_all = Window.partitionBy("requested_path")
    ranked = parsed.select(
        "requested_path",
        "elb_status_code",
        "total_processing_time_ms",
        "received_bytes",
        "sent_bytes",
    ).select(
        "*",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("cnt"),
    )
    is_err = (F.col("elb_status_code") >= 500).cast("long")
    from elb_log_to_mysql_spark.functions.numeric import davg

    return (
        ranked.groupBy("requested_path")
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.sum(is_err).alias("n_errors"),
            F.sum(F.col("received_bytes") + F.col("sent_bytes")).alias(
                "total_bytes"
            ),
            davg("total_processing_time_ms").alias("mean_time_ms"),
            F.max(
                F.when(
                    F.col("rn")
                    == F.ceil(F.lit(0.95) * F.col("cnt")).cast("long"),
                    F.col("total_processing_time_ms"),
                )
            ).alias("p95_time_ms"),
        )
        .select(
            "requested_path",
            "n_requests",
            "n_errors",
            (F.col("n_errors").cast("double") / F.col("n_requests")).alias(
                "error_rate"
            ),
            "total_bytes",
            "mean_time_ms",
            "p95_time_ms",
        )
    )


# ===========================================================================
# Reference-surface P12 parity: the exact uap-core resolution path
# (pandas UDF over the vendored database) checked cross-engine
# against a DuckDB CASE ladder COMPILED FROM THE SAME YAML — three
# independent evaluations of data/ua_regexes.yaml must agree per UA.
# ===========================================================================

_UA_SAMPLE: list[str] = [
    # one representative per family the database names, plus the
    # precedence traps (bot UAs embedding Chrome, rebadged Chromiums,
    # Chrome-before-Safari) and the blank/long-tail sentinels
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Linux; Android 13; Pixel 7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.6045.163 Mobile Safari/537.36",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/119.0.6045.169 Mobile/15E148 Safari/604.1",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) HeadlessChrome/118.0.0.0 Safari/537.36",
    "Mozilla/5.0 (X11; Ubuntu; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chromium/112.0.5615.49 Chrome/112.0.5615.49 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
    "Mozilla/5.0 (Linux; Android 10; HD1913) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.0.0 Mobile Safari/537.36 EdgA/119.0.2151.78",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.0.0 Safari/537.36 OPR/105.0.0.0",
    "Opera/9.80 (J2ME/MIDP; Opera Mini/9.80 (S60; SymbOS; Opera Mobi/23.348; U; en) Presto/2.5.25 Version/10.54",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/118.0.0.0 YaBrowser/23.11.0.0 Safari/537.36",
    "Mozilla/5.0 (Linux; U; Android 12; en-US; CPH2185) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/100.0.4896.58 UCBrowser/13.4.0.1306 Mobile Safari/537.36",
    "Mozilla/5.0 (Linux; Android 13; SAMSUNG SM-S918B) AppleWebKit/537.36 (KHTML, like Gecko) SamsungBrowser/23.0 Chrome/115.0.0.0 Mobile Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:120.0) Gecko/20100101 Firefox/120.0",
    "Mozilla/5.0 (Android 13; Mobile; rv:120.0) Gecko/120.0 Firefox/120.0",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) FxiOS/119.0 Mobile/15E148 Safari/605.1.15",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Safari/605.1.15",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1.1 Mobile/15E148 Safari/604.1",
    "Mozilla/5.0 (Linux; U; Android 4.4.2; en-us; SM-T530NU Build/KOT49H) AppleWebKit/534.30 (KHTML, like Gecko) Version/4.0 Safari/534.30",
    "Mozilla/5.0 (Windows NT 6.1; WOW64; Trident/7.0; rv:11.0) like Gecko",
    "Mozilla/5.0 (Linux; Android 6.0.1; Nexus 5X Build/MMB29P) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.6045.163 Mobile Safari/537.36 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
    "Mozilla/5.0 AppleWebKit/537.36 (KHTML, like Gecko; compatible; bingbot/2.0; +http://www.bing.com/bingbot.htm) Chrome/116.0.1938.76 Safari/537.36",
    "Mozilla/5.0 (compatible; YandexBot/3.0; +http://yandex.com/bots)",
    "Mozilla/5.0 (compatible; Yahoo! Slurp; http://help.yahoo.com/help/us/ysearch/slurp)",
    "curl/8.4.0",
    "python-requests/2.31.0",
    "Go-http-client/2.0",
    "Apache-HttpClient/4.5.13 (Java/11.0.19)",
    "Mozilla/5.0 (X11; CrOS x86_64 14541.0.0) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/117.0.0.0 Safari/537.36",
    "Mozilla/5.0 (X11; FreeBSD amd64; rv:109.0) Gecko/20100101 Firefox/115.0",
    # --- r8 long-tail certification: infrastructure probes, AI
    # crawlers, generic $1 naming (unknown bots and structured
    # product tokens resolve to their REAL names, not "Other"),
    # webviews, niche browsers — one row per new ladder section ---
    "ELB-HealthChecker/2.0",
    "Amazon CloudFront",
    "Mozilla/5.0 AppleWebKit/537.36 (KHTML, like Gecko); compatible; GPTBot/1.0; +https://openai.com/gptbot",
    "Mozilla/5.0 AppleWebKit/537.36 (KHTML, like Gecko; compatible; PerplexityBot/1.0; +https://perplexity.ai/perplexitybot)",
    "facebookexternalhit/1.1 (+http://www.facebook.com/externalhit_uatext.php)",
    "MyCompanyBot/2.3 (+https://example.com/bot)",
    "Mozilla/5.0 (compatible; WebDataSpider/1.1)",
    "Mozilla/5.0 (compatible; ObscureFetcher/1.4; +http://x.example)",
    "Dalvik/2.1.0 (Linux; U; Android 13; Pixel 7a Build/TQ3A)",
    "MyApp/7.3.2 CFNetwork/1410.0.3 Darwin/22.6.0",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) UnknownShell/5.0",
    "PostmanRuntime/7.35.0",
    "aws-sdk-js/2.1450.0 promise",
    "Debian APT-HTTP/1.3 (2.2.4)",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 16_6 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Mobile/15E148 Instagram 302.1.0.36.111",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Slack/4.35.126 Chrome/116.0.5845.190 Electron/26.2.4 Safari/537.36 Sonic Slack_SSB/4.35.126",
    "Mozilla/5.0 (Linux; Android 9; KFMAWI) AppleWebKit/537.36 (KHTML, like Gecko) Silk/112.2.5 like Chrome/112.0.5615.136 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:102.0) Gecko/20100101 Goanna/6.3 Firefox/102.0 PaleMoon/32.4.1",
    "Mozilla/5.0 (BB10; Touch) AppleWebKit/537.35+ (KHTML, like Gecko) Version/10.3.3.2205 Mobile Safari/537.35+",
    "VLC/3.0.18 LibVLC/3.0.18",
    "Mozilla/5.0 (SMART-TV; LINUX; Tizen 6.0) AppleWebKit/537.36 (KHTML, like Gecko) 76.0.3809.146/6.0 TV Safari/537.36",
    "SomeObscureAgent/0.1 (long tail)",
    "-",
    "",
]


def _ua_classify_oracle() -> str:
    from elb_log_to_mysql_spark.functions import uap

    vals = ",\n      ".join(
        f"({i}, {uap._sql_quote(ua)})" for i, ua in enumerate(_UA_SAMPLE)
    )
    bcase = uap.duckdb_case_sql("ua", uap.browser_parsers())
    ocase = uap.duckdb_case_sql("ua", uap.os_parsers())
    return f"""
    WITH u(ua_id, ua) AS (VALUES
      {vals}
    )
    SELECT ua_id,
           {bcase} AS browser,
           {ocase} AS os,
           TRUE AS ladder_agrees
    FROM u
    """


@_q("ua_classify", _ua_classify_oracle())
def q_ua_classify(spark, sf_dir):
    """P12 exact-parity path, driver-checked: the browser/os columns
    come from the Arrow-batched uap-core evaluator (functions/ua.py:
    classify_ua_rows, a mapInPandas stage — `user_agents` where
    installed, else the vendored database with the same algorithm),
    the oracle recomputes them via a DuckDB CASE ladder generated
    from the SAME yaml, and `ladder_agrees` pins the JVM rlike
    when-ladder against the evaluator in-plan (the oracle expects
    TRUE on every row). One driver row therefore certifies
    evaluator ≡ JVM ladder ≡ DuckDB CASE over a family-complete UA
    sample including the precedence traps. prefer_wrapper=False pins
    the evaluator to the VENDORED database: this entry's contract is
    three-way agreement over that database, and the full-uap-core
    `user_agents` wrapper (used by elb_parse when installed) would
    name long-tail agents the subset maps to "Other", spuriously
    failing the oracle in wrapper-equipped environments."""
    from elb_log_to_mysql_spark.functions.ua import (
        classify_ua_rows,
        ua_browser_family_expr,
        ua_os_family_expr,
    )

    df = spark.createDataFrame(
        [(i, ua) for i, ua in enumerate(_UA_SAMPLE)], "ua_id int, ua string"
    )
    classified = classify_ua_rows(
        df, "ua", "browser", "os", prefer_wrapper=False
    )
    return classified.select(
        "ua_id",
        "browser",
        "os",
        (
            (ua_browser_family_expr("ua") == F.col("browser"))
            & (ua_os_family_expr("ua") == F.col("os"))
        ).alias("ladder_agrees"),
    )


# ===========================================================================
# TPC-H battery: remaining canonical shapes (Q2/Q8/Q9/Q11/Q12/Q14/Q15/
# Q16/Q20/Q21/Q22), adapted to the test schema (operators/tpch.py)
# ===========================================================================

@_q(
    "tpch_q2",
    """
    WITH eu_supp AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), catalog AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS supp_price
      FROM lineitem
      WHERE l_suppkey IN (SELECT s_suppkey FROM eu_supp)
      GROUP BY l_partkey, l_suppkey
    ), min_price AS (
      SELECT l_partkey AS mp_partkey, MIN(supp_price) AS min_price
      FROM catalog GROUP BY l_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           ROUND(supp_price, 6) AS supp_price
    FROM catalog
    JOIN min_price ON l_partkey = mp_partkey AND supp_price = min_price
    JOIN part ON p_partkey = l_partkey
    JOIN eu_supp ON l_suppkey = s_suppkey
    WHERE p_size = 15 AND p_type = 'STANDARD'
    """,
)
def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 adapted to the test schema (operators/tpch.py; decimal-exact aggregates, broadcast dims)."""
    t = load_tables(spark, sf_dir, ["part", "supplier", "lineitem", "nation", "region"])
    return tpch.tpch_q2(t["part"], t["supplier"], t["lineitem"], t["nation"], t["region"])


@_q(
    "tpch_q8",
    f"""
    SELECT year(o_orderdate) AS o_year,
           {_dsum("CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
           / {_dsum('l_extendedprice * (1 - l_discount)')} AS mkt_share
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY o_year
    """,
)
def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 adapted to the test schema (operators/tpch.py; decimal-exact aggregates, broadcast dims)."""
    t = load_tables(
        spark, sf_dir,
        ["part", "supplier", "lineitem", "orders", "customer", "nation", "region"],
    )
    return tpch.tpch_q8(
        t["part"], t["supplier"], t["lineitem"], t["orders"], t["customer"],
        t["nation"], t["region"],
    )


@_q(
    "tpch_q9",
    f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           {_dsum('l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity')} AS sum_profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    """,
)
def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 adapted to the test schema (operators/tpch.py; decimal-exact aggregates, broadcast dims)."""
    t = load_tables(
        spark, sf_dir, ["part", "supplier", "lineitem", "orders", "nation"]
    )
    return tpch.tpch_q9(t["part"], t["supplier"], t["lineitem"], t["orders"], t["nation"])


@_q(
    "tpch_q11",
    f"""
    WITH asia_supp AS (
      SELECT s_suppkey FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ), per_part AS (
      SELECT l_partkey,
             {_dsum('l_extendedprice * (1 - l_discount)')} AS part_value
      FROM lineitem
      WHERE l_suppkey IN (SELECT s_suppkey FROM asia_supp)
      GROUP BY l_partkey
    )
    SELECT l_partkey, part_value
    FROM per_part
    WHERE part_value > (
      SELECT {_dsum('part_value')} * 0.001 FROM per_part
    )
    """,
)
def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 adapted to the test schema (operators/tpch.py; decimal-exact aggregates, broadcast dims)."""
    t = load_tables(spark, sf_dir, ["lineitem", "supplier", "nation", "region"])
    return tpch.tpch_q11(t["lineitem"], t["supplier"], t["nation"], t["region"])


@_q(
    "tpch_q12",
    """
    SELECT l_linestatus AS ship_mode,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_shipdate >= o_orderdate
    GROUP BY ship_mode
    """,
)
def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 adapted to the test schema (operators/tpch.py; decimal-exact aggregates, broadcast dims)."""
    return tpch.tpch_q12(_t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem"))


@_q(
    "tpch_q14",
    f"""
    SELECT 100.0 * {_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
           / {_dsum('l_extendedprice * (1 - l_discount)')} AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 adapted to the test schema (operators/tpch.py; decimal-exact aggregates, broadcast dims)."""
    return tpch.tpch_q14(_t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part"))


@_q(
    "tpch_q15",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM revenue JOIN supplier ON supplier_no = s_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q_tpch_q15(spark, sf_dir):
    """TPC-H Q15 adapted to the test schema (operators/tpch.py; decimal-exact aggregates, broadcast dims)."""
    return tpch.tpch_q15(_t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "supplier"))


@_q(
    "tpch_q16",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 14, 19, 23, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16 adapted to the test schema (operators/tpch.py; decimal-exact aggregates, broadcast dims)."""
    t = load_tables(spark, sf_dir, ["part", "supplier", "lineitem"])
    return tpch.tpch_q16(t["part"], t["supplier"], t["lineitem"])


@_q(
    "tpch_q20",
    f"""
    WITH qty96 AS (
      SELECT l_partkey, l_suppkey, {_dsum('l_quantity')} AS ps_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      GROUP BY l_partkey, l_suppkey
    ), per_part AS (
      SELECT l_partkey AS pp_partkey, {_dsum('ps_qty')} AS part_qty
      FROM qty96 GROUP BY l_partkey
    ), over_suppliers AS (
      SELECT DISTINCT l_suppkey FROM qty96
      JOIN per_part ON l_partkey = pp_partkey
      WHERE ps_qty > 0.2 * part_qty
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND s_suppkey IN (SELECT l_suppkey FROM over_suppliers)
    ORDER BY s_suppkey
    """,
)
def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 adapted to the test schema (operators/tpch.py; decimal-exact aggregates, broadcast dims)."""
    t = load_tables(spark, sf_dir, ["part", "supplier", "lineitem", "nation", "region"])
    return tpch.tpch_q20(
        t["part"], t["supplier"], t["lineitem"], t["nation"], t["region"]
    )


@_q(
    "tpch_q21",
    """
    WITH li AS (
      SELECT l_orderkey, l_suppkey,
             l_shipdate > o_orderdate + INTERVAL 60 DAY AS is_late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ), pairs AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM li
    ), late_pairs AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE is_late
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM late_pairs w
    JOIN supplier ON w.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND EXISTS (SELECT 1 FROM pairs p
                  WHERE p.l_orderkey = w.l_orderkey
                    AND p.l_suppkey <> w.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late_pairs lp
                      WHERE lp.l_orderkey = w.l_orderkey
                        AND lp.l_suppkey <> w.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21 adapted to the test schema (operators/tpch.py; decimal-exact aggregates, broadcast dims)."""
    t = load_tables(spark, sf_dir, ["supplier", "lineitem", "orders", "nation"])
    return tpch.tpch_q21(t["supplier"], t["lineitem"], t["orders"], t["nation"])


@_q(
    "tpch_q22",
    f"""
    SELECT n_name AS cntry, COUNT(*) AS numcust,
           {_dsum('c_acctbal')} AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE n_nationkey IN (0, 3, 7, 11, 17)
      AND c_acctbal > (
        SELECT {_dsum('c_acctbal')} / COUNT(*) FROM customer WHERE c_acctbal > 0.0
      )
      AND c_custkey NOT IN (
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY cntry
    """,
)
def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 adapted to the test schema (operators/tpch.py; decimal-exact aggregates, broadcast dims)."""
    t = load_tables(spark, sf_dir, ["customer", "orders", "nation"])
    return tpch.tpch_q22(t["customer"], t["orders"], t["nation"])


# ===========================================================================
# Training-data pipeline operators (operators/pipeline.py)
# ===========================================================================

@_q(
    "pii_scrub",
    r"""
    WITH seeded AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com or ' ||
             (doc_id % 800 + 100) || '-' || (doc_id % 80 + 10) || '-' ||
             (doc_id % 8000 + 1000) || ' ip 10.0.' || (doc_id % 256) ||
             '.7' AS text
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
           len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS n_ssn,
           len(regexp_extract_all(text, '\b\d{3}[- ]\d{3}[- ]\d{4}\b')) AS n_phone,
           len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
               '\b\d{3}[- ]\d{3}[- ]\d{4}\b', '<PHONE>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g') AS clean_text
    FROM seeded
    """,
)
def q_pii_scrub(spark, sf_dir):
    """PII redaction over documents seeded with synthetic, per-row-
    deterministic PII (emails, SSN-shaped ids, phone numbers, IPs) so
    the scrub is exercised on every row — the raw corpus contains
    none. Pure regexp column expressions: zero shuffles."""
    docs = _t(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com or "),
            (F.col("doc_id") % 800 + 100).cast("string"), F.lit("-"),
            (F.col("doc_id") % 80 + 10).cast("string"), F.lit("-"),
            (F.col("doc_id") % 8000 + 1000).cast("string"),
            F.lit(" ip 10.0."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ).alias("text"),
    )
    from elb_log_to_mysql_spark.operators.pipeline import pii_scrub

    return pii_scrub(seeded).select(
        "doc_id", "n_email", "n_ssn", "n_phone", "n_ipv4", "clean_text"
    )


@_q(
    "decontaminate",
    r"""
    WITH toks AS (
      SELECT doc_id, lang, n_chars,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 4, 0)),
               i -> array_to_string(t[i:i+4], ' ')))) AS gram
      FROM toks
    ), contaminated AS (
      SELECT DISTINCT doc_id FROM grams
      WHERE doc_id % 97 <> 0
        AND gram IN (SELECT gram FROM grams WHERE doc_id % 97 = 0)
    )
    SELECT doc_id, lang, n_chars FROM toks
    WHERE doc_id % 97 <> 0
      AND t IS NOT NULL
      AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
)
def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: docs with id ≡ 0 mod 97 stand in
    for an eval suite; training docs sharing any 5-gram with them are
    dropped via broadcast semi + anti joins (no corpus-side shuffle)."""
    from elb_log_to_mysql_spark.operators.pipeline import decontaminate

    docs = _t(spark, sf_dir, "documents")
    return decontaminate(docs).select("doc_id", "lang", "n_chars")


# exact end-to-end semantics — shares decontaminate's oracle verbatim
@_q("decontaminate_bloom", None)
def q_decontaminate_bloom(spark, sf_dir):
    """Bloom-pruned decontamination (operators/pipeline.py): the
    benchmark gram set is compressed into a constant-size JVM-probed
    Bloom filter; only bloom-positive docs reach the exact
    explode+join verification. Same output as `decontaminate` — the
    bloom can only over-select, and the exact stage kills its false
    positives."""
    from elb_log_to_mysql_spark.operators.pipeline import decontaminate_bloom

    docs = _t(spark, sf_dir, "documents")
    return decontaminate_bloom(docs).select("doc_id", "lang", "n_chars")


ORACLE_SQL["decontaminate_bloom"] = ORACLE_SQL["decontaminate"]


@_q(
    "shuffle_index",
    """
    SELECT doc_id,
           ROW_NUMBER() OVER (
             ORDER BY md5(doc_id::VARCHAR || '|seed42'), doc_id
           ) - 1 AS pos
    FROM documents
    """,
)
def q_shuffle_index(spark, sf_dir):
    """Deterministic global training-order permutation without a
    single-partition sort: hash-prefix buckets + per-bucket rank +
    prefix-sum offsets (operators/pipeline.py:shuffle_index)."""
    from elb_log_to_mysql_spark.operators.pipeline import shuffle_index

    docs = _t(spark, sf_dir, "documents")
    return shuffle_index(docs, "doc_id").select("doc_id", "pos")


@_q(
    "stratified_sample",
    """
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE md5(doc_id::VARCHAR || '|seed42') <
          CASE WHEN lang = 'en' THEN '2' ELSE '8' END
    """,
)
def q_stratified_sample(spark, sf_dir):
    """Corpus rebalance: downsample the dominant language to ~1/8 and
    the rest to ~1/2 with an md5-threshold — reproducible across runs
    and consistent across any table sharing doc_id. Pure filter."""
    from elb_log_to_mysql_spark.operators.pipeline import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "lang", "doc_id", {"en": "2"}, default_threshold="8"
    ).select("doc_id", "lang", "n_chars")


@_q(
    "sequence_pack",
    r"""
    WITH t AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\s+')) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (
               ORDER BY md5(doc_id::VARCHAR || '|seed42'), doc_id
             ) - n_tokens AS BIGINT) AS start
      FROM t
    )
    SELECT doc_id, n_tokens,
           CAST(FLOOR(start / 2048.0) AS BIGINT) AS seq_id,
           start % 2048 AS seq_offset
    FROM c
    """,
)
def q_sequence_pack(spark, sf_dir):
    """Concat-and-chunk sequence packing in deterministic shuffle
    order (operators/pipeline.py:sequence_pack): global token
    prefix-sum via hash-prefix buckets — no single-partition sort."""
    from elb_log_to_mysql_spark.operators.pipeline import sequence_pack

    docs = _t(spark, sf_dir, "documents")
    return sequence_pack(docs, "doc_id").select(
        "doc_id", "n_tokens", "seq_id", "seq_offset"
    )


@_q(
    "dedup_clusters",
    r"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS t FROM documents
    ), shingled AS (
      SELECT doc_id,
             list_distinct(list_transform(range(0, greatest(len(t)-2, 0)),
                    i -> concat_ws(' ', t[i+1], t[i+2], t[i+3]))) AS shingles
      FROM toks
    ), sh AS (
      SELECT doc_id, unnest(shingles) AS shingle
      FROM shingled WHERE len(shingles) > 0
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), edges AS (
      SELECT doc_id_a, doc_id_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_id_a
      JOIN sizes sb ON sb.doc_id = doc_id_b
      WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    ), sym AS (
      SELECT doc_id_a AS u, doc_id_b AS v FROM edges
      UNION ALL
      SELECT doc_id_b, doc_id_a FROM edges
    ), reach(id, label) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM sym)
      UNION
      SELECT s.v, r.label FROM reach r JOIN sym s ON r.id = s.u
    ), cc AS (
      SELECT id, MIN(label) AS cluster_id FROM reach GROUP BY id
    )
    SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN cc ON d.doc_id = cc.id
    """,
)
def q_dedup_clusters(spark, sf_dir):
    """Near-dup clusters: exact n-gram Jaccard pairs (threshold 0.5)
    closed transitively via min-label-propagation connected components
    (operators/graph.py) — every doc gets the min doc_id of its
    duplicate component. The DuckDB oracle computes the same closure
    with a recursive CTE."""
    from elb_log_to_mysql_spark.operators.graph import dedup_clusters
    from elb_log_to_mysql_spark.session import carry_caches

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    # Keep the pairs' shingle cache alive until this derived plan runs.
    return carry_caches(dedup_clusters(docs, pairs), pairs)


@_q(
    "window_distribution",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           NTILE(4) OVER w AS spend_quartile,
           ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 9) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_window_distribution(spark, sf_dir):
    """Distribution windows (ntile/percent_rank/cume_dist) with a
    unique ordering tiebreaker (operators/windows.py)."""
    return windows.window_distribution(_t(spark, sf_dir, "orders"))


@_q(
    "multimodal_resize",
    """
    WITH d AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n,
             octet_length(encode(text)) % 640 + 1 AS w,
             octet_length(encode(text)) % 480 + 1 AS h,
             CASE WHEN text LIKE 'RIFF%' THEN 'riff'
                  WHEN text LIKE 'fLaC%' THEN 'flac'
                  ELSE 'unknown' END AS fmt
      FROM documents
    ), s AS (
      SELECT *, LEAST(64.0 / GREATEST(w, h), 1.0) AS scale FROM d
    ), r AS (
      SELECT doc_id, n, fmt, w, h,
             GREATEST(CAST(TRUNC(w * scale) AS INTEGER), 1) AS width,
             GREATEST(CAST(TRUNC(h * scale) AS INTEGER), 1) AS height
      FROM s
    )
    SELECT doc_id, fmt, width, height,
           LEAST(
             GREATEST(
               CAST(TRUNC(n * ((width * height) / CAST(w * h AS DOUBLE)))
                    AS BIGINT),
               1),
             n) AS resized_len
    FROM r
    """,
)
def q_multimodal_resize(spark, sf_dir):
    """Resize-to-budget plumbing over mapInPandas (codec stubbed —
    operators/multimodal.py:resize_images). The stub's scale math is
    pure IEEE-double arithmetic on the payload length, so the oracle
    replays the identical operation sequence in SQL (same division and
    truncation order -> bit-identical intermediate doubles) and value-
    checks every output row; only the byte-slicing "codec" is fake.
    The LEAST(..., n) guard mirrors Python's slice semantics for
    degenerate empty payloads."""
    docs = _t(spark, sf_dir, "documents")
    media = multimodal.binary_metadata(docs)
    return multimodal.resize_images(media).select(
        "doc_id", "fmt", "width", "height", "resized_len"
    )


@_q(
    "scd2_history",
    """
    SELECT user_id, event_id, event_type AS state,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(LEAD(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
           LEAD(ts) OVER w IS NULL AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_scd2_history(spark, sf_dir):
    """SCD type-2 validity intervals from the event stream
    (operators/windows.py:scd2_history)."""
    return windows.scd2_history(_t(spark, sf_dir, "events"))


@_q(
    "sketch_rollup",
    """
    SELECT r_name,
           CAST(COUNT(DISTINCT n_name) AS BIGINT) AS n_nations,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts_exact,
           TRUE AS estimate_in_bound
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def q_sketch_rollup(spark, sf_dir):
    """Distinct parts per region via per-nation HLL sketch union —
    one fact scan for the whole hierarchy
    (operators/advanced.py:sketch_rollup) — under the same error-bound
    contract as approx_distinct: the oracle recomputes the exact
    distinct counts and nation fan-in, and the sketch estimate must
    land within 5x the HLL standard error (lgConfigK=12 -> rsd
    ~1.6%, so the bound is ~8%). Estimator bits are engine-specific
    and deliberately not compared."""
    t = load_tables(spark, sf_dir, ["lineitem", "supplier", "nation", "region"])
    est = advanced.sketch_rollup(
        t["lineitem"], t["supplier"], t["nation"], t["region"]
    )
    exact = (
        t["lineitem"]
        .join(
            F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(
            F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .groupBy("r_name")
        .agg(F.countDistinct("l_partkey").alias("n_parts_exact"))
    )
    rsd = 1.04 / (2**12) ** 0.5  # HLL standard error at lgConfigK=12
    return (
        est.join(exact, "r_name")
        .select(
            "r_name",
            "n_nations",
            "n_parts_exact",
            (
                F.abs(F.col("approx_parts") - F.col("n_parts_exact"))
                <= F.lit(5 * rsd) * F.col("n_parts_exact")
            ).alias("estimate_in_bound"),
        )
        .orderBy("r_name")
    )


@_q(
    "incremental_agg",
    f"""
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
           COUNT(*) AS n_events,
           {_dsum('value')} AS total_value,
           {_davg('value')} AS avg_value
    FROM events
    GROUP BY day, event_type
    """,
)
def q_incremental_agg(spark, sf_dir):
    """Two disjoint partial-state aggregations merged by re-aggregation
    must be bit-identical to the oracle's single-pass recompute —
    the algebraic-state contract (operators/advanced.py:incremental_agg)."""
    return advanced.incremental_agg(_t(spark, sf_dir, "events"))


@_q(
    "dedup_survivors",
    """
    WITH RECURSIVE toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x <> '') AS t FROM documents
    ), shingled AS (
      SELECT doc_id,
             list_distinct(list_transform(range(0, greatest(len(t)-2, 0)),
                    i -> concat_ws(' ', t[i+1], t[i+2], t[i+3]))) AS shingles
      FROM toks
    ), sh AS (
      SELECT doc_id, unnest(shingles) AS shingle
      FROM shingled WHERE len(shingles) > 0
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), edges AS (
      SELECT doc_id_a, doc_id_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_id_a
      JOIN sizes sb ON sb.doc_id = doc_id_b
      WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    ), sym AS (
      SELECT doc_id_a AS u, doc_id_b AS v FROM edges
      UNION ALL
      SELECT doc_id_b, doc_id_a FROM edges
    ), reach(id, label) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM sym)
      UNION
      SELECT s.v, r.label FROM reach r JOIN sym s ON r.id = s.u
    ), cc AS (
      SELECT id, MIN(label) AS cluster_id FROM reach GROUP BY id
    )
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d LEFT JOIN cc ON d.doc_id = cc.id
    WHERE COALESCE(cc.cluster_id, d.doc_id) = d.doc_id
    """,
)
def q_dedup_survivors(spark, sf_dir):
    """End-to-end near-dedup: pairs -> connected components -> keep
    one survivor per cluster (the min doc_id). The whole dedup story
    as a corpus->corpus transform."""
    from elb_log_to_mysql_spark.operators.graph import dedup_clusters
    from elb_log_to_mysql_spark.session import carry_caches

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    clusters = dedup_clusters(docs, pairs)
    out = (
        docs.join(clusters, "doc_id")
        .filter(F.col("cluster_id") == F.col("doc_id"))
        .select("doc_id", "lang", "n_chars")
    )
    # Keep the pairs' shingle cache alive until this derived plan runs.
    return carry_caches(out, pairs)


@_q(
    "bucketed_join",
    f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           {_dsum('o_totalprice')} AS sum_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_bucketed_join(spark, sf_dir):
    """Shuffle-free fact join via co-bucketed tables (sinks/layout.py).

    Both sides are persisted bucketed by the join key into the same
    bucket count, then joined through the catalog: the executed join
    has NO Exchange on either side — the write-time shuffle is paid
    once and amortized over every subsequent join, which at 100 TB
    removes the single largest steady-state exchange (fact-to-fact
    joins) from the pipeline (tests/test_layout.py asserts the
    no-Exchange plan property). The result is identical to the plain
    join, which is exactly what the oracle checks.
    """
    import hashlib

    from elb_log_to_mysql_spark.sinks.layout import write_bucketed

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    lt, rt = f"orders_bkt_{tag}", f"customer_bkt_{tag}"
    write_bucketed(
        _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
        lt, ["o_custkey"], 8, sort_by=["o_custkey"],
    )
    write_bucketed(
        _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
        rt, ["c_custkey"], 8, sort_by=["c_custkey"],
    )
    return (
        spark.table(lt)
        .join(
            spark.table(rt),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
        )
    )


# ===========================================================================
# Behavioral analytics / CDC battery (operators/analytics.py)
# ===========================================================================

@_q(
    "funnel_analysis",
    """
    WITH f AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ),
    v AS (
      SELECT user_id, ts, event_id FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM f WHERE event_type = 'view') WHERE rn = 1
    ),
    c AS (
      SELECT user_id, ts, event_id FROM (
        SELECT e.user_id, e.ts, e.event_id,
               ROW_NUMBER() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts, e.event_id) AS rn
        FROM f e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click'
          AND (e.ts, e.event_id) > (v.ts, v.event_id)) WHERE rn = 1
    ),
    p AS (
      SELECT user_id FROM (
        SELECT e.user_id,
               ROW_NUMBER() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts, e.event_id) AS rn
        FROM f e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase'
          AND (e.ts, e.event_id) > (c.ts, c.event_id)) WHERE rn = 1
    ),
    n AS (SELECT (SELECT COUNT(*) FROM v) AS s1,
                 (SELECT COUNT(*) FROM c) AS s2,
                 (SELECT COUNT(*) FROM p) AS s3)
    SELECT 1 AS step_idx, 'view' AS step_name, s1 AS n_users,
           ROUND(CAST(s1 AS DOUBLE) / s1, 9) AS conversion FROM n
    UNION ALL
    SELECT 2, 'click', s2, ROUND(CAST(s2 AS DOUBLE) / s1, 9) FROM n
    UNION ALL
    SELECT 3, 'purchase', s3, ROUND(CAST(s3 AS DOUBLE) / s1, 9) FROM n
    """,
)
def q_funnel_analysis(spark, sf_dir):
    """Ordered view->click->purchase funnel in ONE shuffle: per-user
    greedy subsequence fold as a codegen'd higher-order expression
    (operators/analytics.py:funnel_analysis); the oracle replays the
    equivalent min-after-min SQL chain."""
    return analytics.funnel_analysis(
        _t(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


@_q(
    "retention_cohorts",
    """
    WITH f AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    )
    SELECT strftime(date_trunc('week', f.cohort_day), '%Y-%m-%d')
             AS cohort_week,
           CAST(FLOOR(date_diff('day', f.cohort_day, CAST(e.ts AS DATE))
                      / 7.0) AS INTEGER) AS week_offset,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e JOIN f ON e.user_id = f.user_id
    GROUP BY cohort_week, week_offset
    """,
)
def q_retention_cohorts(spark, sf_dir):
    """Weekly cohort retention matrix
    (operators/analytics.py:retention_cohorts)."""
    return analytics.retention_cohorts(_t(spark, sf_dir, "events"))


@_q(
    "anomaly_zscore",
    f"""
    WITH s AS (
      SELECT event_type, COUNT(*) AS n,
             {_dsum('value')} AS sv,
             {_dsum('value * value')} AS svv
      FROM events GROUP BY event_type
    ),
    st AS (
      SELECT event_type, sv / n AS mean_v,
             SQRT((svv - sv * sv / n) / (n - 1)) AS stddev_v
      FROM s
    )
    SELECT event_id, e.event_type, value,
           ROUND((value - mean_v) / stddev_v, 6) AS zscore
    FROM events e JOIN st ON e.event_type = st.event_type
    WHERE ABS(ROUND((value - mean_v) / stddev_v, 6)) >= 3.0
    """,
)
def q_anomaly_zscore(spark, sf_dir):
    """Per-type z-score outlier flags; stats from exact-decimal sums
    so scores are bit-identical to the oracle
    (operators/analytics.py:anomaly_zscore)."""
    return analytics.anomaly_zscore(_t(spark, sf_dir, "events"))


@_q(
    "scd1_merge",
    """
    WITH b AS (
      SELECT user_id, ts, event_id, event_type FROM (
        SELECT user_id, ts, event_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '2024-01-20') WHERE rn = 1
    ),
    u AS (
      SELECT user_id, ts, event_id, event_type FROM (
        SELECT user_id, ts, event_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '2024-01-20') WHERE rn = 1
    )
    SELECT COALESCE(b.user_id, u.user_id) AS user_id,
           COALESCE(u.event_type, b.event_type) AS state,
           strftime(COALESCE(u.ts, b.ts), '%Y-%m-%d %H:%M:%S')
             AS updated_at,
           CASE WHEN b.user_id IS NULL THEN 'insert'
                WHEN u.user_id IS NULL THEN 'carry'
                ELSE 'update' END AS action
    FROM b FULL OUTER JOIN u ON b.user_id = u.user_id
    """,
)
def q_scd1_merge(spark, sf_dir):
    """CDC snapshot upsert: base (pre-split) merged with the change
    feed via tie-safe max(struct) latest-per-key — partial aggregate,
    no sort window (operators/analytics.py:scd1_merge)."""
    return analytics.scd1_merge(_t(spark, sf_dir, "events"), "2024-01-20")


@_q(
    "rolling_median",
    """
    SELECT user_id, event_id, value,
           ROUND(quantile_cont(value, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 9) AS med_10
    FROM events
    """,
)
def q_rolling_median(spark, sf_dir):
    """Exact trailing 10-row median per user — Spark `percentile`
    window vs DuckDB quantile_cont, identical interpolation
    (operators/analytics.py:rolling_median)."""
    return analytics.rolling_median(_t(spark, sf_dir, "events"), 10)


@_q(
    "data_profile",
    f"""
    WITH n AS (SELECT COUNT(*) AS n_rows FROM lineitem)
    SELECT 'l_quantity' AS col_name, n_rows,
           (SELECT COUNT(*) FROM lineitem WHERE l_quantity IS NULL)
             AS n_null,
           (SELECT COUNT(DISTINCT l_quantity) FROM lineitem) AS n_distinct,
           (SELECT CAST(MIN(l_quantity) AS DOUBLE) FROM lineitem)
             AS min_val,
           (SELECT CAST(MAX(l_quantity) AS DOUBLE) FROM lineitem)
             AS max_val,
           (SELECT {_davg('l_quantity')} FROM lineitem) AS avg_val
    FROM n
    UNION ALL
    SELECT 'l_extendedprice', n_rows,
           (SELECT COUNT(*) FROM lineitem WHERE l_extendedprice IS NULL),
           (SELECT COUNT(DISTINCT l_extendedprice) FROM lineitem),
           (SELECT CAST(MIN(l_extendedprice) AS DOUBLE) FROM lineitem),
           (SELECT CAST(MAX(l_extendedprice) AS DOUBLE) FROM lineitem),
           (SELECT {_davg('l_extendedprice')} FROM lineitem)
    FROM n
    UNION ALL
    SELECT 'l_discount', n_rows,
           (SELECT COUNT(*) FROM lineitem WHERE l_discount IS NULL),
           (SELECT COUNT(DISTINCT l_discount) FROM lineitem),
           (SELECT CAST(MIN(l_discount) AS DOUBLE) FROM lineitem),
           (SELECT CAST(MAX(l_discount) AS DOUBLE) FROM lineitem),
           (SELECT {_davg('l_discount')} FROM lineitem)
    FROM n
    UNION ALL
    SELECT 'l_tax', n_rows,
           (SELECT COUNT(*) FROM lineitem WHERE l_tax IS NULL),
           (SELECT COUNT(DISTINCT l_tax) FROM lineitem),
           (SELECT CAST(MIN(l_tax) AS DOUBLE) FROM lineitem),
           (SELECT CAST(MAX(l_tax) AS DOUBLE) FROM lineitem),
           (SELECT {_davg('l_tax')} FROM lineitem)
    FROM n
    """,
)
def q_data_profile(spark, sf_dir):
    """Deequ-style one-pass profiler: null/distinct/min/max/mean for
    four measures from a SINGLE fact scan, unpivoted via stack
    (operators/analytics.py:data_profile). The oracle recomputes each
    cell independently."""
    return analytics.data_profile(
        _t(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


@_q(
    "zorder_scan",
    f"""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           {_dsum('l_extendedprice')} AS sum_price
    FROM lineitem
    WHERE l_partkey BETWEEN 10 AND 150
      AND l_suppkey BETWEEN 1 AND 8
    GROUP BY l_returnflag
    """,
)
def q_zorder_scan(spark, sf_dir):
    """2-D range query over a Z-order-clustered copy of the fact table
    (sinks/layout.py:write_zordered). The Morton layout makes BOTH
    predicate columns' file/row-group statistics narrow, so the scan
    prunes ~everything outside the query rectangle — the 100 TB
    data-skipping lever (tests/test_layout.py pins that the z-ordered
    layout skips strictly more row groups than a 1-D sort for the same
    predicate). The oracle checks the clustered copy returns exactly
    the original table's answer."""
    import hashlib
    import tempfile

    from elb_log_to_mysql_spark.sinks.layout import write_zordered

    li = _t(spark, sf_dir, "lineitem")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"{tempfile.gettempdir()}/zorder_lineitem_{tag}"
    write_zordered(li, path, "l_partkey", "l_suppkey", num_files=16)
    return (
        spark.read.parquet(path)
        .filter(
            F.col("l_partkey").between(10, 150)
            & F.col("l_suppkey").between(1, 8)
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("l_extendedprice").alias("sum_price"),
        )
    )


@_q(
    "pagerank_parts",
    """
    WITH e AS (
      SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM lineitem
      UNION
      SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR),
                      'p' || CAST(l_partkey AS VARCHAR)
      FROM lineitem
    ),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
    nodes AS (SELECT DISTINCT src AS id FROM e),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    pr0 AS (SELECT id, 1.0 / n AS pr FROM nodes CROSS JOIN nn),
    it1 AS (
      SELECT nodes.id, 0.15 / nn.n + 0.85 * COALESCE(c.s, 0.0) AS pr
      FROM nodes CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS id, CAST(CAST(SUM(CAST(pr0.pr / deg.outdeg AS DECIMAL(28,8))) AS STRING) AS DOUBLE) AS s
        FROM e JOIN pr0 ON e.src = pr0.id
               JOIN deg ON e.src = deg.src
        GROUP BY e.dst) c ON nodes.id = c.id
    ),
    it2 AS (
      SELECT nodes.id, 0.15 / nn.n + 0.85 * COALESCE(c.s, 0.0) AS pr
      FROM nodes CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS id, CAST(CAST(SUM(CAST(it1.pr / deg.outdeg AS DECIMAL(28,8))) AS STRING) AS DOUBLE) AS s
        FROM e JOIN it1 ON e.src = it1.id
               JOIN deg ON e.src = deg.src
        GROUP BY e.dst) c ON nodes.id = c.id
    ),
    it3 AS (
      SELECT nodes.id, 0.15 / nn.n + 0.85 * COALESCE(c.s, 0.0) AS pr
      FROM nodes CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS id, CAST(CAST(SUM(CAST(it2.pr / deg.outdeg AS DECIMAL(28,8))) AS STRING) AS DOUBLE) AS s
        FROM e JOIN it2 ON e.src = it2.id
               JOIN deg ON e.src = deg.src
        GROUP BY e.dst) c ON nodes.id = c.id
    )
    SELECT id, ROUND(pr, 9) AS pr FROM it3
""",
)
def q_pagerank_parts(spark, sf_dir):
    """Fixed-3-iteration PageRank over the symmetrized part-supplier
    bipartite graph (operators/graph.py:pagerank). Each iteration is
    one shuffle; contributions go through the exact-decimal contract
    so ranks are bit-identical to the oracle's unrolled-CTE replay of
    the same iterations."""
    from elb_log_to_mysql_spark.operators.graph import pagerank

    li = _t(spark, sf_dir, "lineitem")
    p = F.concat(F.lit("p"), F.col("l_partkey").cast("string"))
    s = F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
    edges = li.select(p.alias("src"), s.alias("dst")).union(
        li.select(s.alias("src"), p.alias("dst"))
    )
    pr = pagerank(edges, iterations=3, damping=0.85)
    return pr.select("id", F.round("pr", 9).alias("pr"))


@_q(
    "fuzzy_match_parts",
    """
    WITH v AS (
      SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL
    ),
    bb AS (SELECT name, regexp_extract(name, '[^ ]+$') AS blk FROM v)
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
    FROM bb a JOIN bb b ON a.blk = b.blk AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= 3
    """,
)
def q_fuzzy_match_parts(spark, sf_dir):
    """Blocked fuzzy matching over part names: block on the head noun,
    verify with JVM-side levenshtein inside the join stage
    (operators/textops.py:fuzzy_name_pairs)."""
    out = textops.fuzzy_name_pairs(
        _t(spark, sf_dir, "part"), "p_name", max_dist=3
    )
    return out.select("name_a", "name_b", F.col("dist").cast("long").alias("dist"))


@_q(
    "triangle_count_cosupply",
    """
    WITH ps AS (
      SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
    ),
    e AS (
      SELECT DISTINCT a.s AS u, b.s AS v
      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
    )
    SELECT COUNT(*) AS n_triangles
    FROM e ab
    JOIN e bc ON ab.v = bc.u
    JOIN e ac ON ac.u = ab.u AND ac.v = bc.v
    """,
)
def q_triangle_count_cosupply(spark, sf_dir):
    """Triangle count of the supplier co-supply graph via degree-
    ordered wedge enumeration (operators/graph.py:triangle_count); the
    oracle counts the same triangles with the orientation-free
    canonical 3-way join."""
    from elb_log_to_mysql_spark.operators.graph import triangle_count

    ps = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a, b = ps.alias("a"), ps.alias("b")
    edges = (
        a.join(b, F.col("a.p") == F.col("b.p"))
        .filter(F.col("a.s") < F.col("b.s"))
        .select(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .distinct()
    )
    return triangle_count(edges)


@_q(
    "jsonl_deadletter",
    """
    SELECT CAST(SUM(CASE WHEN event_id % 10 <> 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_good,
           CAST(SUM(CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bad,
           CAST(SUM(CASE WHEN event_id % 10 <> 0
                    THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
               END) AS BIGINT) AS sum_k
    FROM events
    """,
)
def q_jsonl_deadletter(spark, sf_dir):
    """Error-absorbing JSON ingest (sources/formats.py:
    read_jsonl_with_deadletter): every 10th event's JSON payload is
    deterministically truncated before staging, the PERMISSIVE reader
    routes those lines to the dead-letter frame verbatim, and the
    good frame parses the rest — the at-scale replacement for the
    reference's silent row drop (etl:129-131). The oracle recomputes
    good/bad/sum from the uncorrupted table by the same id rule."""
    from elb_log_to_mysql_spark.sources.formats import read_jsonl_with_deadletter

    ev = _t(spark, sf_dir, "events")
    line = F.when(
        F.col("event_id") % 10 == 0,
        F.expr("substring(props, 1, length(props) - 1)"),
    ).otherwise(F.col("props"))
    staged = os.path.join(_work_dir("jsonl-dl"), "staged")
    ev.select(line.alias("value")).write.mode("overwrite").text(staged)
    good, dead = read_jsonl_with_deadletter(spark, staged, "k long")
    g = good.agg(
        F.count(F.lit(1)).alias("n_good"), F.sum("k").alias("sum_k")
    )
    d = dead.agg(F.count(F.lit(1)).alias("n_bad"))
    return g.crossJoin(d).select("n_good", "n_bad", "sum_k")


@_q(
    "weighted_sample",
    """
    WITH w AS (
      SELECT c_mktsegment, c_custkey,
             GREATEST(c_acctbal, 0.01) AS w
      FROM customer
    ),
    c AS (
      SELECT c_mktsegment, c_custkey, w,
             CAST(CAST(SUM(CAST(w AS DECIMAL(28,8)))
                       OVER (PARTITION BY c_mktsegment ORDER BY c_custkey)
                  AS STRING) AS DOUBLE) AS cw,
             CAST(CAST(SUM(CAST(w AS DECIMAL(28,8)))
                       OVER (PARTITION BY c_mktsegment)
                  AS STRING) AS DOUBLE) AS tw
      FROM w
    )
    SELECT c_mktsegment, c_custkey
    FROM c
    WHERE FLOOR(cw / (tw / 20)) > FLOOR((cw - w) / (tw / 20))
    """,
)
def q_weighted_sample(spark, sf_dir):
    """PPS systematic sampling: 20 customers per segment, probability
    proportional to account balance — transcendental-free (decimal
    cumsums + IEEE-exact floor arithmetic) so the picked set is
    bit-identical across engines
    (operators/analytics.py:pps_systematic_sample)."""
    return analytics.pps_systematic_sample(
        _t(spark, sf_dir, "customer"),
        "c_mktsegment",
        "c_custkey",
        F.greatest(F.col("c_acctbal"), F.lit(0.01)),
        k=20,
    )


@_q(
    "histogram",
    """
    WITH b AS (
      SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
      FROM lineitem
    ),
    f AS (
      SELECT CAST(LEAST(FLOOR((l_extendedprice - lo) / ((hi - lo) / 20)),
                        19) AS INTEGER) AS bin, lo, hi
      FROM lineitem CROSS JOIN b
    )
    SELECT bin,
           ROUND(lo + bin * ((hi - lo) / 20), 6) AS bin_lo,
           ROUND(lo + (bin + 1) * ((hi - lo) / 20), 6) AS bin_hi,
           COUNT(*) AS n
    FROM f
    GROUP BY bin, lo, hi
    ORDER BY bin
    """,
)
def q_histogram(spark, sf_dir):
    """Equal-width 20-bin histogram with in-plan broadcast bounds
    (operators/analytics.py:equal_width_histogram)."""
    return analytics.equal_width_histogram(
        _t(spark, sf_dir, "lineitem"), F.col("l_extendedprice"), bins=20
    )


@_q(
    "semantic_dedup",
    """
    WITH RECURSIVE edges AS (
      SELECT a.vec_id AS u, b.vec_id AS v
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
    ), sym AS (
      SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges
    ), reach(id, label) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM sym)
      UNION
      SELECT s.v, r.label FROM reach r JOIN sym s ON r.id = s.u
    ), cc AS (
      SELECT id, MIN(label) AS cluster_id FROM reach GROUP BY id
    ), assigned AS (
      SELECT e.vec_id, e.label, COALESCE(cc.cluster_id, e.vec_id) AS cluster_id
      FROM embeddings e LEFT JOIN cc ON e.vec_id = cc.id
    )
    SELECT vec_id, label, cluster_id,
           vec_id = cluster_id AS is_survivor
    FROM assigned
    """,
)
def q_semantic_dedup(spark, sf_dir):
    """Semantic (embedding-space) dedup end to end: exact cosine
    near-dup pairs -> connected components -> min-id survivor policy,
    composing the ANN and graph families
    (operators/similarity.py:embedding_near_dup +
    operators/graph.py:dedup_clusters). In production the pair stage
    swaps to the LSH-bucketed variant (embedding_near_dup_lsh) — same
    downstream closure; the exact twin here keeps the oracle exact.
    The 0.45 threshold carries >5e-4 margin to the nearest pair, so
    float32-vs-double accumulation cannot flip an edge."""
    from elb_log_to_mysql_spark.operators.graph import dedup_clusters

    emb = _t(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_near_dup(emb, threshold=0.45).select(
        F.col("id_a").alias("doc_id_a"), F.col("id_b").alias("doc_id_b")
    )
    clusters = dedup_clusters(
        emb.select(F.col("vec_id").alias("doc_id")),
        pairs,
    )
    return (
        emb.select("vec_id", "label")
        .join(
            clusters.withColumnRenamed("doc_id", "vec_id"), "vec_id"
        )
        .select(
            "vec_id",
            "label",
            "cluster_id",
            (F.col("vec_id") == F.col("cluster_id")).alias("is_survivor"),
        )
    )


@_q(
    "ewma",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(list_reduce(list(value ORDER BY ts, event_id),
                             (acc, x) -> (x + acc) / 2), 9) AS ewma
    FROM events GROUP BY user_id
    """,
)
def q_ewma(spark, sf_dir):
    """Per-user EWMA (decay 1/2) folded over event history — halving
    is exact IEEE arithmetic, so the fold is bit-identical to the
    oracle's list_reduce (operators/analytics.py:ewma_per_user)."""
    return analytics.ewma_per_user(_t(spark, sf_dir, "events"))


@_q(
    "event_transitions",
    """
    WITH p AS (
      SELECT event_type AS to_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS from_type
      FROM events
    ), c AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM p WHERE from_type IS NOT NULL GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type),
                 9) AS p
    FROM c
    """,
)
def q_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over the event stream
    (operators/analytics.py:event_transitions)."""
    return analytics.event_transitions(_t(spark, sf_dir, "events"))


@_q(
    "multimodal_png_real",
    """
    SELECT doc_id,
           CAST(16 + doc_id % 16 AS INTEGER) AS width,
           CAST(8 + doc_id % 8 AS INTEGER) AS height,
           ROUND(CAST(doc_id AS DOUBLE) + (8 + doc_id % 8 - 1) / 2.0, 6)
             AS mean_pixel
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 32)
    """,
)
def q_multimodal_png_real(spark, sf_dir):
    """REAL compressed-container decode e2e: PNG fixtures (8-bit RGB,
    real DEFLATE via stdlib zlib, scanline filters cycling through all
    five types) are decoded by inflating and unfiltering the actual
    byte stream (operators/multimodal.py:png_decode_pixels). Pixels
    form a vertical gradient (row r = doc_id + r, no 256-wrap in this
    id range), so the decoded mean is exactly doc_id + (height-1)/2 —
    a wrong sub/up/average/paeth predictor shifts the mean and
    hash-mismatches. This closes the 'compressed formats need external
    codecs' gap for the one compressed format whose codec ships in the
    standard library."""
    from elb_log_to_mysql_spark.sources.formats import read_media_dir

    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .orderBy("doc_id")
        .limit(32)
        .collect()
    )
    out_dir = _work_dir("media-png")
    for r in docs:
        payload = multimodal.make_png_bytes(
            width=16 + r.doc_id % 16,
            height=8 + r.doc_id % 8,
            row_base=r.doc_id,
        )
        with open(os.path.join(out_dir, f"doc_{r.doc_id}.png"), "wb") as fh:
            fh.write(payload)
    media = read_media_dir(spark, out_dir, glob="*.png").select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.png", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    return multimodal.decode_png_media(media)


@_q(
    "multimodal_jpeg_real",
    """
    SELECT doc_id,
           CAST(8 * (2 + doc_id % 3) AS INTEGER) AS width,
           CAST(8 * (1 + doc_id % 2) AS INTEGER) AS height,
           ROUND(CAST(2 * (doc_id % 100)
                      + ((2 + doc_id % 3) * (1 + doc_id % 2) - 1)
                      AS DOUBLE), 6) AS mean_pixel
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 32)
    """,
)
def q_multimodal_jpeg_real(spark, sf_dir):
    """REAL JPEG decode e2e with the VENDORED baseline codec
    (operators/jpegcodec.py — public T.81 spec: Huffman entropy
    decode with byte unstuffing, DC prediction, dequantization,
    de-zigzag, inverse DCT, level shift), closing the r7 'JPEG is the
    one stubbed codec' gap without any external library. Fixtures
    are spec-valid JFIF files from the vendored ENCODER (forward
    DCT + quantization + canonical in-stream Huffman tables) whose
    8x8 blocks are constant at even levels: such blocks carry only a
    DC coefficient and with qDC=16 the encode→decode round trip is
    integer-EXACT, so the oracle recomputes each decoded mean from
    the generation parameters alone — block i of doc d decodes to
    exactly 2*(d%100 + i) (base d%100 <= 99 and <= 5 blocks keep the
    level under 256 for ANY id space), giving mean
    2*(d%100) + (n_blocks-1). A wrong Huffman table read, bit-reader
    off-by-one, dequant slip, or IDCT scale error shifts the mean
    and hash-mismatches. Same mapInPandas plumbing/plan shape as
    multimodal_png_real (scan -> project, no shuffle)."""
    from elb_log_to_mysql_spark.sources.formats import read_media_dir

    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .orderBy("doc_id")
        .limit(32)
        .collect()
    )
    out_dir = _work_dir("media-jpeg")
    for r in docs:
        payload = multimodal.make_baseline_jpeg_bytes(
            width=8 * (2 + r.doc_id % 3),
            height=8 * (1 + r.doc_id % 2),
            block_base=r.doc_id % 100,
        )
        with open(os.path.join(out_dir, f"doc_{r.doc_id}.jpg"), "wb") as fh:
            fh.write(payload)
    media = read_media_dir(spark, out_dir, glob="*.jpg").select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.jpg", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    return multimodal.decode_jpeg_media_vendored(media)


@_q(
    "multimodal_jpeg_color",
    """
    SELECT doc_id,
           CAST(8 * (2 + doc_id % 3) AS INTEGER) AS width,
           CAST(8 * (1 + doc_id % 2) AS INTEGER) AS height,
           ROUND(CAST(2 * (doc_id % 100)
                      + ((2 + doc_id % 3) * (1 + doc_id % 2) - 1)
                      AS DOUBLE), 6) AS mean_pixel
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 24)
    """,
)
def q_multimodal_jpeg_color(spark, sf_dir):
    """COLOR JPEG decode e2e: 3-component 4:4:4 interleaved MCUs —
    per block, THREE entropy-coded units with independent DC
    predictors — plus the T.871 YCbCr→RGB reconstruction. Fixtures
    are gray-valued RGB blocks (r=g=b=even v), for which the color
    conversion is exact (Y=v, Cb=Cr=128: the chroma coefficient rows
    sum to zero), so the decoded RGB mean equals the grayscale
    formula and the oracle replays it from generation parameters —
    certifying the color path in the driver gate rather than only in
    unit tests (which cover the inexact general-color cases)."""
    from elb_log_to_mysql_spark.sources.formats import read_media_dir

    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .orderBy("doc_id")
        .limit(24)
        .collect()
    )
    out_dir = _work_dir("media-jpeg-color")
    for r in docs:
        payload = multimodal.make_baseline_jpeg_color_bytes(
            width=8 * (2 + r.doc_id % 3),
            height=8 * (1 + r.doc_id % 2),
            block_base=r.doc_id % 100,
        )
        with open(os.path.join(out_dir, f"doc_{r.doc_id}.jpg"), "wb") as fh:
            fh.write(payload)
    media = read_media_dir(spark, out_dir, glob="*.jpg").select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.jpg", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    return multimodal.decode_jpeg_media_vendored(media)


@_q(
    "multimodal_jpeg_420",
    """
    SELECT doc_id,
           CAST(8 * (2 + doc_id % 3) AS INTEGER) AS width,
           CAST(8 * (1 + doc_id % 2) AS INTEGER) AS height,
           ROUND(CAST(2 * (doc_id % 100)
                      + ((2 + doc_id % 3) * (1 + doc_id % 2) - 1)
                      AS DOUBLE), 6) AS mean_pixel
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 24)
    """,
)
def q_multimodal_jpeg_420(spark, sf_dir):
    """4:2:0 chroma-subsampled JPEG decode e2e — the DOMINANT wild
    JPEG layout (VERDICT r8 item 1): interleaved 16x16-pixel MCUs of
    4 Y + 1 Cb + 1 Cr data units, chroma at quarter resolution,
    replication upsampling, partial-MCU crop (widths 16/24/32 and
    heights 8/16 leave partial MCUs in both axes across the id
    range). Fixtures are gray-valued RGB 8x8-constant blocks at even
    levels: Y encodes each block's level exactly, the constant-128
    chroma survives the 2x2 box downsample and replication upsample
    exactly, so the decode is integer-exact and the oracle replays
    decoded means from generation parameters. The four Y blocks in
    an MCU carry DIFFERENT levels — a wrong interleave order, DC
    predictor routing, or upsample alignment shifts the mean and
    hash-mismatches. Same mapInPandas plumbing as the other media
    entries (scan -> project, no shuffle)."""
    from elb_log_to_mysql_spark.sources.formats import read_media_dir

    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .orderBy("doc_id")
        .limit(24)
        .collect()
    )
    out_dir = _work_dir("media-jpeg-420")
    for r in docs:
        payload = multimodal.make_baseline_jpeg_420_bytes(
            width=8 * (2 + r.doc_id % 3),
            height=8 * (1 + r.doc_id % 2),
            block_base=r.doc_id % 100,
        )
        with open(os.path.join(out_dir, f"doc_{r.doc_id}.jpg"), "wb") as fh:
            fh.write(payload)
    media = read_media_dir(spark, out_dir, glob="*.jpg").select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.jpg", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    return multimodal.decode_jpeg_media_vendored(media)


@_q(
    "multimodal_jpeg_progressive",
    """
    SELECT doc_id,
           CAST(8 * (2 + doc_id % 3) AS INTEGER) AS width,
           CAST(8 * (1 + doc_id % 2) AS INTEGER) AS height,
           ROUND(CAST(2 * (doc_id % 100)
                      + ((2 + doc_id % 3) * (1 + doc_id % 2) - 1)
                      AS DOUBLE), 6) AS mean_pixel
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 24)
    """,
)
def q_multimodal_jpeg_progressive(spark, sf_dir):
    """PROGRESSIVE (SOF2) JPEG decode e2e — the other dominant wild
    JPEG variant (VERDICT r8 'what's missing' item 1 second half):
    multi-scan streams with spectral selection and successive
    approximation. The vendored decoder accumulates coefficients
    across scans — DC first pass at reduced precision, DC refinement
    bits, per-band AC first passes with EOB runs spanning blocks, AC
    refinement with correction bits (T.81 G.1.2) — and reconstructs
    once at EOI. Fixtures come from the vendored progressive ENCODER
    (same quantized coefficients as the baseline fixture, multi-scan
    transmission), so the block-constant integer-exact property
    holds and the oracle replays decoded means from generation
    parameters: a wrong successive-approximation shift, EOB-run
    count, or per-scan predictor reset shifts the mean and
    hash-mismatches. tests/test_jpeg_codec.py additionally proves
    progressive ≡ baseline on random full-AC images (every entropy
    branch). Same mapInPandas plumbing (scan -> project, no
    shuffle)."""
    from elb_log_to_mysql_spark.sources.formats import read_media_dir

    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .orderBy("doc_id")
        .limit(24)
        .collect()
    )
    out_dir = _work_dir("media-jpeg-prog")
    for r in docs:
        payload = multimodal.make_progressive_jpeg_bytes(
            width=8 * (2 + r.doc_id % 3),
            height=8 * (1 + r.doc_id % 2),
            block_base=r.doc_id % 100,
        )
        with open(os.path.join(out_dir, f"doc_{r.doc_id}.jpg"), "wb") as fh:
            fh.write(payload)
    media = read_media_dir(spark, out_dir, glob="*.jpg").select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.jpg", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    return multimodal.decode_jpeg_media_vendored(media)


@_q(
    "sql_interface",
    """
    WITH seg AS (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    SELECT s.c_mktsegment, s.o_orderkey,
           CAST(n.n_orders AS BIGINT) AS n_orders,
           ROUND(s.o_totalprice, 2) AS top_price
    FROM seg s
    JOIN (SELECT c_mktsegment, COUNT(*) AS n_orders
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment) n
      ON s.c_mktsegment = n.c_mktsegment
    WHERE s.rk <= 3
    """,
)
def q_sql_interface(spark, sf_dir):
    """The SQL front end end-to-end: tables registered as catalog
    views (sources/tables.py:register_views), the query submitted as
    ONE spark.sql(...) string — CTE + window + join + subquery all
    parsed/planned by Spark SQL, zero DataFrame calls. Proves a
    SQL-only consumer gets the identical engine (same loader
    normalizations, same Catalyst plan machinery) as the DataFrame
    API."""
    from elb_log_to_mysql_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(ORACLE_SQL["sql_interface"])


def _sql_interface_entry(name: str, sql: str, doc: str):
    """Register one SQL-front-end battery entry (VERDICT r9 item 5):
    the query string is submitted VERBATIM via spark.sql(...) and is
    its own DuckDB oracle — a dialect-intersection proof that the SQL
    surface (not just the DataFrame API) computes this shape
    identically on both engines. Zero DataFrame calls."""

    @_q(name, sql)
    def q(spark, sf_dir):
        from elb_log_to_mysql_spark.sources.tables import register_views

        register_views(spark, sf_dir)
        return spark.sql(ORACLE_SQL[name])

    q.__doc__ = doc
    q.__name__ = f"q_{name}"
    return q


_sql_interface_entry(
    "sql_interface_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    "GROUPING SETS + GROUPING() markers through the SQL front end: "
    "three aggregation granularities in one pass, the grouping-id "
    "bit semantics proven identical across both parsers.",
)

_sql_interface_entry(
    "sql_interface_rollup",
    """
    SELECT n_name, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, o_orderpriority)
    """,
    "ROLLUP over a two-join star through the SQL front end; the "
    "DECIMAL(18,2) sum makes the rolled-up totals exact (not "
    "float-order-dependent) so the hash comparison is meaningful.",
)

_sql_interface_entry(
    "sql_interface_interval_join",
    """
    WITH bands AS (
      SELECT * FROM (VALUES (0, 10, 'small'), (10, 25, 'mid'), (25, 51, 'large'))
                AS b(lo, hi, band)
    )
    SELECT band, CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
    GROUP BY band
    """,
    "Non-equi interval join (VALUES inline dimension, half-open "
    "band predicate) through the SQL front end — Spark plans this "
    "as a broadcast nested-loop over the 3-row dim; the asof-style "
    "range containment semantics match DuckDB's exactly.",
)

_sql_interface_entry(
    "sql_interface_percentile",
    """
    SELECT l_returnflag,
           ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_extendedprice)
                 * 100, 0) / 100
             AS median_price,
           ROUND(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY l_extendedprice)
                 * 100, 0) / 100
             AS p90_price,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    "Ordered-set aggregate PERCENTILE_CONT ... WITHIN GROUP through "
    "the SQL front end: linear interpolation on the sorted group is "
    "deterministic, so exact doubles must agree across engines. The "
    "cent rounding is spelled ROUND(x*100,0)/100 rather than "
    "ROUND(x,2): a 2-decimal-price median interpolates to an exact "
    "half-cent whose double sits 1 ulp off x.xx5, where Spark "
    "(HALF_UP on the shortest decimal repr) and DuckDB "
    "(std::round(x*100)/100) disagree; both engines compute the "
    "identical IEEE product x*100 and round exact-.5 away from "
    "zero, so this form is engine-agnostic and preserves every "
    "previously-agreed value.",
)

_sql_interface_entry(
    "sql_interface_window_frame",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling3,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS BIGINT) AS rn
    FROM orders
    """,
    "Explicit ROWS window frame (3-row rolling DECIMAL sum, unique "
    "tiebreak) plus row numbering through the SQL front end — the "
    "bounded-frame syntax and semantics proven identical across "
    "engines on all 15k order rows.",
)

_sql_interface_entry(
    "sql_interface_exists",
    """
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderpriority = '5-LOW')
    GROUP BY c_mktsegment
    """,
    "Correlated EXISTS and NOT EXISTS predicates (Spark plans them "
    "as left-semi / left-anti joins) through the SQL front end.",
)

_sql_interface_entry(
    "sql_interface_having_case",
    """
    SELECT n_name,
           CAST(SUM(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_urgent,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM orders JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name HAVING COUNT(*) > 50
    """,
    "Conditional aggregation (CASE inside SUM), LIKE predicates, and "
    "a post-aggregation HAVING filter through the SQL front end.",
)

_sql_interface_entry(
    "sql_interface_setops",
    """
    WITH hi AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000),
         urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    SELECT 'both' AS tag, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT * FROM hi INTERSECT SELECT * FROM urgent) t
    UNION ALL
    SELECT 'hi_only' AS tag, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT * FROM hi EXCEPT SELECT * FROM urgent) t
    UNION ALL
    SELECT 'either' AS tag, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT * FROM hi UNION SELECT * FROM urgent) t
    """,
    "INTERSECT / EXCEPT / UNION (set semantics, bag-dedup) through "
    "the SQL front end, counted per branch so every set operator's "
    "distinct handling is hash-checked.",
)


@_q(
    "countmin_freq",
    """
    WITH buckets AS (
      SELECT 0 AS j, (CAST(l_partkey AS BIGINT) * 2654435761) % 2147483648 % 256 AS bucket FROM lineitem
      UNION ALL SELECT 1 AS j, (CAST(l_partkey AS BIGINT) * 2246822507) % 2147483648 % 256 AS bucket FROM lineitem
      UNION ALL SELECT 2 AS j, (CAST(l_partkey AS BIGINT) * 3266489909) % 2147483648 % 256 AS bucket FROM lineitem
    ), cms AS (
      SELECT j, bucket, COUNT(*) AS c FROM buckets GROUP BY j, bucket
    ), exact AS (
      SELECT l_partkey, COUNT(*) AS exact_n FROM lineitem
      GROUP BY l_partkey ORDER BY exact_n DESC, l_partkey LIMIT 10
    ), probes AS (
      SELECT l_partkey, exact_n, 0 AS j, (CAST(l_partkey AS BIGINT) * 2654435761) % 2147483648 % 256 AS bucket FROM exact
      UNION ALL SELECT l_partkey, exact_n, 1 AS j, (CAST(l_partkey AS BIGINT) * 2246822507) % 2147483648 % 256 AS bucket FROM exact
      UNION ALL SELECT l_partkey, exact_n, 2 AS j, (CAST(l_partkey AS BIGINT) * 3266489909) % 2147483648 % 256 AS bucket FROM exact
    )
    SELECT p.l_partkey, p.exact_n, MIN(c.c) AS cms_est,
           MIN(c.c) >= p.exact_n AS never_undercounts
    FROM probes p JOIN cms c ON p.j = c.j AND p.bucket = c.bucket
    GROUP BY p.l_partkey, p.exact_n
""",
)
def q_countmin_freq(spark, sf_dir):
    """Count-Min sketch frequency estimates for the 10 heaviest part
    keys, exact counts alongside and the structural never-undercount
    contract checked in-plan (operators/advanced.py:
    countmin_estimates). Pure 64-bit integer hashing, so the estimate
    itself is bit-reproducible and oracle-checked — the second
    mergeable sketch next to sketch_rollup's HLL."""
    return advanced.countmin_estimates(
        _t(spark, sf_dir, "lineitem"), "l_partkey", width=256, topk=10
    )


@_q(
    "skew_salted_join",
    f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           {_dsum('o_totalprice')} AS sum_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_skew_salted_join(spark, sf_dir):
    """Salted skew-resilient join (operators/skew.py:salted_join):
    the fact side spreads each key over 8 salts, the dim side
    replicates per salt, and the (key, salt) join reproduces the
    plain join's multiset exactly — checked by aggregating to the
    identical rollup the oracle computes with an unsalted join."""
    out = skew.salted_join(
        _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
        _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
        "o_custkey",
        "c_custkey",
        n_salts=8,
    )
    return out.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("sum_price"),
    )


@_q(
    "stream_funnel",
    ORACLE_SQL["funnel_analysis"],
)
def q_stream_funnel(spark, sf_dir):
    """The funnel as an INCREMENTAL streaming computation: per-user
    stage held in one int of keyed state (applyInPandasWithState,
    streaming/stateful.py:funnel_stream), drained with AvailableNow
    and rolled up to the identical step-count table the batch
    operator produces — same oracle as funnel_analysis, proving
    stream ≡ batch for the ordered-subsequence semantics."""
    from elb_log_to_mysql_spark.streaming.stateful import funnel_stream

    steps = ["view", "click", "purchase"]
    raw_schema = raw_parquet_schema(spark, os.path.join(sf_dir, "events.parquet"))

    def transform(stream):
        from elb_log_to_mysql_spark.streaming.windows import event_time_micros

        prepared = stream.filter(F.col("event_type").isin(steps)).select(
            "user_id", "event_id", event_time_micros(stream), "event_type"
        )
        return funnel_stream(prepared, steps)

    updates = run_stream_to_batch(
        spark,
        os.path.join(sf_dir, "events.parquet"),
        transform,
        raw_schema,
        output_mode="update",
    )
    per_user = updates.groupBy("user_id").agg(F.max("stage").alias("max_stage"))
    counts = per_user.agg(
        *[
            F.sum((F.col("max_stage") >= k).cast("bigint")).alias(f"s{k}")
            for k in range(1, len(steps) + 1)
        ]
    )
    stack_args = ", ".join(
        f"{k}, '{steps[k - 1]}', s{k}" for k in range(1, len(steps) + 1)
    )
    return (
        counts.select(
            F.expr(
                f"stack({len(steps)}, {stack_args}) "
                "AS (step_idx, step_name, n_users)"
            ),
            F.col("s1").alias("_first"),
        )
        .select(
            "step_idx",
            "step_name",
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("_first"), 9
            ).alias("conversion"),
        )
        .orderBy("step_idx")
    )


@_q(
    "asof_join_forward",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS side
      FROM events WHERE event_type IN ('click', 'purchase')
    ), merged AS (
      SELECT user_id, ts, event_id, side,
             last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
               OVER w AS p_id,
             last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS)
               OVER w AS p_value,
             last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
               OVER w AS p_ts
      FROM tagged
      WINDOW w AS (
        PARTITION BY user_id
        ORDER BY ts DESC, side,
                 (CASE WHEN side = 0 THEN event_id END) ASC NULLS FIRST,
                 (CASE WHEN side = 0 THEN value END) ASC NULLS FIRST
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id AS click_event_id,
           CASE WHEN p_ts IS NOT NULL
                 AND epoch_us(p_ts) - epoch_us(ts) <= 86400000000
                THEN p_id END AS next_purchase_id,
           CASE WHEN p_ts IS NOT NULL
                 AND epoch_us(p_ts) - epoch_us(ts) <= 86400000000
                THEN p_value END AS next_purchase_value
    FROM merged WHERE side = 1
    """,
)
def q_asof_join_forward(spark, sf_dir):
    """FORWARD as-of with tolerance: each click matched to the user's
    next purchase within 24 h (operators/asof.py, direction="forward",
    tolerance_us) — the other half of the merge-asof surface; same
    union-merge single-shuffle plan, time walked in reverse."""
    events = _t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    out = asof.asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_values={
            "event_id": "next_purchase_id",
            "value": "next_purchase_value",
        },
        direction="forward",
        tolerance_us=86_400_000_000,
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        "next_purchase_id",
        "next_purchase_value",
    )


@_q(
    "token_budget_sample",
    r"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(COALESCE(
               len(list_filter(string_split_regex(lower(text), '\s+'),
                               x -> x <> '')), 0) AS BIGINT) AS n_tokens
      FROM documents
    ), cum AS (
      SELECT doc_id, source, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '|seed42'), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS tokens_before
      FROM toks
    )
    SELECT doc_id, source, n_tokens, tokens_before
    FROM cum
    WHERE tokens_before < CASE source
                            WHEN 'src0' THEN 3000
                            WHEN 'src1' THEN 8000
                            WHEN 'src2' THEN 1000000000
                            ELSE 0 END
    """,
)
def q_token_budget_sample(spark, sf_dir):
    """TOKEN-budget training mix: fill 3k tokens of src0, 8k of src1,
    all of src2 (budget exceeds the stratum), drop src3 (no budget) —
    mixture_sample's semantics in the unit a training run actually
    consumes, selected in deterministic md5(key|salt) order. The
    per-stratum running token total comes from the stratified
    bucketed prefix-sum (no stratum-wide sort window); the emitted
    tokens_before replays exactly in the oracle's ROWS-window cumsum
    (operators/pipeline.py:token_budget_sample)."""
    from elb_log_to_mysql_spark.operators.pipeline import token_budget_sample

    return token_budget_sample(
        _t(spark, sf_dir, "documents"),
        strata_col="source",
        key_col="doc_id",
        budgets={"src0": 3000, "src1": 8000, "src2": 10**9},
    )


@_q(
    "mixture_sample",
    r"""
    WITH ranked AS (
      SELECT doc_id, source, lang, n_chars,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '|seed42'), doc_id
             ) - 1 AS BIGINT) AS mix_rank
      FROM documents
    )
    SELECT doc_id, source, lang, n_chars, mix_rank
    FROM ranked
    WHERE mix_rank < CASE source
                       WHEN 'src0' THEN 10
                       WHEN 'src1' THEN 5
                       WHEN 'src2' THEN 25
                       WHEN 'src3' THEN 40
                       ELSE 0 END
    """,
)
def q_mixture_sample(spark, sf_dir):
    """Exact-quota training-mix sampling: 10 docs of src0, 5 of src1,
    all of src2 (quota == stratum size), src3 over-quota (40 > 25,
    whole stratum survives), every other source dropped — the
    data-mixing step of a corpus build, selected in deterministic
    md5(key|salt) order via the stratified bucketed prefix-sum (no
    per-stratum single-partition sort;
    operators/pipeline.py:mixture_sample)."""
    from elb_log_to_mysql_spark.operators.pipeline import mixture_sample

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    return mixture_sample(
        docs,
        strata_col="source",
        key_col="doc_id",
        quotas={"src0": 10, "src1": 5, "src2": 25, "src3": 40},
    )


@_q(
    "source_overlap",
    r"""
    WITH toks AS (
      SELECT source, list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS t
      FROM documents
    ), grams AS (
      SELECT DISTINCT source AS src, substring(md5(g), 1, 16) AS fp
      FROM (
        SELECT source, unnest(list_distinct(list_transform(
                 generate_series(1, greatest(len(t) - 4, 0)),
                 i -> array_to_string(t[i:i+4], ' ')))) AS g
        FROM toks)
    ), sizes AS (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS n FROM grams GROUP BY src
    )
    SELECT a.src AS src_a, b.src AS src_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared,
           sa.n AS n_grams_a, sb.n AS n_grams_b,
           CAST(COUNT(*) AS DOUBLE) / LEAST(sa.n, sb.n) AS containment
    FROM grams a
    JOIN grams b USING (fp)
    JOIN sizes sa ON sa.src = a.src
    JOIN sizes sb ON sb.src = b.src
    WHERE a.src < b.src
    GROUP BY a.src, b.src, sa.n, sb.n
    """,
)
def q_source_overlap(spark, sf_dir):
    """Cross-source contamination matrix: distinct shared 5-gram
    fingerprints and containment ratio for every source pair — the
    curation diagnostic run before committing a training mix
    (operators/pipeline.py:source_overlap). The shuffle moves 16-char
    md5 fingerprints, never gram text."""
    from elb_log_to_mysql_spark.operators.pipeline import source_overlap

    return source_overlap(_t(spark, sf_dir, "documents"), ngram=5)


@_q(
    "unigram_prevalence",
    r"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS tok
      FROM documents
    ), vocab AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM toks GROUP BY tok
    )
    SELECT t.doc_id, t.lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(v.freq) AS BIGINT) AS sum_freq,
           MIN(v.freq) AS min_freq,
           CAST(SUM(v.freq) AS DOUBLE) / COUNT(*) AS mean_freq
    FROM toks t JOIN vocab v USING (tok)
    GROUP BY t.doc_id, t.lang
    """,
)
def q_unigram_prevalence(spark, sf_dir):
    """Unigram-LM corpus-frequency scoring: per doc, the corpus-wide
    frequency mass of its tokens (sum/min/mean) — the statistical
    quality signal a CCNet-style filter thresholds on. All-integer
    aggregation + one IEEE division = bit-exact vs the SQL replay
    (operators/textops.py:unigram_prevalence)."""
    return textops.unigram_prevalence(_t(spark, sf_dir, "documents"))


@_q(
    "kmeans_embeddings",
    r"""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings WHERE embedding IS NOT NULL
    ), seeds AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER)
               AS cluster_id,
             vec AS c
      FROM (SELECT vec_id, vec FROM v ORDER BY vec_id LIMIT 8)
    ), d0 AS (
      SELECT v.vec_id, v.vec, s.cluster_id,
             list_reduce(list_transform(generate_series(1, len(v.vec)),
                 i -> (v.vec[i] - s.c[i]) * (v.vec[i] - s.c[i])),
                 (acc, x) -> acc + x) AS dist
      FROM v CROSS JOIN seeds s
    ), a0 AS (
      SELECT vec_id, vec, cluster_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY dist, cluster_id) AS rn
        FROM d0) WHERE rn = 1
    ), m AS (
      -- aligned unnests pair vec[i] with its position i, so the
      -- per-(cluster, dim) group count matches Spark's posexplode
      -- exactly (dim-agnostic: no hardcoded vector length)
      SELECT cluster_id, i,
             CAST(CAST(SUM(CAST(x AS DECIMAL(28,8))) AS STRING)
                  AS DOUBLE) / COUNT(*) AS mi
      FROM (SELECT cluster_id, unnest(vec) AS x,
                   unnest(generate_series(1, len(vec))) AS i
            FROM a0)
      GROUP BY cluster_id, i
    ), c1 AS (
      SELECT cluster_id, list(mi ORDER BY i) AS c FROM m GROUP BY cluster_id
    ), cf AS (
      SELECT s.cluster_id, COALESCE(c1.c, s.c) AS c
      FROM seeds s LEFT JOIN c1 USING (cluster_id)
    ), d1 AS (
      SELECT v.vec_id, cf.cluster_id,
             list_reduce(list_transform(generate_series(1, len(v.vec)),
                 i -> (v.vec[i] - cf.c[i]) * (v.vec[i] - cf.c[i])),
                 (acc, x) -> acc + x) AS dist
      FROM v CROSS JOIN cf
    )
    SELECT vec_id, cluster_id, dist FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY dist, cluster_id) AS rn
      FROM d1) WHERE rn = 1
    """,
)
def q_kmeans_embeddings(spark, sf_dir):
    """Deterministic FULL-TABLE distributed k-means (k=8, 2 Lloyd
    rounds, lowest-id seeding): every vector's final cluster and
    squared distance, bit-identical to the oracle because centroid
    means go through the engine-wide DECIMAL(28,8) sum contract and
    distances are order-pinned IEEE folds
    (operators/clustering.py:kmeans_embeddings). Complements the
    capped-sample MLlib quantizer (train_ivf_centroids) with the
    can't-cap-the-data semantic-sharding path."""
    from elb_log_to_mysql_spark.operators.clustering import kmeans_embeddings

    return kmeans_embeddings(_t(spark, sf_dir, "embeddings"), k=8, iterations=2)


@_q(
    "bpe_pair_counts",
    r"""
    WITH words AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> length(x) >= 2)) AS w
      FROM documents
    ), pairs AS (
      SELECT unnest(list_transform(generate_series(1, length(w) - 1),
                                   i -> substr(w, i, 2))) AS pair
      FROM words
    )
    SELECT pair, COUNT(*) AS n_occurrences
    FROM pairs GROUP BY pair
    ORDER BY n_occurrences DESC, pair
    LIMIT 40
    """,
)
def q_bpe_pair_counts(spark, sf_dir):
    """First BPE merge iteration: corpus-wide adjacent character-pair
    counts, top-40 with deterministic tiebreak — tokenizer training's
    distributed inner loop (operators/textops.py:bpe_pair_counts)."""
    return textops.bpe_pair_counts(_t(spark, sf_dir, "documents"), k=40)


def _bpe_ctes(n_merges: int = 3) -> str:
    """Unrolled-CTE replay of the BPE training loop, shared by the
    bpe_merge_loop and bpe_encode oracles. The merge-apply step is
    deliberately a DIFFERENT formulation from the Spark fold: each
    word's symbol string is space-wrapped (' a  b  c ') so plain
    left-to-right non-overlapping replace of ' pa  pb ' -> ' merged '
    is exactly the fold's non-overlap rule — two independent
    implementations that must agree bit-for-bit (symbols are
    [a-z0-9]+ so they never contain the space delimiter)."""
    ctes = [
        r"""toks AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                    x -> len(x) >= 2 AND regexp_matches(x, '^[a-z0-9]+$'))) AS w
      FROM documents
    )""",
        """w0 AS (
      SELECT array_to_string(string_split(w, ''), ' ') AS s,
             COUNT(*) AS freq
      FROM toks GROUP BY w
    )""",
    ]
    for i in range(1, n_merges + 1):
        p = i - 1
        ctes.append(f"""c{i} AS (
      SELECT a AS pair_a, b AS pair_b,
             CAST(SUM(freq) AS BIGINT) AS n_occurrences
      FROM (
        SELECT freq, unnest(t[1:len(t)-1]) AS a, unnest(t[2:len(t)]) AS b
        FROM (SELECT freq, string_split(s, ' ') AS t FROM w{p})
      ) GROUP BY 1, 2
    )""")
        ctes.append(f"""b{i} AS (
      SELECT CAST({i} AS INTEGER) AS step, pair_a, pair_b,
             pair_a || pair_b AS merged, n_occurrences
      FROM c{i} ORDER BY n_occurrences DESC, pair_a, pair_b LIMIT 1
    )""")
        ctes.append(f"""w{i} AS (
      SELECT replace(substr(r, 2, len(r) - 2), '  ', ' ') AS s, freq
      FROM (
        SELECT replace(' ' || replace(w.s, ' ', '  ') || ' ',
                       ' ' || b.pair_a || '  ' || b.pair_b || ' ',
                       ' ' || b.merged || ' ') AS r,
               w.freq
        FROM w{p} w, b{i} b
      )
    )""")
    return ",\n    ".join(ctes)


def _bpe_loop_oracle(n_merges: int = 3) -> str:
    """See `_bpe_ctes`: the merge list, one row per training step."""
    union = "\n    UNION ALL ".join(
        f"SELECT step, pair_a, pair_b, merged, n_occurrences FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return f"""
    WITH {_bpe_ctes(n_merges)}
    {union}
    """


def _bpe_encode_oracle(n_merges: int = 3, k: int = 40) -> str:
    """See `_bpe_ctes`: the corpus vocabulary AFTER the merges — every
    word's final segmentation exploded back out weighted by corpus
    word frequency. An error anywhere in the replayed loop (argmax
    tiebreak, overlap rule, re-segmentation) shifts these counts."""
    return f"""
    WITH {_bpe_ctes(n_merges)}
    SELECT token,
           CAST(SUM(freq) AS BIGINT) AS n_occurrences,
           CAST(length(token) AS INTEGER) AS token_len
    FROM (
      SELECT unnest(string_split(s, ' ')) AS token, freq
      FROM w{n_merges}
    )
    GROUP BY token
    ORDER BY n_occurrences DESC, token
    LIMIT {k}
    """


@_q("bpe_merge_loop", _bpe_loop_oracle(3))
def q_bpe_merge_loop(spark, sf_dir):
    """Tokenizer training's OUTER loop — three full BPE iterations
    where each merge changes the next iteration's pair counts
    (operators/textops.py:bpe_merge_loop): count pairs on the
    distinct-word frequency table, broadcast the 1-row argmax, apply
    it with an in-row non-overlapping fold, repeat. The oracle
    replays the loop with an INDEPENDENT merge-apply formulation
    (space-wrapped string replace), so a drift in either the
    overlap rule, the argmax tiebreak, or the re-segmentation
    hash-mismatches. Output = the ordered merge list, i.e. the
    trained tokenizer artifact."""
    return textops.bpe_merge_loop(_t(spark, sf_dir, "documents"), n_merges=3)


@_q("bpe_encode", _bpe_encode_oracle(3, 40))
def q_bpe_encode(spark, sf_dir):
    """BPE ENCODE — the trained tokenizer applied back to the corpus
    (operators/textops.py:bpe_encode): train 3 merges on the
    distinct-word table, re-segment every word with the in-row
    non-overlapping fold, and count the resulting tokens corpus-wide
    (weighted by word frequency), top-40 with total tiebreak. The
    oracle replays train AND encode with the independent
    space-wrapped-replace formulation, so the output vocabulary is
    pinned bit-for-bit — completing the bpe_pair_counts ->
    bpe_merge_loop -> encode trilogy."""
    return textops.bpe_encode(_t(spark, sf_dir, "documents"), n_merges=3, k=40)


_ONE_SHOT_CORPUS_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t,
             length(text) - length(replace(text, '#', '')) AS hashes,
             (length(text) - length(replace(text, '...', ''))) / 3 AS ellipses
      FROM documents
    ), base AS (
      SELECT doc_id,
             len(t) AS n_words,
             COALESCE(list_sum(list_transform(t, x -> length(x))), 0)
               / greatest(len(t), 1) AS mean_word_len,
             len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
               / greatest(len(t), 1) AS alpha_word_frac,
             (hashes + ellipses) / greatest(len(t), 1) AS symbol_word_ratio,
             len(list_intersect(list_distinct(t),
                 ['the','and','of','to','in','is','that','for','with','a']))
               AS stopword_hits
      FROM toks
    ), g2 AS (
      SELECT doc_id, unnest(list_transform(range(0, greatest(len(t)-1, 0)),
             i -> concat_ws(' ', t[i+1], t[i+2]))) AS g FROM toks
    ), c2 AS (
      SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2
    ), m2 AS (
      SELECT doc_id, MAX(c) AS top_c, SUM(c) AS tot FROM c2 GROUP BY 1
    ), g3 AS (
      SELECT doc_id, unnest(list_transform(range(0, greatest(len(t)-2, 0)),
             i -> concat_ws(' ', t[i+1], t[i+2], t[i+3]))) AS g FROM toks
    ), c3 AS (
      SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2
    ), m3 AS (
      SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_c,
             SUM(c) AS tot FROM c3 GROUP BY 1
    ), keepq AS (
      SELECT base.doc_id
      FROM base
      LEFT JOIN m2 ON base.doc_id = m2.doc_id
      LEFT JOIN m3 ON base.doc_id = m3.doc_id
      WHERE n_words >= 5 AND n_words <= 5000
        AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
        AND alpha_word_frac >= 0.8
        AND symbol_word_ratio <= 0.1
        AND stopword_hits >= 2
        AND COALESCE(CAST(m2.top_c AS DOUBLE) / m2.tot, 0.0) <= 0.20
        AND COALESCE(CAST(m3.dup_c AS DOUBLE) / m3.tot, 0.0) <= 0.30
    ), surv AS (
      SELECT MIN(d.doc_id) AS doc_id
      FROM documents d JOIN keepq USING (doc_id)
      GROUP BY md5(lower(regexp_replace(trim(d.text), '\s+', ' ', 'g')))
    ), grams AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 4, 0)),
               i -> array_to_string(t[i:i+4], ' ')))) AS gram
      FROM toks
    ), contaminated AS (
      SELECT DISTINCT doc_id FROM grams
      WHERE doc_id % 97 <> 0
        AND gram IN (SELECT gram FROM grams WHERE doc_id % 97 = 0)
    ), clean AS (
      SELECT s.doc_id FROM surv s
      WHERE s.doc_id % 97 <> 0
        AND s.doc_id NOT IN (SELECT doc_id FROM contaminated)
    ), ranked AS (
      SELECT d.doc_id, d.source,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY d.source
               ORDER BY md5(CAST(d.doc_id AS VARCHAR) || '|seed42'), d.doc_id
             ) - 1 AS BIGINT) AS mix_rank
      FROM documents d JOIN clean USING (doc_id)
    ), mixed AS (
      SELECT * FROM ranked
      WHERE mix_rank < CASE source
                         WHEN 'src0' THEN 12
                         WHEN 'src1' THEN 8
                         WHEN 'src2' THEN 6
                         WHEN 'src3' THEN 100
                         ELSE 0 END
    )
    SELECT doc_id, source, mix_rank,
           CAST(ROW_NUMBER() OVER (
             ORDER BY md5(CAST(doc_id AS VARCHAR) || '|seed42'), doc_id
           ) - 1 AS BIGINT) AS pos
    FROM mixed
    """


@_q(
    "corpus_pipeline",
    _ONE_SHOT_CORPUS_ORACLE,
)
def q_corpus_pipeline(spark, sf_dir):
    """The END-TO-END curation build as one job: Gopher quality gate
    -> exact-fingerprint dedup -> benchmark decontamination ->
    exact-quota mixture -> deterministic global training order
    (operators/pipeline.py:corpus_pipeline). The oracle replays the
    ENTIRE five-stage chain in one SQL statement — the strongest
    composition evidence in the registry: a wrong answer in any stage
    shifts ids, quotas, or order and hash-mismatches."""
    from elb_log_to_mysql_spark.operators.pipeline import corpus_pipeline

    return corpus_pipeline(
        _t(spark, sf_dir, "documents"),
        quotas={"src0": 12, "src1": 8, "src2": 6, "src3": 100},
    )


@_q("incremental_corpus_pipeline", _ONE_SHOT_CORPUS_ORACLE)
def q_incremental_corpus_pipeline(spark, sf_dir):
    """The daily-cadence corpus build (operators/pipeline.py:
    incremental_corpus_pipeline): the corpus is split into two
    id-ordered ingest batches, batch 1 is curated against an empty
    pool, batch 2 against batch 1's accepted pool, and the mixture +
    training order are re-derived over the updated pool. The oracle
    is the ONE-SHOT chain over the union (same SQL as
    corpus_pipeline), so the driver's hash match IS the proof of the
    equivalence contract: incremental over id-ordered batches accepts
    exactly the one-shot set and emits the identical training order.
    The benchmark set (docs with id % 97 == 0) is passed as the fixed
    external eval-suite frame both batches screen against."""
    from elb_log_to_mysql_spark.operators.pipeline import (
        incremental_accept,
        incremental_corpus_pipeline,
    )

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    thr = docs.agg(
        ((F.min("doc_id") + F.max("doc_id")) / 2).cast("long").alias("thr")
    )
    with_thr = docs.crossJoin(F.broadcast(thr))
    batch1 = with_thr.filter(F.col("doc_id") <= F.col("thr")).drop("thr")
    batch2 = with_thr.filter(F.col("doc_id") > F.col("thr")).drop("thr")
    pool1 = incremental_accept(batch1, None, bench)
    return incremental_corpus_pipeline(
        batch2,
        pool1,
        bench,
        quotas={"src0": 12, "src1": 8, "src2": 6, "src3": 100},
    )


@_q(
    "bigram_condprob",
    r"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ), positions AS (
      -- aligned unnests zip: position i pairs t[i] with t[i+1]; no
      -- length cap, so arbitrarily long documents replay exactly
      SELECT doc_id, lang,
             unnest(t[1:len(t)-1]) AS w1,
             unnest(t[2:len(t)]) AS w2
      FROM toks
    ), unigrams AS (
      SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM (
        SELECT unnest(t) AS w1 FROM toks) GROUP BY w1
    ), bigrams AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM positions GROUP BY w1, w2
    ), scored AS (
      SELECT p.doc_id, p.lang,
             CAST(b.c12 AS DOUBLE) / u.c1 AS p
      FROM positions p
      JOIN bigrams b USING (w1, w2)
      JOIN unigrams u USING (w1)
    )
    SELECT doc_id, lang,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(CAST(SUM(CAST(p AS DECIMAL(28,8))) AS STRING) AS DOUBLE)
             / COUNT(*) AS mean_condp,
           MIN(p) AS min_condp
    FROM scored GROUP BY doc_id, lang
    """,
)
def q_bigram_condprob(spark, sf_dir):
    """Second-order LM scoring: per-doc mean/min corpus bigram
    conditional probability — individually-common words in an
    improbable order score low (operators/textops.py:
    bigram_condprob). Exact integer counts, one IEEE division per
    bigram, decimal-image mean: bit-identical to the replay."""
    return textops.bigram_condprob(_t(spark, sf_dir, "documents"))


@_q(
    "lm_perplexity_filter",
    r"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ), positions AS (
      SELECT doc_id, lang,
             unnest(t[1:len(t)-1]) AS w1,
             unnest(t[2:len(t)]) AS w2
      FROM toks
    ), unigrams AS (
      SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM (
        SELECT unnest(t) AS w1 FROM toks) GROUP BY w1
    ), vocab AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v FROM unigrams
    ), bigrams AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM positions GROUP BY w1, w2
    ), surprisal AS (
      SELECT b.w1, b.w2,
             ROUND(-log2(CAST(b.c12 + 1 AS DOUBLE) / (u.c1 + vocab.v)),
                   6) AS bits
      FROM bigrams b JOIN unigrams u USING (w1) CROSS JOIN vocab
    ), perdoc AS (
      SELECT p.doc_id, p.lang,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(CAST(SUM(CAST(s.bits AS DECIMAL(28,8))) AS STRING)
                  AS DOUBLE) / COUNT(*) AS cross_entropy
      FROM positions p JOIN surprisal s USING (w1, w2)
      GROUP BY p.doc_id, p.lang
    ), thr AS (
      SELECT CAST(CAST(SUM(CAST(cross_entropy AS DECIMAL(28,8)))
                  AS STRING) AS DOUBLE) / COUNT(*) AS thr
      FROM perdoc
    )
    SELECT doc_id, lang, n_bigrams, cross_entropy,
           cross_entropy <= thr.thr AS keep
    FROM perdoc CROSS JOIN thr
    """,
)
def q_lm_perplexity_filter(spark, sf_dir):
    """CCNet-style LM perplexity gate: add-one smoothed bigram
    cross-entropy per document, keep = below the corpus mean
    (operators/textops.py:lm_perplexity_filter). The one log() goes
    through ROUND(6) + decimal-image aggregation on both engines, so
    the threshold comparison is bit-deterministic."""
    return textops.lm_perplexity_filter(_t(spark, sf_dir, "documents"))


@_q(
    "interval_join_bucketed",
    r"""
    WITH p AS (
      SELECT event_id, user_id, epoch_us(ts) AS us
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT event_id, user_id, epoch_us(ts) AS us
      FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, CAST(COUNT(c.event_id) AS BIGINT) AS n_nearby
    FROM p LEFT JOIN c
      ON abs(c.us - p.us) <= 60000000 AND c.user_id <> p.user_id
    GROUP BY p.event_id
    """,
)
def q_interval_join_bucketed(spark, sf_dir):
    """Pure theta interval join via bucket decomposition: for every
    purchase, the count of OTHER users' clicks within ±60 s — the
    no-equi-key temporal join that naively degrades to a nested-loop
    cartesian, rebuilt as an equi-join on tolerance-width time
    buckets (operators/relational.py:interval_join_bucketed). The
    oracle runs the naive quadratic formulation; the operator must
    reproduce it exactly."""
    events = _t(spark, sf_dir, "events")
    return relational.interval_join_bucketed(
        events.filter(F.col("event_type") == "purchase"),
        events.filter(F.col("event_type") == "click"),
    )


@_q(
    "curriculum_bins",
    r"""
    WITH toks AS (
      SELECT doc_id, lang,
             len(list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '')) AS n_tokens
      FROM documents
    )
    SELECT doc_id, lang, n_tokens,
           CAST(FLOOR(
             CAST((ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY n_tokens, doc_id) - 1)
                  * 10 AS DOUBLE)
             / (COUNT(*) OVER (PARTITION BY lang))
           ) AS INTEGER) AS bin
    FROM toks
    """,
)
def q_curriculum_bins(spark, sf_dir):
    """Length-curriculum binning: per-lang token-count rank cut into
    10 equal-width slices, computed WITHOUT a per-stratum global-sort
    window (value-bucketed rank decomposition —
    operators/pipeline.py:curriculum_bins). The oracle's ROW_NUMBER
    formulation must match the decomposed rank bit-for-bit."""
    from elb_log_to_mysql_spark.operators.pipeline import curriculum_bins

    return curriculum_bins(_t(spark, sf_dir, "documents"))


@_q(
    "embedding_quantize",
    r"""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings WHERE embedding IS NOT NULL
    ), s AS (
      SELECT vec_id, vec,
             CASE WHEN list_max(list_transform(vec, x -> abs(x))) > 0
                  THEN 127.0 / list_max(list_transform(vec, x -> abs(x)))
                  ELSE 0.0 END AS scale
      FROM v
    ), q AS (
      SELECT vec_id, scale,
             list_transform(vec, x -> CAST(FLOOR(x * scale + 0.5)
                                           AS INTEGER)) AS qv
      FROM s
    )
    SELECT vec_id, scale,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           list_min(qv) AS q_min,
           list_max(qv) AS q_max,
           CAST(len(list_filter(qv, x -> abs(x) = 127)) AS INTEGER) AS n_sat
    FROM q
    """,
)
def q_embedding_quantize(spark, sf_dir):
    """Symmetric int8 embedding quantization (storage path for
    corpus-scale ANN): per-vector scale + integer summary of the
    quantized array, floor(+0.5) rounding so both engines agree
    bit-for-bit (operators/similarity.py:embedding_quantize_int8)."""
    return similarity.embedding_quantize_int8(_t(spark, sf_dir, "embeddings"))


@_q(
    "domain_cap",
    r"""
    WITH q AS (
      SELECT doc_id, source,
             string_split(lower(trim(text)), ' ') AS toks,
             CAST(LENGTH(text) AS INT) AS n_chars_m,
             CAST(LENGTH(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                  AS INT) AS punct
      FROM documents
    ), score AS (
      SELECT doc_id, source,
             CASE WHEN len(toks) BETWEEN 5 AND 5000 THEN 0.4 ELSE 0.0 END
             + CASE WHEN punct / greatest(n_chars_m, 1) < 0.2
                    THEN 0.3 ELSE 0.0 END
             + CASE WHEN len(list_filter(toks, t -> list_contains(
                   ['the','and','of','to','in','is','that','for','with','a'],
                   t))) / greatest(len(toks), 1) > 0.05
                    THEN 0.3 ELSE 0.0 END AS quality_score
      FROM q
    )
    SELECT doc_id, source, quality_score,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY quality_score DESC, doc_id)
             AS src_rank,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY quality_score DESC, doc_id)
             <= 50 AS kept
    FROM score
    """,
)
def q_domain_cap(spark, sf_dir):
    """Quality-ranked per-source cap (RefinedWeb-style domain
    diversity): keep the top-50 highest-Gopher-score docs per source,
    ties to the lowest doc_id; every doc emitted with its rank and a
    kept flag (operators/pipeline.py:domain_cap). The rank avoids the
    stratum-wide sort window via the bucketed-rank decomposition over
    the score's 6 discrete levels — the oracle replays it as the
    ROW_NUMBER it is semantically equal to."""
    from elb_log_to_mysql_spark.operators.pipeline import domain_cap

    return domain_cap(_t(spark, sf_dir, "documents"), cap=50)


@_q(
    "semantic_dedup_quality",
    r"""
    WITH RECURSIVE edges AS (
      SELECT a.vec_id AS u, b.vec_id AS v
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
    ), sym AS (
      SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges
    ), reach(id, label) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM sym)
      UNION
      SELECT s.v, r.label FROM reach r JOIN sym s ON r.id = s.u
    ), cc AS (
      SELECT id, MIN(label) AS cluster_id FROM reach GROUP BY id
    ), assigned AS (
      SELECT e.vec_id AS doc_id,
             COALESCE(cc.cluster_id, e.vec_id) AS cluster_id
      FROM embeddings e LEFT JOIN cc ON e.vec_id = cc.id
    ), q AS (
      SELECT doc_id,
             string_split(lower(trim(text)), ' ') AS toks,
             CAST(LENGTH(text) AS INT) AS n_chars_m,
             CAST(LENGTH(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                  AS INT) AS punct
      FROM documents
    ), score AS (
      SELECT doc_id,
             CASE WHEN len(toks) BETWEEN 5 AND 5000 THEN 0.4 ELSE 0.0 END
             + CASE WHEN punct / greatest(n_chars_m, 1) < 0.2
                    THEN 0.3 ELSE 0.0 END
             + CASE WHEN len(list_filter(toks, t -> list_contains(
                   ['the','and','of','to','in','is','that','for','with','a'],
                   t))) / greatest(len(toks), 1) > 0.05
                    THEN 0.3 ELSE 0.0 END AS quality_score
      FROM q
    )
    SELECT a.doc_id, a.cluster_id, s.quality_score,
           ROW_NUMBER() OVER (PARTITION BY a.cluster_id
                              ORDER BY s.quality_score DESC, a.doc_id)
             = 1 AS is_survivor
    FROM assigned a JOIN score s USING (doc_id)
    """,
)
def q_semantic_dedup_quality(spark, sf_dir):
    """Quality-aware semantic dedup — the production survivor policy:
    within each embedding-similarity cluster keep the HIGHEST-QUALITY
    document (Gopher-score, doc_id tiebreak), not the lowest id.
    Composes three families end to end: ANN pair generation
    (embedding_near_dup), graph closure (dedup_clusters), and text
    quality scoring (text_stats). The per-cluster argmax is a
    row_number window over cluster groups — bounded by cluster size,
    which the 0.45-threshold pair generation already bounds."""
    from elb_log_to_mysql_spark.operators.graph import dedup_clusters
    from elb_log_to_mysql_spark.session import carry_caches

    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents")
    pairs = similarity.embedding_near_dup(emb, threshold=0.45).select(
        F.col("id_a").alias("doc_id_a"), F.col("id_b").alias("doc_id_b")
    )
    clusters = dedup_clusters(
        emb.select(F.col("vec_id").alias("doc_id")), pairs
    )
    quality = textops.text_stats(docs).select("doc_id", "quality_score")
    assigned = clusters.join(quality, "doc_id")
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality_score").desc(), "doc_id"
    )
    out = assigned.select(
        "doc_id",
        "cluster_id",
        "quality_score",
        (F.row_number().over(w) == 1).alias("is_survivor"),
    )
    return carry_caches(out, pairs)


@_q(
    "curation_audit",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t,
             length(text) - length(replace(text, '#', '')) AS hashes,
             (length(text) - length(replace(text, '...', ''))) / 3 AS ellipses
      FROM documents
    ), base AS (
      SELECT doc_id,
             len(t) AS n_words,
             COALESCE(list_sum(list_transform(t, x -> length(x))), 0)
               / greatest(len(t), 1) AS mean_word_len,
             len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
               / greatest(len(t), 1) AS alpha_word_frac,
             (hashes + ellipses) / greatest(len(t), 1) AS symbol_word_ratio,
             len(list_intersect(list_distinct(t),
                 ['the','and','of','to','in','is','that','for','with','a']))
               AS stopword_hits
      FROM toks
    ), g2 AS (
      SELECT doc_id, unnest(list_transform(range(0, greatest(len(t)-1, 0)),
             i -> concat_ws(' ', t[i+1], t[i+2]))) AS g FROM toks
    ), c2 AS (
      SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2
    ), m2 AS (
      SELECT doc_id, MAX(c) AS top_c, SUM(c) AS tot FROM c2 GROUP BY 1
    ), g3 AS (
      SELECT doc_id, unnest(list_transform(range(0, greatest(len(t)-2, 0)),
             i -> concat_ws(' ', t[i+1], t[i+2], t[i+3]))) AS g FROM toks
    ), c3 AS (
      SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2
    ), m3 AS (
      SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_c,
             SUM(c) AS tot FROM c3 GROUP BY 1
    ), keepq AS (
      SELECT base.doc_id
      FROM base
      LEFT JOIN m2 ON base.doc_id = m2.doc_id
      LEFT JOIN m3 ON base.doc_id = m3.doc_id
      WHERE n_words >= 5 AND n_words <= 5000
        AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
        AND alpha_word_frac >= 0.8
        AND symbol_word_ratio <= 0.1
        AND stopword_hits >= 2
        AND COALESCE(CAST(m2.top_c AS DOUBLE) / m2.tot, 0.0) <= 0.20
        AND COALESCE(CAST(m3.dup_c AS DOUBLE) / m3.tot, 0.0) <= 0.30
    ), surv AS (
      SELECT MIN(d.doc_id) AS doc_id
      FROM documents d JOIN keepq USING (doc_id)
      GROUP BY md5(lower(regexp_replace(trim(d.text), '\s+', ' ', 'g')))
    ), grams AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 4, 0)),
               i -> array_to_string(t[i:i+4], ' ')))) AS gram
      FROM toks
    ), contaminated AS (
      SELECT DISTINCT doc_id FROM grams
      WHERE doc_id % 97 <> 0
        AND gram IN (SELECT gram FROM grams WHERE doc_id % 97 = 0)
    ), decon AS (
      -- text IS NOT NULL mirrors the operator: arrays_overlap(NULL)
      -- filter semantics DROP a null-text doc on the Spark side
      SELECT doc_id FROM documents
      WHERE doc_id % 97 <> 0
        AND text IS NOT NULL
        AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    ), clean AS (
      SELECT s.doc_id FROM surv s JOIN decon USING (doc_id)
    ), ranked AS (
      SELECT d.doc_id, d.source,
             ROW_NUMBER() OVER (
               PARTITION BY d.source
               ORDER BY md5(CAST(d.doc_id AS VARCHAR) || '|seed42'), d.doc_id
             ) - 1 AS mix_rank
      FROM documents d JOIN clean USING (doc_id)
    ), mixed AS (
      SELECT doc_id FROM ranked
      WHERE mix_rank < CASE source
                         WHEN 'src0' THEN 12
                         WHEN 'src1' THEN 8
                         WHEN 'src2' THEN 6
                         WHEN 'src3' THEN 100
                         ELSE 0 END
    )
    SELECT d.doc_id, d.source,
           d.doc_id IN (SELECT doc_id FROM keepq) AS quality_keep,
           d.doc_id IN (SELECT doc_id FROM surv) AS dedup_survivor,
           d.doc_id % 97 = 0 AS is_bench,
           d.doc_id IN (SELECT doc_id FROM decon) AS decontaminated,
           d.doc_id IN (SELECT doc_id FROM mixed) AS selected
    FROM documents d
    """,
)
def q_curation_audit(spark, sf_dir):
    """Per-document curation LINEAGE: every input doc with each
    stage's verdict (quality gate, dedup survivorship, benchmark
    membership/contamination, final selection) — the audit table that
    turns "why did my document disappear?" into a filter
    (operators/pipeline.py:curation_audit). Shares corpus_pipeline's
    quota config; the oracle replays every stage and materializes
    the flags for ALL documents."""
    from elb_log_to_mysql_spark.operators.pipeline import curation_audit

    return curation_audit(
        _t(spark, sf_dir, "documents"),
        quotas={"src0": 12, "src1": 8, "src2": 6, "src3": 100},
    )


@_q(
    "dataset_diff",
    r"""
    WITH old AS (
      SELECT doc_id,
             md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
      FROM documents WHERE doc_id % 10 <> 9
    ), new AS (
      SELECT doc_id,
             md5(lower(regexp_replace(trim(
               CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END
             ), '\s+', ' ', 'g'))) AS fp
      FROM documents WHERE doc_id % 10 <> 8
    )
    SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
           CASE WHEN old.fp IS NULL THEN 'added'
                WHEN new.fp IS NULL THEN 'removed'
                WHEN old.fp <> new.fp THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
    """,
)
def q_dataset_diff(spark, sf_dir):
    """Corpus snapshot diff: synthetic v2 (docs % 10 == 8 removed,
    % 10 == 9 added, % 7 == 0 edited) diffed against v1 by canonical
    content fingerprint — added/removed/changed/unchanged per id
    (operators/pipeline.py:dataset_diff)."""
    from elb_log_to_mysql_spark.operators.pipeline import dataset_diff

    docs = _t(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 10 != 9)
    new = docs.filter(F.col("doc_id") % 10 != 8).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" rev2"))
        ).otherwise(F.col("text")),
    )
    return dataset_diff(old, new)


# ===========================================================================
# Table maintenance: compaction planning + block-stats pruning
# ===========================================================================

@_q(
    "compaction_bins",
    """
    WITH binned AS (
      SELECT source, doc_id, n_chars,
             CAST(FLOOR(COALESCE(SUM(n_chars) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ), 0) / 2048.0) AS BIGINT) AS bin
      FROM documents
    )
    SELECT source, bin,
           CAST(COUNT(*) AS BIGINT) AS n_objects,
           CAST(SUM(n_chars) AS BIGINT) AS bin_bytes,
           MIN(doc_id) AS first_key,
           MAX(doc_id) AS last_key
    FROM binned GROUP BY 1, 2
    """,
)
def q_compaction_bins(spark, sf_dir):
    """Small-file compaction plan: scan-order bin-packing of each
    table partition's objects into ~2 KiB output bins (the sf corpus
    analogue of Delta OPTIMIZE's default 1 GiB target), one plan row
    per rewrite task (operators/maintenance.py:compaction_plan). The
    window is per-partition — the plan parallelizes across partitions
    with no global sort — and the oracle re-derives every bin
    boundary, so the exclusive-cumsum packing arithmetic (a bin may
    overflow by one straddling object, never split one) is
    value-checked end to end."""
    from elb_log_to_mysql_spark.operators import maintenance

    return maintenance.compaction_plan(
        _t(spark, sf_dir, "documents"), target_bytes=2048
    )


@_q(
    "file_compaction_plan",
    """
    WITH f AS (
      SELECT doc_id,
             'part=' || CAST(doc_id % 4 AS VARCHAR) AS partition,
             'doc_' || lpad(CAST(doc_id AS VARCHAR), 6, '0') || '.bin'
               AS fname,
             CAST(200 + (doc_id * 37) % 400 AS BIGINT) AS length
      FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 48)
    ), binned AS (
      SELECT partition, fname, length,
             COALESCE(SUM(length) OVER (
                 PARTITION BY partition ORDER BY fname
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM f
    )
    SELECT partition,
           CAST(FLOOR(cb / 1000.0) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_objects,
           CAST(SUM(length) AS BIGINT) AS bin_bytes,
           MIN(fname) AS first_key,
           MAX(fname) AS last_key
    FROM binned GROUP BY 1, 2
    """,
)
def q_file_compaction_plan(spark, sf_dir):
    """Compaction plan over a REAL on-disk hive layout (operators/
    maintenance.py:file_compaction_plan): fixture files with
    table-derived names and byte sizes are written under
    part=K/doc_NNNNNN.bin, listed with the distributed binaryFile
    source (path + length only, glob pushed down, recursive lookup),
    and bin-packed per partition directory in path order. The oracle
    replays the layout derivation (partition, zero-padded file name,
    size formula) AND every bin boundary from the same doc_ids, so
    the whole listing→partition-derivation→packing chain is
    value-checked — the gate-certified twin of the library-level
    byte-conservation test (tests/test_maintenance.py). Paths are
    reduced to their table-relative tails so the plan is independent
    of the scratch directory."""
    from elb_log_to_mysql_spark.operators import maintenance

    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .orderBy("doc_id")
        .limit(48)
        .collect()
    )
    out_dir = _work_dir("compaction-layout")
    for r in docs:
        part_dir = os.path.join(out_dir, f"part={r.doc_id % 4}")
        os.makedirs(part_dir, exist_ok=True)
        size = 200 + (r.doc_id * 37) % 400
        with open(
            os.path.join(part_dir, f"doc_{r.doc_id:06d}.bin"), "wb"
        ) as fh:
            fh.write(b"x" * size)
    plan = maintenance.file_compaction_plan(
        spark, out_dir, target_bytes=1000, glob="*.bin"
    )
    tail = lambda c: F.regexp_extract(c, r"([^/]+)$", 1)  # noqa: E731
    return plan.select(
        tail(F.col("partition")).alias("partition"),
        "bin",
        "n_objects",
        "bin_bytes",
        tail(F.col("first_key")).alias("first_key"),
        tail(F.col("last_key")).alias("last_key"),
    )


@_q(
    "stats_pruning",
    """
    WITH pos AS (
      SELECT o_orderdate,
             ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) - 1 AS p
      FROM orders
    ), blocked AS (
      SELECT o_orderdate, CAST(FLOOR(p / 512.0) AS BIGINT) AS block_id FROM pos
    ), stats AS (
      SELECT block_id, COUNT(*) AS n_rows,
             MIN(o_orderdate) AS mn, MAX(o_orderdate) AS mx,
             SUM(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                       AND o_orderdate <  TIMESTAMP '1996-07-01'
                      THEN 1 ELSE 0 END) AS n_matched
      FROM blocked GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(CASE WHEN mx >= TIMESTAMP '1996-01-01'
                          AND mn <  TIMESTAMP '1996-07-01'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_blocks_kept,
           CAST(SUM(n_rows) AS BIGINT) AS rows_total,
           CAST(SUM(CASE WHEN mx >= TIMESTAMP '1996-01-01'
                          AND mn <  TIMESTAMP '1996-07-01'
                         THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
           CAST(SUM(n_matched) AS BIGINT) AS rows_matched
    FROM stats
    """,
)
def q_stats_pruning(spark, sf_dir):
    """Block-stats data-skipping report: build the min/max stats index
    a date-clustered layout would persist per 512-row block, then
    evaluate a 6-month range predicate against it — one row of
    pruning effectiveness (blocks kept / rows a pruned scan reads /
    rows actually matching). The clustered block ids come from the
    bucketed two-pass prefix sum (operators/maintenance.py:
    _clustered_position — no single-partition window at any size; the
    year bucket is a monotone coarsening of the sort key so the ids
    equal a global ORDER BY's), and the oracle recomputes the whole
    index plus the keep/skip decision per block, value-checking the
    interval-intersection test a parquet reader applies to row-group
    statistics. Complements zorder_scan/partition_pruning (which
    prove the PHYSICAL skip happens) by making the stats themselves
    a queryable artifact."""
    from elb_log_to_mysql_spark.operators import maintenance

    return maintenance.stats_prune_report(
        _t(spark, sf_dir, "orders"),
        "o_orderdate",
        "o_orderkey",
        lo="1996-01-01",
        hi="1996-07-01",
        block_rows=512,
    )


@_q(
    "bm25_topk",
    r"""
    WITH tk AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ), sized AS (
      SELECT doc_id, t, CAST(len(t) AS BIGINT) AS dl FROM tk WHERE len(t) > 0
    ), corpus AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS sum_dl FROM sized
    ), dfreq AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df
      FROM (SELECT doc_id, unnest(list_distinct(t)) AS term FROM sized)
      GROUP BY 1
    ), qterms AS (
      SELECT term, df FROM dfreq
      WHERE df >= 2
      ORDER BY df ASC, term LIMIT 5
    ), tf AS (
      SELECT term, df, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(t) AS term FROM sized) e
      JOIN qterms USING (term)
      GROUP BY 1, 2, 3
    ), scored AS (
      SELECT tf.term, tf.doc_id, tf.tf, s.dl,
             ln(1 + (c.n_docs - tf.df + 0.5) / (tf.df + 0.5))
               * ((tf.tf * 2.2)
                  / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * s.dl
                       / (CAST(c.sum_dl AS DOUBLE) / c.n_docs)))) AS s
      FROM tf JOIN sized s USING (doc_id), corpus c
    )
    SELECT term, doc_id, tf, dl, CAST(rank AS INTEGER) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY term ORDER BY s DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def q_bm25_topk(spark, sf_dir):
    """Okapi BM25 top-10 per query term over the document corpus
    (operators/textops.py:bm25_topk — query terms self-derived: the 5
    most selective terms with df >= 2, so the gate needs no external
    fixture). The oracle recomputes the full scoring pipeline — tf,
    df, doc length, the corpus scalars, the (k1=1.2, b=0.75) BM25
    formula written token-for-token the same — and the checked output
    is (term, doc_id, tf, dl, rank): exact ints plus the rank the
    float score induces, per the ANN entries' determinism contract
    (identical integer inputs + identical expression tree => identical
    IEEE doubles => identical ranks; doc_id breaks exact ties)."""
    from elb_log_to_mysql_spark.operators import textops

    return textops.bm25_topk(_t(spark, sf_dir, "documents"))


@_q("stream_near_dedup")
def q_stream_near_dedup(spark, sf_dir):
    """Streaming MinHash-LSH near-dedup: LSH bucket state streams
    candidate pairs (streaming/neardedup.py:stream_band_collisions —
    applyInPandasWithState keyed on (band_idx, band_hash), state =
    bucket occupants), exact-Jaccard verification joins the shingle
    sets back from the corpus store. Audited exactly like the batch
    `near_dedup` entry and sharing its oracle verbatim: `n_exact`
    (DuckDB recomputes the exact threshold-0.6 pair set), `false_pairs`
    must be 0 (verification is structural), and the 0.9 recall floor
    (the 64/16 S-curve; measured 1.0 at sf0.001/sf0.01 for the
    seeded-xxhash64 family too)."""
    from elb_log_to_mysql_spark.streaming.neardedup import (
        stream_band_collisions,
        verify_candidate_pairs,
    )

    path = os.path.join(sf_dir, "documents.parquet")
    schema = raw_parquet_schema(spark, path)
    # The exact ground truth is independent of the stream: persist it
    # and materialize on a side thread while the bounded stream runs,
    # so its wall hides under the stream's (r16, guide §2.6). The
    # cached pair set is small (the audit's own output volume class)
    # and GC-scoped like every other in-query cache.
    docs = _t(spark, sf_dir, "documents")
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.6).persist()
    warm = _overlap_materialize(exact)
    cand = run_stream_to_batch(
        spark, path, stream_band_collisions, schema, output_mode="append"
    )
    warm.join()
    found = verify_candidate_pairs(cand, docs)
    out = _near_dedup_audit(exact, found)
    # `found` owns the verifier's restricted-shingle cache (r16)
    return carry_caches(unpersist_on_gc(out, exact), exact, found)


ORACLE_SQL["stream_near_dedup"] = ORACLE_SQL["near_dedup"]


@_q("stream_near_dedup_join")
def q_stream_near_dedup_join(spark, sf_dir):
    """The SCALE variant of streaming near-dedup (streaming/
    neardedup.py:stream_band_collisions_join): candidate pairs from a
    symmetric stream-stream SELF-JOIN on the LSH band key — the
    "new arrival pairs against remembered occupants" recurrence
    executed entirely in the JVM's join state machinery (RocksDB
    state, zero Python in the stateful path; the 20x probe measured
    1.6x the batch twin's wall vs 2.0x for the applyInPandasWithState
    variant). Same Arrow-vectorized band_rows upstream, same
    exact-Jaccard verification downstream, same oracle as near_dedup:
    n_exact recomputed by DuckDB, false_pairs must be 0, 0.9 recall
    floor."""
    from elb_log_to_mysql_spark.streaming.neardedup import (
        stream_band_collisions_join,
        verify_candidate_pairs,
    )

    path = os.path.join(sf_dir, "documents.parquet")
    schema = raw_parquet_schema(spark, path)
    # same overlap as stream_near_dedup: the exact leg materializes
    # on a side thread while the bounded stream runs (guide §2.6)
    docs = _t(spark, sf_dir, "documents")
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.6).persist()
    warm = _overlap_materialize(exact)
    cand = run_stream_to_batch(
        spark, path, stream_band_collisions_join, schema, output_mode="append"
    )
    warm.join()
    found = verify_candidate_pairs(cand, docs)
    out = _near_dedup_audit(exact, found)
    # `found` owns the verifier's restricted-shingle cache (r16)
    return carry_caches(unpersist_on_gc(out, exact), exact, found)


ORACLE_SQL["stream_near_dedup_join"] = ORACLE_SQL["near_dedup"]


@_q("stream_near_dedup_blocklist")
def q_stream_near_dedup_blocklist(spark, sf_dir):
    """The static skew guard of the streaming join variant,
    gate-certified (streaming/neardedup.py:hot_bucket_blocklist +
    stream_band_collisions_join; the guard's band config rides IN the
    blocklist frame as literal columns since round 12, so it survives
    the land-to-storage/refresh-on-a-cadence flow). The corpus is the
    documents table plus an in-plan 50-wide spam cluster (one novel
    text under 50 fresh ids — the degenerate bucket a plain symmetric
    join would pair quadratically). The blocklist (max_bucket=20,
    natural occupancy measured ≤4 at both gate SFs) names exactly the
    spam cluster's band keys; the audit then checks BOTH duties at
    once: `spam_blocked` (zero found pairs touch a spam id — the
    quadratic bucket never reaches the join) and the standard
    near-dedup contract on the NATURAL pairs (n_exact recomputed by
    DuckDB over the unmodified documents table, false_pairs 0, 0.9
    recall floor) — proving the guard removes the pathology without
    costing legitimate recall."""
    import shutil as _shutil

    from elb_log_to_mysql_spark.streaming.neardedup import (
        hot_bucket_blocklist,
        stream_band_collisions_join,
        verify_candidate_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    spam_text = (
        "buy cheap pills online now best price guaranteed today "
        "limited offer act fast"
    )
    # the spam/natural id partition must stay correct at ANY scale
    # factor: derive the spam id base from the table's own max id
    # (ADVICE r12 — a hardcoded 1e6 base would misclassify natural
    # docs as spam if a larger SF ever crossed it). This entry is
    # already eager (it lands the corpus to parquet), so the 1-value
    # agg adds no new driver-action class; at the gate SFs the base
    # stays 1_000_000, keeping the audit bit-identical.
    max_id = docs.agg(F.max("doc_id")).first()[0] or 0
    spam_base = max(1_000_000, int(max_id) + 1)
    spam = spark.range(50).select(
        (F.lit(spam_base) + F.col("id")).alias("doc_id"),
        F.lit(spam_text).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(spam)
    corpus_dir = _work_dir("blocklist-corpus")
    _shutil.rmtree(corpus_dir, ignore_errors=True)
    corpus.coalesce(4).write.parquet(corpus_dir)
    corpus_batch = spark.read.parquet(corpus_dir)

    bl = hot_bucket_blocklist(corpus_batch, max_bucket=20)
    # overlap the exact ground truth (over the UNMODIFIED documents
    # table — the natural-pair contract) with the bounded stream run,
    # as in the other two stream audit entries (guide §2.6)
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.6).persist()
    warm = _overlap_materialize(exact)
    cand = run_stream_to_batch(
        spark,
        corpus_dir,
        lambda s: stream_band_collisions_join(s, blocklist=bl),
        corpus_batch.schema,
        output_mode="append",
    )
    warm.join()
    found = verify_candidate_pairs(cand, corpus_batch)
    spam_stats = found.agg(
        F.sum(
            (
                (F.col("doc_id_a") >= spam_base)
                | (F.col("doc_id_b") >= spam_base)
            ).cast("long")
        ).alias("n_spam_pairs")
    )
    found_nat = found.filter(
        (F.col("doc_id_a") < spam_base) & (F.col("doc_id_b") < spam_base)
    )
    out = (
        _near_dedup_audit(exact, found_nat)
        .crossJoin(F.broadcast(spam_stats))
        .select(
            "n_exact",
            "false_pairs",
            "recall_floor_met",
            (F.coalesce("n_spam_pairs", F.lit(0)) == 0).alias("spam_blocked"),
        )
    )
    # `found` owns the verifier's restricted-shingle cache (r16)
    return carry_caches(unpersist_on_gc(out, exact), exact, found)


ORACLE_SQL["stream_near_dedup_blocklist"] = ORACLE_SQL["near_dedup"].replace(
    "TRUE AS recall_floor_met",
    "TRUE AS recall_floor_met,\n           TRUE AS spam_blocked",
)


@_q(
    "cdc_apply",
    """
    WITH b AS (
      SELECT user_id, ts, event_id, event_type FROM (
        SELECT user_id, ts, event_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '2024-01-20') WHERE rn = 1
    ),
    u AS (
      SELECT user_id, ts, event_id, op, event_type FROM (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '2024-01-20') WHERE rn = 1
    )
    SELECT COALESCE(b.user_id, u.user_id) AS user_id,
           CASE WHEN u.op = 'D' THEN NULL
                ELSE COALESCE(u.event_type, b.event_type) END AS state,
           CASE WHEN u.op = 'D' THEN NULL
                ELSE strftime(COALESCE(u.ts, b.ts), '%Y-%m-%d %H:%M:%S')
           END AS updated_at,
           CASE WHEN u.op = 'D' THEN 'delete'
                WHEN b.user_id IS NULL THEN 'insert'
                WHEN u.user_id IS NULL THEN 'carry'
                ELSE 'update' END AS action,
           COALESCE(u.op, 'U') <> 'D' AS in_snapshot
    FROM b FULL OUTER JOIN u ON b.user_id = u.user_id
    """,
)
def q_cdc_apply(spark, sf_dir):
    """CDC changelog apply WITH DELETES (operators/analytics.py:
    cdc_apply): post-split events form an ordered changelog where
    `error` is a tombstone; last-writer-wins per key via the tie-safe
    max(struct) partial aggregate (no sort window), full-outer merge
    against the pre-split snapshot, and the output is the merge audit
    (final state, insert/update/delete/carry action, in_snapshot
    flag). Completes the lakehouse merge surface next to scd1_merge
    (upsert-only) and scd2_history (validity intervals): the oracle
    replays net-op selection — including a U superseded by a later D
    — and the tombstone's NULL payload, per key."""
    return analytics.cdc_apply(_t(spark, sf_dir, "events"), "2024-01-20")


@_q(
    "hybrid_rrf",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split_regex(lower(text), '\s+'),
                                       x -> x <> '')) AS t
      FROM documents
    ), qt AS (
      SELECT doc_id AS query_id, unnest(t) AS term FROM toks WHERE doc_id < 10
    ), ct AS (
      SELECT doc_id, unnest(t) AS term FROM toks
    ), ov AS (
      SELECT query_id, ct.doc_id, COUNT(*) AS overlap
      FROM ct JOIN qt USING (term)
      WHERE ct.doc_id <> qt.query_id
      GROUP BY 1, 2
    ), lex AS (
      SELECT query_id, doc_id, CAST(rank_lex AS INTEGER) AS rank_lex FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY overlap DESC, doc_id) AS rank_lex
        FROM ov) WHERE rank_lex <= 20
    ), sem AS (
      SELECT query_id, doc_id, CAST(rank_sem AS INTEGER) AS rank_sem FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(q.embedding, c.embedding)
                          DESC, c.vec_id) AS rank_sem
        FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        WHERE q.vec_id < 10) WHERE rank_sem <= 20
    ), fused AS (
      SELECT COALESCE(lex.query_id, sem.query_id) AS query_id,
             COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
             lex.rank_lex, sem.rank_sem,
             COALESCE(1.0 / (60 + lex.rank_lex), 0.0)
               + COALESCE(1.0 / (60 + sem.rank_sem), 0.0) AS rrf
      FROM lex FULL OUTER JOIN sem
        ON lex.query_id = sem.query_id AND lex.doc_id = sem.doc_id
    )
    SELECT query_id, doc_id, rank_lex, rank_sem, CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf DESC, doc_id) AS rank
      FROM fused) WHERE rank <= 10
    """,
)
def q_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval with reciprocal-rank fusion (operators/
    retrieval.py:hybrid_rrf): query-by-example over 10 query docs,
    lexical leg = exact distinct-token-overlap top-20, semantic leg =
    cosine top-20 over the aligned embedding column, fused by
    RRF(k=60) into a final top-10. The oracle replays BOTH legs and
    the fusion arithmetic; the hash-checked output is all-integer
    (both nullable leg ranks + the fused rank) — only small-integer
    ranks enter the RRF score, so its IEEE value (and hence the fused
    order, doc_id tie-broken) is engine-independent."""
    from elb_log_to_mysql_spark.operators import retrieval

    return retrieval.hybrid_rrf(
        _t(spark, sf_dir, "documents"), _t(spark, sf_dir, "embeddings")
    )


_sql_interface_entry(
    "sql_interface_tpch_q6",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice * l_discount
                              AS DECIMAL(28,8))) AS STRING) AS DOUBLE)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    "TPC-H Q6 submitted VERBATIM through the SQL front end (the "
    "DataFrame twin is the tpch_q6 entry): date-range + band "
    "predicates reach the scan and the revenue sum goes through the "
    "exact-decimal contract, so the double is bit-identical across "
    "engines.",
)

_sql_interface_entry(
    "sql_interface_tpch_q4",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate
                    AND l.l_quantity > 45)
    GROUP BY o_orderpriority
    """,
    "TPC-H Q4's shape through the SQL front end (the test schema "
    "carries no commit/receipt dates, so the late-line predicate is "
    "shipped-after-order + a quantity band): correlated EXISTS "
    "(decorrelated to a semi-join by both planners) under a date "
    "window, grouped count per priority — proven identical across "
    "engines.",
)

_sql_interface_entry(
    "sql_interface_tpch_q1",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum('l_quantity')} AS sum_qty,
           {_dsum('l_extendedprice')} AS sum_base_price,
           {_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}
             AS sum_charge,
           {_dsum('l_quantity')} / COUNT(*) AS avg_qty,
           {_dsum('l_extendedprice')} / COUNT(*) AS avg_price,
           {_dsum('l_discount')} / COUNT(*) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1 submitted VERBATIM through the SQL front end (the "
    "DataFrame twin is hash_agg/tpch_q1): the wide pricing-summary "
    "aggregate with every sum routed through the exact-decimal "
    "contract, so all seven measures are bit-identical across both "
    "parsers and both execution engines.",
)

_sql_interface_entry(
    "sql_interface_tpch_q3",
    f"""
    SELECT o_orderkey,
           SUBSTRING(CAST(o_orderdate AS STRING), 1, 10) AS order_date,
           o_orderpriority,
           {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING' AND l_shipdate > TIMESTAMP '1996-01-01'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    "TPC-H Q3 through the SQL front end (DataFrame twin: tpch_q3): "
    "dim-filtered double join, exact-decimal revenue, deterministic "
    "top-10 via the o_orderkey tiebreak; the date renders through "
    "SUBSTRING(CAST(.. AS STRING)) — the dialect-intersecting "
    "spelling both engines format identically.",
)

_sql_interface_entry(
    "sql_interface_tpch_q10",
    f"""
    SELECT c_custkey, c_name, n_name, c_acctbal,
           {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "TPC-H Q10 submitted VERBATIM through the SQL front end "
    "(DataFrame twin: tpch_q10): returned-item revenue ranking over "
    "a three-join star, exact-decimal revenue, deterministic top-20.",
)

_sql_interface_entry(
    "sql_interface_tpch_q12",
    """
    SELECT l_linestatus AS ship_mode,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_shipdate >= o_orderdate
    GROUP BY ship_mode
    """,
    "TPC-H Q12's shape submitted VERBATIM through the SQL front end "
    "(DataFrame twin: tpch_q12; l_linestatus stands in for the "
    "absent l_shipmode): priority-classified line counts under a "
    "date window with a cross-table residual predicate, plus a "
    "GROUP BY on a select-list alias — both parsers resolve it.",
)

_sql_interface_entry(
    "sql_interface_tpch_q14",
    f"""
    SELECT 100.0 * {_dsum(
        "CASE WHEN p_type = 'PROMO' "
        "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END"
    )}
           / {_dsum('l_extendedprice * (1 - l_discount)')}
             AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    "TPC-H Q14 submitted VERBATIM through the SQL front end "
    "(DataFrame twin: tpch_q14): promo revenue share — a ratio of "
    "two exact-decimal sums, so the single double survives the "
    "stringified hash bit-for-bit on both engines.",
)


@_q(
    "constraint_check",
    """
    WITH local AS (
      SELECT CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS dup_keys,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_custkey,
             CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS bad_price,
             CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                             OR o_orderdate >= TIMESTAMP '2010-01-01'
                           THEN 1 ELSE 0 END) AS BIGINT) AS bad_date
      FROM orders
    ), orph AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS orphan_lines
      FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_orderkey = l.l_orderkey)
    ), verdicts AS (
      SELECT 'orderkey_unique' AS check_name, dup_keys AS violations
        FROM local
      UNION ALL
      SELECT 'custkey_complete', null_custkey FROM local
      UNION ALL
      SELECT 'totalprice_positive', bad_price FROM local
      UNION ALL
      SELECT 'orderdate_in_era', bad_date FROM local
      UNION ALL
      SELECT 'lineitem_fk_orders', orphan_lines FROM orph
    )
    SELECT check_name, violations, violations = 0 AS passed FROM verdicts
    """,
)
def q_constraint_check(spark, sf_dir):
    """Declarative data-quality constraints over the fact tables
    (operators/analytics.py:constraint_check): key uniqueness,
    completeness, two value ranges, and lineitem->orders referential
    integrity — one aggregate pass per table plus one anti-join,
    unpivoted into a (constraint, violations, passed) verdict table.
    The oracle recomputes every violation count, so the whole suite
    is value-checked, not just its pass/fail bits."""
    return analytics.constraint_check(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    )


@_q("stream_cdc_apply")
def q_stream_cdc_apply(spark, sf_dir):
    """Streaming CDC changelog apply (streaming/cdc.py): the stateful
    per-key fold that continuously maintains cdc_apply's merged view —
    latest base state + latest net changelog op per key, tombstone
    deletes, last-writer-wins by (ts, event_id). Bounded execution
    emits each key's final merged row, which must be bit-equal to the
    batch merge audit: the entry shares cdc_apply's DuckDB oracle
    verbatim. Cross-batch delivery invariance is pinned by unit test
    (rows fold in event order inside the state fn, so batch
    boundaries cannot change the outcome). The update-mode sink holds
    one row per touched key per micro-batch; latest_cdc_rows reduces
    to the final emission per key (max_by over the per-key emit_seq),
    so the entry stays correct even if the bounded run splits into
    many micro-batches (multi-file dirs, maxFilesPerTrigger)."""
    from elb_log_to_mysql_spark.streaming.cdc import (
        latest_cdc_rows,
        stream_cdc_apply,
    )

    path = os.path.join(sf_dir, "events.parquet")
    schema = raw_parquet_schema(spark, path)
    emissions = run_stream_to_batch(
        spark,
        path,
        lambda s: stream_cdc_apply(s, "2024-01-20"),
        schema,
        output_mode="update",
    )
    return latest_cdc_rows(emissions)


ORACLE_SQL["stream_cdc_apply"] = ORACLE_SQL["cdc_apply"]


@_q(
    "variant_funcs",
    """
    SELECT event_type AS vtype,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(event_id) AS max_event,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def q_variant_funcs(spark, sf_dir):
    """Spark 4 VARIANT round trip (operators/advanced.py:
    variant_funcs): a nested JSON document built from typed columns is
    parsed into a VARIANT and read back via typed path extraction
    ('$.meta.ids[1]') into a JVM aggregate. The oracle recomputes the
    aggregate from the base columns directly, so equality proves the
    variant encode/extract round trip preserved every value — the
    schema-drift-tolerant semi-structured path next to the classic
    json_funcs entry."""
    return advanced.variant_funcs(_t(spark, sf_dir, "events"))


@_q(
    "python_datasource",
    """
    WITH synth AS (
      SELECT i AS event_id,
             i % 97 AS user_id,
             ['view','click','purchase','signup','error'][(i % 5) + 1]
               AS event_type,
             (i * 31) % 10000 AS cents
      FROM range(10000) t(i)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           MAX(event_id) AS max_id
    FROM synth GROUP BY event_type
    """,
)
def q_python_datasource(spark, sf_dir):
    """Custom Python Data Source (Spark 4 pyspark.sql.datasource API —
    sources/pysource.py): a deterministic synthetic-events generator
    with partition-parallel reads (8 InputPartitions of contiguous
    ids). The aggregate over the source must equal the oracle's
    independent replay of the generator formula over DuckDB's
    range(): closed-form fields make the whole custom-source read
    path value-checkable end to end."""
    from elb_log_to_mysql_spark.sources import pysource

    pysource.register(spark)
    df = (
        spark.read.format("synth_events")
        .option("n", "10000")
        .option("parts", "8")
        .load()
    )
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("sum_cents"),
        F.countDistinct("user_id").alias("n_users"),
        F.max("event_id").alias("max_id"),
    )


@_q("python_datasource_stream")
def q_python_datasource_stream(spark, sf_dir):
    """STREAMING half of the custom Python data source
    (sources/pysource.py:SynthEventsStreamReader — the Spark 4
    SimpleDataSourceStreamReader API): offset-based micro-batches of
    1000 ids each; redelivered offset ranges regenerate identical
    rows because the generator is a pure function of the index, so
    the source is exactly-once by construction. Bounded execution
    drains the generator (10 micro-batches), and the aggregate shares
    `python_datasource`'s oracle — stream ≡ batch ≡ independent SQL
    replay."""
    import time
    import uuid

    from elb_log_to_mysql_spark.sources import pysource

    pysource.register(spark)
    name = "synth_stream_" + uuid.uuid4().hex[:8]
    n = 10000
    q = (
        spark.readStream.format("synth_events")
        .option("n", str(n))
        .option("chunk", "1000")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    # content-bounded drain: the generator is finite (offsets stop
    # advancing at n), so poll the sink until all rows landed. A
    # failed stream would otherwise poll to the deadline and hand the
    # gate a partial table — surface the real error instead.
    deadline = time.time() + 300
    while time.time() < deadline and spark.table(name).count() < n:
        exc = q.exception()
        if exc is not None:
            q.stop()
            raise exc
        time.sleep(0.5)
    landed = spark.table(name).count()
    q.stop()
    q.awaitTermination()
    if landed < n:
        raise TimeoutError(
            f"python_datasource_stream drained {landed}/{n} rows "
            "before the 300 s deadline"
        )
    df = spark.table(name)
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("sum_cents"),
        F.countDistinct("user_id").alias("n_users"),
        F.max("event_id").alias("max_id"),
    )


ORACLE_SQL["python_datasource_stream"] = ORACLE_SQL["python_datasource"]


_sql_interface_entry(
    "sql_interface_lateral",
    """
    SELECT c.c_custkey, c.c_mktsegment, t.top_price, t.n_orders
    FROM customer c,
    LATERAL (SELECT MAX(o.o_totalprice) AS top_price,
                    CAST(COUNT(*) AS BIGINT) AS n_orders
             FROM orders o WHERE o.o_custkey = c.c_custkey) t
    WHERE c.c_custkey < 50 AND t.n_orders > 0
    """,
    "Correlated LATERAL subquery through the SQL front end: the "
    "per-row dependent aggregate (both planners decorrelate it to a "
    "join) proven identical across engines — MAX over doubles is "
    "order-independent, counts are exact.",
)


@_q(
    "multimodal_meta_arrow",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           text LIKE 'the%' AS starts_the
    FROM documents
    """,
)
def q_multimodal_meta_arrow(spark, sf_dir):
    """mapInArrow metadata extraction (operators/multimodal.py:
    binary_metadata_arrow): RecordBatches transformed with
    pyarrow.compute kernels only — no pandas materialization between
    Arrow and Python, the zero-copy fast path for wide binary
    columns. Values are checked against the SQL recomputation, and
    the mapInPandas sibling (`multimodal_meta`) checks the same
    byte-length arithmetic, so the two Python-crossing APIs are
    mutually pinned."""
    return multimodal.binary_metadata_arrow(_t(spark, sf_dir, "documents"))


# ===========================================================================
# Verbatim SQL-front-end battery: the full TPC-H suite (round 11)
# ===========================================================================
# Every adapted TPC-H oracle text whose SQL is dialect-intersecting is
# ALSO submitted verbatim through spark.sql(...) — the string is its
# own DuckDB oracle, so each entry proves parser+analyzer+execution
# parity on that shape with zero DataFrame calls. The remaining texts
# (q3/q18's strftime date rendering) get a SUBSTRING(CAST(..)) spelling
# both engines format identically (q3 above; q18 here).

for _qn in (
    "q2", "q5", "q7", "q8", "q9", "q11", "q13",
    "q15", "q16", "q17", "q19", "q20", "q21", "q22",
):
    _sql_interface_entry(
        f"sql_interface_tpch_{_qn}",
        ORACLE_SQL[f"tpch_{_qn}"],
        f"TPC-H {_qn.upper()} (the adapted tpch_{_qn} oracle text) "
        "submitted VERBATIM through the SQL front end: the identical "
        "string runs on both parsers/engines and must hash-match — "
        "the DataFrame twin is the tpch_" + _qn + " entry.",
    )

_sql_interface_entry(
    "sql_interface_tpch_q18",
    f"""
    WITH big AS (
      SELECT l_orderkey, {_dsum('l_quantity')} AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING {_dsum('l_quantity')} > 180.0
    )
    SELECT c_custkey, c_name, o_orderkey,
           SUBSTRING(CAST(o_orderdate AS STRING), 1, 10) AS order_date,
           o_totalprice, sum_qty
    FROM orders
    JOIN big ON o_orderkey = l_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    "TPC-H Q18 through the SQL front end (DataFrame twin: tpch_q18): "
    "large-quantity orders via a HAVING'd CTE aggregate joined back to "
    "the facts; the date renders through SUBSTRING(CAST(.. AS STRING)) "
    "— the dialect-intersecting spelling.",
)
