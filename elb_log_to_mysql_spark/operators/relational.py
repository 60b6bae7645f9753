"""Relational operator set (SURVEY §2.3) — pure DataFrame expressions.

The reference has NO relational operators (SURVEY §2.1: its only query
is scan→parse→project→filter→limit→sink). This module supplies the
full relational surface a user of the engine needs, each as a thin,
composable function over DataFrames. Everything is built-in Catalyst
expressions: predicate pushdown, column pruning, join strategy choice
(broadcast vs shuffle-hash vs sort-merge) and AQE skew handling are
free.

Scale notes are per-operator; the common rules:
- dimension tables are broadcast explicitly (`F.broadcast`) so the
  fact-table side never shuffles for the join;
- aggregates use partial (map-side) aggregation automatically;
- double aggregates use the deterministic-decimal contract from
  functions.numeric so results are partition-order independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from elb_log_to_mysql_spark.functions.numeric import davg, dsum


# ---------------------------------------------------------------------------
# filter + project
# ---------------------------------------------------------------------------
def filter_project(lineitem: DataFrame) -> DataFrame:
    """Predicate + projection with a computed column.

    Catalyst pushes both the filters and the 5-column projection into
    the parquet scan (check .explain: PushedFilters + ReadSchema) — at
    100 TB this is the difference between reading 5 columns of 3 years
    and the whole table.
    """
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_quantity") < 30)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            # no round(): identical IEEE double expr matches the oracle
            # bit-for-bit; Spark round() diverges on decimal-repr ties
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        )
    )


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------
def inner_join(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Equi inner join, detail output (exercises the join itself)."""
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(
            "o_orderkey",
            "o_custkey",
            "c_name",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
    )


def left_join(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left outer join + per-customer agg; unmatched customers kept.

    Aggregating AFTER an outer join is shuffle-heavy at scale; the
    plan here pre-aggregates orders per custkey first (one shuffle on
    the small aggregated side), then joins — the classic
    "aggregate-then-join" rewrite that Catalyst does not do for you.
    """
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("order_cnt"),
        dsum("o_totalprice").alias("total_spent"),
    )
    return customer.join(
        per_cust, customer.c_custkey == per_cust.o_custkey, "left"
    ).select(
        "c_custkey",
        "c_name",
        F.coalesce("order_cnt", F.lit(0)).alias("order_cnt"),
        F.coalesce("total_spent", F.lit(0.0)).alias("total_spent"),
    )


def semi_join(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT SEMI: customers having >=1 high-value order.

    left_semi short-circuits on first match and never duplicates the
    left side — cheaper than join+distinct at any scale.
    """
    big = orders.filter(F.col("o_totalprice") > 200000).select("o_custkey")
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


def anti_join(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT ANTI: customers with no order above the value threshold."""
    big = orders.filter(F.col("o_totalprice") > 250000).select("o_custkey")
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_nationkey")


def broadcast_dim_join(
    customer: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Star join with explicitly broadcast dimensions.

    nation⋈region is tiny; broadcasting it means the customer (fact)
    side is scanned once with zero shuffle — the canonical plan for a
    100 TB fact / KB dimension star schema. The final 5-group agg is
    the only shuffle.
    """
    dim = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey", "n_name", "r_name"
        )
    )
    return (
        customer.join(dim, customer.c_nationkey == dim.n_nationkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


def range_join(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Equi + non-equi (theta) condition: late shipments per month.

    The equi part (orderkey) keys the shuffle so this stays a hash
    join with a residual range predicate — NOT a cartesian product.
    A pure theta join at scale should instead bucket one side into
    ranges and equi-join on the bucket id.
    """
    late = lineitem.join(
        orders,
        (lineitem.l_orderkey == orders.o_orderkey)
        & (lineitem.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "inner",
    )
    return late.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    ).agg(
        F.count(F.lit(1)).alias("late_lines"),
        dsum("l_extendedprice").alias("late_value"),
    )


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------
def hash_agg_q1(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 pricing summary (the canonical wide hash aggregate).

    Map-side partial aggregation reduces each partition to ~4 groups
    before the (tiny) shuffle; all arithmetic is per-row expressions
    inside whole-stage codegen. Deterministic decimal sums make the
    result independent of partition count.
    """
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def distinct_agg(lineitem: DataFrame) -> DataFrame:
    """COUNT(DISTINCT) per group (expands to a two-phase plan)."""
    return lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.count(F.lit(1)).alias("rows_total"),
    )


def approx_distinct(lineitem: DataFrame, rsd: float = 0.01) -> DataFrame:
    """HyperLogLog++ distinct estimate with a CHECKABLE contract.

    Exact distinct of a high-cardinality key shuffles every distinct
    value; HLL sketches merge in fixed space (map-side combine) — at
    100 TB only the approx columns run. Raw estimates are
    estimator-specific (no engine-neutral oracle), so this query emits
    the engine-neutral CONTRACT instead: the exact counts plus
    in-bound flags asserting |approx − exact| ≤ 5·rsd·exact. The
    exact twin here is the verification harness, not the scale path.
    """
    # The approx and exact legs are SEPARATE aggregations joined on the
    # (tiny) group key, never one mixed agg: Spark rewrites multi-column
    # DISTINCT aggregates with an Expand that multiplies the input ×
    # (n_distinct_cols + 1), and a mixed agg drags the HLL sketch
    # updates through that expansion — measured 45 s vs 1.6 s at sf0.1
    # for the same contract. Split, the approx leg is a pure map-side
    # combine (the 100 TB path the docstring describes) and only the
    # verification leg pays the Expand.
    est = lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd).alias("est_p"),
        F.approx_count_distinct("l_orderkey", rsd).alias("est_o"),
    )
    exact = lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )
    bound = F.lit(5 * rsd)
    return exact.join(F.broadcast(est), "l_returnflag").select(
        "l_returnflag",
        "n_parts",
        "n_orders",
        (F.abs(F.col("est_p") - F.col("n_parts")) <= bound * F.col("n_parts"))
        .alias("parts_in_bound"),
        (F.abs(F.col("est_o") - F.col("n_orders")) <= bound * F.col("n_orders"))
        .alias("orders_in_bound"),
    )


def rollup_agg(lineitem: DataFrame) -> DataFrame:
    """GROUP BY ROLLUP with grouping indicators (hierarchy totals)."""
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("l_quantity").alias("sum_qty"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
    )


def cube_agg(orders: DataFrame) -> DataFrame:
    """GROUP BY CUBE over status x priority (all 4 grouping sets)."""
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        )
    )


# ---------------------------------------------------------------------------
# ordering / top-k / set ops
# ---------------------------------------------------------------------------
def topk(orders: DataFrame, k: int = 10) -> DataFrame:
    """Global top-k: ORDER BY + LIMIT compiles to TakeOrderedAndProject
    — each partition keeps a k-heap, driver merges k*numPartitions
    rows; no global sort ever materializes. Tiebreak on o_orderkey
    makes the k-boundary deterministic.
    """
    return orders.orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    ).limit(k).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
    )


def set_ops(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over two customer-key derivations,
    tagged so one result table exercises all three semantics."""
    with_orders = orders.select(F.col("o_custkey").alias("custkey")).distinct()
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    u = with_orders.union(building).distinct().withColumn("op", F.lit("union"))
    i = with_orders.intersect(building).withColumn("op", F.lit("intersect"))
    e = building.exceptAll(with_orders).distinct().withColumn("op", F.lit("except"))
    return u.unionByName(i).unionByName(e)


def scalar_funcs(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """String/date/math scalar-function battery (engine function
    surface, P6-P11 analogues on relational data)."""
    j = orders.join(customer, orders.o_custkey == customer.c_custkey)
    return j.select(
        "o_orderkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_mktsegment", 1, 4).alias("seg4"),
        F.concat_ws("|", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        (F.col("o_totalprice") / 1000.0).alias("price_k"),
        F.abs(F.col("c_acctbal")).alias("abs_bal"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        F.when(F.col("o_totalprice") > 150000, "high")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("low")
        .alias("price_band"),
    )


def full_outer_join(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """FULL OUTER on nation membership profiles: nations seen from the
    customer side, the supplier side, or both — unmatched sides kept
    with nulls. Aggregate-then-join keeps the outer join small (one
    row per nation per side), the pattern that makes full outer
    viable at scale (outer joins cannot broadcast their outer side)."""
    c = customer.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_customers"))
    s = supplier.groupBy("s_nationkey").agg(F.count(F.lit(1)).alias("n_suppliers"))
    return c.join(s, c.c_nationkey == s.s_nationkey, "full_outer").select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


def cross_join_small(region: DataFrame, nation: DataFrame) -> DataFrame:
    """Explicit cartesian product of two SMALL inputs (the only scale
    at which a cross join is legitimate): every (region, nation) pair
    with a same-region flag. Spark requires crossJoin() spelled out —
    an implicit cartesian is almost always a bug."""
    return region.crossJoin(nation).select(
        "r_regionkey",
        "r_name",
        "n_nationkey",
        "n_name",
        (F.col("n_regionkey") == F.col("r_regionkey")).cast("int").alias("same_region"),
    )


def interval_join_bucketed(
    probes: DataFrame,
    points: DataFrame,
    probe_ts: str = "ts",
    point_ts: str = "ts",
    tolerance_us: int = 60_000_000,
    probe_id: str = "event_id",
    point_id: str = "event_id",
    probe_user: str = "user_id",
    point_user: str = "user_id",
) -> DataFrame:
    """PURE theta interval join (no equi key) made scalable by bucket
    decomposition — the third member of the temporal-join family
    beside `asof_join` (nearest-one) and `range_join` (equi + theta
    residual): for every probe row, COUNT the point rows of OTHER
    users within ±tolerance.

    A naive formulation is a cartesian product with a range filter —
    the plan Spark degrades to when a join has no equality conjunct
    (BroadcastNestedLoopJoin; see range_join's docstring note). The
    fix is the textbook bucketization: quantize time into
    tolerance-width buckets, fan the PROBE side out to the ≤3 buckets
    its window can touch (sequence+explode), keep each point in its
    single home bucket, and equi-join on bucket id with the range
    test as a residual. Every (probe, point) pair meets EXACTLY once
    (the point's home bucket), so no post-join dedup; the shuffle is
    keyed on high-cardinality bucket ids; worst-case work is
    sum-of-bucket-pair products, never |probes|×|points|. Skewed hot
    buckets (a flash-sale minute) are ordinary join skew — AQE's
    skew-join split applies, unlike the nested-loop plan it replaces.

    Returns (event_id, n_nearby): probe id + matched-point count,
    zero-rows kept via left join. The id/user column names are
    parameterized per side (probe_id/point_id, probe_user/point_user)
    so the ts parameters are no longer misleading about what schema
    the operator accepts; the output id column keeps the fixed name
    ``event_id``.
    """
    p_us = F.unix_micros(F.col(probe_ts))
    c_us = F.unix_micros(F.col(point_ts))
    # exact integer floor division on longs: (us - pmod(us, tol)) is a
    # multiple of tol, so the one double division is exact (quotient
    # and both operands well under 2^53) — bucket assignment never
    # rests on double-rounding monotonicity. pmod's non-negative
    # remainder gives true floor semantics for pre-epoch timestamps.
    tol = F.lit(tolerance_us)
    bucket = lambda us: (  # noqa: E731
        (us - F.pmod(us, tol)) / tol
    ).cast("long")
    p = probes.select(
        F.col(probe_id).alias("_pid"),
        F.col(probe_user).alias("_puser"),
        p_us.alias("_pus"),
    ).withColumn(
        "_bkt",
        # explode_outer: a NULL probe timestamp yields a NULL bucket
        # sequence — plain explode would DROP the row, breaking the
        # "every probe kept (n_nearby=0)" contract the naive left
        # join (and the oracle) honors
        F.explode_outer(
            F.sequence(
                bucket(F.col("_pus") - tolerance_us),
                bucket(F.col("_pus") + tolerance_us),
            )
        ),
    )
    c = points.select(
        F.col(point_id).alias("_cid"),
        F.col(point_user).alias("_cuser"),
        c_us.alias("_cus"),
    ).withColumn("_bkt", bucket(F.col("_cus")))
    joined = p.join(
        c,
        (p["_bkt"] == c["_bkt"])
        & (F.abs(c["_cus"] - p["_pus"]) <= tolerance_us)
        & (c["_cuser"] != p["_puser"]),
        "left",
    )
    return joined.groupBy(F.col("_pid").alias("event_id")).agg(
        F.count("_cid").alias("n_nearby")
    )
