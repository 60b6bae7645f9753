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


def tpch_q2(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    size: int = 15,
    type_: str = "STANDARD",
    region_name: str = "EUROPE",
) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 shape). The test schema has no
    partsupp, so the part↔supplier catalog is derived from lineitem:
    supply price per (part, supplier) = min unit price ever shipped.
    The correlated MIN subquery decorrelates into a per-part aggregate
    re-joined on (partkey, price) — two shuffles of the narrow
    catalog, never a per-row subquery; all dimensions broadcast."""
    eu_supp = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    catalog = (
        lineitem.join(
            F.broadcast(eu_supp.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supp_price"))
    )
    min_price = catalog.groupBy(F.col("l_partkey").alias("mp_partkey")).agg(
        F.min("supp_price").alias("min_price")
    )
    wanted = part.filter((F.col("p_size") == size) & (F.col("p_type") == type_))
    return (
        catalog.join(
            min_price,
            (F.col("l_partkey") == F.col("mp_partkey"))
            & (F.col("supp_price") == F.col("min_price")),
        )
        .join(F.broadcast(wanted), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.round("supp_price", 6).alias("supp_price"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
    )


def tpch_q8(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    target_nation: str = "NATION_3",
) -> DataFrame:
    """National market share (TPC-H Q8 shape): the target nation's
    slice of ECONOMY-part revenue sold into AMERICA, per year.
    Conditional aggregation (share = Σ case / Σ all) computes both
    sums in one pass over one joined stream; only lineitem⋈orders is
    a real shuffle — every dimension broadcasts."""
    america = (
        customer.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_type") == "ECONOMY")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1998-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(america), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                dsum(F.when(F.col("supp_nation") == target_nation, rev).otherwise(0.0))
                / dsum(rev)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def tpch_q9(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    name_fragment: str = "red",
) -> DataFrame:
    """Product-type profit (TPC-H Q9 shape). No partsupp supplycost in
    the test schema, so cost is modeled as 10% of p_retailprice per
    unit: profit = price·(1−disc) − 0.1·retail·qty. One fact-fact
    shuffle (lineitem⋈orders on orderkey); part/supplier/nation
    broadcast; LIKE filter prunes part before the join."""
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_name").contains(name_fragment))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(dsum(profit).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def tpch_q11(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    fraction: float = 0.001,
) -> DataFrame:
    """Important-stock identification (TPC-H Q11 shape): parts whose
    shipped value through ASIA-region suppliers exceeds a fraction of
    the total. The HAVING threshold is a global scalar — computed once
    from the same per-part aggregate (no second scan) and broadcast
    into the filter via a 1-row cross join."""
    asia_supp = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    value = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = (
        lineitem.join(
            F.broadcast(asia_supp), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("l_partkey")
        .agg(dsum(value).alias("part_value"))
    )
    threshold = per_part.agg(
        (dsum("part_value") * fraction).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


def tpch_q12(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Shipping-mode priority counts (TPC-H Q12 shape; l_linestatus
    stands in for the absent l_shipmode). Two CASE-sums over one
    orders⋈lineitem stream — a single shuffle on orderkey, counts are
    integers so no float determinism concerns."""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy(F.col("l_linestatus").alias("ship_mode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_mode")
    )


def tpch_q14(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Promotion-effect revenue share (TPC-H Q14 shape): percentage of
    one month's revenue from PROMO parts. Numerator and denominator in
    one conditional aggregate over a single broadcast join."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1996-09-01")
            & (F.col("l_shipdate") < "1996-10-01")
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                100.0
                * dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / dsum(rev)
            ).alias("promo_revenue_pct")
        )
    )


def tpch_q15(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """Top supplier by quarterly revenue (TPC-H Q15 shape). The view +
    MAX scalar decorrelates into one per-supplier aggregate reused for
    both the max and the final filter — Spark caches nothing here, but
    the aggregate is tiny (|suppliers| rows) so recompute is cheaper
    than a persist at scale; equality on the exact-decimal sum is
    bit-safe."""
    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        ))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supplier), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def tpch_q16(
    part: DataFrame, supplier: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Part/supplier relationship count (TPC-H Q16 shape): how many
    distinct suppliers shipped each (brand, type, size) combination,
    excluding one brand, PROMO types, and complaint suppliers (stand-in:
    negative account balance → NOT IN → broadcast anti join). The
    distinct-count shuffles pre-deduplicated (partkey, suppkey) pairs
    only — map-side distinct keeps the shuffle narrow."""
    bad_supp = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    wanted = part.filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 14, 19, 23, 45)
    )
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(wanted), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def tpch_q20(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    name_prefix: str = "small",
    region_name: str = "ASIA",
) -> DataFrame:
    """Excess-supply candidates (TPC-H Q20 shape): ASIA suppliers whose
    1996 shipments of any 'small…' part exceeded 20% of that part's
    total 1996 volume. The nested IN-subqueries flatten into one
    per-(part,supplier) aggregate, a windowless per-part total via a
    second narrow aggregate, and a final SEMI join into supplier — the
    fact table is scanned once."""
    qty_96 = lineitem.filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).join(
        F.broadcast(
            part.filter(F.col("p_name").startswith(name_prefix)).select("p_partkey")
        ),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    per_ps = qty_96.groupBy("l_partkey", "l_suppkey").agg(
        dsum("l_quantity").alias("ps_qty")
    )
    per_part = per_ps.groupBy(F.col("l_partkey").alias("pp_partkey")).agg(
        dsum("ps_qty").alias("part_qty")
    )
    over = (
        per_ps.join(per_part, F.col("l_partkey") == F.col("pp_partkey"))
        .filter(F.col("ps_qty") > 0.2 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    asia = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    return (
        supplier.join(
            F.broadcast(over), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .join(F.broadcast(asia), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


def tpch_q21(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    target_nation: str = "NATION_3",
    late_days: int = 60,
) -> DataFrame:
    """Suppliers-who-kept-orders-waiting (TPC-H Q21 shape; lateness =
    shipped >late_days after order date, since the test schema has no
    commit/receipt dates). The EXISTS / NOT-EXISTS pair-set logic is a
    per-order cardinality fact, so it folds into aggregation (r15,
    guide §2.4): for each order, n_supp = distinct suppliers and
    n_late = distinct LATE suppliers; a late pair is "waiting" iff
    n_supp > 1 (someone else touched the order) and n_late == 1 (it is
    the only late one) — and that unique late supplier is recoverable
    as max(late suppkey). Identical set to the former semi+anti join
    over distinct pair lists (oracle-verified), but the fact table is
    scanned ONCE (was 3×) with two aggregations instead of two
    sort-merge joins, and nothing ever row-multiplies."""
    li = lineitem.join(
        orders.filter(F.col("o_orderstatus") == "F").select(
            "o_orderkey", "o_orderdate"
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
            f"INTERVAL {late_days} DAYS"
        ),
    )
    pair_late = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("is_late"), 1).otherwise(0)).alias("late")
    )
    per_order = pair_late.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("late").alias("n_late"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    waiting = per_order.filter(
        (F.col("n_supp") > 1) & (F.col("n_late") == 1)
    ).select(F.col("late_supp").alias("w_suppkey"))
    return (
        waiting.join(
            F.broadcast(
                supplier.join(
                    F.broadcast(
                        nation.filter(F.col("n_name") == target_nation)
                    ),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                )
            ),
            F.col("w_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


def tpch_q22(
    customer: DataFrame, orders: DataFrame, nation: DataFrame
) -> DataFrame:
    """Global sales opportunity (TPC-H Q22 shape; nation name stands in
    for the absent phone country code). Positive-balance average is a
    broadcast scalar; customers-without-recent-orders is an anti join
    against the distinct custkey list of the final year — at 100 TB
    the date filter prunes the fact scan and the distinct list is the
    small side and broadcasts, so no fact-side shuffle."""
    target = customer.join(
        F.broadcast(
            nation.filter(
                F.col("n_nationkey").isin(0, 3, 7, 11, 17)
            ).select("n_nationkey", "n_name")
        ),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum("c_acctbal") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        target.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(F.col("o_orderdate") >= "2000-01-01")
            .select("o_custkey")
            .distinct(),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("n_name").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("cntry")
    )
