"""Window-function operators (SURVEY §2.3: window_rank / window_analytic / per-group top-k).

Window functions shuffle once on the partition key then sort within
partitions; AQE handles skewed partition keys. All orderings carry a
unique tiebreaker column so ranks and frames are total-order
deterministic (a bare ORDER BY on a non-unique key makes row_number
nondeterministic across runs — unacceptable for a reproducible engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from elb_log_to_mysql_spark.functions.numeric import DET_DECIMAL


def window_rank(customer: DataFrame) -> DataFrame:
    """rank / dense_rank / row_number per nation by account balance."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return customer.select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    ).filter(F.col("rn") <= 5)


def window_analytic(orders: DataFrame) -> DataFrame:
    """lag / lead / running sum with an explicit frame, per customer.

    The running sum uses the exact-decimal image of o_totalprice so
    the cumulative double is identical under any physical ordering of
    the partition sort (deterministic-aggregation contract).
    """
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        "o_totalprice",
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        F.sum(F.col("o_totalprice").cast(DET_DECIMAL))
        .over(frame)
        .cast("double")
        .alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


def window_range_trailing(orders: DataFrame, days: int = 90) -> DataFrame:
    """RANGE-frame analytics: orders and spend in the trailing `days`
    window per customer (value-based frame, not row-count-based — the
    frame a ROWS spec cannot express when order density varies).

    Spark's rangeBetween needs a numeric sort key; epoch seconds map
    order-dates monotonically, so date peers stay peers and the frame
    `[ts - days·86400, ts]` matches SQL's
    `RANGE BETWEEN INTERVAL d DAYS PRECEDING AND CURRENT ROW`.
    """
    epoch = F.col("o_orderdate").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch.alias("epoch"))
        .rangeBetween(-days * 86400, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.count(F.lit(1)).over(w).alias("trailing_n"),
        F.sum(F.col("o_totalprice").cast(DET_DECIMAL))
        .over(w)
        .cast("double")
        .alias("trailing_spend"),
    )


def topk_per_group(lineitem: DataFrame, k: int = 3) -> DataFrame:
    """Per-group top-k via row_number — the scalable pattern.

    One shuffle on the group key, per-partition sort, early filter;
    never collects groups to the driver. (A groupBy + collect_list +
    slice would materialize whole groups — wrong at scale.)
    """
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        lineitem.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).alias("price_rank"),
        )
        .filter(F.col("price_rank") <= k)
    )


def window_distribution(orders: DataFrame) -> DataFrame:
    """Distribution window functions: quartile bucket (ntile),
    percent_rank and cume_dist per customer — the spend-percentile
    profile. Unique (totalprice, orderkey) ordering makes every
    function's output deterministic; one shuffle on the partition
    key, same as any other window."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.ntile(4).over(w).alias("spend_quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


def scd2_history(events: DataFrame) -> DataFrame:
    """Slowly-changing-dimension type-2 derivation: turn an event
    stream into versioned validity intervals per user — valid_from =
    the event time, valid_to = the NEXT event's time (open for the
    current row), is_current on the last version. One shuffle on the
    entity key; lead() needs no frame and the unique (ts, event_id)
    ordering pins ties."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return events.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
