"""Advanced relational operators: multi-join analytical queries,
pivot, moment-based statistics, JSON access, date/string function
batteries, percentiles, grouping sets, ordered collection.

Everything follows the engine's determinism contract: double
aggregates go through exact decimal power sums; collections are
sorted before emission; rankings carry tiebreakers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from elb_log_to_mysql_spark.functions.numeric import DET_DECIMAL, dsum


def tpch_q3(customer: DataFrame, orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Shipping-priority revenue (TPC-H Q3 shape): top-10 open orders
    by revenue in the BUILDING segment. The c_custkey filter output is
    tiny -> broadcast; lineitem⋈orders shuffles on orderkey once."""
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
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


def tpch_q5(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Local-supplier volume (TPC-H Q5 shape): revenue per nation where
    customer and supplier share the nation. Exercises a 6-table join
    with both broadcast (dims) and shuffle (facts) strategies and a
    join-key-equality side condition."""
    dims = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey", "n_name"
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(dims, F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .groupBy("n_name")
        .agg(dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


PIVOT_STATUSES = ["F", "O", "P"]


def pivot_agg(orders: DataFrame) -> DataFrame:
    """Pivot order value per priority across order-status columns.

    Explicit pivot values keep the plan a single pass (no extra job to
    discover the domain) — required practice at scale.
    """
    p = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", PIVOT_STATUSES)
        .agg(F.sum(F.col("o_totalprice").cast(DET_DECIMAL)).cast("double"))
    )
    return p.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(s), F.lit(0.0)).alias(f"total_{s.lower()}")
            for s in PIVOT_STATUSES
        ],
    )


def stats_agg(lineitem: DataFrame) -> DataFrame:
    """Mean / variance / stddev / correlation from exact power sums.

    Spark's built-in var_samp/corr use streaming single-pass updates
    whose float accumulation is partition-order dependent — fine for
    estimation, wrong for a reproducible engine. Here the five power
    sums are exact decimals (order-independent), and the moments are
    derived in double with one fixed expression, so results are
    bit-stable under any parallelism AND match the oracle running the
    same formula.
    """
    x = F.col("l_extendedprice")
    y = F.col("l_quantity")
    agg = lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(x).alias("sx"),
        dsum(x * x).alias("sxx"),
        dsum(y).alias("sy"),
        dsum(y * y).alias("syy"),
        dsum(x * y).alias("sxy"),
    )
    n = F.col("n").cast("double")
    var_x = (n * F.col("sxx") - F.col("sx") * F.col("sx")) / (n * (n - 1))
    var_y = (n * F.col("syy") - F.col("sy") * F.col("sy")) / (n * (n - 1))
    cov = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (n * (n - 1))
    # Quantize derived moments: the a*b - c*d shapes are subject to FMA
    # contraction, which differs between the JVM and native engines in
    # the last ulp. Rounding orders of magnitude above that noise (but
    # far below statistical meaning) restores cross-engine bit equality.
    return agg.select(
        "l_returnflag",
        "n",
        (F.col("sx") / n).alias("mean_price"),
        F.round(var_x, 2).alias("var_price"),
        F.round(F.sqrt(var_x), 4).alias("std_price"),
        F.round(cov / F.sqrt(var_x * var_y), 8).alias("corr_price_qty"),
    )


def json_funcs(events: DataFrame) -> DataFrame:
    """JSON access over the events.props payload column."""
    k_str = F.get_json_object("props", "$.k")
    return events.select(
        "event_id",
        "event_type",
        k_str.alias("k_str"),
        k_str.try_cast("long").alias("k_int"),
        (k_str.try_cast("long") % 10).alias("k_mod10"),
    )


def date_funcs(orders: DataFrame) -> DataFrame:
    """Date/time function battery on o_orderdate."""
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_trunc("quarter", d), "yyyy-MM-dd").alias("quarter_start"),
        (F.weekday(d) + 1).cast("int").alias("iso_dow"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.lit("1998-12-31").cast("date"), d).cast("int").alias(
            "days_to_end"
        ),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_3mo"),
    )


def string_funcs(part: DataFrame) -> DataFrame:
    """String function battery on part names/brands/types."""
    return part.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.col("p_brand"), 2).alias("brand_twice"),
        F.translate("p_type", "aeiou", "AEIOU").alias("type_vowels_up"),
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("type_first_word"),
        F.instr("p_name", "a").cast("int").alias("first_a"),
        F.levenshtein("p_brand", F.lit("Brand#00")).cast("int").alias("brand_dist"),
        F.left("p_name", F.lit(5)).alias("name5"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_masked"),
    )


def percentile_agg(lineitem: DataFrame) -> DataFrame:
    """Exact interpolated percentiles per group (sort-based within
    group). For 100 TB prefer approx_percentile (t-digest sketch,
    map-side combinable) — exposed as the _approx twin below."""
    q = F.col("l_quantity")
    return lineitem.groupBy("l_returnflag").agg(
        F.percentile(q, F.lit(0.25)).alias("p25"),
        F.percentile(q, F.lit(0.5)).alias("p50"),
        F.percentile(q, F.lit(0.75)).alias("p75"),
        F.min(q).alias("q_min"),
        F.max(q).alias("q_max"),
    )


def percentile_approx_agg(lineitem: DataFrame) -> DataFrame:
    """Sketch-based percentile with a CHECKABLE contract.

    `percentile_approx` (GK sketch, accuracy 10000 → rank error
    ≤ n/10000) is the 100 TB path. Its raw output is sketch-specific,
    so the query emits the engine-neutral contract instead: the exact
    median plus a flag asserting the approx value lies within the
    exact [p48, p52] quantile envelope (rank-error bound with margin).
    The exact percentiles are the verification harness, not the scale
    path."""
    q = F.col("l_quantity")
    approx = F.percentile_approx(q, F.lit(0.5), F.lit(10000))
    return lineitem.groupBy("l_returnflag").agg(
        F.percentile(q, F.lit(0.5)).alias("p50_exact"),
        approx.between(
            F.percentile(q, F.lit(0.48)), F.percentile(q, F.lit(0.52))
        ).alias("p50_in_bound"),
    )


def grouping_sets_agg(spark: SparkSession, lineitem: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube) via Spark SQL."""
    lineitem.createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_extendedprice AS {DET_DECIMAL})) AS DOUBLE)
                 AS sum_price,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


def collect_sorted(customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Deterministic per-group collection: distinct market segments per
    nation, sorted then joined. collect_list alone is partition-order
    nondeterministic — array_sort(array_distinct(...)) restores a
    stable value, the only safe way to emit collections from a
    distributed engine."""
    return (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .groupBy("n_name")
        .agg(
            F.array_join(
                F.array_sort(F.array_distinct(F.collect_list("c_mktsegment"))), "|"
            ).alias("segments"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
    )


def sketch_rollup(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Mergeable-sketch hierarchy rollup: distinct parts per REGION
    computed by unioning per-NATION HyperLogLog sketches — the fact
    table is scanned and aggregated ONCE at the fine grain; every
    coarser level derives from sketch union (hll_union_agg), never a
    rescan. This is how distinct-count hierarchies (daily→monthly,
    nation→region) stay tractable at 100 TB: sketches are a few KB
    each and merge associatively, where exact distinct would need a
    full re-shuffle of raw keys per level. Estimates carry ~2% HLL
    error by construction (rows-only check + accuracy-bounded test).
    """
    per_nation = (
        lineitem.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_regionkey", "n_name")
        .agg(F.hll_sketch_agg("l_partkey").alias("sk"))
    )
    return (
        per_nation.join(
            F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .groupBy("r_name")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_parts"),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("r_name")
    )


def incremental_agg(events: DataFrame, split: str = "2025-07-01") -> DataFrame:
    """Re-aggregatable partial state: the incremental-rollup pattern.

    A 100 TB pipeline never recomputes a rolling metric from raw
    data — it maintains ALGEBRAIC state (count + exact-decimal sum
    per group) and merges new partitions into it. Here the stream is
    split into two disjoint date ranges, each aggregated to state
    independently (as a daily batch job would), and the states are
    merged by a second aggregation. Because the state stays DECIMAL
    until the final cast, merge order cannot perturb the result: the
    merged metric is bit-identical to a single-pass recompute — which
    is exactly what the oracle computes.
    """
    from elb_log_to_mysql_spark.functions.numeric import DET_DECIMAL

    day = F.date_format("ts", "yyyy-MM-dd").alias("day")

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy(day, "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DET_DECIMAL)).alias("total_state"),
        )

    s1 = state(events.filter(F.col("ts") < split))
    s2 = state(events.filter(F.col("ts") >= split))
    return (
        s1.unionAll(s2)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("total_state").cast("double").alias("total_value"),
            (F.sum("total_state").cast("double") / F.sum("n")).alias("avg_value"),
        )
    )


_CMS_SALTS = (0x9E3779B1, 0x85EBCA6B, 0xC2B2AE35)


def _cms_bucket(key: Column, salt: int, width: int) -> Column:
    """Multiplicative-hash bucket — pure 64-bit integer arithmetic
    (identical on any engine; no float, no library hash)."""
    return ((key * F.lit(salt)) % F.lit(2**31)) % F.lit(width)


def countmin_estimates(
    fact: DataFrame, key: str, width: int = 256, topk: int = 10
) -> DataFrame:
    """Count-Min sketch frequency estimation with an in-plan
    exactness audit: build the d×w counter table (d=3 rows of
    `width` counters) in ONE aggregation over the fact table, then
    estimate the top-`topk` keys' frequencies as the min of their
    d counters and place the estimate next to the exact count.

    Scale posture: the sketch is a 768-row table — THE mergeable
    summary (counters are sums: partial aggregation composes them
    map-side, and day-level sketches add into month-level ones
    without touching raw data, same union story as sketch_rollup's
    HLL). Point queries join the broadcast sketch. The contract is
    structural: CMS can only OVERcount (est >= exact always; the
    hash is deterministic integer arithmetic so the estimate is
    bit-reproducible and oracle-checkable, not a tolerance band).
    """
    k = F.col(key).cast("long")
    stack_expr = ", ".join(
        f"{j}, b{j}" for j in range(len(_CMS_SALTS))
    )
    buckets = fact.select(
        *[
            _cms_bucket(k, s, width).alias(f"b{j}")
            for j, s in enumerate(_CMS_SALTS)
        ]
    ).select(
        F.expr(
            f"stack({len(_CMS_SALTS)}, {stack_expr}) AS (j, bucket)"
        )
    )
    cms = buckets.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    exact = (
        fact.groupBy(key)
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col(key))
        .limit(topk)
    )
    probes = exact.select(
        key,
        "exact_n",
        F.expr(
            "stack({n}, {args}) AS (j, bucket)".format(
                n=len(_CMS_SALTS),
                args=", ".join(
                    f"{j}, (CAST({key} AS BIGINT) * {s}) % {2**31} % {width}"
                    for j, s in enumerate(_CMS_SALTS)
                ),
            )
        ),
    )
    est = (
        probes.join(F.broadcast(cms), ["j", "bucket"])
        .groupBy(key, "exact_n")
        .agg(F.min("c").alias("cms_est"))
    )
    return est.select(
        key,
        "exact_n",
        "cms_est",
        (F.col("cms_est") >= F.col("exact_n")).alias("never_undercounts"),
    )


def variant_funcs(events: DataFrame) -> DataFrame:
    """Spark 4 VARIANT round trip over semi-structured payloads.

    A nested JSON document (object + array) is constructed per event
    from typed columns, parsed into a VARIANT with parse_json, and
    read back through typed path extraction (try_variant_get with
    '$.meta.ids[1]'-style paths) feeding a JVM aggregate. The oracle
    recomputes the aggregate from the BASE columns, so the checked
    property is exactly "the variant encode/extract round trip
    preserves every value" — the property a semi-structured ingest
    pipeline relies on. VARIANT beats from_json-with-schema when the
    payload schema drifts: no upfront StructType, per-path typed
    access, binary-encoded storage."""
    k = F.get_json_object("props", "$.k").cast("long")
    # build the document structurally (to_json handles quote/backslash
    # escaping and null fields; hand-concatenated literals would emit
    # malformed JSON for a quoted event_type and collapse NULL k rows
    # into a NULL document via concat's null propagation)
    doc = F.to_json(
        F.struct(
            F.struct(
                F.col("event_type").alias("type"),
                F.array(F.col("user_id"), F.col("event_id")).alias("ids"),
            ).alias("meta"),
            k.alias("k"),
        )
    )
    v = events.select(F.parse_json(doc).alias("v"))
    extracted = v.select(
        F.try_variant_get("v", "$.meta.type", "string").alias("vtype"),
        F.try_variant_get("v", "$.meta.ids[0]", "long").alias("vuser"),
        F.try_variant_get("v", "$.meta.ids[1]", "long").alias("vevent"),
        F.try_variant_get("v", "$.k", "long").alias("vk"),
    )
    return extracted.groupBy("vtype").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("vk").alias("sum_k"),
        F.max("vevent").alias("max_event"),
        F.countDistinct("vuser").alias("n_users"),
    )
