"""Product/behavioral analytics operators over the event stream.

The reference engine (etl_elb_log_to_mysql.py) stops at a flat log
table; any downstream analytics happen in MySQL. These operators move
the standard event-analytics battery (funnel conversion, cohort
retention, anomaly flagging, CDC snapshot merge, rolling statistics,
one-pass profiling) into the engine itself, expressed as distributed
DataFrame plans.

Scale notes (100 TB / 1000-executor posture):

- `funnel_analysis` is ONE shuffle: events are grouped per user and
  the ordered funnel-stage fold runs as a pure higher-order-function
  expression (`aggregate` over a sorted struct array) inside codegen —
  no window over the raw stream, no self-join chain, no Python. Per-
  user arrays are bounded by per-user activity, not corpus size.
- `retention_cohorts` is two shuffles (first-touch per user, then the
  cohort/offset rollup) — both partial-agg friendly.
- `anomaly_zscore` is the classic two-pass score: a 5-row stats
  aggregate broadcast back over the stream. Both passes are map-side
  combinable; the join is a broadcast, never a shuffle of the stream.
- `scd1_merge` computes latest-per-key on each side with a tie-safe
  `max(struct(ts, event_id, ...))` — an ordinary partial aggregate,
  deliberately NOT a row_number window (no sort, map-side combine).
- `data_profile` reads the fact table ONCE for all columns (a single
  multi-aggregate; Spark plans the distinct counts via Expand) and
  unpivots the one result row driver-side-free with `stack`.

Determinism contract: every double aggregate goes through the exact
DECIMAL image (functions/numeric.py) so results are bit-identical
across partitionings and match the DuckDB oracle; ranking ties carry
`event_id` as a unique tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from elb_log_to_mysql_spark.functions.eventtime import normalize_event_time
from elb_log_to_mysql_spark.functions.numeric import davg, dsum


def funnel_analysis(events: DataFrame, steps: list[str]) -> DataFrame:
    """Ordered funnel conversion: how many users reached step k via a
    strictly ordered subsequence of their event stream.

    Greedy earliest-match over the (ts, event_id)-sorted per-user
    stream is equivalent to the min-after-min chain (the SQL oracle's
    formulation): advancing at the first possible occurrence of each
    step never forecloses a later step. One shuffle; the fold is a
    codegen'd higher-order function, not a window or join chain.
    """
    ev = normalize_event_time(events)
    filtered = ev.filter(F.col("event_type").isin(steps)).select(
        "user_id", "ts", "event_id", "event_type"
    )
    step_arr = F.array(*[F.lit(s) for s in steps])
    stage = F.aggregate(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
        F.lit(0),
        lambda acc, e: F.when(
            (acc < len(steps))
            & (e["event_type"] == F.element_at(step_arr, acc + 1)),
            acc + 1,
        ).otherwise(acc),
    )
    per_user = filtered.groupBy("user_id").agg(stage.alias("max_stage"))
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
            F.round(F.col("n_users").cast("double") / F.col("_first"), 9).alias(
                "conversion"
            ),
        )
        .orderBy("step_idx")
    )


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week of their
    first event; activity bucketed by whole-week offset from that
    first day. `n_users` is exact distinct."""
    ev = normalize_event_time(events).select(
        "user_id", F.to_date("ts").alias("d")
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        ev.join(first, "user_id")
        .select(
            "user_id",
            F.date_format(F.date_trunc("week", "cohort_day"), "yyyy-MM-dd").alias(
                "cohort_week"
            ),
            F.floor(F.datediff("d", "cohort_day") / 7).cast("int").alias(
                "week_offset"
            ),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def anomaly_zscore(events: DataFrame, threshold: float = 3.0) -> DataFrame:
    """Flag events whose `value` deviates >= `threshold` standard
    deviations from the per-type mean.

    Mean and variance derive from exact-decimal sums of v and v*v
    (sample variance, n-1), so stats — and therefore every z-score —
    are bit-identical to a single-node oracle computing the same
    expression sequence. The 5-row stats side is broadcast."""
    ev = normalize_event_time(events)
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("sv"),
        dsum(F.col("value") * F.col("value")).alias("svv"),
    )
    stats = stats.select(
        "event_type",
        (F.col("sv") / F.col("n")).alias("mean_v"),
        F.sqrt(
            (F.col("svv") - F.col("sv") * F.col("sv") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("stddev_v"),
    )
    z = (F.col("value") - F.col("mean_v")) / F.col("stddev_v")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 6).alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) >= threshold)
    )


def scd1_merge(events: DataFrame, split: str) -> DataFrame:
    """SCD type-1 / CDC snapshot merge: the pre-`split` stream is the
    base snapshot (latest state per user), the post-`split` stream is
    the change feed; merge keeps the newest state and labels each key
    `insert` (new key), `update` (key present in both), or `carry`
    (untouched base key).

    Latest-per-key is `max(struct(ts, event_id, state))` — tie-safe
    (event_id unique), partial-agg friendly, and avoids the full sort
    a row_number window would require."""
    ev = normalize_event_time(events)
    latest = F.max(F.struct("ts", "event_id", "event_type")).alias("s")

    def side(df: DataFrame, prefix: str) -> DataFrame:
        return (
            df.groupBy("user_id")
            .agg(latest)
            .select(
                "user_id",
                F.col("s.ts").alias(f"{prefix}_ts"),
                F.col("s.event_id").alias(f"{prefix}_id"),
                F.col("s.event_type").alias(f"{prefix}_state"),
            )
        )

    base = side(ev.filter(F.col("ts") < F.lit(split).cast("timestamp")), "b")
    upd = side(ev.filter(F.col("ts") >= F.lit(split).cast("timestamp")), "u")
    merged = base.join(upd, "user_id", "full_outer")
    return merged.select(
        "user_id",
        F.coalesce("u_state", "b_state").alias("state"),
        F.date_format(
            F.coalesce("u_ts", "b_ts"), "yyyy-MM-dd HH:mm:ss"
        ).alias("updated_at"),
        F.when(F.col("b_id").isNull(), F.lit("insert"))
        .when(F.col("u_id").isNull(), F.lit("carry"))
        .otherwise(F.lit("update"))
        .alias("action"),
    )


def rolling_median(events: DataFrame, frame_rows: int = 10) -> DataFrame:
    """Exact trailing median of `value` over the last `frame_rows`
    events per user (ordered by ts, event_id). `percentile(0.5)` is
    Spark's exact interpolated quantile — identical arithmetic to the
    oracle's quantile_cont, so values are bit-stable."""
    ev = normalize_event_time(events)
    frame = (
        f"(PARTITION BY user_id ORDER BY ts, event_id "
        f"ROWS BETWEEN {frame_rows - 1} PRECEDING AND CURRENT ROW)"
    )
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.round(
            F.expr(f"percentile(value, 0.5) OVER {frame}"), 9
        ).alias("med_{}".format(frame_rows)),
    )


def data_profile(df: DataFrame, numeric_cols: list[str]) -> DataFrame:
    """One-pass column profiler (Deequ-style): row/null/exact-distinct
    counts, min/max, and deterministic mean for each numeric column,
    from a SINGLE scan of the fact table. The per-column result row is
    unpivoted with `stack` — no driver-side loop over columns."""
    aggs: list = [F.count(F.lit(1)).alias("n_rows")]
    for c in numeric_cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("double").alias(f"{c}__mn"),
            F.max(c).cast("double").alias(f"{c}__mx"),
            davg(c).alias(f"{c}__av"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__mn, {c}__mx, {c}__av"
        for c in numeric_cols
    )
    return one.select(
        "n_rows",
        F.expr(
            f"stack({len(numeric_cols)}, {stack_args}) AS "
            "(col_name, n_null, n_distinct, min_val, max_val, avg_val)"
        ),
    ).select(
        "col_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val",
        "avg_val",
    )


def pps_systematic_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    weight: "F.Column",
    k: int,
) -> DataFrame:
    """Probability-proportional-to-size sampling, systematic variant:
    within each stratum, walk the key-ordered cumulative-weight line
    and pick the row at every crossing of `total_weight / k` — exactly
    k picks per stratum, heavier rows proportionally likelier, fully
    deterministic (a pure function of keys and weights: reproducible
    across runs, engines, and partitionings).

    Deliberately transcendental-free: the classic A-ES exponential-
    race key (u^(1/w)) needs pow/ln, which are only ~1-ulp accurate
    and differ between libm implementations — a cross-engine ordering
    hazard. Here the only operations are decimal cumulative sums
    (order-independent by the engine-wide contract) and IEEE-exact
    +,-,/,floor, so the picked set is bit-stable everywhere.

    One shuffle (the per-stratum window). Strata sort independently;
    a mega-stratum bounds one task — pre-split hot strata if needed.

    Standard systematic-PPS caveat: a single weight exceeding
    total/k absorbs several step crossings, so such strata return
    FEWER than k distinct rows (the giant is picked once, with
    certainty — survey practice's "certainty unit"); callers needing
    exactly k distinct picks remove certainty units and re-sample
    the remainder.
    """
    from pyspark.sql.window import Window

    from elb_log_to_mysql_spark.functions.numeric import DET_DECIMAL

    w_ord = Window.partitionBy(stratum_col).orderBy(key_col)
    w_all = Window.partitionBy(stratum_col)
    wv = weight.alias("w")
    base = df.select(stratum_col, key_col, wv)
    dec = F.sum(F.col("w").cast(DET_DECIMAL))
    cum = dec.over(w_ord).cast("string").cast("double")
    tot = dec.over(w_all).cast("string").cast("double")
    step = tot / k
    picked = (
        base.withColumn("cw", cum)
        .withColumn("step", step)
        .filter(
            F.floor(F.col("cw") / F.col("step"))
            > F.floor((F.col("cw") - F.col("w")) / F.col("step"))
        )
    )
    return picked.select(stratum_col, key_col)


def equal_width_histogram(
    df: DataFrame, value: "F.Column", bins: int = 20
) -> DataFrame:
    """Equal-width histogram with in-plan bounds: min/max come from a
    broadcast scalar aggregate (no driver round-trip), bin edges are
    derived arithmetic. Two scans of the value column (bounds + fill),
    one tiny broadcast, one groupBy — the standard distributed
    histogram. Top edge clamps into the last bin."""
    v = value.alias("v")
    vals = df.select(v)
    bounds = vals.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / bins
    binned = (
        vals.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.floor((F.col("v") - F.col("lo")) / width),
                F.lit(bins - 1),
            ).cast("int").alias("bin"),
            "lo",
            "hi",
        )
        .groupBy("bin", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w2 = (F.col("hi") - F.col("lo")) / bins
    return binned.select(
        "bin",
        F.round(F.col("lo") + F.col("bin") * w2, 6).alias("bin_lo"),
        F.round(F.col("lo") + (F.col("bin") + 1) * w2, 6).alias("bin_hi"),
        "n",
    ).orderBy("bin")


def ewma_per_user(events: DataFrame) -> DataFrame:
    """Final exponentially-weighted moving average of `value` per user
    (decay 1/2), folded over the (ts, event_id)-ordered history:
    acc_0 = x_0; acc_i = (x_i + acc_{i-1}) / 2.

    alpha is FIXED at 1/2 deliberately: halving is exact IEEE
    arithmetic, so the fold is bit-identical on any engine — a general
    alpha needs pow(1-a, k), whose last-ulp varies by libm and breaks
    cross-engine hash equality. One shuffle (groupBy user); the fold
    is a codegen higher-order function over the sorted array, same
    shape as the funnel fold."""
    ev = normalize_event_time(events)
    arr = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "value"))
    )
    vals = F.transform(arr, lambda e: e["value"])
    ewma = F.aggregate(
        F.slice(vals, 2, 1_000_000_000),
        F.element_at(vals, 1),
        lambda acc, x: (x + acc) / 2,
    )
    return (
        ev.groupBy("user_id")
        .agg(ewma.alias("ewma"), F.count(F.lit(1)).alias("n_events"))
        .select("user_id", "n_events", F.round("ewma", 9).alias("ewma"))
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition counts: consecutive event-type
    pairs per user ((ts, event_id)-ordered), aggregated corpus-wide,
    with the row-normalized probability. One window sort + one
    aggregate; the per-user lag never crosses users, so partitioning
    by user keeps the sort local to each key."""
    from pyspark.sql.window import Window

    ev = normalize_event_time(events)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_from = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_from), 9).alias("p"),
    )


def cdc_apply(events: DataFrame, split: str) -> DataFrame:
    """CDC changelog apply WITH DELETES — the full merge semantics
    scd1_merge (upsert-only) leaves out.

    The pre-`split` stream is the base snapshot (latest state per
    key); the post-`split` stream is an ordered changelog where an
    `error` event is a tombstone (op=D) and anything else an upsert
    (op=U). Last-writer-wins per key: the net effect of a key's
    changelog is its maximum-(ts, event_id) operation — earlier ops
    in the window are superseded, including Us before a final D.
    That net op is one tie-safe `max(struct(...))` partial aggregate
    (event_id unique), never a sort window, exactly like the
    scd1_merge pattern — at 100 TB the changelog collapses map-side
    before the merge join moves anything.

    Output is the merge AUDIT: every key with its final state,
    `action` in insert/update/delete/carry, and `in_snapshot` (false
    only for deletes — filtering on it yields the applied snapshot;
    deleted keys keep state/updated_at NULL because a tombstone
    carries no payload)."""
    ev = normalize_event_time(events)
    latest = F.max(F.struct("ts", "event_id", "op", "event_type")).alias("s")

    base = (
        ev.filter(F.col("ts") < F.lit(split).cast("timestamp"))
        .withColumn("op", F.lit("U"))
        .groupBy("user_id")
        .agg(latest)
        .select(
            "user_id",
            F.col("s.ts").alias("b_ts"),
            F.col("s.event_id").alias("b_id"),
            F.col("s.event_type").alias("b_state"),
        )
    )
    chg = (
        ev.filter(F.col("ts") >= F.lit(split).cast("timestamp"))
        .withColumn(
            "op",
            F.when(F.col("event_type") == "error", F.lit("D")).otherwise(
                F.lit("U")
            ),
        )
        .groupBy("user_id")
        .agg(latest)
        .select(
            "user_id",
            F.col("s.ts").alias("u_ts"),
            F.col("s.event_id").alias("u_id"),
            F.col("s.op").alias("u_op"),
            F.col("s.event_type").alias("u_state"),
        )
    )
    merged = base.join(chg, "user_id", "full_outer")
    deleted = F.col("u_op") == "D"
    return merged.select(
        "user_id",
        F.when(deleted, F.lit(None).cast("string"))
        .otherwise(F.coalesce("u_state", "b_state"))
        .alias("state"),
        F.when(
            deleted, F.lit(None).cast("string")
        )
        .otherwise(
            F.date_format(F.coalesce("u_ts", "b_ts"), "yyyy-MM-dd HH:mm:ss")
        )
        .alias("updated_at"),
        F.when(deleted, F.lit("delete"))
        .when(F.col("b_id").isNull(), F.lit("insert"))
        .when(F.col("u_id").isNull(), F.lit("carry"))
        .otherwise(F.lit("update"))
        .alias("action"),
        (~deleted | F.col("u_op").isNull()).alias("in_snapshot"),
    )


def constraint_check(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Declarative data-quality constraint suite (the Deequ-style
    check step a production table runs after every load), evaluated
    in ONE pass over each table plus one anti-join:

    - key uniqueness (o_orderkey duplicate count — exact distinct;
      at extreme scale swap in approx_count_distinct and treat the
      constraint as a bound),
    - completeness (NULL o_custkey count),
    - value ranges (non-positive o_totalprice; o_orderdate outside
      the expected era),
    - referential integrity (lineitem rows whose l_orderkey has no
      parent order — left anti join, the relational NOT EXISTS).

    All single-table metrics ride one aggregate (map-side combined);
    the verdict table is a stack() unpivot of that row joined with
    the orphan count. Output: (check_name, violations, passed) —
    exact integers and a boolean, trivially oracle-checkable."""
    local = orders.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_keys"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "null_custkey"
        ),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "bad_price"
        ),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
                | (F.col("o_orderdate") >= F.lit("2010-01-01").cast("timestamp")),
                1,
            ).otherwise(0)
        ).alias("bad_date"),
    )
    orphans = (
        lineitem.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("orphan_lines"))
    )
    wide = local.crossJoin(F.broadcast(orphans))
    stacked = wide.selectExpr(
        "stack(5,"
        " 'orderkey_unique', dup_keys,"
        " 'custkey_complete', null_custkey,"
        " 'totalprice_positive', bad_price,"
        " 'orderdate_in_era', bad_date,"
        " 'lineitem_fk_orders', orphan_lines"
        ") AS (check_name, violations)"
    )
    return stacked.select(
        "check_name",
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    )
