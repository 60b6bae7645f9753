"""Behavioral-analytics operator invariants (operators/analytics.py).

The registry oracles check value parity against DuckDB; these tests
pin the semantic properties that parity alone wouldn't catch — funnel
monotonicity and ordering strictness, cohort-offset bounds, merge
action partitioning, and the single-scan plan shape of the profiler.
"""

from __future__ import annotations

import datetime as dt

import pytest

from elb_log_to_mysql_spark.operators import analytics
from elb_log_to_mysql_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_funnel_counts_are_monotone_nonincreasing(spark):
    ev = load_table(spark, SF_DIR, "events")
    rows = analytics.funnel_analysis(ev, ["view", "click", "purchase"]).collect()
    assert [r["step_idx"] for r in rows] == [1, 2, 3]
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert rows[0]["conversion"] == 1.0


def test_funnel_requires_strict_order(spark):
    # purchase BEFORE view must not count as a completed funnel
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 10, "purchase"),
        (1, base + dt.timedelta(minutes=1), 11, "view"),
        (2, base, 20, "view"),
        (2, base + dt.timedelta(minutes=1), 21, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {
        r["step_name"]: r["n_users"]
        for r in analytics.funnel_analysis(ev, ["view", "purchase"]).collect()
    }
    assert out == {"view": 2, "purchase": 1}


def test_funnel_tie_on_timestamp_breaks_by_event_id(spark):
    # same-instant events: progression follows event_id order
    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, base, 5, "view"), (1, base, 6, "purchase"),
         (2, base, 8, "purchase"), (2, base, 7, "view")],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    out = {
        r["step_name"]: r["n_users"]
        for r in analytics.funnel_analysis(ev, ["view", "purchase"]).collect()
    }
    # user 1: view(5) then purchase(6) -> completes; user 2: purchase(7? no —
    # view is id 7, purchase id 8) -> completes too
    assert out == {"view": 2, "purchase": 2}


def test_retention_week_zero_covers_every_user(spark):
    ev = load_table(spark, SF_DIR, "events")
    out = analytics.retention_cohorts(ev).collect()
    assert all(r["week_offset"] >= 0 for r in out)
    week0 = sum(r["n_users"] for r in out if r["week_offset"] == 0)
    n_users = ev.select("user_id").distinct().count()
    # every user is active in their own cohort week 0
    assert week0 == n_users


def test_anomaly_zscore_flags_are_symmetric_tail(spark):
    ev = load_table(spark, SF_DIR, "events")
    out = analytics.anomaly_zscore(ev, threshold=1.0)
    flagged = out.count()
    total = ev.count()
    # |z|>=1 should flag a strict minority but not nothing
    assert 0 < flagged < total
    assert out.filter("abs(zscore) < 1.0").count() == 0


def test_scd1_merge_actions_partition_the_keyspace(spark):
    ev = load_table(spark, SF_DIR, "events")
    split = "2024-01-20"
    out = analytics.scd1_merge(ev, split).cache()
    n_out = out.count()
    n_users = ev.select("user_id").distinct().count()
    assert n_out == n_users
    by_action = {
        r["action"]: r["n"]
        for r in out.groupBy("action").count().withColumnRenamed("count", "n").collect()
    }
    from pyspark.sql import functions as F

    pre = ev.filter(F.col("ts") < split).select("user_id").distinct()
    post = ev.filter(F.col("ts") >= split).select("user_id").distinct()
    assert by_action.get("insert", 0) == post.join(pre, "user_id", "anti").count()
    assert by_action.get("carry", 0) == pre.join(post, "user_id", "anti").count()
    assert by_action.get("update", 0) == pre.join(post, "user_id", "semi").count()
    out.unpersist()


def test_scd1_merge_state_is_latest_event(spark):
    ev = load_table(spark, SF_DIR, "events")
    out = analytics.scd1_merge(ev, "2024-01-20")
    from pyspark.sql import functions as F

    latest = (
        ev.groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id", "event_type")).alias("s"))
        .select("user_id", F.col("s.event_type").alias("want"))
    )
    mism = out.join(latest, "user_id").filter("state <> want").count()
    assert mism == 0


def test_rolling_median_first_row_equals_value(spark):
    ev = load_table(spark, SF_DIR, "events")
    out = analytics.rolling_median(ev, 10)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("event_id")
    first = out.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    # a window of one row: median == the value itself
    assert first.filter(F.expr("med_10 <> round(value, 9)")).count() == 0


def test_data_profile_single_scan_and_values(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    prof = analytics.data_profile(li, ["l_quantity", "l_discount"])
    rows = {r["col_name"]: r for r in prof.collect()}
    assert set(rows) == {"l_quantity", "l_discount"}
    n = li.count()
    assert rows["l_quantity"]["n_rows"] == n
    assert rows["l_quantity"]["min_val"] == 1.0
    assert rows["l_quantity"]["n_null"] == 0
    # one-pass contract: exactly one parquet scan in the physical plan
    plan = prof._jdf.queryExecution().executedPlan().toString()
    # AQE repeats the tree under "== Initial Plan =="; count the final only
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1


@pytest.mark.parametrize("threshold", [2.0, 3.0])
def test_anomaly_threshold_monotone(spark, threshold):
    ev = load_table(spark, SF_DIR, "events")
    lo = analytics.anomaly_zscore(ev, threshold).count()
    hi = analytics.anomaly_zscore(ev, threshold + 1.0).count()
    assert hi <= lo


def test_pps_sample_exactly_k_per_stratum_and_includes_giants(spark):
    from pyspark.sql import functions as F

    rows = [("a", i, 1.0 if i != 7 else 1000.0) for i in range(100)] + [
        ("b", i, 1.0) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "seg string, k long, w double")
    out = analytics.pps_systematic_sample(df, "seg", "k", F.col("w"), k=5)
    per = {r["seg"]: r["n"] for r in out.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # uniform stratum: exactly k picks; the giant-weight stratum
    # returns fewer distinct rows (the certainty unit absorbs several
    # step crossings — standard systematic-PPS behavior)
    assert per["b"] == 5
    assert 1 <= per["a"] <= 5
    # a weight holding >1/k of the stratum's mass is ALWAYS picked
    assert out.filter("seg = 'a' and k = 7").count() == 1
    # deterministic: a second run picks the identical set
    again = analytics.pps_systematic_sample(df, "seg", "k", F.col("w"), k=5)
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}


def test_histogram_partitions_all_rows(spark):
    from pyspark.sql import functions as F

    li = load_table(spark, SF_DIR, "lineitem")
    h = analytics.equal_width_histogram(li, F.col("l_quantity"), bins=10)
    rows = h.collect()
    assert sum(r["n"] for r in rows) == li.count()
    assert all(r["bin_hi"] > r["bin_lo"] for r in rows)
    assert [r["bin"] for r in rows] == sorted(r["bin"] for r in rows)


def test_ewma_fold_matches_python(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    vals = [4.0, 2.0, 8.0, 16.0]
    rows = [(1, base + dt.timedelta(seconds=i), i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = analytics.ewma_per_user(df).collect()[0]
    acc = vals[0]
    for v in vals[1:]:
        acc = (v + acc) / 2
    assert out["ewma"] == round(acc, 9) and out["n_events"] == 4


def test_event_transitions_rows_and_probs(spark):
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events")
    out = analytics.event_transitions(ev).cache()
    # each from_type's probabilities sum to ~1
    sums = out.groupBy("from_type").agg(F.sum("p").alias("s")).collect()
    assert all(abs(r["s"] - 1.0) < 1e-6 for r in sums)
    # total transitions = total events - number of users
    n_trans = out.agg(F.sum("n")).first()[0]
    assert n_trans == ev.count() - ev.select("user_id").distinct().count()
    out.unpersist()


def test_cdc_apply_delete_semantics(spark):
    """Last-writer-wins with tombstones: U superseded by a later D
    deletes; D superseded by a later U resurrects; a tombstone for an
    unknown key is a (no-op) delete; untouched base keys carry."""
    from pyspark.sql import functions as F

    from elb_log_to_mysql_spark.operators.analytics import cdc_apply

    rows = [
        # user 1: in base, then updated then DELETED after split
        (1, "2024-01-10 00:00:00", 10, "view", 1.0, "{}"),
        (1, "2024-01-21 00:00:00", 11, "click", 1.0, "{}"),
        (1, "2024-01-22 00:00:00", 12, "error", 1.0, "{}"),
        # user 2: in base, deleted then RE-INSERTED after split
        (2, "2024-01-11 00:00:00", 20, "view", 1.0, "{}"),
        (2, "2024-01-21 00:00:00", 21, "error", 1.0, "{}"),
        (2, "2024-01-23 00:00:00", 22, "signup", 1.0, "{}"),
        # user 3: never in base, only a tombstone arrives
        (3, "2024-01-25 00:00:00", 30, "error", 1.0, "{}"),
        # user 4: base only (carry)
        (4, "2024-01-12 00:00:00", 40, "purchase", 1.0, "{}"),
        # user 5: insert after split
        (5, "2024-01-26 00:00:00", 50, "click", 1.0, "{}"),
    ]
    events = spark.createDataFrame(
        [(e, ts, u, t, v, p) for (u, ts, e, t, v, p) in rows],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["user_id"]: r.asDict() for r in
           cdc_apply(events, "2024-01-20").collect()}
    assert out[1]["action"] == "delete" and not out[1]["in_snapshot"]
    assert out[1]["state"] is None and out[1]["updated_at"] is None
    assert out[2]["action"] == "update" and out[2]["state"] == "signup"
    assert out[2]["in_snapshot"]
    assert out[3]["action"] == "delete" and not out[3]["in_snapshot"]
    assert out[4]["action"] == "carry" and out[4]["state"] == "purchase"
    assert out[5]["action"] == "insert" and out[5]["state"] == "click"
    # the applied snapshot = in_snapshot filter: exactly users 2,4,5
    assert {u for u, r in out.items() if r["in_snapshot"]} == {2, 4, 5}


def test_constraint_check_detects_violations(spark):
    """Each constraint must actually fire on planted bad data."""
    from elb_log_to_mysql_spark.operators.analytics import constraint_check

    orders = spark.createDataFrame(
        [
            (1, 10, "O", 100.0, "1996-01-01"),
            (1, 11, "O", 200.0, "1996-01-02"),      # duplicate key
            (2, None, "O", 300.0, "1996-01-03"),    # null custkey
            (3, 12, "O", -5.0, "1996-01-04"),       # non-positive price
            (4, 13, "O", 400.0, "1985-01-01"),      # out-of-era date
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate AS TIMESTAMP) o_orderdate",
    )
    lineitem = spark.createDataFrame(
        [(1, 1), (99, 1)],  # 99 has no parent order
        "l_orderkey long, l_linenumber long",
    )
    got = {r["check_name"]: r for r in
           constraint_check(orders, lineitem).collect()}
    assert got["orderkey_unique"]["violations"] == 1
    assert got["custkey_complete"]["violations"] == 1
    assert got["totalprice_positive"]["violations"] == 1
    assert got["orderdate_in_era"]["violations"] == 1
    assert got["lineitem_fk_orders"]["violations"] == 1
    assert not any(r["passed"] for r in got.values())
