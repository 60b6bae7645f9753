"""Table-maintenance planners: compaction bin-packing and block-stats
pruning (operators/maintenance.py).

Invariants pinned here are the ones the DuckDB oracle can't state
directly: packing never splits an object, bins are contiguous key
ranges, the two-pass clustered position equals a global ORDER BY's,
and the prune report's inequalities hold structurally.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from elb_log_to_mysql_spark.operators import maintenance


def _objects(spark, rows):
    return spark.createDataFrame(rows, "source string, doc_id long, n_chars long")


def test_compaction_bins_conserve_and_contiguous(spark):
    rows = [("a", i, 100 + (i % 3) * 50) for i in range(20)] + [
        ("b", i, 400) for i in range(5)
    ]
    df = _objects(spark, rows)
    plan = maintenance.compaction_plan(
        df, part_col="source", order_col="doc_id", size_col="n_chars",
        target_bytes=500,
    )
    got = {(r["source"], r["bin"]): r for r in plan.collect()}
    # conservation: every byte and object lands in exactly one bin
    assert sum(r["n_objects"] for r in got.values()) == len(rows)
    assert sum(r["bin_bytes"] for r in got.values()) == sum(r[2] for r in rows)
    # contiguity: within a source, bins tile the key range in order
    for src in ("a", "b"):
        bins = sorted(
            (r for (s, _), r in got.items() if s == src), key=lambda r: r["bin"]
        )
        for prev, nxt in zip(bins, bins[1:]):
            assert prev["last_key"] < nxt["first_key"]
    # scan-order packing: a bin starts strictly below the target
    # boundary (the straddling object may overflow it, never split)
    for (src, b), r in got.items():
        if b > 0:
            prior = sum(
                rr["bin_bytes"] for (s2, b2), rr in got.items()
                if s2 == src and b2 < b
            )
            assert prior >= b * 500 - max(x[2] for x in rows)


def test_compaction_never_splits_an_object(spark):
    # one object larger than the target must still be exactly one row
    # of exactly one bin
    df = _objects(spark, [("a", 1, 5000), ("a", 2, 10)])
    plan = maintenance.compaction_plan(df, target_bytes=500).collect()
    by_bin = {r["bin"]: r for r in plan}
    assert by_bin[0]["n_objects"] == 1 and by_bin[0]["bin_bytes"] == 5000
    # the next object starts a new bin (cum_before 5000 -> bin 10)
    assert sum(r["n_objects"] for r in plan) == 2


def test_clustered_position_equals_global_sort(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pos = maintenance._clustered_position(
        orders, F.year("o_orderdate").cast("long"), ["o_orderdate", "o_orderkey"]
    ).select("o_orderkey", "_pos")
    truth = orders.select(
        "o_orderkey",
        (
            F.row_number().over(
                Window.partitionBy(F.lit(0)).orderBy("o_orderdate", "o_orderkey")
            )
            - 1
        ).cast("long").alias("_tpos"),
    )
    diff = pos.join(truth, "o_orderkey").filter(F.col("_pos") != F.col("_tpos"))
    assert diff.count() == 0


def test_stats_prune_report_invariants(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    row = maintenance.stats_prune_report(
        orders, "o_orderdate", "o_orderkey",
        lo="1996-01-01", hi="1996-07-01", block_rows=128,
    ).collect()[0]
    assert row["rows_matched"] <= row["rows_scanned"] <= row["rows_total"]
    assert row["n_blocks_kept"] <= row["n_blocks"]
    # the layout is date-clustered, so a 6-month slice of a ~6.5-year
    # span must actually skip blocks — pruning effectiveness is the
    # point of the operator
    assert row["n_blocks_kept"] < row["n_blocks"]
    # completeness: every matching row lives in a kept block
    direct = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    ).count()
    assert row["rows_matched"] == direct


def test_file_compaction_plan_on_real_layout(spark, sf_dir, tmp_path):
    """Plan over a real hive-partitioned multi-file layout: byte
    conservation against the actual on-disk sizes, per-partition
    plans, and a small-file layout that genuinely wants compaction."""
    import os

    from elb_log_to_mysql_spark.sources.tables import load_table

    out = str(tmp_path / "events_hive")
    events = load_table(spark, sf_dir, "events")
    (
        events.withColumn("event_date", F.to_date("ts"))
        .repartition(4)
        .write.partitionBy("event_date")
        .mode("overwrite")
        .parquet(out)
    )
    from elb_log_to_mysql_spark.operators import maintenance

    plan = maintenance.file_compaction_plan(
        spark, out, target_bytes=1 << 20
    ).collect()
    # ground truth from the filesystem
    truth_bytes, truth_files = 0, 0
    for root, _dirs, files in os.walk(out):
        for f in files:
            if f.endswith(".parquet"):
                truth_bytes += os.path.getsize(os.path.join(root, f))
                truth_files += 1
    assert sum(r["bin_bytes"] for r in plan) == truth_bytes
    assert sum(r["n_objects"] for r in plan) == truth_files
    # every partition with multiple small files plans them into ONE
    # target-size bin (4 files/partition, each far below 1 MiB)
    parts = {r["partition"] for r in plan}
    assert all("event_date=" in p for p in parts)
    per_part: dict = {}
    for r in plan:
        per_part.setdefault(r["partition"], []).append(r)
    assert all(len(bins) == 1 for bins in per_part.values())
    assert all(bins[0]["n_objects"] >= 2 for bins in per_part.values())


def test_stats_prune_keeps_null_cluster_rows(spark):
    """NULL cluster values must stay IN the index (sentinel bucket),
    not silently vanish through the bucket equi-join: rows_total
    counts every row, and a NULL-stats block is never 'kept' for a
    range predicate (NULL min/max fail the interval test)."""
    rows = [(i, f"2000-01-{(i % 27) + 1:02d}") for i in range(40)] + [
        (100 + i, None) for i in range(5)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate string"
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    rep = maintenance.stats_prune_report(
        df, "o_orderdate", "o_orderkey",
        lo="2000-01-01", hi="2000-01-10", block_rows=16,
    ).collect()[0]
    assert rep["rows_total"] == 45
    assert rep["rows_matched"] == sum(
        1 for _i, d in rows if d is not None and d < "2000-01-10"
    )
    assert rep["rows_matched"] <= rep["rows_scanned"] <= rep["rows_total"]
