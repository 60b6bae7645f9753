"""Runnable front door for the table-maintenance planners.

`examples/corpus_build.py` drives the curation pipeline; this is the
table-services twin: point it at parquet tables and it emits the two
plans a lakehouse maintenance job schedules from —

1. a compaction plan (scan-order bin-packing of each table
   partition's objects into ~target-size rewrite bins,
   operators/maintenance.py:compaction_plan), and
2. a data-skipping effectiveness report for a date-range predicate
   against the block min/max statistics a clustered layout would
   persist (operators/maintenance.py:stats_prune_report).

Both plans are DataFrames — inspectable, joinable, writable — which
is how production table services hand work to their rewrite
executors.

Usage:
    python examples/table_maintenance.py \
        --docs   /root/testdata/sf0.01/documents.parquet \
        --orders /root/testdata/sf0.01/orders.parquet \
        --target-bytes 2048 --lo 1996-01-01 --hi 1996-07-01 \
        --output /tmp/maintenance_plans
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from elb_log_to_mysql_spark.operators import maintenance  # noqa: E402
from elb_log_to_mysql_spark.session import build_session  # noqa: E402
from elb_log_to_mysql_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--orders", required=True)
    ap.add_argument("--target-bytes", type=int, default=2048)
    ap.add_argument("--lo", default="1996-01-01")
    ap.add_argument("--hi", default="1996-07-01")
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    spark = build_session(app_name="table-maintenance")
    spark.sparkContext.setLogLevel("ERROR")

    def _load(path):
        # the shared loader handles nanosecond-timestamp parquet
        sf_dir, name = os.path.dirname(path), os.path.basename(path)
        return load_table(spark, sf_dir, name.removesuffix(".parquet"))

    docs = _load(args.docs)
    orders = _load(args.orders)

    plan = maintenance.compaction_plan(docs, target_bytes=args.target_bytes)
    plan.write.mode("overwrite").parquet(
        os.path.join(args.output, "compaction_plan.parquet")
    )
    plan_stats = plan.agg(
        F.count(F.lit(1)).alias("bins"),
        F.sum("n_objects").alias("objects"),
        F.sum("bin_bytes").alias("bytes"),
    ).collect()[0]

    report = maintenance.stats_prune_report(
        orders, "o_orderdate", "o_orderkey", lo=args.lo, hi=args.hi
    ).collect()[0]

    summary = {
        "compaction": {
            "bins": plan_stats["bins"],
            "objects": plan_stats["objects"],
            "bytes": plan_stats["bytes"],
            "target_bytes": args.target_bytes,
        },
        "stats_pruning": {
            "n_blocks": report["n_blocks"],
            "n_blocks_kept": report["n_blocks_kept"],
            "rows_total": report["rows_total"],
            "rows_scanned": report["rows_scanned"],
            "rows_matched": report["rows_matched"],
            "scan_saved_fraction": round(
                1 - report["rows_scanned"] / report["rows_total"], 4
            ),
        },
    }
    print(json.dumps(summary, indent=2))
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
