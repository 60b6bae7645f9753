"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is fully materialized through the noop sink (no driver
collect, no result-size bias) after a small JVM warm-up. Designed to
be comparable run-to-run: fixed query list, fixed session conf.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from elb_log_to_mysql_spark.queries import QUERIES  # noqa: E402
from elb_log_to_mysql_spark.session import build_session  # noqa: E402

HEADLINE = [
    "elb_parse",
    "filter_project",
    "hash_agg",
    "inner_join",
    "broadcast_join",
    "range_join",
    "asof_join",
    "tpch_q3",
    "tpch_q6",
    "tpch_q9",
    "tpch_q10",
    "tpch_q18",
    "tpch_q21",
    "skew_salted_agg",
    "distinct_agg",
    "scalar_subquery",
    "window_analytic",
    "window_range",
    "group_map_profile",
    "topk_per_group",
    "set_ops",
    "exact_dedup",
    "sessionize",
    "text_stats",
    "token_count",
    "tfidf",
    "ngram_jaccard",
    "near_dedup",
    "simhash_pairs",
    "similarity_topk",
    "similarity_topk_lsh",
    "stream_tumbling",
    "multimodal_meta",
    "multimodal_frames",
    "decontaminate",
    "shuffle_index",
    "pii_scrub",
    "sequence_pack",
    "window_distribution",
    "scd2_history",
    "incremental_agg",
    "sketch_rollup",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm up JVM / codegen / parquet footer caches
    materialize(QUERIES["hash_agg"](spark, sf_dir))
    # warm up the Python UDF workers: the first Arrow-UDF stage forks
    # 32 workers that each import pandas/numpy (~10s one-time); pay it
    # here so no measured query carries the startup instead of its
    # own cost. Workers are reused afterwards (spark.python.worker.reuse).
    from pyspark.sql import functions as F
    from elb_log_to_mysql_spark.functions.vectorops import pairwise_cosine

    spark.range(10_000).select(
        pairwise_cosine(
            F.array(F.lit(1.0), F.lit(2.0)), F.array(F.lit(3.0), F.lit(4.0))
        )
    ).write.format("noop").mode("overwrite").save()

    # min of two runs per query: the shared host shows ±2x noise on
    # individual timings; the minimum is the reproducible cost.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(QUERIES[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
