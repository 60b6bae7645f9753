"""Driver contract for the spark-graft builder (PySpark target).

entry()   — flagship query (shipping-priority revenue top-k: the
            join+agg+topk spine of the engine) on sf0.001.
queries() — every implemented operator from SURVEY.md §2, bound to
            the test tables (elb_log_to_mysql_spark/queries.py).
oracle_sql() — a DuckDB twin for EVERY entry (zero rows-only since
            round 4): exact operators hash-match bit-for-bit; the
            approximate/stream/UDF families carry value-checked
            CONTRACT oracles (recall floors with exact counts
            recomputed by DuckDB, error bounds, replayed arithmetic).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elb_log_to_mysql_spark.functions.numeric import dsum
from elb_log_to_mysql_spark.queries import ORACLE_SQL, QUERIES
from elb_log_to_mysql_spark.session import tune_session
from elb_log_to_mysql_spark.sources.tables import load_table

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: revenue top-10 of BUILDING-segment orders with open
    lineitems (TPC-H Q3 shape) — broadcast dim filter, fact join,
    decimal-exact agg, deterministic top-k."""
    tune_session(spark)
    customer = load_table(spark, SF0001, "customer")
    orders = load_table(spark, SF0001, "orders")
    lineitem = load_table(spark, SF0001, "lineitem")

    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
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


# Driver-budget scheduling: each round's driver run verifies ~50
# registry entries in the order queries() yields them, so entries are
# ranked by how much information a fresh driver row adds:
#   1. percentile_approx — the only entry whose sole driver row (r1)
#      predates its error-bound oracle (it was `no_oracle` then);
#   2. never driver-checked at all (new entries this round;
#      oracle-backed before rows-only);
#   3. stale: last driver evidence is r1/r3 — the testdata has been
#      regenerated since, so those rows predate the current layout
#      (TPC-H q2/q8/q9/..., elb_parse, dedup family, pipeline ops);
#   4. round-4-verified (freshest evidence, re-checked last).
_R1_CHECKED = [
    "filter_project", "inner_join", "left_join", "semi_join", "anti_join",
    "broadcast_join", "range_join", "hash_agg", "tpch_q1", "distinct_agg",
    "approx_distinct", "rollup_agg", "cube_agg", "window_rank",
    "window_analytic", "scalar_subquery", "window_range",
    "group_map_profile", "topk", "topk_per_group", "set_ops",
    "scalar_funcs", "tpch_q3", "tpch_q5", "tpch_q4", "tpch_q6", "tpch_q10",
    "tpch_q13", "tpch_q18", "tpch_q19", "full_outer_join", "cross_join",
    "array_funcs", "tpch_q7", "tpch_q17", "asof_join", "skew_salted_agg",
    "pivot_agg", "stats_agg", "json_funcs", "date_funcs", "string_funcs",
    "percentile_agg", "percentile_approx", "grouping_sets",
    "collect_sorted", "map_funcs", "unpivot", "text_chunking",
    "deterministic_sample",
]

_R3_FAILED = [
    "sessionize", "stream_tumbling", "stream_sliding", "stream_stateful",
    "stream_stream_join",
]

_R3_CHECKED = [
    "group_map_profile_pandas", "exact_dedup", "dedup_docs_exact",
    "ngram_jaccard", "similarity_topk", "embedding_near_dup",
    "embedding_near_dup_lsh", "embedding_stats", "text_stats",
    "token_count", "lang_id", "doc_fingerprint", "tfidf",
    "repetition_filter", "corpus_ngrams", "session_window", "stream_dedup",
    "udtf_sentences", "udaf_gini", "resample_gapfill", "multimodal_meta",
    "multimodal_frames", "elb_parse", "tpch_q2", "tpch_q8", "tpch_q9",
    "tpch_q11", "tpch_q12", "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q20",
    "tpch_q21", "tpch_q22", "pii_scrub", "decontaminate",
    "decontaminate_bloom", "shuffle_index", "stratified_sample",
    "sequence_pack", "dedup_clusters", "window_distribution",
    "scd2_history", "incremental_agg", "dedup_survivors",
]


_R4_CHECKED = [
    "ngram_jaccard_prefix", "near_dedup", "simhash_pairs",
    "similarity_topk_lsh", "similarity_topk_ivf", "quality_filter",
    "multimodal_decode", "multimodal_features", "multimodal_resize",
    "sketch_rollup", "bucketed_join", "sessionize", "stream_tumbling",
    "stream_sliding", "stream_stateful", "stream_stream_join",
    "filter_project", "inner_join", "left_join", "semi_join", "anti_join",
    "broadcast_join", "range_join", "hash_agg", "tpch_q1", "distinct_agg",
    "approx_distinct", "rollup_agg", "cube_agg", "window_rank",
    "window_analytic", "scalar_subquery", "window_range",
    "group_map_profile", "topk", "topk_per_group", "set_ops",
    "scalar_funcs", "tpch_q3", "tpch_q5", "tpch_q4", "tpch_q6", "tpch_q10",
    "tpch_q13", "tpch_q18", "tpch_q19", "full_outer_join", "cross_join",
    "array_funcs", "tpch_q7",
]

# percentile_approx has never had a driver row that exercised its
# error-bound oracle (added r2; its only driver check was r1, pre-oracle).
_NEVER_ORACLE_GREEN = ["percentile_approx"]

# ROUND-6 NOTE: the round-5 driver verifies entries in the order this
# module yields them, so _R5_CHECKED = the keys of CORRECTNESS_r05.json
# (equivalently the first N of round-5's _driver_order, N = the
# driver's budget). Round 5 pre-flighted the first 50 locally
# (tools/compare_oracle.py --driver-order 50): all green. When
# refreshing for round 6, fold those into a checked tier and put the
# 40-odd entries WITHOUT any driver row first (mostly round-5
# additions past the budget cutoff).


def _driver_order(names) -> list[str]:
    checked = set(_R1_CHECKED) | set(_R3_CHECKED) | set(_R3_FAILED)
    r4 = set(_R4_CHECKED)
    first = [n for n in _NEVER_ORACLE_GREEN if n in names]
    taken = set(first)
    never = [n for n in names if n not in checked and n not in r4
             and n not in taken]
    never_oracle = [n for n in never if n in ORACLE_SQL]
    never_rows = [n for n in never if n not in ORACLE_SQL]
    stale = [n for n in names
             if n in checked and n not in r4 and n not in taken]
    r4_fresh = [n for n in names if n in r4 and n not in taken]
    return first + never_oracle + never_rows + stale + r4_fresh


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _driver_order(QUERIES)}


def oracle_sql() -> dict[str, str]:
    return {n: ORACLE_SQL[n] for n in _driver_order(QUERIES) if n in ORACLE_SQL}
