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
# ranked by how much information a fresh driver row adds. Since round
# 6 the tiers are DERIVED from the recorded driver artifacts instead
# of hand-maintained lists: CORRECTNESS_r0N.json (N = 1..current, in
# this directory) gives every entry's most recent driver row, and the
# order is
#   1. entries whose LATEST driver record failed (re-verify first);
#   2. entries with no driver row at all (new this round) —
#      oracle-backed before rows-only;
#   3. everything else, stalest round first (ties: registry order).
# Each future round automatically folds the previous round's
# CORRECTNESS file into the history — no per-round list edits.

import json as _json
from functools import lru_cache as _lru_cache
import re
from pathlib import Path as _Path


@_lru_cache(maxsize=1)
def _driver_history() -> tuple[dict[str, int], frozenset[str]]:
    """(last driver-checked round per entry, entries whose latest
    record was a failure). Missing/corrupt artifacts degrade to
    'never checked', which only makes the schedule more cautious.
    Cached: the artifact set is fixed for the process lifetime and
    both queries() and oracle_sql() consult it. 'Latest record'
    is keyed on the parsed round NUMBER, not filename sort order —
    lexicographic order diverges from round order at r10+."""
    last_round: dict[str, int] = {}
    last_ok: dict[str, bool] = {}
    here = _Path(__file__).resolve().parent
    for f in here.glob("CORRECTNESS_r[0-9]*.json"):
        m = re.search(r"_r(\d+)\.json$", f.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            records = _json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(records, dict):
            continue
        for name, rec in records.items():
            if not isinstance(rec, dict):
                continue
            ok = bool(rec.get("hash_match")) or (
                rec.get("err") == "no_oracle" and (rec.get("spark_rows") or 0) > 0
            )
            if rnd >= last_round.get(name, 0):
                last_ok[name] = ok
            last_round[name] = max(rnd, last_round.get(name, 0))
    failed = frozenset(n for n, ok in last_ok.items() if not ok)
    return last_round, failed


def _driver_order(names) -> list[str]:
    last_round, failed = _driver_history()
    names = list(names)
    pos = {n: i for i, n in enumerate(names)}
    refail = [n for n in names if n in failed]
    taken = set(refail)
    never = [n for n in names if n not in last_round and n not in taken]
    never_oracle = [n for n in never if n in ORACLE_SQL]
    never_rows = [n for n in never if n not in ORACLE_SQL]
    taken |= set(never)
    rest = sorted(
        (n for n in names if n not in taken),
        key=lambda n: (last_round[n], pos[n]),
    )
    return refail + never_oracle + never_rows + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _driver_order(QUERIES)}


def oracle_sql() -> dict[str, str]:
    return {n: ORACLE_SQL[n] for n in _driver_order(QUERIES) if n in ORACLE_SQL}
