"""Physical-plan inspection utilities.

The engine's performance contract is expressed as properties of the
executed plan, not vibes: filters and projections reach the parquet
scan, dimension joins broadcast, aggregates have a partial (map-side)
phase, Python appears nowhere unexpected. These helpers extract those
properties so tests (and humans) can assert them.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def plan_report(df: DataFrame) -> dict:
    """Summarize scale-relevant plan properties."""
    plan = executed_plan(df)
    return {
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        "read_schemas": re.findall(r"ReadSchema: (\S+)", plan),
        "broadcast_joins": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "exchanges": plan.count("Exchange "),
        "partial_aggs": len(re.findall(r"HashAggregate.*partial", plan)),
        "wholestage_codegen": plan.count("WholeStageCodegen") + plan.count("*("),
        "python_evals": plan.count("BatchEvalPython") + plan.count("ArrowEvalPython"),
        "aqe": "AdaptiveSparkPlan" in plan,
    }
