"""Physical-plan inspection utilities.

The engine's performance contract is expressed as properties of the
executed plan, not vibes: filters and projections reach the parquet
scan, dimension joins broadcast, aggregates have a partial (map-side)
phase, Python appears nowhere unexpected. These helpers extract those
properties so tests (and humans) can assert them.

Parsing uses the *formatted* explain output: the default tree string
truncates long scan metadata at 100 chars (cutting PushedFilters
mid-list), and under AQE it appends an "Initial Plan" section that
double-counts every node. Here the final-plan subtree is isolated
first and node details are joined by id.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Raw executed-plan tree (truncated fields; debugging only)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """Full `explain("formatted")` text as a string."""
    jqe = df._jdf.queryExecution()
    return df.sparkSession._jvm.PythonSQLUtils.explainString(jqe, "formatted")


def _final_nodes(plan: str) -> tuple[list[str], dict[str, str]]:
    """(final-plan node names in tree order, node id -> detail block).

    Under AQE the tree section lists the final plan first and the
    initial plan after a `== Initial Plan ==` marker; only ids from
    the final subtree are kept.
    """
    tree, _, details = plan.partition("\n\n(")
    details = "(" + details if details else ""
    tree = tree.split("== Initial Plan ==")[0]
    final_ids = re.findall(r"\((\d+)\)", tree)
    blocks: dict[str, str] = {}
    names_by_id: dict[str, str] = {}
    for blk in re.split(r"\n\s*\n", details):
        m = re.match(r"\((\d+)\)\s+(\w+)", blk)
        if m and m.group(1) in set(final_ids):
            blocks[m.group(1)] = blk
            names_by_id[m.group(1)] = m.group(2)
    # tree order, names from the (untruncated) detail headers
    names = [names_by_id[i] for i in final_ids if i in names_by_id]
    return names, blocks


def plan_report(df: DataFrame) -> dict:
    """Summarize scale-relevant properties of the (final) executed plan."""
    plan = formatted_plan(df)
    names, blocks = _final_nodes(plan)
    detail_text = "\n".join(blocks.values())
    return {
        "nodes": names,
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", detail_text),
        "read_schemas": re.findall(r"ReadSchema: (\S+)", detail_text),
        "broadcast_joins": sum(
            n in ("BroadcastHashJoin", "BroadcastNestedLoopJoin") for n in names
        ),
        "sortmerge_joins": names.count("SortMergeJoin"),
        "shuffled_hash_joins": names.count("ShuffledHashJoin"),
        "exchanges": names.count("Exchange"),
        "partial_aggs": len(
            re.findall(r"Functions \[\d+\]: \[partial_", detail_text)
        ),
        "wholestage_codegen": len(set(re.findall(r"codegen id : (\d+)", detail_text))),
        # every physical form Python work can take: scalar/grouped UDF
        # eval nodes carry "Python" in the name; the Arrow stage
        # operators (mapInPandas/mapInArrow/applyInPandas[WithState])
        # carry "Pandas"/"Arrow" instead
        "python_evals": sum(
            ("Python" in n) or ("InPandas" in n) or ("InArrow" in n)
            for n in names
        ),
        "aqe": "AdaptiveSparkPlan" in plan,
    }
