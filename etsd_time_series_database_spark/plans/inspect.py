"""Physical-plan inspection and linting.

The reference's observability is a bitmask error log (errorlog.h); the
Spark engine's equivalent concern is *plan quality*: did the filter
push down, did the dim broadcast, did a Python UDF sneak into the hot
path. ``summarize`` extracts those facts from the executed plan string;
``lint`` turns them into actionable warnings. Used by
tests/test_plan_shape.py and available to users for their own queries.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanSummary:
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    joins: list[str] = field(default_factory=list)
    exchanges: int = 0
    broadcast_exchanges: int = 0
    python_evals: int = 0
    codegen_stages: int = 0
    scans: int = 0
    post_scan_filters: int = 0


def summarize(df: DataFrame, execute: bool = False) -> PlanSummary:
    """Extract plan-quality facts. With ``execute=True`` the DataFrame
    is collected first so AQE's final plan (join demotions, coalesced
    partitions) is summarized rather than the initial guess."""
    if execute:
        df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "== Final Plan ==" in plan:
        plan = plan.split("== Final Plan ==")[1].split("== Initial Plan ==")[0]
    s = PlanSummary()
    s.pushed_filters = [
        m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m.strip()
    ]
    s.read_schemas = re.findall(r"ReadSchema: (struct<[^>]*>)", plan)
    s.partition_filters = [
        m for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan) if m.strip()
    ]
    s.joins = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )
    s.exchanges = len(re.findall(r"Exchange (hash|range)partitioning", plan))
    s.broadcast_exchanges = plan.count("BroadcastExchange")
    s.python_evals = len(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas)", plan))
    s.codegen_stages = len(set(re.findall(r"\*\((\d+)\)", plan)))
    s.scans = plan.count("FileScan")
    s.post_scan_filters = len(re.findall(r"\bFilter \(?", plan))
    return s


def lint(df: DataFrame, execute: bool = False) -> list[str]:
    """Plan-quality warnings for a DataFrame. Empty list == clean."""
    s = summarize(df, execute=execute)
    warnings = []
    if "CartesianProduct" in s.joins:
        warnings.append("CartesianProduct join: O(n*m), will not scale")
    if "BroadcastNestedLoopJoin" in s.joins:
        warnings.append("BroadcastNestedLoopJoin: non-equi join, row-at-a-time probe")
    if (
        s.scans
        and s.post_scan_filters
        and not s.pushed_filters
        and not s.partition_filters
    ):
        warnings.append(
            "plan filters after the scan but nothing reached the reader "
            "(PushedFilters empty): predicate not pushed — check for "
            "function-wrapped filter columns"
        )
    for rs in s.read_schemas:
        if rs.count(",") >= 7:
            warnings.append(
                f"wide ReadSchema ({rs.count(',') + 1} columns): check projection pruning"
            )
    if s.python_evals:
        warnings.append(
            f"{s.python_evals} Python eval node(s) in plan: ensure Arrow-batched "
            "and genuinely necessary"
        )
    return warnings
