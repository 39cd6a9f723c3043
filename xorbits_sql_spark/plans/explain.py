"""Helpers to introspect physical plans for scale-quality checks."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The `.explain("formatted")` text of the DataFrame's physical plan."""
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries found in the plan's scan nodes.

    The block is captured to the LAST ``]`` on the line: a filter that
    itself contains brackets (``In(id, [1,2,3])``) would otherwise be
    cut at its first ``]``, truncating the entry and dropping every
    filter listed after it."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[(.*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema projections of each scan (column-pruning visibility)."""
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: (\S+)", plan)


def uses_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters entries of each scan (partition-pruning visibility)."""
    plan = formatted_plan(df)
    return re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes in the physical plan.

    Formatted explain output puts the node name (``(4) Exchange``) and
    its ``Arguments: hashpartitioning(...)`` on SEPARATE lines, so the
    old single-line ``Exchange hashpartitioning`` regex matched nothing
    and every ==0 gate passed vacuously. Count node-header lines
    instead; BroadcastExchange is excluded (broadcast is not a
    shuffle)."""
    plan = formatted_plan(df)
    return len(
        re.findall(r"^\s*\(\d+\)\s+Exchange\b", plan, flags=re.MULTILINE)
    )
