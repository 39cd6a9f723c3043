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
    """All PushedFilters entries found in the plan's scan nodes."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


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
    """Number of shuffle Exchange nodes in the physical plan."""
    return len(re.findall(r"\bExchange hashpartitioning", formatted_plan(df)))
