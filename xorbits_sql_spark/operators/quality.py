"""Data-quality audit operators: declarative checks over any DataFrame.

The pattern every production pipeline runs before publishing a table:
a set of named checks, each defined as a *violations frame* (rows that
break the rule — empty means pass), rolled up into one small report
row per check. Because a check is just a DataFrame, every Spark
optimization applies: anti-joins for referential integrity, map-side
aggregation for counts, predicate pushdown into the scan. Nothing is
collected; the report itself is |checks| rows.

Helpers build the common violation frames:

* :func:`duplicate_keys` — primary-key uniqueness (one row per dup key)
* :func:`orphans` — foreign-key integrity via broadcast-able anti-join
* :func:`null_rows` / :func:`failing` — null and predicate checks
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Violation frame: one row per key value that appears more than once."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def orphans(child: DataFrame, parent: DataFrame, child_key: str, parent_key: str) -> DataFrame:
    """Violation frame: child rows whose key is missing from the parent.

    A left-anti join — broadcast when the parent's key projection fits,
    shuffle otherwise; either way no pair explosion.
    """
    return child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(), child_key, "left_anti"
    )


def null_rows(df: DataFrame, col: str) -> DataFrame:
    """Violation frame: rows with a NULL in ``col``."""
    return df.filter(F.col(col).isNull())


def failing(df: DataFrame, ok: Column) -> DataFrame:
    """Violation frame: rows where the OK-predicate does not hold.

    NULL predicate results count as violations (ANSI: NOT NULL is NULL,
    so the filter uses a null-safe negation).
    """
    return df.filter(~F.coalesce(ok, F.lit(False)))


def dq_report(checks: dict[str, DataFrame]) -> DataFrame:
    """Roll named violation frames into (check_name, n_violations, passed).

    Each check is one independent aggregation (Spark runs them as
    separate stages of one job after the union); the report is tiny and
    deterministic, ordered by check name.
    """
    parts = [
        df.agg(F.count(F.lit(1)).cast("bigint").alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )
        for name, df in checks.items()
    ]
    out = reduce(DataFrame.unionAll, parts)
    return out.withColumn("passed", (F.col("n_violations") == 0).cast("int")).orderBy(
        "check_name"
    )
