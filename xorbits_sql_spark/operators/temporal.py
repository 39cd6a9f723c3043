"""Temporal/change-data-capture operators.

Slowly-changing-dimension (SCD2) history building from an append-only
change log — the standard warehouse pattern for "what was this entity's
state at time T". The reference has no temporal surface at all
(SURVEY.md §2.9); these are extensions in the same family as the as-of
join (operators/joins.py).

Scale shape: both steps are windows partitioned by the entity key —
one hash shuffle on the key, then every derived column (change flags,
validity bounds) is computed inside the per-key sorted partition. The
second window reuses the first's partitioning (same key), so Catalyst
plans a single Exchange. No collect, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def changes_only(
    df: DataFrame,
    key_cols: list[str],
    attr_col: str,
    ts_col: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse an append-only log to rows where ``attr_col`` changed.

    CDC-style change detection: within each key (ordered by ``ts_col``
    then ``tiebreak``), keep the first row and every row whose attribute
    differs from the previous row's. NULL-safe via eqNullSafe, so
    NULL->value and value->NULL transitions are kept too.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = W.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(attr_col).over(w)
    prev_seen = F.lag(F.lit(1)).over(w)  # distinguishes first row from NULL attr
    return (
        df.withColumn("__prev", prev)
        .withColumn("__first", prev_seen.isNull())
        .filter(F.col("__first") | ~F.col("__prev").eqNullSafe(F.col(attr_col)))
        .drop("__prev", "__first")
    )


def scd2_ranges(
    df: DataFrame,
    key_cols: list[str],
    attr_col: str,
    ts_col: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Build SCD2 validity ranges from an append-only change log.

    Returns the change rows with ``valid_from`` (the row's timestamp),
    ``valid_to`` (the next change's timestamp within the key, NULL while
    current) and ``is_current``. Half-open intervals
    [valid_from, valid_to) — the standard warehouse contract, so a
    point-in-time lookup is ``valid_from <= T AND (valid_to IS NULL OR
    T < valid_to)``.
    """
    changes = changes_only(df, key_cols, attr_col, ts_col, tiebreak)
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = W.partitionBy(*key_cols).orderBy(*order)
    nxt = F.lead(ts_col).over(w)
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", F.col("valid_to").isNull())
    )
