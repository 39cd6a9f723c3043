"""Join operators Spark lacks natively: as-of joins and range/band joins.

The reference supports only inner/left/right equi joins plus cross
joins (reference executor.py:414-471); these are extensions for
time-series and banding workloads, built as compositions of built-in
DataFrame ops so Catalyst keeps optimizing around them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    right_values: list[str],
    tolerance: float | int | None = None,
    tie_breakers: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_time <= left_time`` within the same key group
    (``direction="backward"``, the default), or the nearest upcoming
    right row with ``right_time >= left_time``
    (``direction="forward"`` — pandas ``merge_asof`` direction
    semantics). Forward is the same one-window plan scanning time
    descending; tolerance then bounds the look-AHEAD.

    Implementation is the *union trick*, not a join: tag both inputs,
    union them, and run a single ``last_value(..., ignorenulls)`` window
    partitioned by key and ordered by (time, side, tie_breakers). Cost is
    one shuffle + sort per key partition — O((|L|+|R|) log) — versus the
    naive inequality-join-then-window which materializes every
    (left, right-earlier) pair and explodes quadratically on hot keys.
    That difference is what makes this usable at 100 TB.

    Tie semantics: right rows at exactly ``left_time`` are eligible
    (sorted before left rows); among right rows with equal time the one
    with the greatest ``tie_breakers`` value wins (default: last of
    ``right_values`` order — pass explicit tie_breakers for determinism).

    ``tolerance`` bounds the lookback like pandas ``merge_asof``:
    matches older than it are nulled out. Units: same as the time
    columns for numeric times; SECONDS when they are timestamps.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    tie_breakers = tie_breakers or []

    lcols = [c for c in left.columns]
    clashes = [v for v in right_values if v in lcols]
    if clashes:
        raise ValueError(
            f"right_values {clashes} collide with left column names; "
            "rename one side before the as-of join (pandas merge_asof "
            "suffixes; here a silent duplicate column would make every "
            "downstream reference ambiguous)"
        )
    # NULL-time rows never match and never receive a match (pandas
    # merge_asof rejects NaT keys outright): a NULL right_time row
    # sorts FIRST under the asc window (Spark asc = nulls first) and
    # would otherwise become the "latest" match for every left row
    # preceding the first real right row — silent wrong data.
    right = right.filter(F.col(right_time).isNotNull())
    tagged_left = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__r_{v}") for v in right_values],
        *[F.lit(None).cast(right.schema[b].dataType).alias(f"__tb_{b}") for b in tie_breakers],
    )
    tagged_right = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(v).alias(f"__r_{v}") for v in right_values],
        *[F.col(b).alias(f"__tb_{b}") for b in tie_breakers],
    ).select(*[f"{c}" for c in tagged_left.columns])  # align column order

    unioned = tagged_left.unionByName(tagged_right)
    # Forward scans time descending; either way right rows at exactly
    # left_time sort before the left row (eligible), and among
    # equal-time right rows the greatest tie_breakers value wins.
    time_order = F.col("__t").desc() if direction == "forward" else F.col("__t").asc()
    order = [time_order, F.col("__side").asc()] + [
        F.col(f"__tb_{b}").asc_nulls_first() for b in tie_breakers
    ]
    w = W.partitionBy(*keys).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    # Carry the entire matched right row as ONE struct. A per-column
    # last(value, ignorenulls) would backfill a genuine NULL in the
    # matched right row from an older right row — diverging from pandas
    # merge_asof / DuckDB ASOF. The struct is non-null exactly for
    # right-side rows, so last(..., ignorenulls) selects the latest
    # right ROW wholesale; values (and the match time used for the
    # tolerance check) all project out of that single row.
    matched = F.last(
        F.when(
            F.col("__side") == 0,
            F.struct(
                F.col("__t").alias("__rt"),
                *[F.col(f"__r_{v}").alias(v) for v in right_values],
            ),
        ),
        ignorenulls=True,
    ).over(w)
    filled = unioned.select(*lcols, F.col("__side"), F.col("__t"), matched.alias("__m"))
    out = filled.filter(F.col("__side") == 1)
    stale = None
    if tolerance is not None:
        is_ts = isinstance(left.schema[left_time].dataType, T.TimestampType)
        mt = F.col("__m").getField("__rt")
        age = (
            (F.unix_micros(F.col("__t")) - F.unix_micros(mt)) / 1_000_000.0
            if is_ts
            else F.col("__t") - mt
        )
        if direction == "forward":  # match is ahead of the left row
            age = -age
        stale = mt.isNull() | (age > tolerance)

    def _val(v: str) -> Column:
        base = F.col("__m").getField(v)
        if stale is not None:
            base = F.when(stale, F.lit(None)).otherwise(base)
        # a NULL left_time row matches nothing (it sorts outside the
        # time order entirely — under forward's desc it would otherwise
        # inherit the final right row as a spurious "match")
        return F.when(F.col("__t").isNull(), F.lit(None)).otherwise(base).alias(v)

    return out.select(*lcols, *[_val(v) for v in right_values])


def range_join(
    fact: DataFrame,
    bands: DataFrame,
    value: str | Column,
    lo: str = "lo",
    hi: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Band/interval join: attach the band row where ``lo <= value < hi``.

    ``bands`` is expected to be small (a dimension of intervals) and is
    broadcast, so the plan is a BroadcastNestedLoopJoin with a range
    predicate — no shuffle of the fact side at any scale. For large
    interval tables, pre-bucketize both sides instead (see docs in
    SURVEY.md §2.4: the reference has no range join at all).
    """
    v = F.col(value) if isinstance(value, str) else value
    cond = (v >= bands[lo]) & (v < bands[hi])
    return fact.join(F.broadcast(bands), cond, how)
