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


def sessionize(
    df: DataFrame,
    gap_us: int = 1_800_000_000,
    user_col: str = "user_id",
    time_col: str = "ts",
    tiebreak: str = "event_id",
    flag_col: str = "new_session",
    id_col: str | None = None,
) -> DataFrame:
    """Append a lag-gap new-session flag (and optionally a running-sum
    session id) to an event stream.

    The canonical sessionization rule: a row opens a new session when
    the microsecond gap to the user's previous event exceeds ``gap_us``
    (default 30 min) or there is no previous event. ``tiebreak`` makes
    the per-user order total so the flags (and therefore session ids)
    are byte-identical across engines and shuffle orders. SQL mirror::

        CASE WHEN ts - LAG(ts) OVER w > INTERVAL .. OR LAG(ts) OVER w
             IS NULL THEN 1 ELSE 0 END  -- w = (PARTITION BY user
                                        --      ORDER BY ts, tiebreak)

    Previously respelled in q51/s22/t72 (round-7 review); one window
    shuffle on the user key, and the optional session-id running sum
    reuses the same window, so Catalyst plans a single Exchange.
    """
    w = W.partitionBy(user_col).orderBy(time_col, tiebreak)
    gap = F.unix_micros(F.col(time_col)) - F.unix_micros(
        F.lag(time_col).over(w)
    )
    out = df.withColumn(
        flag_col, F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    )
    if id_col is not None:
        out = out.withColumn(
            id_col,
            F.sum(flag_col).over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
    return out


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


def gapfill_locf(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    bucket: str = "day",
) -> DataFrame:
    """Time-bucket gap-filling with last-observation-carried-forward.

    TimescaleDB's ``time_bucket_gapfill + locf`` re-expressed as plain
    relational ops: aggregate per (key, bucket), build the dense
    key x bucket spine (global [min, max] bounds come from one tiny
    aggregate broadcast; each distinct key explodes the shared bucket
    sequence), left-join the sparse data onto the spine, and fill value
    gaps with ``last(value, ignorenulls=True)`` over the per-key
    bucket order. Returns (keys..., bucket_ts, n_events, total,
    total_locf, was_gap).

    Scale shape: the spine explode is |keys| * |buckets| rows — dense by
    design (that's the semantic) but generated distributed, never on the
    driver; the join and the locf window both shuffle on the key, and
    Catalyst collapses them into one Exchange. Leading gaps (before a
    key's first observation) fill with 0.0 so the output carries no
    NULL doubles.
    """
    b = F.date_trunc(bucket, F.col(ts_col))
    daily = df.groupBy(*key_cols, b.alias("__b")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double").alias("total"),
    )
    bounds = df.agg(
        F.date_trunc(bucket, F.min(ts_col)).alias("__lo"),
        F.date_trunc(bucket, F.max(ts_col)).alias("__hi"),
    )
    keys = df.select(*key_cols).distinct()
    spine = (
        keys.crossJoin(F.broadcast(bounds))
        .select(
            *key_cols,
            F.explode(F.expr(f"sequence(__lo, __hi, interval 1 {bucket})")).alias("__b"),
        )
    )
    joined = spine.join(daily, [*key_cols, "__b"], "left")
    w = (
        W.partitionBy(*key_cols)
        .orderBy("__b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        *key_cols,
        F.col("__b").alias("bucket_ts"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce("total", F.lit(0.0)).alias("total"),
        F.coalesce(F.last("total", ignorenulls=True).over(w), F.lit(0.0)).alias("total_locf"),
        F.col("n_events").isNull().cast("int").alias("was_gap"),
    )


def gapfill_interpolate(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    bucket: str = "hour",
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Time-bucket gap-filling with LINEAR INTERPOLATION between the
    neighboring observed buckets (TimescaleDB ``interpolate()`` to
    :func:`gapfill_locf`'s ``locf()``).

    Same dense-spine plan as locf; each gap row then reads its previous
    and next OBSERVED (bucket, total) via one backward ignore-nulls
    ``last`` and one forward ignore-nulls ``first`` window — both on
    the same key Exchange — and fills
    ``prev + (next - prev) * (t - t_prev)/(t_next - t_prev)`` with the
    fractions computed on integer bucket indices, so the fill is a
    single double expression (no accumulation; bit-identical on any
    engine/partitioning). Buckets before the first or after the last
    observation stay NULL — interpolation honestly has no answer there.
    """
    b = F.date_trunc(bucket, F.col(ts_col))
    agg = df.groupBy(*key_cols, b.alias("__b")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double").alias("total"),
    )
    bounds = df.agg(
        F.date_trunc(bucket, F.min(ts_col)).alias("__lo"),
        F.date_trunc(bucket, F.max(ts_col)).alias("__hi"),
    )
    keys = df.select(*key_cols).distinct()
    spine = keys.crossJoin(F.broadcast(bounds)).select(
        *key_cols,
        F.explode(F.expr(f"sequence(__lo, __hi, interval 1 {bucket})")).alias("__b"),
    )
    joined = spine.join(agg, [*key_cols, "__b"], "left").withColumn(
        "__bi", (F.unix_micros("__b") / bucket_us).cast("bigint")
    )
    wp = (
        W.partitionBy(*key_cols)
        .orderBy("__bi")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy(*key_cols)
        .orderBy("__bi")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs = F.col("total").isNotNull()
    prev_v = F.last(F.when(obs, F.col("total")), ignorenulls=True).over(wp)
    prev_b = F.last(F.when(obs, F.col("__bi")), ignorenulls=True).over(wp)
    next_v = F.first(F.when(obs, F.col("total")), ignorenulls=True).over(wf)
    next_b = F.first(F.when(obs, F.col("__bi")), ignorenulls=True).over(wf)
    lerp = prev_v + (next_v - prev_v) * (
        (F.col("__bi") - prev_b).cast("double") / (next_b - prev_b).cast("double")
    )
    filled = F.when(obs, F.col("total")).when(
        prev_b.isNotNull() & next_b.isNotNull(), lerp
    )
    return joined.select(
        *key_cols,
        F.col("__b").alias("bucket_ts"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        filled.alias("total_interp"),
        F.col("n_events").isNull().cast("int").alias("was_gap"),
    )


def apply_changeset(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    seq_col: str | None = None,
    broadcast_changes: bool = False,
) -> DataFrame:
    """MERGE-style batch apply of a CDC changeset to a snapshot.

    ``changes`` carries the snapshot's columns plus ``op_col`` with
    values ``'I'`` (insert/upsert), ``'U'`` (update/upsert) or ``'D'``
    (delete). When ``seq_col`` is given, only the latest change per key
    applies (a key changed multiple times in one batch folds to its
    final state first — standard CDC compaction). The result is:
    snapshot rows whose key has no change, plus the I/U rows, minus the
    D keys — the batch equivalent of ``MERGE INTO`` without requiring a
    table format that supports it.

    Scale shape: the latest-change window and the key distinct shuffle
    only the changeset; the 100 TB snapshot side is touched by exactly
    one LEFT ANTI join on the key — broadcastable via
    ``broadcast_changes=True`` when the changeset is a typical daily
    batch (small next to the snapshot), making the whole merge
    shuffle-free on the big side. No full outer join, no row updates in
    place.
    """
    data_cols = list(snapshot.columns)
    ch = changes
    if seq_col is not None:
        w = W.partitionBy(*key_cols).orderBy(F.desc(seq_col))
        ch = (
            ch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    keys = ch.select(*key_cols).distinct()
    keep = snapshot.join(
        F.broadcast(keys) if broadcast_changes else keys, key_cols, "left_anti"
    )
    applied = ch.filter(F.upper(F.col(op_col)).isin("I", "U")).select(*data_cols)
    return keep.unionByName(applied)
