"""Shared helpers for the query inventory."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_DEC = "decimal(18,6)"


_TABLES: dict[tuple[int, str, str], DataFrame] = {}


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver parquet table (columnar scan; Catalyst prunes/pushes).

    events.parquet stores TIMESTAMP(NANOS) which Spark's parquet reader
    rejects; with ``spark.sql.legacy.parquet.nanosAsLong`` (set in
    session defaults) it reads as BIGINT nanos, converted here to a
    microsecond timestamp by floor division — matching DuckDB's
    nanos→micros truncation exactly.

    The unresolved DataFrame (an immutable logical plan) is memoized per
    (session, dir, table): repeated queries against the same table skip
    the driver-side file listing + parquet footer schema read, which
    otherwise costs tens of ms per call across a many-query suite.
    """
    key = (id(spark), sf_dir, name)
    df = _TABLES.get(key)
    if df is None:
        # The caller may hand us a vanilla SparkSession (the driver
        # harness does) that lacks the tuned defaults in session.py.
        # Both confs below are runtime-settable and required for
        # cross-engine-correct reads of the driver parquet:
        #  - nanosAsLong: events.parquet stores TIMESTAMP(NANOS), which
        #    Spark's reader otherwise rejects outright.
        #  - UTC session timezone: collected TIMESTAMP values render in
        #    the session zone; the DuckDB oracle reads the same naive
        #    epoch values, so any other zone shifts every timestamp.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            from ..sources.readers import normalize_event_ts

            df = normalize_event_ts(df)
        _TABLES[key] = df
    return df


def clear_table_cache() -> None:
    """Drop every memoized table plan.

    The memo caches the resolved logical plan (file listing + schema)
    per (session, dir, table) for the life of the process — the right
    trade for a bench/driver loop over immutable parquet, but STALE if
    a table directory is rewritten in place (Spark then throws
    'underlying files have been updated' or reads old files). Call this
    after regenerating or compacting any {sf_dir} table.
    """
    _TABLES.clear()


def dsum(expr: Column | str, alias: str) -> Column:
    """Order-independent exact sum of a double expression, as DOUBLE.

    Accumulating in DECIMAL(18,6) makes the aggregate independent of
    partition/merge order — identical on local[32] and a 1000-executor
    cluster, and bit-equal to DuckDB's same-shaped sum.
    """
    c = F.col(expr) if isinstance(expr, str) else expr
    return F.sum(c.cast(_DEC)).cast("double").alias(alias)


def davg(expr: Column | str, alias: str) -> Column:
    """Exact-sum-based average as DOUBLE (see dsum).

    Divides by COUNT(expr) — non-NULL values, matching SQL AVG — not
    COUNT(*): on a nullable column the old row-count divisor silently
    deflated the average (sum skips NULLs, the divisor did not).
    try_divide so an all-NULL group yields NULL (as AVG and the DuckDB
    mirror do) instead of an ANSI divide-by-zero abort.
    """
    c = F.col(expr) if isinstance(expr, str) else expr
    return F.try_divide(
        F.sum(c.cast(_DEC)).cast("double"), F.count(c)
    ).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"(CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) "
        f"/ COUNT({expr})) AS {alias}"
    )


def disc_price() -> Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


SQL_DISC_PRICE = "l_extendedprice * (1 - l_discount)"


def rank_median(
    df: DataFrame,
    keys: str | list[str],
    col: str,
    out: str,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Discrete rank-based per-group median: the value at rank
    ceil(n/2) under a (col, tiebreak) total order — interpolation-free,
    so it is engine-identical on integers and exact doubles alike.
    Returns one row per key group with columns (*keys, out, n). SQL
    mirror::

        ROW_NUMBER() OVER (PARTITION BY keys ORDER BY col, tiebreak)
          = CAST(ceil(0.5 * COUNT(*) OVER (PARTITION BY keys)) AS BIGINT)

    Previously respelled in s21 (per event_type) and s30 (per user) —
    round-7 review. One window shuffle on the keys; the count window
    reuses the same partitioning.
    """
    from pyspark.sql.window import Window as W

    key_list = [keys] if isinstance(keys, str) else list(keys)
    ranked = df.select(
        *key_list,
        col,
        F.row_number()
        .over(W.partitionBy(*key_list).orderBy(col, tiebreak))
        .alias("rnk"),
        F.count(F.lit(1)).over(W.partitionBy(*key_list)).alias("n"),
    )
    at = F.ceil(F.lit(0.5) * F.col("n")).cast("bigint")
    return ranked.groupBy(*key_list).agg(
        F.max(F.when(F.col("rnk") == at, F.col(col))).alias(out),
        F.max("n").alias("n"),
    )


def copurchase_edges(
    spark: SparkSession, sf_dir: str, min_support: int = 2, cap: int = 64
) -> DataFrame:
    """Support-thresholded part co-purchase edges (p1 < p2).

    The one edge construction the graph-query family (s49 triangles,
    s77 k-core, t11 Adamic-Adar, t17 assortativity, t54 giant
    component) shares — previously respelled per query, with the
    power-law per-key cap present only in t54 (round-7 review).

    Per-key cap: only the ``cap`` first (partkey, linenumber) lines of
    each order feed the wedge self-join, bounding it at cap² rows per
    order key even on power-law data (TPC-H baskets are <= 13, so
    results here are unchanged). Deterministic tie-break mirrored in
    every oracle's ``basket`` CTE::

        SELECT l_orderkey, l_partkey FROM (
          SELECT l_orderkey, l_partkey,
                 ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                    ORDER BY l_partkey, l_linenumber) AS rn
          FROM lineitem) WHERE rn <= 64
    """
    # Deliberately NOT persisted although the self-join computes the
    # capped-basket pipeline once per side (broadcast build + probe):
    # the two computations run as OVERLAPPING jobs (the broadcast
    # build is an async job the probe stage does not wait on), so the
    # duplicate work hides in otherwise-idle cores, while a persist
    # serializes cache-build -> broadcast-read -> probe-read. Measured
    # (round-11 ABBA at sf0.1): persisting made t17 1.04x, t11 1.08x,
    # s49 1.14x SLOWER.
    li = capped_group_rows(
        t(spark, sf_dir, "lineitem"),
        key="l_orderkey",
        order=("l_partkey", "l_linenumber"),
        cap=cap,
    ).select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= min_support)
        .select("p1", "p2")
    )


def capped_group_rows(
    df: DataFrame, key: str | list[str], order: tuple[str, ...], cap: int
) -> DataFrame:
    """Keep at most ``cap`` rows per ``key`` group, deterministically.

    The guard that makes group-local self-joins (wedge joins, per-basket
    pair generation) safe on power-law keys: each group contributes at
    most cap² join rows regardless of its true size. ``order`` must be a
    total order within the group (include a unique tie-breaker column)
    so Spark and a SQL oracle keep the *same* rows — mirror with
    ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY order) <= cap``.

    Cost at scale: one window shuffle on ``key`` — the same partitioning
    the downstream self-join needs, so Catalyst reuses the exchange.
    """
    from pyspark.sql.window import Window

    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )
