"""Event-stream analytics (batch form) over the ``events`` table.

Time-windowed aggregation, sessionization, JSON extraction, band/range
joins and as-of joins — none of which exist in the reference (SURVEY.md
§2.9: no streaming, no time-series ops). The streaming variants of the
windowed aggregates live in queries/streaming.py; these batch forms are
the hash-checked oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import register
from ._util import dsum, sql_dsum, t
from ..operators.joins import asof_join, range_join


@register(
    "q50_events_hourly",
    f"""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n, {sql_dsum('value', 'total_value')}
    FROM events
    GROUP BY hour, event_type
    ORDER BY hour, event_type
    """,
    tags=("events", "time-window"),
)
def q50_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
        .orderBy("hour", "event_type")
    )


@register(
    "q51_events_sessionize",
    """
    WITH gaps AS (
      SELECT user_id, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                  OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM gaps
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("events", "sessionize", "window"),
    doc="Sessionization via lag-gap > 30min; microsecond-exact integer math both engines.",
)
def q51_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import sessionize

    return (
        sessionize(t(spark, sf_dir, "events"))
        .select("user_id", "event_id", "new_session")
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


@register(
    "q52_events_json",
    """
    SELECT json_extract_string(props, '$.k') AS k_value, COUNT(*) AS n
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY k_value
    ORDER BY n DESC, k_value
    LIMIT 25
    """,
    tags=("events", "json"),
)
def q52_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.get_json_object("props", "$.k").alias("k_value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "k_value")
        .limit(25)
    )


@register(
    "q53_events_value_bands",
    f"""
    SELECT band, COUNT(*) AS n, {sql_dsum('value', 'band_value')}
    FROM events
    JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0),
                 ('high', 150.0, 300.0), ('extreme', 300.0, 1e9)) AS bands(band, lo, hi)
      ON value >= lo AND value < hi
    GROUP BY band
    ORDER BY band
    """,
    tags=("events", "range-join"),
)
def q53_events_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = spark.createDataFrame(
        [
            Row(band="low", lo=0.0, hi=50.0),
            Row(band="mid", lo=50.0, hi=150.0),
            Row(band="high", lo=150.0, hi=300.0),
            Row(band="extreme", lo=300.0, hi=1e9),
        ]
    )
    joined = range_join(t(spark, sf_dir, "events"), bands, value="value")
    return (
        joined.groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "band_value"))
        .orderBy("band")
    )


@register(
    "q56_events_rollup_daily",
    f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour, event_type,
             COUNT(*) AS n, {sql_dsum('value', 'total_value')}
      FROM events
      GROUP BY hour, event_type
    )
    SELECT date_trunc('day', hour) AS day, event_type,
           CAST(SUM(n) AS BIGINT) AS n,
           {sql_dsum('total_value', 'total_value')}
    FROM hourly
    GROUP BY day, event_type
    ORDER BY day, event_type
    """,
    tags=("events", "time-window", "rollup"),
    doc=(
        "Hypertable-style rollup: the daily continuous aggregate is "
        "computed FROM the hourly one (aggregate-of-aggregate), the "
        "incremental-maintenance shape — at 100 TB the daily tier reads "
        "|hourly| rows, never re-scans raw events. Exact decimal "
        "re-accumulation keeps it bit-equal to a direct daily aggregate."
    ),
)
def q56_events_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
    )
    return (
        hourly.groupBy(F.date_trunc("day", "hour").alias("day"), "event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            dsum("total_value", "total_value"),
        )
        .orderBy("day", "event_type")
    )


@register(
    "q58_events_sliding",
    f"""
    SELECT win_start, event_type, COUNT(*) AS n, {sql_dsum('value', 'total_value')}
    FROM (
      SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
                    ]) AS win_start,
             event_type, value
      FROM events
    ) expanded
    GROUP BY win_start, event_type
    ORDER BY win_start, event_type
    """,
    tags=("events", "time-window", "sliding"),
    doc=(
        "Sliding (hopping) 1h windows every 30 min — each event counts "
        "in 2 windows. Spark's window(ts, '1 hour', '30 minutes') "
        "expands rows natively; the oracle unnests the two bucket "
        "starts explicitly. Streaming variant: q83."
    ),
)
def q58_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "total_value")
        .orderBy("win_start", "event_type")
    )


@register(
    "q57_event_percentiles",
    """
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.95) AS p95,
           quantile_cont(value, 0.99) AS p99
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("events", "percentile", "aggregate"),
    doc=(
        "Exact linear-interpolated percentiles per event type (Spark "
        "percentile == DuckDB quantile_cont). Spark's exact percentile "
        "sorts within groups; at 100 TB swap to approx_percentile for a "
        "sketch-based single-pass answer."
    ),
)
def q57_event_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.percentile("value", 0.5).alias("p50"),
            F.percentile("value", 0.95).alias("p95"),
            F.percentile("value", 0.99).alias("p99"),
        )
        .orderBy("event_type")
    )


@register(
    "q54_events_asof_order",
    """
    SELECT event_id, user_id, o_orderkey
    FROM (
      SELECT e.event_id, e.user_id, o.o_orderkey,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
             ) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    ) latest
    WHERE rn = 1
    ORDER BY event_id
    """,
    tags=("events", "asof-join"),
    doc=(
        "As-of join: each event picks the user's most recent order at or "
        "before the event time. Spark side uses the union-trick asof "
        "operator (operators/joins.py) — no pair explosion; the oracle "
        "states the same semantics as a window query."
    ),
)
def q54_events_asof_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey"
    )
    joined = asof_join(
        events,
        orders,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        right_values=["o_orderkey"],
        tie_breakers=["o_orderdate", "o_orderkey"],
    )
    return (
        joined.filter(F.col("o_orderkey").isNotNull())
        .select("event_id", "user_id", "o_orderkey")
        .orderBy("event_id")
    )


@register(
    "q55_events_pivot_daily",
    """
    SELECT date_trunc('day', ts) AS day,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
           CAST(SUM(CASE WHEN event_type IN ('signup', 'error') THEN 1 ELSE 0 END) AS BIGINT) AS other
    FROM events
    GROUP BY day
    ORDER BY day
    """,
    tags=("events", "pivot"),
)
def q55_events_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            flag(F.col("event_type") == "click").alias("clicks"),
            flag(F.col("event_type") == "view").alias("views"),
            flag(F.col("event_type") == "purchase").alias("purchases"),
            flag(F.col("event_type").isin("signup", "error")).alias("other"),
        )
        .orderBy("day")
    )


@register(
    "q75_latest_by_key",
    """
    WITH ranked AS (
      SELECT user_id, event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_type,
           event_id AS latest_event_id, value AS latest_value
    FROM ranked
    WHERE rn = 1
    ORDER BY user_id, event_type
    """,
    tags=("events", "window", "dedup"),
    doc=(
        "Latest-record dedup (SCD-style upsert compaction): keep the newest "
        "row per (user_id, event_type). One shuffle on the partition key; "
        "ties broken by the unique event_id so the winner is deterministic "
        "at any parallelism. At 100 TB this is the standard "
        "keep-latest-version compaction — no collect, no skew beyond the "
        "hottest single key."
    ),
)
def q75_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            "event_id",
            "value",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("latest_event_id"),
            F.col("value").alias("latest_value"),
        )
        .orderBy("user_id", "event_type")
    )


@register(
    "q84_full_outer_hours",
    f"""
    WITH buys AS (
      SELECT date_trunc('hour', ts) AS hour, {sql_dsum('value', 'revenue')}
      FROM events WHERE event_type = 'purchase' GROUP BY hour
    ),
    errs AS (
      SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n_errors
      FROM events WHERE event_type = 'error' GROUP BY hour
    )
    SELECT COALESCE(b.hour, e.hour) AS hour,
           COALESCE(b.revenue, 0.0) AS revenue,
           COALESCE(e.n_errors, 0) AS n_errors
    FROM buys b FULL OUTER JOIN errs e ON b.hour = e.hour
    ORDER BY hour
    """,
    tags=("events", "join", "full-outer"),
    doc=(
        "FULL OUTER join of two hourly aggregates (purchase revenue vs "
        "error counts); hours present on only one side surface with the "
        "other side defaulted. The reference's join map has no full-outer "
        "(SURVEY §2.4, executor.py:457-461). Both inputs are already "
        "aggregated, so the outer join runs on tiny relations."
    ),
)
def q84_full_outer_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    hour = F.date_trunc("hour", "ts").alias("hour")
    buys = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(hour)
        .agg(dsum("value", "revenue"))
    )
    errs = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(hour)
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )
    b, e = buys.alias("b"), errs.alias("e")
    return (
        b.join(e, F.col("b.hour") == F.col("e.hour"), "full_outer")
        .select(
            F.coalesce(F.col("b.hour"), F.col("e.hour")).alias("hour"),
            F.coalesce(F.col("revenue"), F.lit(0.0)).alias("revenue"),
            F.coalesce(F.col("n_errors"), F.lit(0)).alias("n_errors"),
        )
        .orderBy("hour")
    )


@register(
    "q85_unpivot_daily",
    """
    WITH p AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
      FROM events GROUP BY day
    )
    SELECT day, 'click' AS event_type, n_click AS n FROM p
    UNION ALL
    SELECT day, 'purchase' AS event_type, n_purchase AS n FROM p
    UNION ALL
    SELECT day, 'view' AS event_type, n_view AS n FROM p
    ORDER BY day, event_type
    """,
    tags=("events", "unpivot"),
    doc=(
        "Unpivot (wide->long): per-day conditional-aggregate columns turned "
        "back into (day, event_type, n) rows via stack(). The inverse of "
        "q55's pivot; stack() is a generator expression evaluated inside "
        "whole-stage codegen — no shuffle beyond the input aggregation."
    ),
)
def q85_unpivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    flag = lambda v: F.sum(F.when(F.col("event_type") == v, 1).otherwise(0)).cast("bigint")  # noqa: E731
    wide = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        flag("click").alias("n_click"),
        flag("purchase").alias("n_purchase"),
        flag("view").alias("n_view"),
    )
    return wide.selectExpr(
        "day",
        "stack(3, 'click', n_click, 'purchase', n_purchase, 'view', n_view) AS (event_type, n)",
    ).orderBy("day", "event_type")


@register(
    "q89_distinct_sketch",
    None,  # approx sketches are engine-specific; accuracy is test-asserted
    tags=("events", "sketch", "approx"),
    doc=(
        "Cardinality sketches: per-event-type approximate distinct users via "
        "HyperLogLog++ (approx_count_distinct) and a DataSketches HLL "
        "(hll_sketch_agg -> hll_sketch_estimate), alongside the exact "
        "count. Sketches are mergeable pre-aggregates: at 100 TB the "
        "per-partition sketch is O(kB) and the merge is associative, vs an "
        "exact distinct whose shuffle carries every key. "
        "tests/test_operators.py asserts <5% relative error."
    ),
)
def q89_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("hll_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .orderBy("event_type")
    )


@register(
    "q92_skew_salted_join",
    f"""
    SELECT c_mktsegment, COUNT(*) AS n, {sql_dsum('value', 'total_value')}
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("events", "join", "skew"),
    doc=(
        "Hot-key mitigation: the fact side is salted (uniform salt in "
        "[0,8), independent of the key) and the dimension replicated "
        "once per salt, so a key carrying a billion rows spreads over 8 "
        "tasks instead of one. Salting only redistributes rows — the "
        "join result is value-identical to the plain join, which is "
        "exactly what the oracle asserts."
    ),
)
def q92_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    ev = t(spark, sf_dir, "events").select("user_id", "value")
    dim = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        salted_join(ev, dim, on="user_id")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
        .orderBy("c_mktsegment")
    )


@register(
    "q96_session_window_batch",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id,
             event_id
      FROM flagged
    ),
    per_session AS (
      SELECT user_id, session_id, COUNT(*) AS n_events
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           CAST(MAX(n_events) AS BIGINT) AS max_session_events
    FROM per_session
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("events", "session-window", "time-window"),
    doc=(
        "Native session_window in BATCH: per-user gap-merged sessions "
        "(30 min) aggregated to session counts — the same operator the "
        "streaming q81 uses, here with a full DuckDB value oracle (the "
        "oracle rebuilds sessions via the lag-gap + running-sum "
        "construction; Spark merges windows when the next event starts "
        "before the previous window ends, i.e. splits at gap >= 30 min, "
        "matching the oracle's >= exactly). One shuffle on user_id."
    ),
)
def q96_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    per_session = (
        ev.groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_events").cast("bigint").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


@register(
    "q99_funnel_view_purchase",
    """
    SELECT COUNT(DISTINCT v.user_id) AS converted_users
    FROM events v
    WHERE v.event_type = 'view'
      AND EXISTS (
        SELECT 1 FROM events p
        WHERE p.user_id = v.user_id
          AND p.event_type = 'purchase'
          AND p.ts >= v.ts
          AND epoch_us(p.ts) - epoch_us(v.ts) <= 3600000000
      )
    """,
    tags=("events", "funnel", "semi-join"),
    doc=(
        "Funnel conversion: users with a purchase within 1 hour of a "
        "view. Planned as a left-semi join on user_id with the time "
        "window as a residual predicate — the pair space is bounded by "
        "per-user event counts, not |events|^2, and the semi join "
        "short-circuits on first match. Microsecond-exact integer window "
        "arithmetic on both engines."
    ),
)
def q99_funnel_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id", F.col("ts").alias("vts"))
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("pts")
    )
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("pts") >= F.col("vts"))
        & (F.unix_micros(F.col("pts")) - F.unix_micros(F.col("vts")) <= 3_600_000_000)
    )
    return (
        views.join(buys, cond, "left_semi")
        .agg(F.countDistinct("user_id").alias("converted_users"))
    )


@register(
    "r75_scd2_history",
    """
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             LAG(event_type) OVER w AS prev_type,
             LAG(1) OVER w AS prev_seen
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT user_id, event_id, ts, event_type FROM ordered
      WHERE prev_seen IS NULL OR prev_type IS DISTINCT FROM event_type
    )
    SELECT user_id, event_id, event_type,
           ts AS valid_from,
           COALESCE(LEAD(ts) OVER w2, TIMESTAMP '2100-01-01 00:00:00') AS valid_to,
           CAST(CASE WHEN LEAD(ts) OVER w2 IS NULL THEN 1 ELSE 0 END AS INT) AS is_current,
           CAST(epoch_us(LEAD(ts) OVER w2) - epoch_us(ts) AS BIGINT) AS duration_us
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, valid_from, event_id
    """,
    tags=("events", "scd2", "cdc", "window"),
    doc=(
        "SCD2 history build (operators/temporal.scd2_ranges): collapse "
        "the per-user event log to event_type *changes* (CDC change "
        "detection, NULL-safe), then attach half-open validity ranges "
        "[valid_from, valid_to) with is_current on the open row — the "
        "standard warehouse dimension-history pattern (open rows carry "
        "the conventional 2100-01-01 high date (pandas/Arrow ns-representable), never NULL). Both windows "
        "share the user_id partitioning so Catalyst plans one Exchange; "
        "microsecond-exact duration math on both engines."
    ),
)
def r75_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import scd2_ranges

    ranges = scd2_ranges(
        t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type"),
        key_cols=["user_id"],
        attr_col="event_type",
        ts_col="ts",
        tiebreak="event_id",
    )
    duration = F.unix_micros(F.col("valid_to")) - F.unix_micros(F.col("valid_from"))
    high_date = F.to_timestamp(F.lit("2100-01-01 00:00:00"))
    return ranges.select(
        "user_id",
        "event_id",
        "event_type",
        "valid_from",
        F.coalesce("valid_to", high_date).alias("valid_to"),
        F.col("is_current").cast("int").alias("is_current"),
        duration.cast("bigint").alias("duration_us"),
    ).orderBy("user_id", "valid_from", "event_id")


@register(
    "r55_gapfill_locf",
    f"""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             COUNT(*) AS n, {sql_dsum('value', 'total')}
      FROM events GROUP BY user_id, day
    ),
    bounds AS (
      SELECT date_trunc('day', MIN(ts)) AS lo, date_trunc('day', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT u.user_id, CAST(g.day AS TIMESTAMP) AS day
      FROM (SELECT DISTINCT user_id FROM events) u
      CROSS JOIN (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
      ) g
    ),
    joined AS (
      SELECT s.user_id, s.day, d.n, d.total
      FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    )
    SELECT user_id, day AS bucket_ts,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
           COALESCE(total, 0.0) AS total,
           COALESCE(last_value(total IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 0.0) AS total_locf,
           CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS INT) AS was_gap
    FROM joined
    ORDER BY user_id, bucket_ts
    """,
    tags=("events", "time-series", "gapfill", "locf"),
    doc=(
        "Time-bucket gap-filling with last-observation-carried-forward "
        "(operators/temporal.gapfill_locf) — TimescaleDB's "
        "time_bucket_gapfill+locf as a spine cross-join plus an "
        "ignore-nulls window: per user per day, event counts and exact "
        "decimal value totals densified over the global date span, gaps "
        "carrying the prior day's total. Spine generated distributed "
        "(bounds from one broadcast aggregate row), join and locf "
        "window share the user_id Exchange; bit-exact oracle."
    ),
)
def r55_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import gapfill_locf

    filled = gapfill_locf(
        t(spark, sf_dir, "events"), ["user_id"], "ts", "value", bucket="day"
    )
    return filled.orderBy("user_id", "bucket_ts")


@register(
    "r56_anomaly_zscore",
    """
    WITH scored AS (
      SELECT event_type, value,
             COUNT(*) OVER w AS cnt,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s,
             CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS ss
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING)
    ),
    z AS (
      SELECT event_type,
             (value - s / cnt) / sqrt((ss - s * s / cnt) / (cnt - 1)) AS zval
      FROM scored
      WHERE cnt >= 20 AND (ss - s * s / cnt) / (cnt - 1) > 0
    )
    SELECT event_type,
           COUNT(*) AS n_scored,
           CAST(SUM(CASE WHEN abs(zval) > 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           MAX(abs(zval)) AS max_abs_z
    FROM z
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("events", "anomaly", "window-frame"),
    doc=(
        "Rolling z-score anomaly detection: each event scored against "
        "the mean/stddev of its 100 predecessors within its event_type "
        "(explicit ROWS frame). The moments come from exact DECIMAL "
        "frame sums (sum, sum-of-squares) rather than a native stddev "
        "window — native implementations differ across engines "
        "(incremental vs Welford) in low bits, while exact sums plus a "
        "fixed double formula are bit-identical anywhere, at any "
        "partition count. One Exchange on event_type; map-side frame "
        "scan; warm-up (<20 predecessors) excluded."
    ),
)
def r56_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The [i-100, i-1] frame sums are computed as differences of
    # CUMULATIVE exact-decimal sums via lag(cum, 1) - lag(cum, 101):
    # O(n) per partition instead of Spark's O(n * frame) re-scan of a
    # bounded preceding frame (measured 3.9s -> ~1s at sf0.1). Decimal
    # addition is associative/exact, so the difference equals the
    # oracle's direct frame sum bit-for-bit — this rewrite is only
    # valid because the accumulator is exact; with double sums the
    # subtraction would introduce cancellation error.
    dec = F.col("value").cast("decimal(18,6)")
    wc = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wl = W.partitionBy("event_type").orderBy("ts", "event_id")
    cum = t(spark, sf_dir, "events").select(
        "event_type",
        "value",
        "ts",
        "event_id",
        F.row_number().over(wl).alias("rn"),
        F.sum(dec).over(wc).alias("cum_s"),
        F.sum(dec * dec).over(wc).alias("cum_ss"),
    )
    def frame(col, lag_far):
        return F.coalesce(F.lag(col, 1).over(wl), F.lit(0)) - F.coalesce(
            F.lag(col, lag_far).over(wl), F.lit(0)
        )
    scored = cum.select(
        "event_type",
        "value",
        frame(F.col("rn"), 101).cast("bigint").alias("cnt"),
        frame(F.col("cum_s"), 101).cast("double").alias("s"),
        frame(F.col("cum_ss"), 101).cast("double").alias("ss"),
    )
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("cnt")) / (F.col("cnt") - 1)
    z = (
        scored.filter((F.col("cnt") >= 20) & (var > 0))
        .select("event_type", ((F.col("value") - F.col("s") / F.col("cnt")) / F.sqrt(var)).alias("zval"))
    )
    return (
        z.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum(F.when(F.abs("zval") > 3.0, 1).otherwise(0)).cast("bigint").alias("n_anomalies"),
            F.max(F.abs("zval")).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


@register(
    "r57_trend_slope",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y
      FROM events
      GROUP BY event_type, x
    )
    SELECT event_type,
           COUNT(*) AS n_days,
           (COUNT(*) * CAST(SUM(CAST(x AS DECIMAL(28,6)) * CAST(y AS DECIMAL(28,6))) AS DOUBLE)
              - CAST(SUM(x) AS DOUBLE) * CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE))
           / (COUNT(*) * CAST(SUM(x * x) AS DOUBLE) - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE))
             AS slope
    FROM daily
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("events", "regression", "analytics"),
    doc=(
        "Per-group trend estimation without any ML library: closed-form "
        "OLS slope of daily value totals per event_type, all moments "
        "(sum x, sum y, sum xy, sum x^2) accumulated as exact DECIMALs "
        "so the slope is bit-identical at any partition count and to "
        "DuckDB — the reason to avoid the engines' native regr_slope, "
        "whose float accumulation order differs. Two keyed "
        "aggregations, map-side combined; the daily rollup reuses the "
        "event_type Exchange."
    ),
)
def r57_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01").cast("date"))
            .cast("bigint")
            .alias("x"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("y"))
    )
    n = F.count(F.lit(1))
    sx = F.sum("x").cast("double")
    sy = F.sum(F.col("y").cast("decimal(28,6)")).cast("double")
    sxy = F.sum(F.col("x").cast("decimal(28,6)") * F.col("y").cast("decimal(28,6)")).cast("double")
    sxx = F.sum(F.col("x") * F.col("x")).cast("double")
    return (
        daily.groupBy("event_type")
        .agg(
            n.alias("n_days"),
            # try_divide: a type active on a single day has zero x-variance
            # — ANSI aborts on the 0 denominator where DuckDB yields NULL
            F.try_divide(n * sxy - sx * sy, n * sxx - sx * sx).alias("slope"),
        )
        .orderBy("event_type")
    )


@register(
    "r58_item_cosine",
    """
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    ),
    norms AS (
      SELECT event_type, CAST(SUM(n * n) AS BIGINT) AS nn FROM c GROUP BY event_type
    ),
    dots AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_common_users,
             CAST(SUM(a.n * b.n) AS BIGINT) AS dot
      FROM c a JOIN c b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY type_a, type_b
    )
    SELECT type_a, type_b, n_common_users, dot,
           dot / (sqrt(na.nn) * sqrt(nb.nn)) AS cosine
    FROM dots
    JOIN norms na ON na.event_type = type_a
    JOIN norms nb ON nb.event_type = type_b
    ORDER BY type_a, type_b
    """,
    tags=("events", "cooccurrence", "recommender"),
    doc=(
        "Item-item cosine similarity from user co-occurrence — the "
        "collaborative-filtering preprocessing step: per-(user, item) "
        "interaction counts, pair dot products via a self-join keyed on "
        "user_id (pair space bounded by per-user item counts, never "
        "|items|^2 over the corpus), integer-exact dot/norm sums, one "
        "double division at the end. The item-count aggregation reuses "
        "the user_id Exchange; norms are a tiny broadcast side."
    ),
)
def r58_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    norms = c.groupBy("event_type").agg(F.sum(F.col("n") * F.col("n")).cast("bigint").alias("nn"))
    a = c.select(F.col("user_id"), F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    b = c.select(F.col("user_id"), F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    dots = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("n_common_users"),
            F.sum(F.col("na") * F.col("nb")).cast("bigint").alias("dot"),
        )
    )
    na = F.broadcast(norms.select(F.col("event_type").alias("type_a"), F.col("nn").alias("nna")))
    nb = F.broadcast(norms.select(F.col("event_type").alias("type_b"), F.col("nn").alias("nnb")))
    return (
        dots.join(na, "type_a")
        .join(nb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_common_users",
            "dot",
            (F.col("dot") / (F.sqrt("nna") * F.sqrt("nnb"))).alias("cosine"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "r59_chi_square",
    """
    WITH obs AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr, COUNT(*) AS o
      FROM events GROUP BY event_type, hr
    ),
    rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS row_n FROM obs GROUP BY event_type),
    ct AS (SELECT hr, CAST(SUM(o) AS BIGINT) AS col_n FROM obs GROUP BY hr),
    g AS (SELECT CAST(SUM(o) AS BIGINT) AS grand FROM obs),
    cells AS (
      SELECT rt.event_type, ct.hr,
             COALESCE(obs.o, 0) AS o,
             CAST(rt.row_n * ct.col_n AS DOUBLE) / g.grand AS e
      FROM rt CROSS JOIN ct CROSS JOIN g
      LEFT JOIN obs ON obs.event_type = rt.event_type AND obs.hr = ct.hr
    )
    SELECT event_type,
           COUNT(*) AS n_cells,
           CAST(SUM(o) AS BIGINT) AS n_obs,
           CAST(SUM(CAST(round((o - e) * (o - e) / e, 12) AS DECIMAL(28,12))) AS DOUBLE) AS chi2_contrib
    FROM cells
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("events", "statistics", "chi-square"),
    doc=(
        "Chi-square independence profiling of event_type vs hour-of-day: "
        "observed cell counts, marginal totals, and expected counts over "
        "the DENSE type x hour spine (zero cells still contribute their "
        "expected mass — built by crossing the two tiny marginal tables, "
        "never the fact table). Per-cell contributions are rounded to "
        "DECIMAL(28,12) before summing so the statistic is "
        "partition-order-independent and bit-equal cross-engine. The "
        "only fact-table work is one keyed aggregation."
    ),
)
def r59_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    obs = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.hour("ts").cast("bigint").alias("hr"))
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rt = obs.groupBy("event_type").agg(F.sum("o").cast("bigint").alias("row_n"))
    ct = obs.groupBy("hr").agg(F.sum("o").cast("bigint").alias("col_n"))
    g = obs.agg(F.sum("o").cast("bigint").alias("grand"))
    cells = (
        rt.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(g))
        .join(obs, ["event_type", "hr"], "left")
        .select(
            "event_type",
            F.coalesce("o", F.lit(0)).alias("o"),
            ((F.col("row_n") * F.col("col_n")).cast("double") / F.col("grand")).alias("e"),
        )
    )
    contrib = (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")
    return (
        cells.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("o").cast("bigint").alias("n_obs"),
            # round(x,12) BEFORE the decimal cast (repo determinism
            # rule): a raw double->DECIMAL(28,12) cast rounds HALF_UP
            # in Spark but HALF_EVEN in DuckDB, so a contribution whose
            # 13th digit is a tie could hash-diverge
            F.sum(F.round(contrib, 12).cast("decimal(28,12)"))
            .cast("double")
            .alias("chi2_contrib"),
        )
        .orderBy("event_type")
    )


@register(
    "r76_winsorized_stats",
    """
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rnk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    cuts AS (
      SELECT event_type,
             MAX(CASE WHEN rnk = CAST(ceil(0.05 * n) AS BIGINT) THEN value END) AS lo,
             MAX(CASE WHEN rnk = CAST(ceil(0.95 * n) AS BIGINT) THEN value END) AS hi,
             MAX(n) AS n
      FROM ranked GROUP BY event_type
    )
    SELECT r.event_type,
           CAST(MAX(c.n) AS BIGINT) AS n,
           MAX(c.lo) AS lo,
           MAX(c.hi) AS hi,
           CAST(SUM(CAST(least(greatest(r.value, c.lo), c.hi) AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*) AS mean_winsorized
    FROM ranked r JOIN cuts c ON r.event_type = c.event_type
    GROUP BY r.event_type
    ORDER BY r.event_type
    """,
    tags=("events", "statistics", "winsorize"),
    doc=(
        "Winsorized (outlier-clipped) robust mean per event_type using "
        "DISCRETE rank-based p05/p95 cutoffs — row_number over (value, "
        "id) rather than interpolated percentiles, because interpolation "
        "formulas differ across engines in low bits while a rank lookup "
        "is exact everywhere. One Exchange on event_type shared by the "
        "rank window, the cutoff extraction, and the clip join; clipped "
        "values re-accumulate as exact decimals."
    ),
)
def r76_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    wv = W.partitionBy("event_type").orderBy("value", "event_id")
    wn = W.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(wv).alias("rnk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    cuts = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rnk") == F.ceil(0.05 * F.col("n")).cast("bigint"), F.col("value"))).alias("lo"),
        F.max(F.when(F.col("rnk") == F.ceil(0.95 * F.col("n")).cast("bigint"), F.col("value"))).alias("hi"),
        F.max("n").alias("cn"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ranked.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("cn").cast("bigint").alias("n"),
            F.max("lo").alias("lo"),
            F.max("hi").alias("hi"),
            (F.sum(clipped.cast("decimal(18,6)")).cast("double") / F.count(F.lit(1))).alias(
                "mean_winsorized"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "r50_time_weighted_avg",
    """
    WITH iv AS (
      SELECT user_id,
             CAST(round(value * 100.0) AS BIGINT) AS value_c,
             epoch_us(LEAD(ts) OVER w) - epoch_us(ts) AS dt_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           COUNT(*) AS n_intervals,
           CAST(SUM(dt_us) AS BIGINT) AS span_us,
           CAST(SUM(CAST(value_c * dt_us AS HUGEINT)) AS DOUBLE) / 100.0
             / CAST(SUM(dt_us) AS DOUBLE) AS twa_value
    FROM iv
    WHERE dt_us IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("events", "time-series", "twa"),
    doc=(
        "Time-weighted average per user — the IoT/financial aggregate "
        "where a value holds until the next observation: lead() "
        "intervals in microsecond-exact integer time; values (2-decimal "
        "payloads) quantized to integer cents so every value x duration "
        "product is an exact int64 and the weighted sum accumulates as "
        "exact int128 (DECIMAL(38,0)) — naive decimal x bigint products "
        "overflow one engine's precision cap or the other's int64 "
        "multiply, while integer grains are exact and "
        "partition-order-independent everywhere — "
        "one double division at the end. Window and final aggregation "
        "share the user_id Exchange."
    ),
)
def r50_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    iv = t(spark, sf_dir, "events").select(
        "user_id",
        F.round(F.col("value") * 100.0).cast("bigint").alias("value_c"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))).alias("dt_us"),
    )
    return (
        iv.filter(F.col("dt_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dt_us").cast("bigint").alias("span_us"),
            (
                F.sum((F.col("value_c") * F.col("dt_us")).cast("decimal(38,0)")).cast("double")
                / 100.0
                / F.sum("dt_us").cast("double")
            ).alias("twa_value"),
        )
        .orderBy("user_id")
    )


@register(
    "r85_ohlc_bars",
    """
    WITH numbered AS (
      SELECT date_trunc('hour', ts) AS hour, value,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_open,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events WHERE event_type = 'purchase'
    )
    SELECT hour,
           COUNT(*) AS n,
           MIN(CASE WHEN rn_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MIN(CASE WHEN rn_close = 1 THEN value END) AS close,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS volume
    FROM numbered
    GROUP BY hour
    ORDER BY hour
    """,
    tags=("events", "time-series", "ohlc"),
    doc=(
        "OHLC bar downsampling (financial/IoT resample): one hash "
        "aggregation keyed on the hour bucket — open/close are "
        "min_by/max_by over a (ts, event_id) struct (deterministic even "
        "under duplicate timestamps — the t81 tie discipline; the oracle "
        "takes the rn=1 rows per hour), high/low/volume plain aggregates with the decimal-"
        "exact sum. Entirely map-side partial-aggregated; the classic "
        "time-series rollup TimescaleDB/kdb users expect, and the "
        "complement of r50's time-weighted average."
    ),
)
def r85_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min_by("value", F.struct("ts", "event_id")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.struct("ts", "event_id")).alias("close"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("volume"),
        )
        .orderBy("hour")
    )


@register(
    "r86_retention_cohorts",
    """
    WITH firsts AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS day_offset,
           COUNT(*) AS active_users
    FROM activity a JOIN firsts f USING (user_id)
    WHERE date_diff('day', f.cohort_day, a.day) BETWEEN 0 AND 7
    GROUP BY f.cohort_day, day_offset
    ORDER BY f.cohort_day, day_offset
    """,
    tags=("events", "retention", "cohort"),
    doc=(
        "Retention cohort analysis: users grouped by first-activity day, "
        "counted per day-offset for the first week — the standard "
        "product-analytics triangle. Two aggregations and one join, all "
        "hash-keyed on user_id so the join reuses the aggregation "
        "shuffle; per-user state is two small rows regardless of event "
        "volume, so the shape holds at any scale."
    ),
)
def r86_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = ev.distinct()
    offset = F.datediff(F.col("day"), F.col("cohort_day")).cast("bigint")
    return (
        activity.join(firsts, "user_id")
        .select("cohort_day", offset.alias("day_offset"))
        .filter(F.col("day_offset").between(0, 7))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "r96_incremental_agg_merge",
    f"""
    SELECT event_type, COUNT(*) AS n, {sql_dsum('value', 'total_value')},
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("events", "incremental", "mergeable-state"),
    doc=(
        "Incremental aggregate maintenance: the stats the pipeline "
        "already holds for data before the cutoff (2024-01-16) are NOT "
        "recomputed — each side produces per-key partial states "
        "(count, exact decimal sum, min, max) and the two state tables "
        "merge by union + re-aggregation. The oracle is the full-table "
        "single-pass aggregate, proving merge == recompute. This is the "
        "contract that lets a 100 TB daily pipeline aggregate only "
        "yesterday's partition and fold it into a running state table "
        "(decimal sums make the fold order-independent, so the merged "
        "result is bit-identical at any batch granularity or cluster "
        "size). Each partial agg is one map-side-combined shuffle over "
        "its own slice; the merge shuffles only |keys| x 2 rows."
    ),
)
def r96_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("ps"),
            F.min("value").alias("pmn"),
            F.max("value").alias("pmx"),
        )

    base = partial(ev.filter(F.col("ts") < cutoff))
    delta = partial(ev.filter(F.col("ts") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("pn").cast("bigint").alias("n"),
            F.sum("ps").cast("double").alias("total_value"),
            F.min("pmn").alias("min_value"),
            F.max("pmx").alias("max_value"),
        )
        .orderBy("event_type")
    )


@register(
    "r99_event_transitions",
    """
    WITH nxt AS (
      SELECT event_type AS prev_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    c AS (
      SELECT prev_type, next_type, COUNT(*) AS n
      FROM nxt WHERE next_type IS NOT NULL
      GROUP BY prev_type, next_type
    ),
    tot AS (SELECT prev_type, SUM(n) AS prev_total FROM c GROUP BY prev_type)
    SELECT c.prev_type, c.next_type, CAST(c.n AS BIGINT) AS n,
           CAST(c.n AS DOUBLE) / tot.prev_total AS p
    FROM c JOIN tot USING (prev_type)
    ORDER BY prev_type, next_type
    """,
    tags=("events", "sequence", "markov"),
    doc=(
        "First-order Markov transition matrix over per-user event "
        "sequences (the product-analytics 'what happens after X' "
        "table, and the sequence prior behind next-event prediction "
        "features). One user-partitioned window (events of one user "
        "sort within their own partition — no global sort), one keyed "
        "count, then the row-probability division via a window over "
        "the ALREADY-AGGREGATED counts table (at most |types|^2 rows) "
        "— a totals-side self-join would recompute the fact-table "
        "window twice. Ties broken by event_id so the sequence — and "
        "therefore every count — is deterministic across engines and "
        "partition orders."
    ),
)
def r99_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    prev_total = F.sum("n").over(W.partitionBy("prev_type"))
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / prev_total).alias("p"),
    ).orderBy("prev_type", "next_type")


@register(
    "s02_sequential_funnel",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.v_ts
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_after,
           (SELECT COUNT(*) FROM p) AS n_purchase_after,
           CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
             / (SELECT COUNT(*) FROM v) AS click_rate,
           CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
             / (SELECT COUNT(*) FROM c) AS purchase_rate
    """,
    tags=("events", "funnel", "sequence"),
    doc=(
        "Three-step strictly-sequential funnel (first view -> first "
        "click after it -> first purchase after that), the ordered "
        "complement of q99's windowed two-step funnel: each stage is a "
        "per-user MIN over rows filtered by the previous stage's "
        "timestamp. All three aggregations and both joins are keyed on "
        "user_id, so the whole funnel reuses ONE user-hash Exchange "
        "end-to-end; stage tables shrink monotonically. Counts come "
        "from three single-row aggregates cross-joined (no collect, "
        "no window)."
    ),
)
def s02_sequential_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_click_after"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchase_after"))
    return (
        nv.crossJoin(nc)
        .crossJoin(np_)
        .select(
            "n_view",
            "n_click_after",
            "n_purchase_after",
            # try_divide: an empty funnel stage must yield NULL rates
            # (DuckDB x/0), not an ANSI DIVIDE_BY_ZERO abort
            F.try_divide(
                F.col("n_click_after").cast("double"), F.col("n_view")
            ).alias("click_rate"),
            F.try_divide(
                F.col("n_purchase_after").cast("double"), F.col("n_click_after")
            ).alias("purchase_rate"),
        )
    )


@register(
    "s05_recent_event_features",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           array_to_string(
             (list(event_type ORDER BY ts DESC, event_id DESC))[1:5], '|'
           ) AS recent
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("events", "features", "sequence"),
    doc=(
        "Bounded per-key sequence features: each user's 5 most recent "
        "event types, newest first, as one delimited feature string — "
        "the classic recsys/behavior-model input (and the same shape an "
        "LLM session-context builder emits). The per-user array is "
        "BOUNDED (sort_array + slice over a per-key collect_list), so "
        "state per key is O(events-per-user) during the aggregation and "
        "O(5) after — no window over the fact table, one user-keyed "
        "shuffle. Ordering ties broken by event_id so the feature "
        "string is deterministic across engines and partition orders."
    ),
)
def s05_recent_event_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    # sort_array on struct(ts, event_id, event_type) orders by ts then
    # event_id; asc=False sorts descending, newest-first deterministically.
    collected = F.sort_array(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type"))),
        asc=False,
    )
    recent = F.array_join(
        F.transform(F.slice(collected, 1, 5), lambda s: s["event_type"]), "|"
    )
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), recent.alias("recent"))
        .orderBy("user_id")
    )


@register(
    "s06_audience_overlap",
    """
    WITH a AS (SELECT DISTINCT user_id, event_type FROM events),
    s AS (SELECT event_type, COUNT(*) AS n FROM a GROUP BY event_type),
    p AS (
      SELECT x.event_type AS type_a, y.event_type AS type_b, COUNT(*) AS n_common
      FROM a x JOIN a y ON x.user_id = y.user_id AND x.event_type < y.event_type
      GROUP BY type_a, type_b
    )
    SELECT type_a, type_b, CAST(n_common AS BIGINT) AS n_common,
           CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
    FROM p
    JOIN s sa ON sa.event_type = type_a
    JOIN s sb ON sb.event_type = type_b
    ORDER BY type_a, type_b
    """,
    tags=("events", "set-similarity", "audience"),
    doc=(
        "Audience-overlap matrix: exact Jaccard similarity between the "
        "user sets of every event-type pair — the set-based complement "
        "of r58's frequency-weighted cosine (segmentation/cannibalization "
        "analysis; at corpus scale, the same shape measures user-set "
        "overlap between data sources). The pair space is bounded per "
        "user by their distinct types (never |types|^2 over the fact "
        "table); audience sizes are a tiny broadcast; one double "
        "division at the end of integer-exact counts."
    ),
)
def s06_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = t(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    sizes = a.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    x = a.select("user_id", F.col("event_type").alias("type_a"))
    y = a.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        x.join(y, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sa = F.broadcast(sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("na")))
    sb = F.broadcast(sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb")))
    return (
        pairs.join(sa, "type_a")
        .join(sb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "s18_purchase_attribution",
    """
    WITH purch AS (
      SELECT user_id, event_id AS pid, ts FROM events WHERE event_type = 'purchase'
    ),
    views AS (
      SELECT user_id, MIN(event_id) AS vid, ts AS vts
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, ts
    ),
    attributed AS (
      SELECT p.user_id, p.pid, p.ts, v.vid, v.vts
      FROM purch p ASOF LEFT JOIN views v
        ON p.user_id = v.user_id AND p.ts >= v.vts
    )
    SELECT date_trunc('day', ts) AS day,
           COUNT(*) AS n_purchases,
           CAST(SUM(CASE WHEN vid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_attributed,
           CAST(SUM(CASE WHEN vid IS NOT NULL
                         THEN epoch_us(ts) - epoch_us(vts) ELSE 0 END) AS BIGINT)
             AS total_lag_us
    FROM attributed
    GROUP BY day
    ORDER BY day
    """,
    tags=("events", "attribution", "asof"),
    doc=(
        "Last-touch attribution: each purchase is credited to the most "
        "recent prior view by the same user — the as-of join's "
        "marketing-analytics face (operators/joins.asof_join, the "
        "union-trick single-window plan, no pair explosion on "
        "heavy-viewing users). Views are deduped to one row per "
        "(user, ts) with the MIN event id so the match is unique and "
        "engine-deterministic; per-day totals report attachment rate "
        "and total view-to-purchase lag in exact integer microseconds "
        "(averages derivable without any float accumulation)."
    ),
)
def s18_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"), "ts"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts").alias("vts"))
        .agg(F.min("event_id").alias("vid"))
    )
    att = asof_join(
        purch,
        views,
        on="user_id",
        left_time="ts",
        right_time="vts",
        right_values=["vid", "vts"],
        tie_breakers=["vid"],
    )
    lag = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("vts"))
    return (
        att.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.when(F.col("vid").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_attributed"),
            F.sum(F.when(F.col("vid").isNotNull(), lag).otherwise(0))
            .cast("bigint")
            .alias("total_lag_us"),
        )
        .orderBy("day")
    )


@register(
    "s19_trailing_wau",
    """
    WITH active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM active),
    contrib AS (
      SELECT a.user_id, a.day + o.off AS target_day
      FROM active a, UNNEST([0, 1, 2, 3, 4, 5, 6]) AS o(off)
    ),
    wau AS (
      SELECT c.target_day AS day, COUNT(DISTINCT c.user_id) AS wau
      FROM contrib c CROSS JOIN bounds b
      WHERE c.target_day BETWEEN b.lo AND b.hi
      GROUP BY c.target_day
    ),
    dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM active GROUP BY day)
    SELECT CAST(w.day AS TIMESTAMP) AS day, CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
           CAST(d.dau AS DOUBLE) / w.wau AS stickiness
    FROM wau w JOIN dau d ON d.day = w.day
    ORDER BY day
    """,
    tags=("events", "retention", "sliding-distinct"),
    doc=(
        "Trailing-7-day active users and DAU/WAU stickiness — the "
        "sliding DISTINCT aggregate windows can't express (distinct "
        "doesn't decompose over overlapping frames). Relational shape: "
        "each (user, active-day) pair is exploded to the seven trailing "
        "report days it supports (map-side, x7), then one "
        "(day, user)-keyed distinct count — the shuffle spreads over "
        "users, never a per-day state blowup; date bounds enter as a "
        "one-row broadcast, not a driver collect."
    ),
)
def s19_trailing_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    active = (
        t(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", "ts").cast("date").alias("day"))
        .distinct()
    )
    bounds = active.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    off = F.explode(F.array(*[F.lit(i) for i in range(7)])).alias("off")
    contrib = active.select("user_id", "day", off).select(
        "user_id", F.date_add("day", F.col("off")).alias("target_day")
    )
    wau = (
        contrib.crossJoin(F.broadcast(bounds))
        .filter(F.col("target_day").between(F.col("lo"), F.col("hi")))
        .groupBy(F.col("target_day").alias("day"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
    )
    dau = active.groupBy("day").agg(F.countDistinct("user_id").cast("bigint").alias("dau"))
    return (
        wau.join(dau, "day")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
        .orderBy("day")
    )


@register(
    "s20_dod_change",
    f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, event_type,
             {sql_dsum('value', 'total_value')}
      FROM events GROUP BY day, event_type
    )
    SELECT day, event_type, total_value,
           CASE WHEN LAG(total_value) OVER w IS NULL
                OR LAG(total_value) OVER w = 0 THEN NULL
                ELSE (total_value - LAG(total_value) OVER w)
                     / LAG(total_value) OVER w END AS dod_pct
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ORDER BY event_type, day
    """,
    tags=("events", "time-series", "growth"),
    doc=(
        "Day-over-day growth per event type: daily exact-decimal "
        "totals, then LAG over the ALREADY-AGGREGATED daily table "
        "(|days| x |types| rows — the window never touches the fact "
        "table) with NULL for the first day and zero-base days. The "
        "division runs on two identical exact-decimal-derived doubles, "
        "so the percentage is bit-stable cross-engine. The KPI-sheet "
        "shape every metrics pipeline ships."
    ),
)
def s20_dod_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(dsum("value", "total_value"))
    )
    w = W.partitionBy("event_type").orderBy("day")
    prev = F.lag("total_value").over(w)
    return daily.select(
        "day",
        "event_type",
        "total_value",
        F.when(prev.isNull() | (prev == 0), F.lit(None)).otherwise(
            (F.col("total_value") - prev) / prev
        ).alias("dod_pct"),
    ).orderBy("event_type", "day")


@register(
    "s21_mad_outliers",
    """
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rnk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    med AS (
      SELECT event_type,
             MAX(CASE WHEN rnk = CAST(ceil(0.5 * n) AS BIGINT) THEN value END) AS median,
             MAX(n) AS n
      FROM ranked GROUP BY event_type
    ),
    devs AS (
      SELECT e.event_type, e.event_id, abs(e.value - m.median) AS dev
      FROM events e JOIN med m ON m.event_type = e.event_type
    ),
    dranked AS (
      SELECT event_type, dev,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rnk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM devs
    ),
    mad AS (
      SELECT event_type,
             MAX(CASE WHEN rnk = CAST(ceil(0.5 * n) AS BIGINT) THEN dev END) AS mad
      FROM dranked GROUP BY event_type
    )
    SELECT m.event_type, CAST(m.n AS BIGINT) AS n, m.median, d.mad,
           CAST(SUM(CASE WHEN abs(e.value - m.median) > 5 * d.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM events e
    JOIN med m ON m.event_type = e.event_type
    JOIN mad d ON d.event_type = e.event_type
    GROUP BY m.event_type, m.n, m.median, d.mad
    ORDER BY m.event_type
    """,
    tags=("events", "robust-statistics", "outliers"),
    doc=(
        "Median-absolute-deviation outlier census per event type — the "
        "robust global complement of r56's rolling z-score (mean/stddev "
        "break down exactly when outliers are present; the median/MAD "
        "pair does not). Both medians are discrete rank-based "
        "(interpolation-free, engine-identical), deviations and the "
        "5*MAD threshold are single products of identical doubles, and "
        "every stage — two partitioned rank windows, two broadcast-"
        "size medians joined back, one counting pass — shuffles on "
        "event_type only. No global window, no float accumulation."
    ),
)
def s21_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._util import rank_median

    ev = t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    med = rank_median(ev, "event_type", "value", "median").select(
        "event_type", "median", "n"
    )
    devs = ev.join(F.broadcast(med.select("event_type", "median")), "event_type").select(
        "event_type", "event_id", F.abs(F.col("value") - F.col("median")).alias("dev")
    )
    mad = rank_median(devs, "event_type", "dev", "mad").select("event_type", "mad")
    return (
        ev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "n", "median", "mad")
        .agg(
            F.sum(
                F.when(F.abs(F.col("value") - F.col("median")) > 5 * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers")
        )
        .select("event_type", F.col("n").cast("bigint").alias("n"), "median", "mad", "n_outliers")
        .orderBy("event_type")
    )


@register(
    "s22_top_session_paths",
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_id, ts, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    paths AS (
      SELECT user_id, session_id,
             array_to_string(
               (list(event_type ORDER BY ts, event_id))[1:8], '>') AS path
      FROM sess GROUP BY user_id, session_id
    )
    SELECT path, COUNT(*) AS n_sessions
    FROM paths
    GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 10
    """,
    tags=("events", "sessionize", "journeys"),
    doc=(
        "Top user journeys: sessions rebuilt with the q51 lag-gap rule "
        "(30 min, microsecond-exact), each session reduced to its first "
        "eight event types as one delimited path (bounded per-key list, "
        "the s05 discipline — state O(8) after aggregation), then a "
        "path frequency count with a top-10 TakeOrderedAndProject. "
        "Everything shuffles on (user) then (path); ties broken by "
        "event_id so paths are byte-identical across engines. The "
        "'what do users actually do' table every funnel design starts "
        "from."
    ),
)
def s22_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import sessionize

    sess = sessionize(
        t(spark, sf_dir, "events").select(
            "user_id", "event_id", "ts", "event_type"
        ),
        id_col="session_id",
    )
    ordered = F.sort_array(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
    )
    path = F.array_join(
        F.transform(F.slice(ordered, 1, 8), lambda s: s["event_type"]), ">"
    )
    paths = sess.groupBy("user_id", "session_id").agg(path.alias("path"))
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(10)
    )


@register(
    "s23_threshold_runs",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hr, COUNT(*) AS n
      FROM events GROUP BY hr
    ),
    avg_n AS (SELECT CAST(SUM(n) AS DOUBLE) / COUNT(*) AS m FROM hourly),
    flagged AS (
      SELECT hr, n,
             CAST(epoch_us(hr) / 3600000000 AS BIGINT) AS hidx
      FROM hourly CROSS JOIN avg_n WHERE n > m
    ),
    grouped AS (
      SELECT hr, n,
             hidx - ROW_NUMBER() OVER (ORDER BY hidx) AS grp
      FROM flagged
    )
    SELECT MIN(hr) AS run_start, MAX(hr) AS run_end,
           COUNT(*) AS run_hours,
           CAST(SUM(n) AS BIGINT) AS total_events,
           CAST(MAX(n) AS BIGINT) AS peak_hour_events
    FROM grouped
    GROUP BY grp
    ORDER BY run_start
    """,
    tags=("events", "gaps-and-islands", "monitoring"),
    doc=(
        "Gaps-and-islands: maximal runs of consecutive hours whose "
        "event volume exceeds the overall hourly average — sustained-"
        "load episodes, the alerting primitive behind 'elevated for N "
        "consecutive hours'. The threshold is data-relative (one-row "
        "broadcast average), so the query is scale-free. The classic "
        "index-minus-rank grouping runs over the HOURLY table, whose "
        "size is bounded by the time span (720 rows/month) regardless "
        "of event volume — the one unpartitioned window here can never "
        "grow with data size. Integer hour indices both engines derive "
        "identically from epoch microseconds."
    ),
)
def s23_threshold_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    avg_n = hourly.agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("m")
    )
    flagged = (
        hourly.crossJoin(F.broadcast(avg_n))
        .filter(F.col("n") > F.col("m"))
        .select(
            "hr", "n", (F.unix_micros("hr") / 3_600_000_000).cast("bigint").alias("hidx")
        )
    )
    grouped = flagged.select(
        "hr", "n", (F.col("hidx") - F.row_number().over(W.orderBy("hidx"))).alias("grp")
    )
    return (
        grouped.groupBy("grp")
        .agg(
            F.min("hr").alias("run_start"),
            F.max("hr").alias("run_end"),
            F.count(F.lit(1)).alias("run_hours"),
            F.sum("n").cast("bigint").alias("total_events"),
            F.max("n").cast("bigint").alias("peak_hour_events"),
        )
        .drop("grp")
        .orderBy("run_start")
    )


@register(
    "s24_duplicate_payments",
    """
    WITH p AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus, value
      FROM events WHERE event_type = 'purchase'
    ),
    buck AS (
      SELECT *, CAST(floor(tus / 3600000000) AS BIGINT) AS b FROM p
    ),
    cand AS (
      SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
             a.tus AS t_a, b.tus AS t_b, a.value AS v_a, b.value AS v_b
      FROM buck a JOIN buck b
        ON a.user_id = b.user_id
       AND (a.tus < b.tus OR (a.tus = b.tus AND a.event_id < b.event_id))
       AND b.b - a.b BETWEEN 0 AND 1
    )
    SELECT user_id, least(id_a, id_b) AS id_a, greatest(id_a, id_b) AS id_b,
           CAST(abs(t_b - t_a) AS BIGINT) AS dt_us,
           abs(v_b - v_a) AS dv
    FROM cand
    WHERE abs(t_b - t_a) <= 3600000000 AND abs(v_b - v_a) <= 25.0
    ORDER BY user_id, id_a, id_b
    """,
    tags=("events", "band-self-join", "fraud"),
    doc=(
        "Near-duplicate payment detection: purchase pairs by the same "
        "user within an hour and within 25.0 in value — the fraud/"
        "double-charge screen. The scale technique is the bucketed "
        "band SELF-join: bucket the time axis at the band width, "
        "explode the earlier side to (bucket, bucket+1), and EQUI-join "
        "on (user, bucket), which covers every within-band pair "
        "exactly once — with a as the EARLIER event the later one's "
        "bucket is offset 0 or 1 by construction (id-ordering alone "
        "would miss pairs whose larger id has the earlier time) — "
        "no all-pairs blowup, unlike a raw inequality self-join, and "
        "no broadcast requirement, unlike range_join's dimension-table "
        "form. The exact band predicate then filters candidates; "
        "all comparisons are integer microseconds or single double "
        "subtractions."
    ),
)
def s24_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", F.unix_micros("ts").alias("tus"), "value")
    )
    buck = p.withColumn("b", F.floor(F.col("tus") / 3_600_000_000).cast("bigint"))
    # The earlier side explodes to its own and the next bucket, so the
    # join is a true EQUI-join on (user_id, bucket) — Spark hashes on
    # both keys and a user with many purchases only meets the two
    # adjacent hour-buckets, not all their same-user pairs. (A residual
    # `b_b - b_a BETWEEN 0 AND 1` condition would plan as an equi-join
    # on user_id alone with the bucket check as a post-join filter.)
    a = buck.select(
        "user_id",
        F.col("event_id").alias("id_a"),
        F.col("tus").alias("t_a"),
        F.col("value").alias("v_a"),
        F.explode(F.array(F.col("b"), F.col("b") + F.lit(1))).alias("jb"),
    )
    bb = buck.select(
        F.col("user_id").alias("user_b"),
        F.col("event_id").alias("id_b"),
        F.col("tus").alias("t_b"),
        F.col("value").alias("v_b"),
        F.col("b").alias("jb_b"),
    )
    cand = a.join(
        bb,
        (F.col("user_id") == F.col("user_b"))
        & (F.col("jb") == F.col("jb_b"))
        & (
            (F.col("t_a") < F.col("t_b"))
            | ((F.col("t_a") == F.col("t_b")) & (F.col("id_a") < F.col("id_b")))
        ),
    )
    return (
        cand.filter(
            (F.abs(F.col("t_b") - F.col("t_a")) <= 3_600_000_000)
            & (F.abs(F.col("v_b") - F.col("v_a")) <= 25.0)
        )
        .select(
            "user_id",
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.abs(F.col("t_b") - F.col("t_a")).cast("bigint").alias("dt_us"),
            F.abs(F.col("v_b") - F.col("v_a")).alias("dv"),
        )
        .orderBy("user_id", "id_a", "id_b")
    )


@register(
    "s28_gapfill_interpolate",
    f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             COUNT(*) AS n, {sql_dsum('value', 'total')}
      FROM events GROUP BY event_type, hr
    ),
    bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT k.event_type, CAST(g.hr AS TIMESTAMP) AS hr
      FROM (SELECT DISTINCT event_type FROM events) k
      CROSS JOIN (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM bounds
      ) g
    ),
    joined AS (
      SELECT s.event_type, s.hr, h.n, h.total,
             CAST(epoch_us(s.hr) / 3600000000 AS BIGINT) AS bi
      FROM spine s LEFT JOIN hourly h
        ON s.event_type = h.event_type AND s.hr = h.hr
    ),
    ctx AS (
      SELECT *,
             last_value(total IGNORE NULLS) OVER wp AS prev_v,
             last_value(CASE WHEN total IS NOT NULL THEN bi END IGNORE NULLS)
               OVER wp AS prev_b,
             first_value(total IGNORE NULLS) OVER wf AS next_v,
             first_value(CASE WHEN total IS NOT NULL THEN bi END IGNORE NULLS)
               OVER wf AS next_b
      FROM joined
      WINDOW wp AS (PARTITION BY event_type ORDER BY bi
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY event_type ORDER BY bi
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, hr AS bucket_ts,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
           CASE WHEN total IS NOT NULL THEN total
                WHEN prev_b IS NOT NULL AND next_b IS NOT NULL
                THEN prev_v + (next_v - prev_v)
                     * (CAST(bi - prev_b AS DOUBLE) / CAST(next_b - prev_b AS DOUBLE))
           END AS total_interp,
           CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS INT) AS was_gap
    FROM ctx
    ORDER BY event_type, bucket_ts
    """,
    tags=("events", "time-series", "gapfill", "interpolate"),
    doc=(
        "Time-bucket gap-filling with linear interpolation "
        "(operators/temporal.gapfill_interpolate) — TimescaleDB's "
        "interpolate() to r55's locf(): gap hours fill with the line "
        "between the neighboring observed totals, computed as ONE "
        "double expression over integer bucket indices (no float "
        "accumulation, bit-identical at any partitioning); buckets "
        "outside a type's observed range stay NULL because "
        "interpolation honestly has no answer there. Backward and "
        "forward ignore-nulls windows share the same event_type "
        "Exchange as the spine join."
    ),
)
def s28_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import gapfill_interpolate

    return gapfill_interpolate(
        t(spark, sf_dir, "events"),
        key_cols=["event_type"],
        ts_col="ts",
        value_col="value",
        bucket="hour",
        bucket_us=3_600_000_000,
    ).orderBy("event_type", "bucket_ts")


@register(
    "s30_bot_regularity",
    """
    WITH gaps AS (
      SELECT user_id,
             event_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    g AS (SELECT user_id, event_id, gap_us FROM gaps WHERE gap_us IS NOT NULL),
    ranked AS (
      SELECT user_id, gap_us,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY gap_us, event_id) AS rnk,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM g
    ),
    med AS (
      SELECT user_id,
             MAX(CASE WHEN rnk = CAST(ceil(0.5 * n) AS BIGINT) THEN gap_us END) AS med,
             MAX(n) AS n
      FROM ranked GROUP BY user_id
    ),
    dev AS (
      SELECT g.user_id, g.event_id, abs(g.gap_us - m.med) AS d
      FROM g JOIN med m ON m.user_id = g.user_id
    ),
    dranked AS (
      SELECT user_id, d,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d, event_id) AS rnk,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM dev
    ),
    mad AS (
      SELECT user_id,
             MAX(CASE WHEN rnk = CAST(ceil(0.5 * n) AS BIGINT) THEN d END) AS mad
      FROM dranked GROUP BY user_id
    )
    SELECT m.user_id, CAST(m.n AS BIGINT) AS n_gaps,
           CAST(m.med AS BIGINT) AS median_gap_us,
           CAST(d.mad AS BIGINT) AS mad_gap_us,
           CAST(d.mad AS DOUBLE) / m.med AS regularity
    FROM med m JOIN mad d ON d.user_id = m.user_id
    WHERE m.n >= 20
    ORDER BY regularity, m.user_id
    LIMIT 10
    """,
    tags=("events", "bot-detection", "robust-statistics"),
    doc=(
        "Bot screening by inter-event regularity: per user, the median "
        "and MAD of inter-arrival gaps — humans are bursty (MAD on the "
        "order of the median), schedulers and scripts are metronomic "
        "(MAD/median near zero). The ten most-regular users with >= 20 "
        "gaps surface for review. All statistics are integer-"
        "microsecond rank-based (the s21 discipline applied per user — "
        "every window partitions on user_id, gap counts bound each "
        "partition), with one double division for the ranking ratio, "
        "ties broken by user_id."
    ),
)
def s30_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("tus"), "ts"
    )
    wseq = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        "event_id",
        (F.col("tus") - F.lag("tus").over(wseq)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())

    from ._util import rank_median

    med = rank_median(g, "user_id", "gap_us", "med")
    dev = g.join(med.select("user_id", "med"), "user_id").select(
        "user_id", "event_id", F.abs(F.col("gap_us") - F.col("med")).alias("d")
    )
    mad = rank_median(dev, "user_id", "d", "mad").select("user_id", "mad")
    return (
        med.join(mad, "user_id")
        .filter(F.col("n") >= 20)
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n_gaps"),
            F.col("med").cast("bigint").alias("median_gap_us"),
            F.col("mad").cast("bigint").alias("mad_gap_us"),
            # try_divide: a metronomic user with majority-duplicate
            # timestamps has median gap 0 — NULL regularity (DuckDB
            # x/0), not an ANSI abort; nulls sort LAST on both engines
            # (asc_nulls_last mirrors DuckDB's ASC default)
            F.try_divide(F.col("mad").cast("double"), F.col("med")).alias(
                "regularity"
            ),
        )
        .orderBy(F.asc_nulls_last("regularity"), "user_id")
        .limit(10)
    )


@register(
    "s31_user_growth_curve",
    """
    WITH first_seen AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS day FROM events GROUP BY user_id
    ),
    per_day AS (
      SELECT day, COUNT(*) AS new_users FROM first_seen GROUP BY day
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumulative_users
    FROM per_day
    ORDER BY day
    """,
    tags=("events", "growth", "cumulative"),
    doc=(
        "User growth curve: first-activity day per user (one user-keyed "
        "MIN), new-user counts per day, and the cumulative total via a "
        "running sum — the acquisition chart every product review "
        "opens with. The only unpartitioned window runs over the "
        "per-DAY table, bounded by the time span (30 rows/month) "
        "regardless of event volume — the s23 argument; the fact table "
        "contributes exactly one user-keyed aggregation."
    ),
)
def s31_user_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    first_seen = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min(F.date_trunc("day", "ts")).alias("day"))
    )
    per_day = first_seen.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return per_day.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    ).orderBy("day")


@register(
    "s60_pattern_v_shape",
    """
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             LAG(value)  OVER w AS prev_v,
             LEAD(value) OVER w AS next_v
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    hits AS (
      SELECT user_id, event_id, ts,
             prev_v - value AS drop_amt,
             next_v - value AS recover_amt
      FROM ordered
      WHERE prev_v IS NOT NULL AND next_v IS NOT NULL
        AND prev_v - value > 50.0 AND next_v - value > 50.0
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_vshapes,
           CAST(MIN(event_id) AS BIGINT) AS first_event,
           CAST(SUM(CAST(drop_amt + recover_amt AS DECIMAL(18,6))) AS DOUBLE)
             AS total_swing
    FROM hits
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("events", "pattern", "window"),
    doc=(
        "Row-pattern detection (the MATCH_RECOGNIZE-lite family): a "
        "V-shape is a local minimum whose neighbors both sit more than "
        "a threshold above it — detected with one lag/lead pass per "
        "user, no self-joins. Per-user counts, first match, and total "
        "swing (exact decimal sum). At 100 TB this is one user-keyed "
        "window shuffle; fixed-length patterns compile to lag/lead "
        "exactly like this, which is why the engine doesn't need a "
        "MATCH_RECOGNIZE interpreter for them. Deterministic: (ts, "
        "event_id) is a total order per user."
    ),
)
def s60_pattern_v_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.lag("value").over(w).alias("prev_v"),
            F.lead("value").over(w).alias("next_v"),
        )
    )
    hits = ordered.filter(
        F.col("prev_v").isNotNull()
        & F.col("next_v").isNotNull()
        & (F.col("prev_v") - F.col("value") > 50.0)
        & (F.col("next_v") - F.col("value") > 50.0)
    ).select(
        "user_id",
        "event_id",
        (F.col("prev_v") - F.col("value")).alias("drop_amt"),
        (F.col("next_v") - F.col("value")).alias("recover_amt"),
    )
    return (
        hits.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vshapes"),
            F.min("event_id").cast("bigint").alias("first_event"),
            F.sum(
                (F.col("drop_amt") + F.col("recover_amt")).cast("decimal(18,6)")
            )
            .cast("double")
            .alias("total_swing"),
        )
        .orderBy("user_id")
    )


@register(
    "s61_heatmap_2d_bins",
    """
    SELECT CAST(hour(ts) AS BIGINT) AS hod,
           CAST(CASE WHEN value < 0 THEN -1
                     WHEN value >= 500 THEN 10
                     ELSE CAST(floor(value / 50.0) AS BIGINT) END AS BIGINT) AS vband,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY hod, vband
    ORDER BY hod, vband
    """,
    tags=("events", "histogram", "binning"),
    doc=(
        "2-D histogram (hour-of-day x value band) — the heatmap "
        "aggregation behind activity dashboards: fixed-width value "
        "bands with explicit underflow (-1) and overflow (10) bins, "
        "crossed with the 24 hour-of-day cells. One map-side-combinable "
        "aggregate over at most 24x12 cells, so the shuffle payload is "
        "constant regardless of corpus size. floor-based band edges "
        "dodge cross-engine round-half rules; exact decimal sums."
    ),
)
def s61_heatmap_2d_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    vband = (
        F.when(F.col("value") < 0, F.lit(-1))
        .when(F.col("value") >= 500, F.lit(10))
        .otherwise(F.floor(F.col("value") / 50.0))
        .cast("bigint")
    )
    return (
        ev.select(F.hour("ts").cast("bigint").alias("hod"), vband.alias("vband"), "value")
        .groupBy("hod", "vband")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .orderBy("hod", "vband")
    )


@register(
    "s62_state_debounce",
    """
    WITH flagged AS (
      SELECT user_id, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN prev_type IS NULL
                           OR event_type <> prev_type
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN event_type = prev_type
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_debounced
    FROM flagged
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("events", "compression", "window"),
    doc=(
        "State de-bounce (consecutive-duplicate compression): a row "
        "survives only when its state differs from the previous row of "
        "the same user — the standard CDC/log-compaction pre-step that "
        "turns chatty state streams into change records. One lag pass "
        "per user, per-user kept/collapsed counts. The same predicate "
        "filters the actual rows when materializing; the counts here "
        "make the result hash-compact."
    ),
)
def s62_state_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    keep = F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type"))
    return (
        flagged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.sum(F.when(F.col("event_type") == F.col("prev_type"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_debounced"),
        )
        .orderBy("user_id")
    )


@register(
    "s63_user_event_sequences",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           array_to_string((list(event_type ORDER BY ts, event_id))[1:10], '|') AS seq
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("events", "sequence", "feature-assembly"),
    doc=(
        "Ordered per-user event sequences — the feature-assembly shape "
        "for sequence models (each user's behavioral history as one "
        "training example). Spark: "
        "sort_array(collect_list(struct(ts, event_id, type))) then a "
        "projection lambda; the struct sort key makes the assembled "
        "order deterministic regardless of shuffle arrival order, "
        "which is the property that matters at 1000 executors "
        "(collect_list alone is arrival-ordered = nondeterministic). "
        "Truncated to the first 10 events to bound row width; the "
        "full-history variant pairs with r64's packing. The sequence "
        "is emitted as a canonical '|'-joined string (the s79/s05 "
        "pattern): array-typed output columns are not canonicalizable "
        "by the driver's hash gate (round-6 verdict #1)."
    ),
)
def s63_user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    seq = F.slice(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s["event_type"],
        ),
        1,
        10,
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.array_join(seq, "|").alias("seq"),
        )
        .orderBy("user_id")
    )


@register(
    "s65_scd2_point_in_time",
    """
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             LAG(event_type) OVER w AS prev_type,
             LAG(1) OVER w AS prev_seen
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT user_id, event_id, ts, event_type FROM ordered
      WHERE prev_seen IS NULL OR prev_type IS DISTINCT FROM event_type
    ),
    ranges AS (
      SELECT user_id, event_type, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM changes
    ),
    days AS (
      SELECT unnest(generate_series(
        date_trunc('day', (SELECT MIN(ts) FROM events)) + INTERVAL 1 DAY,
        date_trunc('day', (SELECT MAX(ts) FROM events)),
        INTERVAL 1 DAY)) AS d
    )
    SELECT d, event_type, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM days JOIN ranges
      ON valid_from <= d AND (valid_to IS NULL OR d < valid_to)
    GROUP BY d, event_type
    ORDER BY d, event_type
    """,
    tags=("events", "scd2", "temporal-join", "as-of"),
    doc=(
        "SCD2 point-in-time join — the consumption side of r75's "
        "dimension history: at every midnight in the data span, count "
        "users per current state by probing the half-open validity "
        "ranges with `valid_from <= T AND (valid_to IS NULL OR T < "
        "valid_to)`. Scale shape: the probe grid is span-bounded tiny "
        "and broadcasts against the range table (classified "
        "scalar-broadcast BNLJ), so the history table never shuffles "
        "for the lookup — exactly how a warehouse answers 'state of "
        "the world at time T' against billions of SCD2 rows; a "
        "per-probe-heavy variant would range-bucket the join like "
        "q53. Deterministic: ranges come from a totally-ordered "
        "change log."
    ),
)
def s65_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import scd2_ranges

    ev = t(spark, sf_dir, "events")
    ranges = scd2_ranges(
        ev.select("user_id", "event_id", "ts", "event_type"),
        key_cols=["user_id"],
        attr_col="event_type",
        ts_col="ts",
        tiebreak="event_id",
    ).select("user_id", "event_type", "valid_from", "valid_to")
    days = (
        ev.agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
        .select(
            F.explode(
                F.expr(
                    "sequence(date_trunc('DAY', mn) + INTERVAL 1 DAY, "
                    "date_trunc('DAY', mx), INTERVAL 1 DAY)"
                )
            ).alias("d")
        )
    )
    joined = ranges.join(
        F.broadcast(days),
        (F.col("valid_from") <= F.col("d"))
        & (F.col("valid_to").isNull() | (F.col("d") < F.col("valid_to"))),
    )
    return (
        joined.groupBy("d", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("d", "event_type")
    )


@register(
    "s67_event_type_pmi",
    """
    WITH per_user AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    n_users AS (
      SELECT COUNT(DISTINCT user_id) AS nu FROM events
    ),
    singles AS (
      SELECT event_type, COUNT(*) AS c FROM per_user GROUP BY event_type
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS cab
      FROM per_user a JOIN per_user b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT p.type_a, p.type_b,
           CAST(p.cab AS BIGINT) AS n_both,
           ln((CAST(p.cab AS DOUBLE) * nu.nu)
              / (CAST(sa.c AS DOUBLE) * CAST(sb.c AS DOUBLE))) AS pmi
    FROM pairs p
    JOIN singles sa ON sa.event_type = p.type_a
    JOIN singles sb ON sb.event_type = p.type_b
    CROSS JOIN n_users nu
    ORDER BY type_a, type_b
    """,
    tags=("events", "stats", "pmi", "co-occurrence"),
    doc=(
        "Pointwise mutual information between event types, with users "
        "as the co-occurrence context — the association statistic "
        "behind co-occurrence embeddings and market-basket lift. Scale "
        "shape: the context collapses to DISTINCT (user, type) first "
        "(type cardinality is small and bounded, so the per-user pair "
        "expansion is at most C(|types|,2), never event-count "
        "quadratic), then one pair count plus broadcast singles/total. "
        "PMI evaluates in identically-spelled IEEE doubles over exact "
        "integer counts — bit-reproducible."
    ),
)
def s67_event_type_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    per_user = ev.select("user_id", "event_type").distinct()
    n_users = ev.agg(F.countDistinct("user_id").alias("nu"))
    singles = per_user.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    a, b = per_user.alias("a"), per_user.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("cab"))
    )
    sa = singles.select(F.col("event_type").alias("type_a"), F.col("c").alias("ca"))
    sb = singles.select(F.col("event_type").alias("type_b"), F.col("c").alias("cb"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            F.col("cab").cast("bigint").alias("n_both"),
            F.log(
                (F.col("cab").cast("double") * F.col("nu"))
                / (F.col("ca").cast("double") * F.col("cb").cast("double"))
            ).alias("pmi"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "t65_conversion_window_curve",
    """
    WITH su AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
      SELECT su.user_id,
             date_diff('day', CAST(su.signup_ts AS DATE),
                       CAST(min(e.ts) AS DATE)) AS lag_days
      FROM su JOIN events e
        ON e.user_id = su.user_id
       AND e.event_type = 'purchase' AND e.ts >= su.signup_ts
      GROUP BY su.user_id, su.signup_ts
    ),
    grid AS (SELECT unnest(range(1, 15)) AS k),
    tot AS (SELECT COUNT(*) AS n_signups FROM su)
    SELECT CAST(g.k AS INT) AS within_days,
           CAST(SUM(CASE WHEN c.lag_days <= g.k THEN 1 ELSE 0 END)
                AS BIGINT) AS n_converted,
           CAST(SUM(CASE WHEN c.lag_days <= g.k THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(t.n_signups AS DOUBLE)
             AS conversion_rate
    FROM grid g
    CROSS JOIN tot t
    LEFT JOIN conv c ON TRUE
    GROUP BY g.k, t.n_signups
    ORDER BY within_days
    """,
    tags=("events", "funnel", "latency"),
    doc=(
        "Conversion-window curve: the share of signed-up users whose "
        "FIRST post-signup purchase lands within k days, for k = "
        "1..14 - the latency dimension of the funnel that rate-only "
        "views (q99, s02, s18) cannot show, and the number that sets "
        "attribution windows and activation SLAs ('80% of converters "
        "convert within N days' => window = N). Per-user firsts are "
        "two keyed collapses and one equi-join; the cumulative curve "
        "is the constant 14-row grid against the bounded per-user "
        "lag table. All counts exact integers; rates one IEEE "
        "division against the signup denominator."
    ),
)
def t65_conversion_window_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    su = ev.filter(F.col("event_type") == "signup").groupBy(
        "user_id"
    ).agg(F.min("ts").alias("signup_ts"))
    conv = (
        su.join(
            ev.filter(F.col("event_type") == "purchase").select(
                F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
            ),
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") >= F.col("signup_ts")),
        )
        .groupBy("user_id", "signup_ts")
        .agg(
            F.datediff(
                F.to_date(F.min("p_ts")), F.to_date(F.col("signup_ts"))
            ).alias("lag_days")
        )
    )
    grid = spark.range(1, 15).select(F.col("id").alias("k"))
    tot = su.agg(F.count(F.lit(1)).alias("n_signups"))
    joined = (
        F.broadcast(grid)
        .crossJoin(F.broadcast(tot))
        .join(conv, F.lit(True), "left")
    )
    hit = F.sum(
        F.when(F.col("lag_days") <= F.col("k"), 1).otherwise(0)
    )
    return (
        joined.groupBy("k", "n_signups")
        .agg(
            hit.cast("bigint").alias("n_converted"),
            # try_divide: zero signups must yield NULL rates (DuckDB
            # x/0), not an ANSI DIVIDE_BY_ZERO abort
            F.try_divide(
                hit.cast("double"), F.col("n_signups").cast("double")
            ).alias("conversion_rate"),
        )
        .select(
            F.col("k").cast("int").alias("within_days"),
            "n_converted",
            "conversion_rate",
        )
        .orderBy("within_days")
    )


@register(
    "t68_interval_union_coverage",
    """
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL 5 MINUTE AS e
      FROM events
    ),
    walk AS (
      SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prev_max_e
      FROM iv
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                  THEN 1 ELSE 0 END AS is_new
      FROM walk
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY s, e
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    ),
    merged AS (
      SELECT user_id, island,
             date_diff('microseconds', MIN(s), MAX(e)) AS dur_us
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           COUNT(*) AS n_intervals,
           CAST(SUM(dur_us) // 1000000 AS BIGINT) AS covered_seconds
    FROM merged
    GROUP BY user_id ORDER BY user_id
    """,
    tags=("events", "intervals", "operator"),
    doc=(
        "Per-user interval union: merge each user's overlapping "
        "5-minute activity intervals and report the count of merged "
        "spans and total COVERED time - the interval-algebra operator "
        "behind billable-time, exposure, and uptime metrics, where "
        "naively summing interval lengths double-counts overlaps. "
        "The merge is the running-max sweep: an interval starts a new "
        "island iff its start exceeds the max end of all predecessors "
        "(per user, ordered (s, e) - deterministic under duplicate "
        "timestamps), islands labeled by a cumulative flag sum - "
        "O(n log n) partitioned windows, never an interval self-join. "
        "Timestamps are exact micros; durations integer microseconds "
        "floored to seconds identically on both engines."
    ),
)
def t68_interval_union_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e"),
    )
    wuser = W.partitionBy("user_id").orderBy("s", "e")
    walk = iv.select(
        "user_id",
        "s",
        "e",
        F.max("e")
        .over(wuser.rowsBetween(W.unboundedPreceding, -1))
        .alias("prev_max_e"),
    )
    flagged = walk.select(
        "user_id",
        "s",
        "e",
        F.when(
            F.col("prev_max_e").isNull()
            | (F.col("s") > F.col("prev_max_e")),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    islands = flagged.select(
        "user_id",
        "s",
        "e",
        F.sum("is_new")
        .over(wuser.rowsBetween(W.unboundedPreceding, 0))
        .alias("island"),
    )
    merged = islands.groupBy("user_id", "island").agg(
        (
            F.unix_micros(F.max("e")) - F.unix_micros(F.min("s"))
        ).alias("dur_us")
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.floor(F.sum("dur_us") / 1000000)
            .cast("bigint")
            .alias("covered_seconds"),
        )
        .orderBy("user_id")
    )


@register(
    "t72_entry_type_bounce",
    """
    WITH gaps AS (
      SELECT user_id, event_id, event_type, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                       > 1800000000
                  OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, event_type, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps
    ),
    numbered AS (
      SELECT user_id, sid, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, sid
                                ORDER BY ts, event_id) AS rn
      FROM sessions
    ),
    per_session AS (
      SELECT user_id, sid,
             MIN(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
             COUNT(*) AS n_events
      FROM numbered GROUP BY user_id, sid
    )
    SELECT entry_type,
           COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bounces,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS bounce_rate,
           CAST(SUM(n_events) AS DOUBLE) / COUNT(*)
             AS avg_session_events
    FROM per_session
    GROUP BY entry_type ORDER BY entry_type
    """,
    tags=("events", "sessionize", "web-analytics"),
    doc=(
        "Entry-type bounce analysis: sessionize (q51's 30-minute "
        "lag-gap, microsecond-exact), take each session's ENTRY "
        "event type (first by (ts, event_id) - deterministic under "
        "timestamp ties), and report per entry type the bounce rate "
        "(single-event sessions) and mean session depth - the "
        "landing-page quality census of web analytics, repurposed "
        "here to show which entry behaviors retain engagement. "
        "the oracle takes the rn=1 row per session where Spark uses "
        "min_by over a (ts, event_id) struct - same total order; counts exact "
        "integers, rates one IEEE division. Partitioned windows "
        "only - fully scalable."
    ),
)
def t72_entry_type_bounce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.temporal import sessionize

    ev = t(spark, sf_dir, "events")
    sessions = sessionize(
        ev.select("user_id", "event_id", "event_type", "ts"), id_col="sid"
    ).select("user_id", "event_type", "ts", "event_id", "sid")
    per_session = sessions.groupBy("user_id", "sid").agg(
        F.min_by(
            "event_type", F.struct("ts", "event_id")
        ).alias("entry_type"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return (
        per_session.groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            bounce.cast("bigint").alias("n_bounces"),
            (bounce.cast("double") / F.count(F.lit(1))).alias(
                "bounce_rate"
            ),
            (
                F.sum("n_events").cast("double") / F.count(F.lit(1))
            ).alias("avg_session_events"),
        )
        .orderBy("entry_type")
    )


@register(
    "t91_event_order_violations",
    """
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END)
               AS first_signup,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               AS first_purchase,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               AS first_view
      FROM events GROUP BY user_id
    )
    SELECT 'purchase_before_signup' AS violation,
           CAST(SUM(CASE WHEN first_purchase IS NOT NULL
                          AND first_signup IS NOT NULL
                          AND first_purchase < first_signup
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_users
    FROM firsts
    UNION ALL
    SELECT 'purchase_before_view',
           CAST(SUM(CASE WHEN first_purchase IS NOT NULL
                          AND first_view IS NOT NULL
                          AND first_purchase < first_view
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM firsts
    UNION ALL
    SELECT 'purchase_without_signup',
           CAST(SUM(CASE WHEN first_purchase IS NOT NULL
                          AND first_signup IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM firsts
    ORDER BY violation
    """,
    tags=("events", "data-quality", "audit"),
    doc=(
        "Event-order violation audit: users whose first purchase "
        "precedes their first signup or first view, or who purchase "
        "without ever signing up - impossible under the product's "
        "nominal funnel, so nonzero counts indicate instrumentation "
        "bugs (missing events, clock skew, backfilled ids) that "
        "silently corrupt every funnel/attribution metric downstream "
        "(q99, s02, s18, t65). The causal-ordering member of the DQ "
        "family (r48 column rules, t64 referential integrity). One "
        "user-level collapse of conditional firsts; exact timestamp "
        "comparisons."
    ),
)
def t91_event_order_violations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).alias("first_signup"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
    )

    def row(name, cond):
        return firsts.agg(
            F.lit(name).alias("violation"),
            F.sum(F.when(cond, 1).otherwise(0))
            .cast("bigint")
            .alias("n_users"),
        )

    fp, fs, fv = (
        F.col("first_purchase"),
        F.col("first_signup"),
        F.col("first_view"),
    )
    return (
        row(
            "purchase_before_signup",
            fp.isNotNull() & fs.isNotNull() & (fp < fs),
        )
        .unionAll(
            row(
                "purchase_before_view",
                fp.isNotNull() & fv.isNotNull() & (fp < fv),
            )
        )
        .unionAll(
            row("purchase_without_signup", fp.isNotNull() & fs.isNull())
        )
        .orderBy("violation")
    )
