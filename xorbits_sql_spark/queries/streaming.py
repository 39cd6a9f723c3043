"""Streaming query inventory entries.

Most entries here carry FULL DuckDB value oracles: a bounded file
stream driven to completion produces a deterministic final result
(finalized windows, converged CDC snapshots), which plain batch SQL can
mirror — so hash-grade verification applies. Only operators whose
output depends on arrival order or per-batch float accumulation
(s68's Welford state) genuinely can't be expressed as DuckDB SQL and
register ``oracle=None`` (the driver records a rows-only check; their
output schemas are pinned in tests/test_oracle_parity.py). Multi-batch
behavior is additionally pinned by tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import register
from ..streaming.windows import read_parquet_stream, run_to_memory, tumbling_counts


@register(
    "q80_stream_hourly",
    """
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY hour, event_type
    ORDER BY hour, event_type
    """,
    tags=("streaming", "time-window"),
    doc=(
        "Streaming tumbling-window counts over events, driven to "
        "completion on the bounded parquet source. Complete-mode window "
        "aggregates are deterministic (counts and exact-decimal sums "
        "are micro-batch-order-proof), so the streaming result carries "
        "a full DuckDB value oracle stating the same hourly aggregate "
        "in batch SQL."
    ),
)
def q80_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    agg = tumbling_counts(stream, window="1 hour")
    return run_to_memory(agg, mode="complete").orderBy("hour", "event_type")


@register(
    "q82_stream_running_totals",
    None,  # non-SQL-expressible: applyInPandasWithState custom state
    tags=("streaming", "stateful", "pandas-udf"),
    doc=(
        "Custom stateful operator (applyInPandasWithState): per-user "
        "running (count, value-sum) state across micro-batches; final "
        "state checked against the batch aggregate in tests."
    ),
)
def q82_stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import running_totals

    stream = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    totals = running_totals(stream, key_col="user_id", value_col="value")
    # update-mode NoTimeout stateful op: emission is data-driven, the
    # no-data flush batch would emit nothing — skip it (run_to_memory
    # flush_batch contract).
    out = run_to_memory(totals, mode="update", flush_batch=False)
    # update mode re-emits a key each batch it changes; the final state
    # per user is the row with the greatest n_events.
    rn = F.row_number().over(W.partitionBy("user_id").orderBy(F.desc("n_events")))
    return out.withColumn("rn", rn).filter(F.col("rn") == 1).drop("rn").orderBy("user_id")


@register(
    "q83_stream_sliding",
    """
    WITH grid AS (
      SELECT event_type, value,
             TIMESTAMP '1970-01-01 00:00:00'
               + to_seconds(CAST(floor(epoch_us(ts) / 1800000000) AS BIGINT) * 1800
                            - 1800 * k.k) AS hour
      FROM events, (SELECT unnest([0, 1]) AS k) k
    )
    SELECT hour, event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM grid
    GROUP BY hour, event_type
    ORDER BY hour, event_type
    """,
    tags=("streaming", "time-window", "sliding"),
    doc=(
        "Streaming sliding windows (1h every 30min) with watermark; "
        "equals the batch q58 result on the bounded source "
        "(tests/test_streaming.py). The DuckDB oracle replays the "
        "window assignment arithmetically: each event lands in the two "
        "epoch-aligned 30-minute-grid windows that cover it (Spark "
        "aligns window starts to the unix epoch modulo the slide)."
    ),
)
def q83_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    agg = tumbling_counts(stream, window="1 hour", slide="30 minutes")
    return run_to_memory(agg, mode="complete").orderBy("hour", "event_type")


@register(
    "q81_stream_sessions",
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
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    tags=("streaming", "sessionize"),
    doc=(
        "Streaming session windows (30 min gap) per user on the bounded "
        "events stream. Session merging is order-independent, so the "
        "complete-mode result is deterministic and carries a full "
        "DuckDB value oracle: the gaps-and-islands construction q96 "
        "pinned (split at gap >= 30 min), with session_end = last "
        "event + gap, matching session_window's window.end."
    ),
)
def q81_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import sessionized_counts

    stream = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    agg = sessionized_counts(stream, gap="30 minutes")
    return run_to_memory(agg, mode="complete").orderBy("user_id", "session_start")


@register(
    "q88_stream_static_join",
    """
    SELECT n_name, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    JOIN customer ON user_id = c_custkey
    JOIN nation ON n_nationkey = c_nationkey
    WHERE event_type = 'purchase'
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("streaming", "join", "stream-static"),
    doc=(
        "Stream-static join: the event stream enriched against a static "
        "customer->nation dimension (broadcast — re-resolved per "
        "micro-batch, never shuffled) and aggregated per nation. Unlike "
        "the windowed streams, the complete-mode result is deterministic "
        "and SQL-expressible, so this one carries a full DuckDB value "
        "oracle; exact decimal sums make it micro-batch-order-proof."
    ),
)
def q88_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._util import t

    stream = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    dim = (
        t(spark, sf_dir, "customer")
        .join(
            t(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("c_custkey").alias("user_id"), "n_name")
    )
    agg = (
        stream.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(dim), "user_id")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )
    return run_to_memory(agg, mode="complete").orderBy("n_name")


@register(
    "r78_stream_dedup",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_keys
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("streaming", "dedup", "stateful"),
    doc=(
        "Streaming exact dedup (streaming/windows.dedup_stream): "
        "dropDuplicatesWithinWatermark on (user_id, event_type) with "
        "bounded per-key state, append output, then a batch rollup of "
        "the sink. On the bounded single-batch source every duplicate "
        "falls inside the watermark, so the result equals batch "
        "COUNT(DISTINCT user_id) per event_type — giving this stateful "
        "streaming operator a full value oracle instead of a rows-only "
        "check."
    ),
)
def r78_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import dedup_stream

    stream = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    deduped = dedup_stream(
        stream.select("user_id", "event_type", "ts"),
        keys=["user_id", "event_type"],
        watermark="1 hour",
    )
    # dropDuplicatesWithinWatermark emits first occurrences eagerly;
    # the flush batch emits nothing — skip it.
    out = run_to_memory(deduped, mode="append", flush_batch=False)
    return (
        out.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .orderBy("event_type")
    )


@register(
    "r84_stream_stream_join",
    """
    SELECT v.user_id, v.ts AS view_ts, p.ts AS purchase_ts, p.value AS val
    FROM events v
    JOIN events p
      ON p.user_id = v.user_id
     AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    WHERE v.event_type = 'view' AND p.event_type = 'purchase'
    ORDER BY v.user_id, view_ts, purchase_ts
    """,
    tags=("streaming", "join", "stream-stream"),
    doc=(
        "Stream-stream inner join (the Structured Streaming capability "
        "q88's stream-static join doesn't cover): views and purchases "
        "read as two event-time streams, watermarked on both sides, "
        "joined per user within a 1-hour interval condition. The "
        "watermarks plus the time bound let the engine expire buffered "
        "state — the knob that keeps a 100 TB/day two-stream join's "
        "state finite; inner-join matches emit eagerly, so the bounded "
        "run equals the batch interval join and carries a full DuckDB "
        "value oracle (timestamps are microsecond-aligned in both "
        "engines)."
    ),
)
def r84_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    purchases = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    v = (
        views.filter(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "2 hours")
    )
    p = (
        purchases.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("val"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = v.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("user_id", "view_ts", "purchase_ts", "val")
    # inner stream-stream join: matches emit eagerly in the data batch
    # (watermark only evicts state) — the flush batch emits nothing.
    return run_to_memory(joined, mode="append", flush_batch=False).orderBy(
        "user_id", "view_ts", "purchase_ts"
    )


@register(
    "s51_stream_upsert_snapshot",
    """
    SELECT user_id, event_id, ts, event_type, value
    FROM (
      SELECT user_id, event_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) latest
    WHERE rn = 1
    ORDER BY user_id
    """,
    tags=("streaming", "cdc", "upsert", "foreachBatch"),
    doc=(
        "Streaming CDC materialization driven to completion: the "
        "events stream maintains a latest-row-per-user parquet "
        "snapshot via foreachBatch keyed upsert "
        "(streaming/sinks.upsert_latest_to_parquet — the MERGE INTO "
        "pattern with the snapshot as the state store). The final "
        "snapshot is deterministic regardless of micro-batch "
        "boundaries (latest-by (ts, event_id) is associative across "
        "batches), so unlike most streaming entries this one carries a "
        "full DuckDB value oracle. Multi-batch merge behavior is "
        "additionally pinned by tests/test_streaming.py's staged "
        "two-file run."
    ),
)
def s51_stream_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from ..streaming.sinks import upsert_latest_to_parquet

    # Deterministic per-(sf_dir, process) work dir, wiped before each
    # run (fresh CDC state, no stale merge): mkdtemp leaked one
    # snapshot + checkpoint per INVOCATION, and the bench protocol
    # re-runs the suite indefinitely (median-of-3 anchors, A/B
    # adjudication) — now bounded at one dir per process. The pid
    # component keeps concurrent sessions (bench overlapping a test
    # run) from rmtree'ing each other's live checkpoint mid-stream.
    base = os.path.join(
        tempfile.gettempdir(),
        "xss_upsert_%s_%d"
        % (hashlib.md5(sf_dir.encode()).hexdigest()[:12], os.getpid()),
    )
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    snap = os.path.join(base, "snapshot")
    stream = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    upsert_latest_to_parquet(
        stream,
        snap,
        key_cols=["user_id"],
        ts_col="ts",
        tiebreak="event_id",
        checkpoint=os.path.join(base, "ck"),
    )
    return (
        spark.read.parquet(snap)
        .select("user_id", "event_id", "ts", "event_type", "value")
        .orderBy("user_id")
    )


@register(
    "s56_stream_append_finalized",
    """
    WITH agg AS (
      SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY date_trunc('hour', ts), event_type
    ),
    wm AS (
      SELECT MAX(ts) - INTERVAL 30 MINUTE AS w FROM events
    )
    SELECT hour, event_type, n, total_value
    FROM agg, wm
    WHERE hour + INTERVAL 1 HOUR <= w
    ORDER BY hour, event_type
    """,
    tags=("streaming", "time-window", "watermark", "append-mode"),
    doc=(
        "Append-mode watermarked windows — the mode a 100 TB/day "
        "production pipeline actually runs, because complete mode "
        "re-emits all state every batch: each hourly window is emitted "
        "exactly once, when the 30-minute watermark passes its end, "
        "and late rows beyond the watermark would be dropped. On the "
        "bounded source the final watermark is max(ts) - 30min, so the "
        "emitted set is exactly the windows whose end precedes it — "
        "deterministic, hence a full DuckDB value oracle (the oracle "
        "states the finalization predicate explicitly). Complements "
        "q80 (complete mode, all windows) with the state-eviction "
        "semantics that make streaming aggregation memory-bounded."
    ),
)
def s56_stream_append_finalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    agg = tumbling_counts(stream, window="1 hour", watermark="30 minutes")
    return run_to_memory(agg, mode="append").orderBy("hour", "event_type")


@register(
    "s68_stream_welford_anomalies",
    None,  # custom stateful operator: the per-row Welford recurrence is
    # order-dependent inside the state machine; equivalence with a
    # sequential Python reference is pinned in tests/test_streaming.py
    tags=("streaming", "stateful", "pandas-udf", "anomaly"),
    doc=(
        "Streaming per-user anomaly detection with constant-size state "
        "(streaming/stateful.welford_anomalies): Welford (count, mean, "
        "M2) per key, alerts when a value sits beyond 3 sigma of the "
        "PRIOR history. Three scalars per key regardless of stream "
        "length — the memory-bounded streaming counterpart of the "
        "batch r56 rolling z-score. Final per-user state is checked "
        "against a sequential reference implementation in tests."
    ),
)
def s68_stream_welford_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W2

    from ..streaming.stateful import welford_anomalies

    stream = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    # update-mode NoTimeout stateful op: data-driven emission, the
    # flush batch emits nothing — skip it.
    out = run_to_memory(
        welford_anomalies(stream, key_col="user_id", value_col="value"),
        mode="update",
        flush_batch=False,
    )
    # update mode re-emits a key each batch; final state = greatest n.
    rn = F.row_number().over(W2.partitionBy("user_id").orderBy(F.desc("n")))
    return out.withColumn("rn", rn).filter(F.col("rn") == 1).drop("rn").orderBy("user_id")


@register(
    "s91_stream_stream_left_join",
    """
    SELECT v.user_id, v.ts AS view_ts, p.ts AS purchase_ts, p.value AS val
    FROM (SELECT * FROM events
          WHERE event_type = 'view'
            AND ts < TIMESTAMP '2024-01-28') v
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = v.user_id
     AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    ORDER BY v.user_id, view_ts, purchase_ts NULLS FIRST
    """,
    tags=("streaming", "join", "stream-stream", "outer"),
    doc=(
        "Stream-stream LEFT OUTER join — the capability beyond r84's "
        "inner join: views with NO purchase within the hour must emit a "
        "null-padded row, which Structured Streaming can only do once "
        "the watermark passes the view's join window (state eviction "
        "proves no match can still arrive). Determinism contract: the "
        "view side is bounded 3 days clear of the stream tail "
        "(ts < 2024-01-28), because views inside the final "
        "watermark-delay+interval horizon stay buffered forever on a "
        "bounded run — the same append-mode finalization discipline as "
        "s56. With that bound, the no-data flush batch finalizes every "
        "retained view and the result equals the batch LEFT JOIN "
        "bit-for-bit, so this streaming entry carries a FULL DuckDB "
        "value oracle. Both watermarks + the interval bound keep "
        "two-unbounded-stream state finite at any volume."
    ),
)
def s91_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    purchases = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    # The ts bound is applied AFTER withWatermark: predicates on the
    # watermark column are not pushed below the watermark operator, so
    # the watermark tracks the FULL view stream (max ts 2024-01-30) and
    # finalizes every bounded view's null row; filtering before the
    # watermark would cap it at the bound and strand the last
    # delay+interval hours of views in state forever.
    v = (
        views.filter(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "2 hours")
        .filter(F.col("view_ts") < F.lit("2024-01-28").cast("timestamp"))
    )
    p = (
        purchases.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("val"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = v.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    ).select("user_id", "view_ts", "purchase_ts", "val")
    return run_to_memory(joined, mode="append").orderBy(
        "user_id", "view_ts", F.asc_nulls_first("purchase_ts")
    )


@register(
    "t52_stream_window_percentiles",
    None,  # approx_percentile's sketch is Spark-internal; the local
    # streaming==batch equality test is the value check
    tags=("streaming", "percentiles"),
    doc=(
        "Streaming per-hour value percentiles: tumbling event-time "
        "windows aggregating approx_percentile(value, [0.5, 0.9, "
        "0.99]) - the latency/SLA dashboard primitive, computed "
        "incrementally with watermark-bounded state instead of a "
        "nightly batch over raw history. approx_percentile's KLL-ish "
        "sketch is mergeable, which is exactly what makes it legal "
        "inside a streaming aggregation (exact percentiles are not - "
        "they would need unbounded per-window buffers). The sketch is "
        "deterministic for a given dataset, so the local test pins "
        "streaming == batch on the same input; no DuckDB oracle "
        "since the sketch is Spark-internal (rows-only driver "
        "check, like q80-q83)."
    ),
)
def t52_stream_window_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    stream = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    agg = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.expr(
                "approx_percentile(value, array(0.5, 0.9, 0.99), 10000)"
            ).alias("pcts"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            F.col("pcts")[0].alias("p50"),
            F.col("pcts")[1].alias("p90"),
            F.col("pcts")[2].alias("p99"),
            "n",
        )
    )
    return run_to_memory(agg, mode="complete").orderBy(
        "hour", "event_type"
    )
