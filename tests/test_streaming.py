"""Streaming correctness: the streaming tumbling aggregation must equal
the batch q50_events_hourly result on the same bounded data (the
strongest check available for a non-SQL-expressible op)."""

from __future__ import annotations

from .conftest import SF_ORACLE
from .oracle import canonical_rows


def test_stream_hourly_matches_batch(spark):
    from xorbits_sql_spark.queries import load_all

    specs = load_all()
    stream = specs["q80_stream_hourly"].fn(spark, SF_ORACLE).toPandas()
    batch = specs["q50_events_hourly"].fn(spark, SF_ORACLE).toPandas()
    assert canonical_rows(stream) == canonical_rows(batch)


def test_stream_sliding_matches_batch(spark):
    from xorbits_sql_spark.queries import load_all

    specs = load_all()
    stream = specs["q83_stream_sliding"].fn(spark, SF_ORACLE).toPandas()
    batch = (
        specs["q58_events_sliding"].fn(spark, SF_ORACLE)
        .withColumnRenamed("win_start", "hour")
        .toPandas()
    )
    assert canonical_rows(stream) == canonical_rows(batch)


def test_stream_running_totals_matches_batch(spark):
    from pyspark.sql import functions as F

    from xorbits_sql_spark.queries import load_all
    from xorbits_sql_spark.queries._util import t

    specs = load_all()
    got = (
        specs["q82_stream_running_totals"].fn(spark, SF_ORACLE)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    want = (
        t(spark, SF_ORACLE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert (got["n_events"] == want["n_events"]).all()
    # state accumulates in float64 inside pandas; allow rounding slack
    assert (got["total_value"] - want["total_value"]).abs().max() < 1e-6


def test_stream_sessions_rows(spark):
    from xorbits_sql_spark.queries import load_all

    specs = load_all()
    sessions = specs["q81_stream_sessions"].fn(spark, SF_ORACLE).toPandas()
    # one row per (user, session); bounded by event count, at least one per user
    assert 150 <= len(sessions) <= 10_000
    assert (sessions["n_events"] >= 1).all()


def test_upsert_sink_equals_batch_latest(spark, tmp_path):
    """foreachBatch keyed-upsert snapshot == batch latest-by-key over the
    same bounded source (the streaming CDC materialization contract)."""
    from pyspark.sql import functions as F

    from xorbits_sql_spark.queries._util import t
    from xorbits_sql_spark.streaming.sinks import upsert_latest_to_parquet
    from xorbits_sql_spark.streaming.windows import read_parquet_stream

    sf = SF_ORACLE
    out = str(tmp_path / "state")
    stream = read_parquet_stream(spark, f"{sf}/events.parquet").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    upsert_latest_to_parquet(
        stream, out, key_cols=["user_id"], ts_col="ts", tiebreak="event_id",
        checkpoint=str(tmp_path / "ckpt"),
    )
    got = spark.read.parquet(out).toPandas().set_index("user_id").sort_index()

    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    want = (
        t(spark, sf, "events")
        .select("user_id", "event_id", "ts", "event_type", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert len(got) == len(want)
    assert (got["event_id"] == want["event_id"]).all()
    assert (got["value"] == want["value"]).all()


def test_welford_anomalies_match_sequential_reference(spark):
    """Final streaming Welford state per user must equal a sequential
    Python pass over the same rows in (ts, event_id) order — pinning
    the state machine including the prior-history alert predicate."""
    from xorbits_sql_spark.queries import load_all

    got = {
        r["user_id"]: (r["n"], r["mean"], r["m2"], r["n_alerts"])
        for r in load_all()["s68_stream_welford_anomalies"]
        .fn(spark, SF_ORACLE)
        .collect()
    }

    rows = (
        spark.read.parquet(f"{SF_ORACLE}/events.parquet")
        .select("user_id", "event_id", "ts", "value")
        .collect()
    )
    by_user = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(float(r["value"]))
    for uid, values in by_user.items():
        n, mean, m2, alerts = 0, 0.0, 0.0, 0
        for v in values:
            if n >= 10:
                var = m2 / (n - 1)
                if var > 0 and abs(v - mean) > 3.0 * var**0.5:
                    alerts += 1
            n += 1
            delta = v - mean
            mean += delta / n
            m2 += delta * (v - mean)
        gn, gmean, gm2, galerts = got[uid]
        assert (gn, galerts) == (n, alerts), uid
        assert abs(gmean - mean) < 1e-9 and abs(gm2 - m2) < 1e-6, uid


def test_restart_from_checkpoint_exactly_once(spark, tmp_path):
    """Kill a stream mid-corpus and restart it from its checkpoint: the
    file-source offset log plus the file-sink transaction log must
    deliver every input row EXACTLY once across the restart — no loss,
    no re-emission. This is the fault-tolerance contract a 100 TB/day
    pipeline leans on every time an executor or driver dies."""
    from pyspark.sql import functions as F

    from xorbits_sql_spark.queries._util import t

    ev = t(spark, SF_ORACLE, "events")
    inp, out, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)
    half1.write.parquet(inp)
    schema = spark.read.parquet(inp).schema

    def run_phase():
        q = (
            spark.readStream.schema(schema)
            .parquet(inp)
            .select("event_id", "event_type")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    run_phase()
    committed = spark.read.parquet(out).count()
    assert committed == half1.count()
    # the restart must pick up ONLY the new files
    half2.write.mode("append").parquet(inp)
    run_phase()
    got = spark.read.parquet(out)
    total = ev.count()
    assert got.count() == total  # no loss, no duplicates
    assert got.select("event_id").distinct().count() == total


def test_stateful_restart_resumes_window_state(spark, tmp_path):
    """Split the corpus at day 15 across a stop/restart: hourly windows
    pending at shutdown (not yet past the watermark) must flush AFTER
    the restart with batch-equal totals — proving the aggregation state
    store recovers from the checkpoint instead of recounting from
    scratch or emitting partial windows."""
    import datetime

    from pyspark.sql import functions as F

    from xorbits_sql_spark.queries._util import t
    from xorbits_sql_spark.streaming.windows import tumbling_counts

    ev = t(spark, SF_ORACLE, "events")
    d0 = ev.agg(F.min("ts")).first()[0]
    split = d0 + datetime.timedelta(days=15)
    inp, out, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    ev.filter(F.col("ts") < F.lit(split)).write.parquet(inp)
    schema = spark.read.parquet(inp).schema

    def run_phase():
        q = (
            tumbling_counts(spark.readStream.schema(schema).parquet(inp))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    run_phase()
    flushed_p1 = spark.read.parquet(out).count()
    ev.filter(F.col("ts") >= F.lit(split)).write.mode("append").parquet(inp)
    run_phase()

    got = spark.read.parquet(out).toPandas()
    # truth: the same operator evaluated in BATCH mode over everything
    # (withWatermark is a no-op in batch)
    truth = tumbling_counts(ev).toPandas()
    tmap = {
        (r.hour, r.event_type): (r.n, r.total_value)
        for r in truth.itertuples()
    }
    assert len(got) > flushed_p1, "no windows flushed after the restart"
    for r in got.itertuples():
        assert tmap[(r.hour, r.event_type)] == (r.n, r.total_value), (
            "window emitted with partial state after restart: "
            f"{r.hour} {r.event_type}"
        )
    # windows finalized before shutdown must not re-emit (append mode
    # emits each window once; duplicate keys here would mean replay)
    assert len(got) == len({(r.hour, r.event_type) for r in got.itertuples()})


def test_stream_percentiles_match_batch(spark):
    """t52's windowed approx_percentile stream must equal the same
    aggregation run in batch over the same bounded input — pinning
    that the mergeable sketch accumulates identically through
    micro-batch state as in one pass."""
    from pyspark.sql import functions as F

    from xorbits_sql_spark.queries import load_all
    from xorbits_sql_spark.queries._util import t

    specs = load_all()
    got = specs["t52_stream_window_percentiles"].fn(spark, SF_ORACLE).toPandas()
    ev = t(spark, SF_ORACLE, "events")
    want = (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
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
        .orderBy("hour", "event_type")
        .toPandas()
    )
    assert canonical_rows(got) == canonical_rows(want)


def test_welford_skips_null_values(spark):
    """A NULL value must not poison a key's Welford state (NaN mean/m2
    forever, alerts frozen — round-7 review)."""
    import pandas as pd

    from xorbits_sql_spark.streaming.stateful import welford_anomalies
    from xorbits_sql_spark.streaming.windows import run_to_memory

    pdf = pd.DataFrame(
        {
            "user_id": [1] * 6,
            "event_id": list(range(6)),
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:0%d" % i for i in range(6)]
            ),
            "value": [1.0, 2.0, None, 1.5, 2.5, 100.0],
        }
    )
    path = "/tmp/xss_welford_null_test.parquet"
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)
    from xorbits_sql_spark.streaming.windows import read_parquet_stream

    stream = read_parquet_stream(spark, path)
    out = run_to_memory(
        welford_anomalies(stream, min_history=2, z_threshold=3.0),
        mode="update",
    ).toPandas()
    row = out[out["user_id"] == 1].iloc[-1]
    # 5 non-null values folded; the NULL skipped; the 100.0 outlier flagged
    assert row["n"] == 5
    assert not pd.isna(row["mean"]) and not pd.isna(row["m2"])
    assert row["n_alerts"] >= 1


def test_flush_batch_skip_is_result_identical_for_eager_emission(spark):
    """run_to_memory(flush_batch=False) must change the result of an
    eager-emission query NOT AT ALL — only remove the trailing no-data
    micro-batch. Checked on an inner stream-stream join (r84's shape:
    matches emit in the data batch; the watermark only evicts state)."""
    from pyspark.sql import functions as F

    from xorbits_sql_spark.streaming.windows import read_parquet_stream, run_to_memory

    def build_joined():
        views = read_parquet_stream(spark, SF_ORACLE + "/events.parquet")
        purchases = read_parquet_stream(spark, SF_ORACLE + "/events.parquet")
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
            )
            .withWatermark("purchase_ts", "2 hours")
        )
        return v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("purchase_ts") > F.col("view_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")
            ),
        ).select("user_id", "view_ts", "purchase_ts")

    with_flush = run_to_memory(build_joined(), mode="append").toPandas()
    without = run_to_memory(
        build_joined(), mode="append", flush_batch=False
    ).toPandas()
    assert canonical_rows(with_flush) == canonical_rows(without)
    # the conf must be restored after the run
    assert (
        spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
        == "true"
    )
