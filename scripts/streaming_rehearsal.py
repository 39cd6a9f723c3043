#!/usr/bin/env python
"""Streaming-tier scale rehearsal: throughput + state-store economy.

The batch 100x rehearsal (scale_rehearsal.py) covers the dedup/CC/ANN
tier; this script stresses the Structured Streaming operators the same
way: each pipeline reads a saturating ``rate`` source (millions of
rows/s available; the source backpressures to what the pipeline
sustains), runs for ``--secs`` wall seconds into a ``noop`` sink, and
reports the *measured* steady-state numbers that matter at cluster
scale:

- processedRowsPerSecond (median of the last half of the run's
  micro-batches) — the pipeline's sustained throughput on local[32];
- state rows + state memory from ``stateOperators`` — the number the
  watermark is supposed to BOUND; a pipeline whose state grows with
  stream length instead of with (keys x windows-in-watermark) is a
  100 TB/day outage, which is exactly what this rehearsal exists to
  catch;
- batchDuration — micro-batch scheduling health.

Late data is synthesized by shifting each row's event time back by
``value % 97`` seconds, so watermarks do real eviction work rather
than trailing a monotone clock.

Usage:
    python scripts/streaming_rehearsal.py            # ~5 min total
    python scripts/streaming_rehearsal.py --secs 30  # quicker pass
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F


def rate_events(spark, rows_per_sec: int, n_keys: int) -> DataFrame:
    """Saturating synthetic event stream with artificial lateness."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .load()
        .select(
            (F.col("timestamp") - (F.col("value") % 97).cast("int")
             .cast("string").cast("interval second")).alias("ts"),
            (F.col("value") % n_keys).cast("string").alias("key"),
            (F.col("value") % 1000).cast("double").alias("value"),
        )
    )


def run(name: str, stream: DataFrame, secs: int, results: dict,
        output_mode: str = "update") -> None:
    q = (
        stream.writeStream.format("noop")
        .outputMode(output_mode)
        .option("checkpointLocation", f"/tmp/stream_rehearsal_ckpt/{name}")
        .start()
    )
    try:
        time.sleep(secs)
        progresses = [p for p in q.recentProgress if p.get("numInputRows")]
    finally:
        q.stop()
    if not progresses:
        results[name] = {"error": "no progress recorded"}
        return
    tail = progresses[len(progresses) // 2 :]  # steady-state half
    rps = statistics.median(
        p.get("processedRowsPerSecond", 0.0) for p in tail
    )
    batch_ms = statistics.median(
        p["durationMs"].get("triggerExecution", 0) for p in tail
    )
    last = progresses[-1]
    state = last.get("stateOperators") or []
    state_rows = sum(s.get("numRowsTotal", 0) for s in state)
    state_mb = sum(s.get("memoryUsedBytes", 0) for s in state) / 1e6
    results[name] = {
        "rows_per_sec": int(rps),
        "batch_ms": int(batch_ms),
        "batches": len(progresses),
        "state_rows": state_rows,
        "state_mb": round(state_mb, 1),
    }
    print(f"# {name}: {int(rps):,} rows/s, batch {int(batch_ms)} ms, "
          f"state {state_rows:,} rows / {state_mb:.1f} MB "
          f"({len(progresses)} batches)", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=int, default=60)
    ap.add_argument("--rate", type=int, default=2_000_000)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    import shutil

    shutil.rmtree("/tmp/stream_rehearsal_ckpt", ignore_errors=True)

    from xorbits_sql_spark.session import get_spark
    from xorbits_sql_spark.streaming.windows import (
        dedup_stream,
        sessionized_counts,
        tumbling_counts,
    )

    spark = get_spark("streaming-rehearsal")
    results: dict[str, dict] = {}

    # 1-minute tumbling windows, 30s watermark, 10k keys: state must
    # plateau at ~(keys x windows-in-watermark), not grow with time.
    run(
        "tumbling_1m_10k_keys",
        tumbling_counts(
            rate_events(spark, args.rate, 10_000),
            window="1 minute", time_col="ts", key_col="key",
            watermark="30 seconds",
        ),
        args.secs, results,
    )
    # sliding 1m/10s: x6 overlapping windows -> state x6, throughput /~
    run(
        "sliding_1m_slide10s",
        tumbling_counts(
            rate_events(spark, args.rate, 10_000),
            window="1 minute", time_col="ts", key_col="key",
            watermark="30 seconds", slide="10 seconds",
        ),
        args.secs, results,
    )
    # streaming dedup: 50k-key space at rate -> heavy duplicate ratio;
    # dropDuplicatesWithinWatermark must evict at the watermark.
    run(
        "dedup_within_watermark_50k",
        dedup_stream(
            rate_events(spark, args.rate, 50_000),
            keys=["key"], time_col="ts", watermark="30 seconds",
        ),
        args.secs, results, output_mode="append",
    )
    # session windows, 15s gap over 5k keys (session aggregation only
    # supports append output: windows emit once finalized past the
    # watermark)
    run(
        "session_gap15s_5k_keys",
        sessionized_counts(
            rate_events(spark, args.rate, 5_000),
            gap="15 seconds", time_col="ts", key_col="key",
            watermark="30 seconds",
        ),
        args.secs, results, output_mode="append",
    )

    print()
    print("| pipeline | rows/s | batch ms | state rows | state MB |")
    print("| --- | --- | --- | --- | --- |")
    for name, r in results.items():
        if "error" in r:
            print(f"| {name} | {r['error']} | | | |")
            continue
        print(f"| {name} | {r['rows_per_sec']:,} | {r['batch_ms']} "
              f"| {r['state_rows']:,} | {r['state_mb']} |")
    print()
    print(json.dumps({"secs": args.secs, "rate_cap": args.rate,
                      "results": results}))


if __name__ == "__main__":
    main()
