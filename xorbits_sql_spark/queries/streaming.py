"""Streaming query inventory entries (rows-only correctness checks).

Structured Streaming results can't be expressed as DuckDB SQL, so these
entries omit oracles — the driver records a rows-only check. Full
correctness is still verified: tests/test_streaming.py asserts the
streaming tumbling aggregation equals the batch q50_events_hourly
result on the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register
from ..streaming.windows import read_parquet_stream, run_to_memory, tumbling_counts


@register(
    "q80_stream_hourly",
    None,  # non-SQL-expressible: Structured Streaming execution
    tags=("streaming", "time-window"),
    doc="Streaming tumbling-window counts over events, driven to completion on the bounded parquet source.",
)
def q80_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    agg = tumbling_counts(stream, window="1 hour")
    return run_to_memory(agg, mode="complete").orderBy("hour", "event_type")


@register(
    "q81_stream_sessions",
    None,  # non-SQL-expressible: session_window streaming state
    tags=("streaming", "sessionize"),
    doc="Streaming session windows (30 min gap) per user on the bounded events stream.",
)
def q81_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import sessionized_counts

    stream = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    agg = sessionized_counts(stream, gap="30 minutes")
    return run_to_memory(agg, mode="complete").orderBy("user_id", "session_start")
