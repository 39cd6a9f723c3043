"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics the built-in windowed aggregates can't express (running
totals that must be re-emitted every micro-batch, custom eviction
logic, per-key accumulators with arbitrary Python state), Structured
Streaming exposes Arrow-batched grouped-map state
(``applyInPandasWithState``). State lives in the streaming state store
(RocksDB/HDFS-backed on a cluster), partitioned by the grouping key —
per-key state is the unit of scale, so a 100 TB/day stream shards
across executors by key hash exactly like a shuffle.

The reference engine has no streaming at all (SURVEY.md §2.9); this is
part of the Structured Streaming extension surface. The batch
equivalence check lives in tests/test_streaming.py: final per-user
state must equal the batch groupBy aggregate over the same bounded
input.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _totals_schema(key_field: StructField) -> StructType:
    return StructType(
        [
            key_field,
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )


def running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    time_col: str = "ts",
    watermark: str = "1 day",
) -> DataFrame:
    """Per-key running (count, sum) maintained across micro-batches.

    Each micro-batch updates the key's accumulator in the state store
    and emits the new running totals — the streaming analogue of a
    continuously-refreshed ``GROUP BY key`` dashboard. Output mode is
    ``update``: downstream sinks see one refreshed row per key per
    batch in which the key appeared.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value": [total]}
        )

    out_schema = _totals_schema(events.schema[key_col])
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_WELFORD_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
        StructField("n_alerts", LongType()),
    ]
)


def welford_anomalies(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    time_col: str = "ts",
    watermark: str = "1 day",
    z_threshold: float = 3.0,
    min_history: int = 10,
) -> DataFrame:
    """Streaming per-key anomaly detection with Welford online moments.

    Each key's state carries (count, mean, M2) — Welford's numerically
    stable single-pass variance recurrence — updated row-by-row inside
    the Arrow batch; a row is flagged when it sits more than
    ``z_threshold`` standard deviations from the mean of the PRIOR
    history (never including itself) once ``min_history`` rows have
    been seen. Emits the refreshed per-key summary each batch (update
    mode). The state is three scalars per key regardless of stream
    length — the constant-memory property that makes this shape safe
    on an unbounded 100 TB/day stream, vs. the batch r56 z-score that
    windows over stored history.

    ``min_history`` must be >= 2: the z-score needs a sample variance,
    and ``m2 / (n - 1)`` is undefined at n = 1. A perfectly constant
    prior history (variance 0) has no defined z-score, so deviations
    from it do NOT alert; NULL values are skipped (never folded into
    the running state).
    """
    if min_history < 2:
        raise ValueError(
            "min_history must be >= 2 (sample variance is undefined "
            f"before the second observation); got {min_history}"
        )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, mean, m2, n_alerts = (
            state.get if state.exists else (0, 0.0, 0.0, 0)
        )
        # Concatenate BEFORE sorting: a key whose micro-batch exceeds
        # the Arrow chunk size arrives as multiple frames, and sorting
        # each independently leaves the state transitions dependent on
        # shuffle arrival order ACROSS chunks — the nondeterminism the
        # sort exists to prevent (round-7 review).
        chunks = [p for p in pdfs if len(p)]
        pdf = pd.concat(chunks, ignore_index=True) if chunks else None
        if pdf is not None:
            # event-time order within the batch: state transitions must
            # not depend on shuffle arrival order. A stable sort keeps
            # arrival order among equal timestamps; event_id joins the
            # key only when the stream carries one (other schemas are
            # legal — this operator is parameterized on its columns).
            sort_cols = [time_col] + (
                ["event_id"] if "event_id" in pdf.columns else []
            )
            pdf = pdf.sort_values(sort_cols, kind="mergesort")
            vals = pdf[value_col].astype(float)
            # NULL/NaN values are SKIPPED, not folded into the state: a
            # single NaN would poison mean/m2 forever (every later
            # comparison False, alerts frozen) — mirroring how
            # running_totals' pandas sum skips NaN.
            for v in vals[vals.notna()]:
                if n >= min_history:
                    var = m2 / (n - 1)
                    # var == 0 (perfectly constant prior history) gives
                    # no defined z-score; such deviations are not
                    # z-anomalies and do not alert — by design.
                    if var > 0 and abs(v - mean) > z_threshold * var**0.5:
                        n_alerts += 1
                n += 1
                delta = v - mean
                mean += delta / n
                m2 += delta * (v - mean)
        state.update((n, mean, m2, n_alerts))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n": [n],
                "mean": [mean],
                "m2": [m2],
                "n_alerts": [n_alerts],
            }
        )

    out_schema = StructType(
        [
            events.schema[key_col],
            StructField("n", LongType()),
            StructField("mean", DoubleType()),
            StructField("m2", DoubleType()),
            StructField("n_alerts", LongType()),
        ]
    )
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=_WELFORD_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
