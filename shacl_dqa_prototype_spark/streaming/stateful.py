"""Stateful Structured Streaming operators over the events feed.

Two patterns the batch half of the engine doesn't exercise:

* ``session_window`` — Spark's native gap-based session aggregation; the
  same expression works in batch and streaming, so the batch form IS the
  correctness oracle for the streaming form (and is independently
  DuckDB-oracle-able: a session breaks when the gap since the previous
  event is >= the gap duration).
* ``applyInPandasWithState`` — the custom-stateful-operator escape hatch:
  per-user running totals kept in explicit GroupState with a processing-
  time timeout, Arrow-batched (no per-row Python).

Scale notes: both shuffle once on user_id; session_window state is pruned
by the watermark, and the with-state operator's GroupState is O(#users).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from shacl_dqa_prototype_spark.schemas import EVENTS_SCHEMA


def sessionize_session_window(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessions via the built-in session_window — one shuffle on
    (user_id, merged-window). Works on batch AND streaming inputs."""
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select("user_id", F.col("w.start").alias("session_start"),
                "n_events", "total_value")
    )


def stream_events(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def run_streaming_sessionize(
    spark: SparkSession, input_dir: str, gap: str = "30 minutes",
    query_name: str = "sessions",
) -> DataFrame:
    """Drain the events backlog (availableNow) through the streaming
    session_window aggregation into a memory sink and return the result.

    complete output mode: with availableNow the watermark stops short of
    the final sessions (they are within the delay of max event time), so
    append mode would withhold them — complete emits every session.
    """
    q = (
        sessionize_session_window(stream_events(spark, input_dir), gap)
        .writeStream.outputMode("complete")
        .format("memory").queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


# ---------------------------------------------------------------------------
# applyInPandasWithState — custom stateful operator
# ---------------------------------------------------------------------------

USER_TOTALS_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
    StructField("last_ts", TimestampType()),
])
_STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
    StructField("last_ts", TimestampType()),
])


def _make_update_user_totals(idle_timeout_ms: int | None):
    def _update_user_totals(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Arrow-batched per-user accumulator: fold each microbatch's rows
        into GroupState, emit the running totals. Vectorized over the batch
        (len/sum/max per pandas frame — no per-row Python)."""
        if state.hasTimedOut:
            state.remove()
            return
        n, total, last_ts = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = pdf["ts"].max()
            last_ts = mx if last_ts is None else max(last_ts, mx)
        state.update((n, round(total, 6), last_ts))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame({
            "user_id": [key[0]], "n_events": [n],
            "total_value": [round(total, 2)], "last_ts": [last_ts],
        })
    return _update_user_totals


def user_totals_with_state(
    events: DataFrame, idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming per-user running totals with explicit GroupState.

    ``idle_timeout_ms`` evicts idle users' state (ProcessingTimeTimeout) —
    set it on CONTINUOUS deployments to bound state size. Leave None for
    availableNow drains: pending processing-time timeouts keep the query
    alive past the drained data, so a drain would hang until the timeout
    fires (observed: 'state stores falling behind' forever)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_user_totals(idle_timeout_ms),
        outputStructType=USER_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout
                     if idle_timeout_ms else GroupStateTimeout.NoTimeout),
    )


def run_streaming_user_totals(
    spark: SparkSession, input_dir: str, query_name: str = "user_totals",
) -> DataFrame:
    """Drain the backlog through the with-state operator; the LAST update
    emitted per user equals the batch groupBy totals (asserted in tests)."""
    q = (
        user_totals_with_state(stream_events(spark, input_dir))
        .writeStream.outputMode("update")
        .format("memory").queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # one row per user per microbatch → keep the latest (max n_events)
    all_updates = spark.table(query_name)
    return (
        all_updates.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value", "last_ts")).alias("m"))
        .select("user_id", "m.n_events", "m.total_value", "m.last_ts")
    )
