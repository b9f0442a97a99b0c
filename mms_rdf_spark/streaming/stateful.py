"""Stateful streaming sessionization via applyInPandasWithState.

The streaming counterpart of operators/sessionize.py: turns arrive in
file batches; per-conversation state (last timestamp, current session
index) persists in the state store across triggers, so a session that
straddles two micro-batches keeps its index — the custom stateful
operator pattern (Arrow-batched, one Python call per group per
trigger, never per row).

Scale notes: state is keyed by conv_id — the same key the batch
pipeline shuffles on; the store holds two longs per live conversation.
There is no watermark-safe way to CLOSE a conversation (any conv_id
may always speak again), so `streaming_sessionize` retains state;
`streaming_sessionize_ttl` is the production variant that bounds the
store with a processing-time idle timeout (eviction via the
hasTimedOut callback; see its docstring for the restart trade).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mms_rdf_spark.streaming.incremental import TRANSCRIPT_DDL

OUTPUT_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
    StructField("session_idx", IntegerType()),
])

STATE_SCHEMA = StructType([
    StructField("last_sec", LongType()),
    StructField("session_idx", LongType()),
])


def _sessionize_group(gap_seconds: int, idle_timeout_ms: int | None = None):
    def fn(key: tuple, pdfs, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            # idle eviction: the conversation went quiet past the TTL;
            # drop its state so the store stays bounded by the LIVE
            # conversation count (a re-appearing conv_id restarts its
            # session numbering at 0 — the documented TTL trade)
            state.remove()
            return
        last_sec, session_idx = (state.get if state.exists else (None, 0))
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        batch = batch.sort_values("turn_idx")
        secs = (pd.to_datetime(batch["ts"]).astype("int64") // 10**9).tolist()
        out_idx = []
        for sec in secs:
            if last_sec is not None and sec - last_sec > gap_seconds:
                session_idx += 1
            out_idx.append(session_idx)
            last_sec = sec
        state.update((int(last_sec), int(session_idx)))
        if idle_timeout_ms is not None:
            # timers reset on every update; must be re-armed per call
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame({
            "conv_id": conv_id,
            "turn_idx": batch["turn_idx"].astype("int32").values,
            "session_idx": pd.array(out_idx, dtype="int32"),
        })

    return fn


def streaming_sessionize(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
) -> StreamingQuery:
    """AvailableNow stateful sessionization: processes unseen input
    files, emits (conv_id, turn_idx, session_idx) continuing each
    conversation's numbering from the persisted state, then stops."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
        .select("conv_id", "turn_idx", "ts")
    )
    sessions = stream.groupBy("conv_id").applyInPandasWithState(
        _sessionize_group(gap_minutes * 60),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        sessions.writeStream
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def streaming_sessionize_ttl(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    idle_timeout_minutes: float = 24 * 60,
    trigger_seconds: float = 0.5,
) -> StreamingQuery:
    """streaming_sessionize with a PROCESSING-TIME idle timeout — the
    standard shape for an unbounded conversation stream (the deliberate
    round-2 gap, NOTES §4): conversations have no watermark-safe close,
    so instead of retaining state forever the store evicts any
    conversation idle (no new turns observed) longer than
    `idle_timeout_minutes` of wall-clock. The hasTimedOut callback
    fires for expired groups at a trigger where they have no data and
    removes their two-long state row, bounding the store at
    O(live conversations) regardless of total conv_id cardinality —
    the 10^12-turn requirement. Trade (documented + tested): a
    conversation resuming AFTER eviction restarts session numbering at
    0; size the TTL well above the session gap so that only genuinely
    dead conversations pay it. Output/semantics are otherwise
    IDENTICAL to streaming_sessionize and to batch sessionize
    (cross-trigger equality pinned in tests).

    Trigger shape (measured, not assumed): processing-time timers need
    wall-clock triggers, so this is a CONTINUOUS query —
    Trigger.AvailableNow NEVER terminates under ProcessingTimeTimeout
    (the engine keeps scheduling batches to service timers; observed
    live: batchId climbs forever on a drained source). Callers stop()
    it; empty triggers are cheap (offset log only) and are exactly what
    fires eviction for quiet conversations."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
        .select("conv_id", "turn_idx", "ts")
    )
    sessions = stream.groupBy("conv_id").applyInPandasWithState(
        _sessionize_group(gap_minutes * 60,
                          idle_timeout_ms=int(idle_timeout_minutes * 60_000)),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
    return (
        sessions.writeStream
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(processingTime=f"{int(trigger_seconds * 1000)} milliseconds")
        .start()
    )
