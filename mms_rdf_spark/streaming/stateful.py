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
may always speak again), so state is retained; a production deployment
bounds the store by switching timeoutConf to ProcessingTimeTimeout and
evicting conversations idle longer than the session gap (the
hasTimedOut branch below already handles the eviction callback).
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


def _sessionize_group(gap_seconds: int):
    def fn(key: tuple, pdfs, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
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
