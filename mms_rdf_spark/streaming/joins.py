"""Watermarked stream-stream interval join.

The last built-in streaming surface the engine exposes: join two live
streams (e.g. tool-call turns against the assistant turns that answer
them) within a bounded event-time window. Spark buffers each side in
state only as long as the watermark + join range require — the
time-range condition is what makes unbounded stream-stream join
feasible, because it gives the engine an eviction rule for both
buffers (state is O(rate x window), not O(history)).

Batch equality is the correctness contract (tests): the same join
predicate over the drained inputs must produce the same rows the
streaming query emitted, and append mode must emit each pair exactly
once.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mms_rdf_spark.streaming.incremental import TRANSCRIPT_DDL


def stream_stream_tool_answers(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> StreamingQuery:
    """Join tool turns (left stream) to same-conversation assistant
    turns (right stream) that arrive within `within` AFTER the tool
    turn. Output: (conv_id, tool_idx, tool_ts_s, answer_idx,
    answer_ts_s, lag_s). Both sides are watermarked so the join state
    evicts: a buffered tool turn can be dropped once the answer-side
    watermark passes tool_ts + within."""
    def read(d):
        return (spark.readStream.schema(TRANSCRIPT_DDL).parquet(d)
                .withColumn("ts", F.col("ts").cast("timestamp"))
                .withWatermark("ts", watermark))

    tool = (read(left_dir)
            .where(F.col("role") == "tool")
            .select(F.col("conv_id"),
                    F.col("turn_idx").alias("tool_idx"),
                    F.col("ts").alias("tool_ts")))
    ans = (read(right_dir)
           .where(F.col("role") == "assistant")
           .select(F.col("conv_id").alias("conv_id_r"),
                   F.col("turn_idx").alias("answer_idx"),
                   F.col("ts").alias("answer_ts")))
    joined = tool.join(
        ans,
        (F.col("conv_id") == F.col("conv_id_r"))
        & (F.col("answer_ts") >= F.col("tool_ts"))
        & (F.col("answer_ts") <= F.col("tool_ts")
           + F.expr(f"INTERVAL {within}")),
    ).select(
        "conv_id", "tool_idx",
        F.unix_timestamp("tool_ts").alias("tool_ts_s"),
        "answer_idx",
        F.unix_timestamp("answer_ts").alias("answer_ts_s"),
        (F.unix_timestamp("answer_ts")
         - F.unix_timestamp("tool_ts")).alias("lag_s"),
    )
    return (joined.writeStream
            .format("parquet")
            .option("path", output_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())
