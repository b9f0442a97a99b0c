"""Watermarked event-time windowed aggregation over streaming turns.

Completes the streaming surface (incremental extraction, stateful
sessionization, and — here — event-time windows with late-data
handling): per-conversation turn counts in tumbling windows, with a
watermark bounding how late a turn may arrive and still amend its
window. Append mode only emits a window once the watermark passes its
end, so downstream consumers never see a window twice — the classic
exactly-once rollup for feeding incremental KG statistics.

At scale: state is (window x conv_id) — bounded by the watermark
horizon, evicted automatically; the shuffle key matches the batch
pipeline's conv_id partitioning.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mms_rdf_spark.streaming.incremental import TRANSCRIPT_DDL


def windowed_turn_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> StreamingQuery:
    """Tumbling event-time windows of turn counts per conversation.

    Output rows: (conv_id, window_start, window_end, n_turns,
    n_tool_turns). Turns later than `watermark` behind the max seen
    event time are dropped (counted against the window they can no
    longer amend) — the documented late-data contract."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .parquet(input_dir)
        # watermark needs a TZ-typed event-time column
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
    )
    agg = (
        stream.groupBy(F.window("ts", window).alias("w"), F.col("conv_id"))
        .agg(F.count(F.lit(1)).alias("n_turns"),
             F.count(F.when(F.col("role") == "tool", 1)).alias("n_tool_turns"))
        .select("conv_id",
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "n_turns", "n_tool_turns")
    )
    return (
        agg.writeStream
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def session_windowed_turn_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> StreamingQuery:
    """Per-conversation SESSION windows via the built-in
    `session_window` (dynamic gap-based windows that merge as turns
    arrive): (conv_id, session_start, session_end, n_turns).

    This is the engine-managed counterpart to the custom
    applyInPandasWithState sessionizers (stateful.py): sessions CLOSE by
    event-time watermark — deterministic, replay-safe, and AvailableNow
    drains terminate (unlike the processing-time-TTL variant, NOTES §4)
    — at the price of session semantics fixed to gap-merge on one
    event-time column. State per (conv_id, open session) merges as the
    watermark advances; append emits each session exactly once after it
    can no longer grow."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .parquet(input_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
    )
    agg = (
        stream.groupBy(F.session_window("ts", gap).alias("w"),
                       F.col("conv_id"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select("conv_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_turns")
    )
    return (
        agg.writeStream
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
