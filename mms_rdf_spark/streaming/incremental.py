"""Incremental (streaming) triple extraction.

The reference is strictly batch (SURVEY.md §2.8); its closest
incremental behavior is the amend loop. The north rule likewise needs
batch + resume, not event-time processing. This module exists for the
operational pattern a 10^12-turn corpus actually needs: NEW transcript
files landing continuously, extracted incrementally without
reprocessing history.

Structured Streaming with Trigger.AvailableNow: each run picks up only
unseen input files (checkpointed file index), runs the SAME fused
extraction plan (stateless, so fully streaming-compatible), and
appends to the triples table. Conversation-level list triples need the
global per-conversation window, so they are recomputed in the batch
amend/materialize stages — the classic lambda split, chosen because a
stateful streaming window over unbounded conversations would hold every
conv_id forever (no watermark can close a conversation).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

TRANSCRIPT_DDL = ("conv_id string, turn_idx int, role string, "
                  "text string, tool string, ts timestamp")


def incremental_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start an AvailableNow incremental extraction: processes files
    not yet recorded in the checkpoint, appends turn-level triples to
    `output_dir`, then stops. Re-running after new files arrive
    processes only the delta (exactly-once via the checkpoint)."""
    from mms_rdf_spark.operators.extract import extract_triples

    stream = (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    # extract_triples' turn-level plan is stateless; the conversation
    # window is batch-only, so restrict to the streamable subset.
    triples = extract_triples(spark, stream, include_conversations=False)
    return (
        triples.writeStream
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
