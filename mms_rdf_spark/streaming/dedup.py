"""Streaming exact deduplication of incoming documents.

The batch dedup suite (operators/dedup.py) assumes the corpus is at
rest; a live ingestion pipeline needs the same guarantee over files
landing continuously: a document whose content hash was already seen
must not be emitted again. Structured Streaming restatement:

  readStream -> md5 content hash -> dropDuplicatesWithinWatermark
  -> append sink

`dropDuplicatesWithinWatermark` keeps one state row per hash and
expires it once the watermark passes (bounded state — a plain
dropDuplicates would hold every hash forever, which at 10^12 docs is
an unbounded state store). The trade is the standard one: a duplicate
arriving LATER than the watermark delay re-emits; the batch exact pass
downstream is the backstop, exactly the lambda split used for
conversation lists in incremental.py.

Trigger.AvailableNow: each run drains only unseen files (checkpointed
file index + state store), so re-running after new files arrive
processes the delta with exactly-once output.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

DOC_DDL = "doc_id long, text string, ts timestamp"


def streaming_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
) -> StreamingQuery:
    """Drain new document files, emit only first-seen content hashes.

    Output rows: (doc_id, content_hash, ts) — the doc_id kept is the
    first arrival within the watermark window."""
    docs = (spark.readStream.schema(DOC_DDL).parquet(input_dir)
            .withColumn("content_hash", F.md5("text"))
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["content_hash"]))
    q = (docs.select("doc_id", "content_hash", "ts")
         .writeStream
         .format("parquet")
         .option("path", output_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .outputMode("append")
         .start())
    return q
