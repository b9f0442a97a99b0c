"""Streaming corpus curation — the streaming twin of the batch
`operators/curate.py` recipe (the last pipeline family without one;
round-3 verdict stretch #10).

Every quality signal in the batch recipe is pure column math fused
into one projection (score, stop ratio, language id, duplicate-gram
ratio, deterministic split stamp), so it streams unchanged — the ONLY
stateful piece is exact dedup, restated as
`dropDuplicatesWithinWatermark` over the md5 content digest:

  readStream -> fused signal projection (stateless, one scan)
  -> watermarked digest dedup (bounded state: one row per digest,
     expired when the watermark passes)
  -> filters (column math; Catalyst pushes them below the state op
     where legal) -> append sink

Survivor semantics vs batch: the batch recipe keeps the MIN doc_id
per digest; streaming keeps the FIRST ARRIVAL within the watermark
window. On an ingest stream ordered by arrival those coincide; a
duplicate arriving later than the watermark delay re-emits, and the
batch pass downstream is the backstop — the same lambda split
incremental.py documents for conversation lists.

Trigger.AvailableNow + checkpoint = exactly-once: each run drains
only unseen files; re-running after new files land processes the
delta with no re-emission of already-curated documents.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mms_rdf_spark.streaming.dedup import DOC_DDL


def streaming_curate(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    min_score: float = 0.0,
    lang: str = "en",
    dup_threshold: float = 0.3,
    watermark: str = "1 hour",
) -> StreamingQuery:
    """Drain new document files, emit curated survivors:
    (doc_id, score, stop_ratio, dup_ratio, split, ts) — the same
    columns the batch `curate_full` returns, plus the event time."""
    from mms_rdf_spark.operators.curate import (dup_ratio_expr,
                                                lang_pred_expr,
                                                quality_score_expr,
                                                split_expr,
                                                stop_ratio_expr)

    sig = (spark.readStream.schema(DOC_DDL).parquet(input_dir)
           .select("doc_id", "ts",
                   F.md5("text").alias("_ch"),
                   quality_score_expr().alias("score"),
                   stop_ratio_expr().alias("stop_ratio"),
                   lang_pred_expr().alias("lang_pred"),
                   dup_ratio_expr().alias("dup_ratio"),
                   split_expr().alias("split"))
           .withWatermark("ts", watermark)
           .dropDuplicatesWithinWatermark(["_ch"]))
    out = (sig.where((F.col("score") > min_score)
                     & (F.col("lang_pred") == lang)
                     & (F.col("dup_ratio") <= dup_threshold))
           .select("doc_id", "score", "stop_ratio", "dup_ratio",
                   "split", "ts"))
    return (out.writeStream
            .format("parquet")
            .option("path", output_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())
