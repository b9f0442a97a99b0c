"""Incremental token-count vocabulary: the streaming twin of
`operators.textstats.token_vocab` (twin #17).

A tokenizer build over a growing corpus should not recount the world
per wave: the store keeps ONE table

    counts (token, n, bucket)    exact corpus token counts,
                                 bucket = crc32(token)

moved through the versioned snapshot protocol (streaming/snapshot.py).
Counts are ADDITIVE across waves, so the merge is the dfc pattern from
streaming/index.py: the batch's own counts aggregate map-side, then
only the store rows for tokens PRESENT IN THE BATCH re-aggregate
(bucket-pruned via the touched-bucket write; untouched buckets
hardlink forward). Per-wave cost is O(batch + touched buckets) — never
O(corpus).

`render_vocab` reproduces the batch operator's exact output shape
(token, n, rank) — TakeOrderedAndProject top-k, rank windowed over the
k survivors only — so cumulative-store render == token_vocab on the
concatenated corpus ROW-IDENTICALLY for any wave split (pinned in
tests/test_streaming_vocab.py).

Crash replay of an applied batch id is a no-op (manifest inside the
version dir); a crash before the pointer swap replays against the old
store. Reference scope: the reference has no streaming (SURVEY §2.8);
this extends its vocabulary-construction role the way streaming/index
extends its ES-indexing role.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mms_rdf_spark.streaming import snapshot
from mms_rdf_spark.streaming.snapshot import (
    N_BUCKETS,
    applied_batches,
    bucket_col,
)


def vocab_batch(
    spark: SparkSession,
    docs: DataFrame,
    store_dir: str,
    n_buckets: int = N_BUCKETS,
    text_col: str = "text",
) -> tuple[DataFrame, set[int]]:
    """One incremental step: returns (counts, touched_buckets) — the
    FULL logical counts table to commit and the buckets this batch
    writes. Pure transformation — the caller commits."""
    from mms_rdf_spark.operators.textstats import _toks

    toks = F.coalesce(F.col(text_col), F.lit(""))
    batch_counts = (docs.select(F.explode(_toks(toks)).alias("token"))
                    .groupBy("token")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .withColumn("bucket", bucket_col("token", n_buckets))
                    .localCheckpoint())
    touched = {r.bucket for r in
               batch_counts.select("bucket").distinct().collect()}
    old = snapshot.read_table(spark, store_dir, "counts")
    if old is None:
        return batch_counts, touched
    batch_tokens = batch_counts.select("token")
    hit = (old.join(F.broadcast(batch_tokens), on="token",
                    how="left_semi")
           .unionByName(batch_counts)
           .groupBy("token", "bucket")
           .agg(F.sum("n").cast("long").alias("n"))
           .select("token", "n", "bucket"))
    rest = old.join(F.broadcast(batch_tokens), on="token",
                    how="left_anti")
    return rest.unionByName(hit), touched


def incremental_vocab(
    spark: SparkSession,
    docs_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    n_buckets: int = N_BUCKETS,
) -> StreamingQuery:
    """AvailableNow incremental vocabulary over a growing documents
    table: drains unseen parquet files, commits the enlarged counts
    store atomically. Crash replays are no-ops."""
    os.makedirs(store_dir, exist_ok=True)
    sample = spark.read.parquet(docs_dir)
    stream = (spark.readStream.schema(sample.schema).parquet(docs_dir)
              .select("doc_id", "text"))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch_id in applied_batches(store_dir):
            return
        counts, touched = vocab_batch(spark, batch, store_dir,
                                      n_buckets)
        snapshot.commit(spark, store_dir, batch_id,
                        {"counts": (counts, touched)}, n_buckets)

    return (stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def render_vocab(spark: SparkSession, store_dir: str,
                 k: int = 50) -> DataFrame:
    """(token, n, rank) in textstats.token_vocab's exact output shape:
    top-k by (n desc, token), rank windowed over the k survivors."""
    from pyspark.sql.window import Window

    counts = snapshot.read_table(spark, store_dir, "counts")
    if counts is None:
        raise ValueError(f"no committed vocabulary at {store_dir}")
    topk = (counts.select("token", "n")
            .orderBy(F.col("n").desc(), "token").limit(k))
    w = Window.orderBy(F.col("n").desc(), "token")
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))
