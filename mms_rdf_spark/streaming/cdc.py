"""Incremental content-defined-chunk store: the streaming twin of
`operators.multimodal.cdc_chunks` + `cdc_dedup_stats` (twin #22).

A blob store's dedup ratio should be monitorable without re-chunking
history per wave: chunking is PER PAYLOAD (a media item never spans
waves), so each wave chunks only its own payloads and the store keeps
two tables moved through the versioned snapshot protocol
(streaming/snapshot.py):

    counts (chunk_hash, length, occ, bucket)   additive occurrence
                                               counts, bucket =
                                               crc32(chunk_hash)
    media  (media_id, bucket)                  media seen so far,
                                               bucket = crc32(id)

The counts merge is the additive dfc pattern (streaming/vocab.py):
batch-side aggregation first, then only store rows whose chunk hashes
appear in the batch re-aggregate (bucket-pruned writes, untouched
buckets hardlink forward). Occurrence counts are NOT idempotent under
replay, so the applied-batch manifest inside the version dir is
load-bearing (the vocab/index discipline, unlike the min-merge twins).

`render_cdc_stats` reproduces cdc_dedup_stats' exact output row, so
cumulative-store render == batch operator over the concatenated media
for any wave split (pinned in tests/test_streaming_cdc.py).

Reference scope: the reference has no streaming (SURVEY §2.8); this
extends the multimodal dedup lane the way streaming/vocab extends the
vocabulary build.
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


def cdc_store_batch(
    spark: SparkSession,
    media: DataFrame,
    store_dir: str,
    min_size: int = 16,
    avg_bits: int = 6,
    max_size: int = 256,
    n_buckets: int = N_BUCKETS,
) -> dict[str, tuple[DataFrame, set[int]]]:
    """One incremental step: returns the snapshot.commit table map
    {counts: (df, touched), media: (df, touched)}. Pure
    transformation — the caller commits."""
    from mms_rdf_spark.operators.multimodal import cdc_chunks

    chunks = cdc_chunks(media, min_size, avg_bits,
                        max_size).localCheckpoint()
    batch_counts = (chunks
                    .groupBy("chunk_hash", "length")
                    .agg(F.count(F.lit(1)).cast("long").alias("occ"))
                    .withColumn("bucket",
                                bucket_col("chunk_hash", n_buckets))
                    .localCheckpoint())
    touched_c = {r.bucket for r in
                 batch_counts.select("bucket").distinct().collect()}
    old = snapshot.read_table(spark, store_dir, "counts")
    if old is None:
        counts = batch_counts.select("chunk_hash", "length", "occ",
                                     "bucket")
    else:
        probe = batch_counts.select("chunk_hash")
        hit = (old.join(F.broadcast(probe), on="chunk_hash",
                        how="left_semi")
               .unionByName(batch_counts)
               .groupBy("chunk_hash", "length", "bucket")
               .agg(F.sum("occ").cast("long").alias("occ"))
               .select("chunk_hash", "length", "occ", "bucket"))
        rest = old.join(F.broadcast(probe), on="chunk_hash",
                        how="left_anti")
        counts = rest.unionByName(hit)

    # media that produced >= 1 chunk — cdc_dedup_stats' n_media is
    # countDistinct over CHUNKS, so empty payloads must not count
    batch_media = (chunks.select("media_id").distinct()
                   .withColumn("_mid_s",
                               F.col("media_id").cast("string"))
                   .withColumn("bucket",
                               bucket_col("_mid_s", n_buckets))
                   .drop("_mid_s")
                   .localCheckpoint())
    touched_m = {r.bucket for r in
                 batch_media.select("bucket").distinct().collect()}
    old_m = snapshot.read_table(spark, store_dir, "media")
    if old_m is None:
        med = batch_media.select("media_id", "bucket")
    else:
        fresh = batch_media.join(old_m.select("media_id"),
                                 on="media_id", how="left_anti")
        med = old_m.select("media_id", "bucket") \
            .unionByName(fresh.select("media_id", "bucket"))
    return {"counts": (counts, touched_c),
            "media": (med, touched_m)}


def incremental_cdc(
    spark: SparkSession,
    data_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    min_size: int = 16,
    avg_bits: int = 6,
    max_size: int = 256,
    n_buckets: int = N_BUCKETS,
) -> StreamingQuery:
    """AvailableNow incremental chunk store over a growing parquet
    media table (media_id, payload): drains unseen files, commits the
    merged store atomically; replays are manifest-guarded no-ops."""
    os.makedirs(store_dir, exist_ok=True)
    sample = spark.read.parquet(data_dir)
    stream = (spark.readStream.schema(sample.schema).parquet(data_dir)
              .select("media_id", "payload"))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch_id in applied_batches(store_dir):
            return
        tables = cdc_store_batch(spark, batch, store_dir, min_size,
                                 avg_bits, max_size, n_buckets)
        snapshot.commit(spark, store_dir, batch_id, tables, n_buckets)

    return (stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def render_cdc_stats(spark: SparkSession, store_dir: str) -> DataFrame:
    """cdc_dedup_stats' exact output row from the committed store."""
    counts = snapshot.read_table(spark, store_dir, "counts")
    media = snapshot.read_table(spark, store_dir, "media")
    if counts is None or media is None:
        raise ValueError(f"no committed CDC store at {store_dir}")
    st = counts.agg(
        F.sum("occ").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("occ") * F.col("length")).cast("long")
        .alias("total_bytes"),
        F.sum("length").cast("long").alias("distinct_bytes"))
    nm = media.agg(F.count(F.lit(1)).cast("long").alias("n_media"))
    st = st.crossJoin(F.broadcast(nm))
    st = st.where(F.col("n_chunks").isNotNull()
                  & (F.col("n_chunks") > 0))
    return st.select(
        "n_media", "n_chunks", "n_distinct", "total_bytes",
        "distinct_bytes",
        F.round(F.col("distinct_bytes") / F.col("total_bytes"), 6)
        .alias("dedup_ratio"))
