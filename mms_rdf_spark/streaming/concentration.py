"""Incremental activity-concentration store: the streaming twin of
`operators.analytics.gini_concentration` (twin #23).

Bot/crawler concentration should be monitorable per wave without
recounting history: the store keeps ONE table

    counts (key, x, bucket)    exact per-key activity counts,
                               bucket = crc32(key)

moved through the versioned snapshot protocol. Counts are ADDITIVE,
so the merge is the dfc pattern from streaming/vocab.py (batch-side
aggregate, store rows for keys PRESENT IN THE BATCH re-aggregate
bucket-pruned, untouched buckets hardlink forward); the manifest is
load-bearing (occurrence counts are not idempotent under replay).

`render_gini` reproduces gini_concentration's exact output row
(n_keys, gini) — including its link.global_rank ranking — so
cumulative-store render == the batch operator over the concatenated
events for any wave split (pinned in tests/test_streaming_conc.py).

Reference scope: the reference has no streaming (SURVEY §2.8).
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


def conc_batch(
    spark: SparkSession,
    events: DataFrame,
    store_dir: str,
    key: str = "user_id",
    n_buckets: int = N_BUCKETS,
) -> tuple[DataFrame, set[int]]:
    """One incremental step: returns (counts, touched_buckets)."""
    batch = (events.where(F.col(key).isNotNull())
             .groupBy(F.col(key).cast("string").alias("key"))
             .agg(F.count(F.lit(1)).cast("long").alias("x"))
             .withColumn("bucket", bucket_col("key", n_buckets))
             .localCheckpoint())
    touched = {r.bucket for r in
               batch.select("bucket").distinct().collect()}
    old = snapshot.read_table(spark, store_dir, "counts")
    if old is None:
        return batch.select("key", "x", "bucket"), touched
    probe = batch.select("key")
    hit = (old.join(F.broadcast(probe), on="key", how="left_semi")
           .unionByName(batch)
           .groupBy("key", "bucket")
           .agg(F.sum("x").cast("long").alias("x"))
           .select("key", "x", "bucket"))
    rest = old.join(F.broadcast(probe), on="key", how="left_anti")
    return rest.unionByName(hit), touched


def incremental_concentration(
    spark: SparkSession,
    data_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    key: str = "user_id",
    n_buckets: int = N_BUCKETS,
) -> StreamingQuery:
    """AvailableNow incremental concentration over a growing parquet
    events table; manifest-guarded exactly-once."""
    os.makedirs(store_dir, exist_ok=True)
    sample = spark.read.parquet(data_dir)
    stream = (spark.readStream.schema(sample.schema).parquet(data_dir)
              .select(key))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch_id in applied_batches(store_dir):
            return
        counts, touched = conc_batch(spark, batch, store_dir, key,
                                     n_buckets)
        snapshot.commit(spark, store_dir, batch_id,
                        {"counts": (counts, touched)}, n_buckets)

    return (stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def render_gini(spark: SparkSession, store_dir: str,
                ndigits: int = 6) -> DataFrame:
    """(n_keys, gini) in gini_concentration's exact output shape."""
    from mms_rdf_spark.operators.link import global_rank

    counts = snapshot.read_table(spark, store_dir, "counts")
    if counts is None:
        raise ValueError(f"no committed store at {store_dir}")
    x = counts.select("key", F.col("x").alias("_x"))
    ranked = global_rank(x, "_x", "key")
    return (ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("_x").alias("_sx"),
        F.sum(F.col("rank") * F.col("_x")).alias("_srx"))
        .select("n_keys",
                F.round((2.0 * F.col("_srx"))
                        / (F.col("n_keys") * F.col("_sx"))
                        - (F.col("n_keys") + 1) / F.col("n_keys"),
                        ndigits).alias("gini")))
