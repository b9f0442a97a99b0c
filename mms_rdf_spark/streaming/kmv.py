"""Incremental KMV distinct-count sketch store: the streaming twin of
`operators.sketch.kmv_distinct` (twin #21).

Distinct-count monitoring over a growing corpus should not re-scan
history per wave: the store keeps ONE table

    sketch (h, bucket)    the bottom-k distinct md5 hashes seen so
                          far, bucket = crc32(h)

moved through the versioned snapshot protocol (streaming/snapshot.py).
The KMV merge (bottom-k of the union) is ASSOCIATIVE, COMMUTATIVE and
IDEMPOTENT — set semantics make replaying a wave a no-op BY ALGEBRA
(the novelty-grams precedent), so the applied-batch manifest is
belt-and-braces, not load-bearing. Per-wave cost is O(batch + k):
the store side of the merge is at most k rows.

Touched buckets are computed from the SYMMETRIC DIFFERENCE between
the old and merged sketches (both <= k rows — a bounded fold), so a
wave whose values are all already represented touches NOTHING and
every bucket file hardlinks forward byte-identical.

`render_distinct` reproduces the batch operator's exact output row
(k_used, kth_hash, est_distinct), so cumulative-store render ==
kmv_distinct on the concatenated corpus ROW-IDENTICALLY for any wave
split (pinned in tests/test_streaming_kmv.py).

Reference scope: the reference has no streaming (SURVEY §2.8); this
extends the sketch suite the way streaming/vocab extends the
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


def kmv_batch(
    spark: SparkSession,
    df: DataFrame,
    store_dir: str,
    col: str,
    k: int = 64,
    n_buckets: int = N_BUCKETS,
) -> tuple[DataFrame, set[int]]:
    """One incremental step: returns (sketch, touched_buckets) — the
    full (<= k row) logical sketch to commit and the buckets whose
    contents actually changed. Pure transformation — the caller
    commits."""
    from mms_rdf_spark.operators.sketch import kmv_sketch

    batch = (kmv_sketch(df, col, k)
             .withColumn("bucket", bucket_col("h", n_buckets))
             .localCheckpoint())
    old = snapshot.read_table(spark, store_dir, "sketch")
    if old is None:
        touched = {r.bucket for r in
                   batch.select("bucket").distinct().collect()}
        return batch.select("h", "bucket"), touched
    merged = (old.select("h").unionByName(batch.select("h"))
              .distinct().orderBy("h").limit(k)
              .withColumn("bucket", bucket_col("h", n_buckets))
              .select("h", "bucket")
              .localCheckpoint())
    changed = (old.select("h", "bucket").exceptAll(merged)
               .unionByName(merged.exceptAll(old.select("h",
                                                        "bucket"))))
    touched = {r.bucket for r in
               changed.select("bucket").distinct().collect()}
    return merged, touched


def incremental_kmv(
    spark: SparkSession,
    data_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    col: str,
    k: int = 64,
    n_buckets: int = N_BUCKETS,
) -> StreamingQuery:
    """AvailableNow incremental distinct-count sketch over a growing
    parquet table: drains unseen files, commits the merged sketch
    atomically. Crash replays are no-ops (idempotent by algebra AND
    manifest-guarded)."""
    os.makedirs(store_dir, exist_ok=True)
    sample = spark.read.parquet(data_dir)
    stream = (spark.readStream.schema(sample.schema).parquet(data_dir)
              .select(col))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch_id in applied_batches(store_dir):
            return
        sk, touched = kmv_batch(spark, batch, store_dir, col, k,
                                n_buckets)
        snapshot.commit(spark, store_dir, batch_id,
                        {"sketch": (sk, touched)}, n_buckets)

    return (stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def render_distinct(spark: SparkSession, store_dir: str,
                    k: int = 64) -> DataFrame:
    """(k_used, kth_hash, est_distinct) in kmv_distinct's exact
    output shape, from the committed sketch."""
    from mms_rdf_spark.operators.sketch import _frac

    sk = snapshot.read_table(spark, store_dir, "sketch")
    if sk is None:
        raise ValueError(f"no committed sketch at {store_dir}")
    kth = F.max("h")
    n = F.count(F.lit(1))
    est = F.when(n < k, n.cast("double")) \
        .otherwise(F.lit(float(k - 1)) / _frac(kth))
    return sk.agg(
        n.cast("int").alias("k_used"),
        kth.alias("kth_hash"),
        F.round(est, 4).alias("est_distinct"))
