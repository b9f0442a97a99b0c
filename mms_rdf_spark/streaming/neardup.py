"""Incremental MinHash/LSH near-duplicate detection: the streaming
twin of `operators.dedup.lsh_candidate_pairs`.

The batch operator re-banding the whole corpus per run is O(corpus);
a training-data ingest pipeline needs O(batch + touched buckets) per
wave: new documents are banded, probed against the ACCUMULATED
signature store (only the band-keys the batch itself touches — an
O(batch)-sized broadcast semi-join, never a store scan), and the new
signatures are upserted into the store through the versioned snapshot
protocol (streaming/snapshot.py: one atomic pointer swap, applied-
batch manifest inside the version, untouched buckets hardlinked).

Exactly-once pair emission without a dedup pass: a pair is emitted by
the ONE batch that introduces its second member — every emitted pair
has >=1 NEW side, and pairs among already-stored docs were emitted by
earlier batches. Crash replay re-derives the same pairs against the
same (old) store version and overwrites the same batch output dir;
after the pointer swap the applied manifest makes replay a no-op.

Cumulative emitted pairs over any wave split == the batch operator on
the full corpus with `max_bucket=None`. The twin is deliberately
UNCAPPED: the batch cap's sub-salting is bucket-WIDTH-dependent, so
under incremental arrival the same corpus could emit different pair
sets depending on wave boundaries — a silent nondeterminism. At
scale, bound bucket width upstream (shingle choice / band count) or
run the capped batch operator as a compaction pass; the probe join
itself is pinned against AQE fan-out blindness like every pair join
(skew.pin_fanout_partitions).

Reference scope note: the reference has no streaming at all
(SURVEY.md §2.8) — this extends its dedup-adjacent tooling the way
the rest of the streaming package extends conversion.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mms_rdf_spark.operators.dedup import _banded_keys
from mms_rdf_spark.operators.skew import pin_fanout_partitions
from mms_rdf_spark.streaming import snapshot
from mms_rdf_spark.streaming.snapshot import (
    N_BUCKETS,
    applied_batches,
    bucket_col,
)

NUM_HASHES = 8
BANDS = 2


def read_signatures(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """(doc_id, band, key, bucket) rows of the CURRENT store version."""
    return snapshot.read_table(spark, store_dir, "banded")


def neardup_batch(
    spark: SparkSession,
    docs: DataFrame,
    store_dir: str,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
    n_buckets: int = N_BUCKETS,
) -> tuple[DataFrame, DataFrame, set[int]]:
    """One incremental step. Returns (pairs, merged_store, touched):
    `pairs` are the candidate pairs with >=1 side in this batch,
    `merged_store` the FULL signature table to commit, `touched` the
    store buckets this batch writes. Pure transformation — the caller
    emits and commits."""
    new = (_banded_keys(docs, num_hashes, bands)
           .withColumn("bucket", bucket_col("key", n_buckets))
           .localCheckpoint())  # one banding pass feeds probe + upsert
    existing = read_signatures(spark, store_dir)
    if existing is None:
        cand = new.withColumn("_new", F.lit(True))
        merged, touched = new, {r.bucket for r in
                                new.select("bucket").distinct().collect()}
    else:
        # only the store rows in band-keys the batch touches can pair
        # with it: an O(batch) broadcast semi-join, never a store scan
        probe_keys = new.select("band", "key").distinct()
        relevant = existing.join(F.broadcast(probe_keys),
                                 on=["band", "key"], how="left_semi")
        cand = (relevant.withColumn("_new", F.lit(False))
                .unionByName(new.withColumn("_new", F.lit(True))))
        merged = existing.unionByName(new)
        touched = {r.bucket for r in
                   new.select("bucket").distinct().collect()}
    cand = pin_fanout_partitions(cand, "band", "key")
    a, b = cand.alias("a"), cand.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc_id") < F.col("b.doc_id"))
               # the pair's SECOND member arrives in this batch:
               # old-old pairs were emitted by an earlier batch
               & (F.col("a._new") | F.col("b._new")))
        .select(F.col("a.doc_id").alias("a_id"),
                F.col("b.doc_id").alias("b_id"))
        .distinct())
    return pairs, merged, touched


def incremental_neardup(
    spark: SparkSession,
    docs_dir: str,
    store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
    n_buckets: int = N_BUCKETS,
) -> StreamingQuery:
    """AvailableNow incremental near-dup over a growing documents
    table: drains unseen parquet files, emits this wave's candidate
    pairs to `pairs_dir/batch=<id>/`, and commits the enlarged
    signature store. Re-running after new files arrive processes only
    the delta; crash replays of an applied batch are no-ops."""
    os.makedirs(store_dir, exist_ok=True)
    sample = spark.read.parquet(docs_dir)
    stream = (spark.readStream.schema(sample.schema).parquet(docs_dir)
              .select("doc_id", "text"))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch_id in applied_batches(store_dir):
            return  # crash replay of a committed batch
        pairs, merged, touched = neardup_batch(
            spark, batch, store_dir, num_hashes, bands, n_buckets)
        # emit BEFORE the store commit: a crash in between replays
        # this batch against the unchanged store and overwrites the
        # same output dir with identical rows (idempotent)
        pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_dir, f"batch={batch_id}"))
        snapshot.commit(spark, store_dir, batch_id,
                        {"banded": (merged, touched)}, n_buckets)

    return (stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def read_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """All pairs emitted so far (a_id, b_id, batch)."""
    return spark.read.option("basePath", pairs_dir).parquet(pairs_dir)
