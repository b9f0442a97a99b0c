"""Incremental Misra-Gries heavy hitters: the streaming twin (#20)
of `operators.sketch.mg_heavy_hitters`.

A growing event log should not be re-scanned per wave to keep a
frequent-items summary current. Misra-Gries is MERGEABLE (Agarwal et
al. PODS 2012): summaries merge by per-item count addition followed by
subtracting the (k+1)-st largest merged count, and the error bounds
ADD — after any number of wave merges every estimate still satisfies

    true - n/(k+1)  <=  est  <=  true        (n = TOTAL rows so far)

and every item with true count > n/(k+1) is guaranteed present. So the
store keeps just TWO tiny tables in ONE snapshot version:

    mg    (item, cnt, bucket)   the merged summary, <= k rows
    meta  (n, bucket)           the exact total row count, 1 row

Per batch: the wave is summarized by the SAME per-partition MG +
bounded driver fold as the batch operator, merged with the stored
summary driver-side (<= 2k counters — a sketch, not data), and both
tables commit under one pointer swap. Per-wave cost is O(batch + k);
the accumulated raw log is never re-read. Like any MG deployment the
summary CONTENTS depend on arrival layout; the INVARIANT above is the
contract, pinned against exact counts over the concatenated waves in
tests/test_streaming_hitters.py for multiple wave splits.

Exactly-once: the summary pair is a deterministic fold over applied
batches; the versioned snapshot protocol (streaming/snapshot.py) makes
replay of an applied batch a no-op and a pre-swap crash re-merge
against the old tables. Reference scope: the reference has no
streaming (SURVEY §2.8); beyond-reference LLM-pipeline suite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mms_rdf_spark.streaming import snapshot
from mms_rdf_spark.streaming.snapshot import applied_batches

__all__ = ["hitters_batch", "incremental_hitters", "render_hitters",
           "applied_batches"]


def hitters_batch(
    spark: SparkSession,
    batch: DataFrame,
    store_dir: str,
    col: str,
    k: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """One incremental step: returns the full (mg, meta) tables to
    commit. Pure transformation + a bounded (<= 2k counters) driver
    fold — the caller commits."""
    from mms_rdf_spark.operators.sketch import mg_heavy_hitters

    if k < 1:
        raise ValueError("hitters_batch: k >= 1")
    rows = batch.where(F.col(col).isNotNull())
    batch_n = rows.count()
    wave = mg_heavy_hitters(rows, col, k)

    old_mg = snapshot.read_table(spark, store_dir, "mg")
    counters: dict[str, int] = {}
    if old_mg is not None:
        for r in old_mg.select("item", "cnt").collect():
            counters[r.item] = int(r.cnt)
    for r in wave.collect():  # <= k rows by construction
        counters[r.item] = counters.get(r.item, 0) + int(r.est_count)
    merged = sorted(counters.items(), key=lambda t: (-t[1], t[0]))
    sub = merged[k][1] if len(merged) > k else 0
    out = [(i, c - sub, 0) for i, c in merged[:k] if c - sub > 0]

    old_meta = snapshot.read_table(spark, store_dir, "meta")
    old_n = 0 if old_meta is None \
        else int(old_meta.agg(F.max("n")).collect()[0][0])

    mg = spark.createDataFrame(out, "item string, cnt long, bucket int")
    meta = spark.createDataFrame([(old_n + batch_n, 0)],
                                 "n long, bucket int")
    return mg, meta


def incremental_hitters(
    spark: SparkSession,
    src_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    col: str,
    k: int = 16,
) -> StreamingQuery:
    """AvailableNow incremental heavy hitters over a growing parquet
    table: drains unseen files, commits the merged (mg, meta) store
    atomically. Crash replays are no-ops."""
    os.makedirs(store_dir, exist_ok=True)
    sample = spark.read.parquet(src_dir)
    stream = (spark.readStream.schema(sample.schema)
              .parquet(src_dir).select(col))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch_id in applied_batches(store_dir):
            return
        mg, meta = hitters_batch(spark, batch, store_dir, col, k)
        snapshot.commit(spark, store_dir, batch_id,
                        {"mg": (mg, None), "meta": (meta, None)},
                        n_buckets=1)

    return (stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def render_hitters(spark: SparkSession, store_dir: str) -> DataFrame:
    """(item, est_count, n) — the cumulative summary plus the exact
    total it is certified against."""
    mg = snapshot.read_table(spark, store_dir, "mg")
    meta = snapshot.read_table(spark, store_dir, "meta")
    if mg is None or meta is None:
        raise ValueError(f"no committed summary at {store_dir}")
    return (mg.select("item", F.col("cnt").alias("est_count"))
            .crossJoin(F.broadcast(meta.select("n"))))
