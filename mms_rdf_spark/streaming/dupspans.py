"""Incremental substring-level exact dedup: the streaming twin of
`operators.dedup.duplicated_spans` (twin #14).

The batch operator re-counts every L-token window of the whole corpus
per run — O(corpus). A training-data ingest pipeline needs O(batch +
touched grams) per wave. State is a gram-count store (gram, cnt,
first_doc, first_pos): per batch, the batch's windows probe ONLY their
own grams' store rows (bucket-pruned by the snapshot layout — never a
store scan), counts accrue, and the store commits through the
versioned snapshot protocol (streaming/snapshot.py: one atomic pointer
swap, applied-batch manifest inside the version, untouched buckets
hardlinked).

Exactly-once WINDOW emission: each duplicated window (doc_id, pos) is
emitted by exactly one batch —
  - its own arrival batch, if the gram's CUMULATIVE count (store +
    batch) is already >= 2 then;
  - otherwise it is the gram's sole first occurrence: the store keeps
    it, and the batch that pushes the count to >= 2 emits it
    retroactively (exactly when stored cnt == 1).
Cumulative emitted windows over ANY wave split == the batch operator's
duplicated window set on the full corpus; spans are a RENDER step
(`spans_from_windows`) reusing the batch operator's own island merge
(`dedup.merge_window_spans` — single source of truth, so the merged
spans are row-identical to `duplicated_spans` on the union corpus).

Exactness under hash collisions: the store is keyed by the GRAM STRING
(xxhash64 only buckets the store layout), so two different grams can
never pool their counts — same guarantee as the batch operator's
exact-gram confirm.

Crash safety: windows are emitted BEFORE the store commit; a crash in
between replays the batch against the unchanged store version and
overwrites the same `batch=<id>` output dir with identical rows; after
the pointer swap the applied-batch manifest makes replay a no-op.

Reference scope note: the reference has no streaming at all
(SURVEY.md §2.8); this extends the dedup suite the way the rest of the
streaming package extends conversion.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mms_rdf_spark.operators.dedup import (
    merge_window_spans,
    window_grams,
)
from mms_rdf_spark.streaming import snapshot
from mms_rdf_spark.streaming.snapshot import (
    N_BUCKETS,
    applied_batches,
    bucket_col,
)

LENGTH = 8


def _windows(docs: DataFrame, length: int) -> DataFrame:
    """(doc_id, pos, gram) — the batch operator's OWN window explode
    (dedup.window_grams), imported so the definitions cannot drift."""
    return window_grams(docs, length)


def read_grams(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """(gram, cnt, f_doc, f_pos, bucket) rows of the CURRENT store."""
    return snapshot.read_table(spark, store_dir, "grams")


def dupspans_batch(
    spark: SparkSession,
    docs: DataFrame,
    store_dir: str,
    length: int = LENGTH,
    n_buckets: int = N_BUCKETS,
) -> tuple[DataFrame, DataFrame, set[int]]:
    """One incremental step. Returns (emit, merged, touched): `emit`
    the duplicated windows this batch is responsible for, `merged` the
    store table to commit (only touched buckets are materialized),
    `touched` those buckets. Pure transformation — the caller writes
    and commits."""
    w = (_windows(docs, length)
         .withColumn("bucket", bucket_col("gram", n_buckets))
         .localCheckpoint())  # one explode feeds emit + upsert
    bg = (w.groupBy("gram", "bucket")
          .agg(F.count(F.lit(1)).alias("b_cnt"),
               F.min(F.struct("doc_id", "pos")).alias("bf")))
    existing = read_grams(spark, store_dir)
    touched = {r.bucket for r in bg.select("bucket").distinct().collect()}
    if existing is None:
        ex_rel = None
        joined = bg.withColumn("cnt", F.lit(0).cast("long")) \
            .withColumn("f_doc", F.lit(None).cast("long")) \
            .withColumn("f_pos", F.lit(None).cast("int"))
    else:
        # only the batch's own grams can change: bucket-pruned scan +
        # broadcast key join, never a full-store shuffle
        ex_rel = (existing.where(F.col("bucket").isin(sorted(touched)))
                  .join(F.broadcast(bg.select("gram")), on="gram",
                        how="left_semi").localCheckpoint())
        joined = (bg.join(ex_rel.select("gram", "cnt", "f_doc",
                                        "f_pos"),
                          on="gram", how="left")
                  .na.fill({"cnt": 0}))
    joined = joined.localCheckpoint()

    # windows whose gram is cumulatively duplicated emit NOW
    hot = joined.where(F.col("cnt") + F.col("b_cnt") >= 2) \
        .select("gram", "cnt")
    emit_own = w.join(F.broadcast(hot.select("gram")), on="gram",
                      how="left_semi").select("doc_id", "pos")
    # the stored sole-first window emits when the count crosses 2
    emit_first = (joined.where((F.col("cnt") == 1)
                               & (F.col("b_cnt") >= 1))
                  .select(F.col("f_doc").alias("doc_id"),
                          F.col("f_pos").alias("pos")))
    emit = emit_own.unionByName(emit_first)

    upd = joined.select(
        "gram", "bucket",
        (F.col("cnt") + F.col("b_cnt")).cast("long").alias("cnt"),
        F.coalesce("f_doc", F.col("bf.doc_id")).cast("long")
        .alias("f_doc"),
        F.coalesce("f_pos", F.col("bf.pos")).cast("int")
        .alias("f_pos"))
    if existing is None:
        merged = upd
    else:
        ex_keep = (existing.where(F.col("bucket").isin(sorted(touched)))
                   .join(F.broadcast(bg.select("gram")), on="gram",
                         how="left_anti"))
        merged = (existing.where(~F.col("bucket").isin(sorted(touched)))
                  .unionByName(ex_keep.select(*upd.columns))
                  .unionByName(upd))
    return emit, merged, touched


def incremental_dupspans(
    spark: SparkSession,
    docs_dir: str,
    store_dir: str,
    windows_dir: str,
    checkpoint_dir: str,
    length: int = LENGTH,
    n_buckets: int = N_BUCKETS,
) -> StreamingQuery:
    """AvailableNow incremental substring dedup over a growing
    documents table: drains unseen parquet files, emits this wave's
    duplicated windows to `windows_dir/batch=<id>/`, and commits the
    accrued gram store. Re-running after new files arrive processes
    only the delta; crash replays of an applied batch are no-ops."""
    os.makedirs(store_dir, exist_ok=True)
    sample = spark.read.parquet(docs_dir)
    stream = (spark.readStream.schema(sample.schema).parquet(docs_dir)
              .select("doc_id", "text"))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch_id in applied_batches(store_dir):
            return  # crash replay of a committed batch
        emit, merged, touched = dupspans_batch(
            spark, batch, store_dir, length, n_buckets)
        emit.write.mode("overwrite").parquet(
            os.path.join(windows_dir, f"batch={batch_id}"))
        snapshot.commit(spark, store_dir, batch_id,
                        {"grams": (merged, touched)}, n_buckets)

    return (stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def read_windows(spark: SparkSession, windows_dir: str) -> DataFrame:
    """All duplicated windows emitted so far (doc_id, pos, batch)."""
    return spark.read.option("basePath", windows_dir).parquet(windows_dir)


def spans_from_windows(spark: SparkSession, windows_dir: str,
                       length: int = LENGTH) -> DataFrame:
    """Render the cumulative emitted windows as maximal spans —
    row-identical to `duplicated_spans` on the union corpus (the
    shared `merge_window_spans` island merge)."""
    return merge_window_spans(
        read_windows(spark, windows_dir).select("doc_id", "pos"),
        length)
