"""Incremental RDFS entailment: the streaming twin of
`materialize.rdfs_entailment` (twin #16).

Why this is cleanly incrementalizable: the RDFS rules materialized
there (rdfs2 domain, rdfs3 range, rdfs7 subPropertyOf, rdfs9 type
inheritance) are LINEAR in the fact stream — every rule joins ONE
fact against the broadcast TBox closures, never fact x fact — so
applying the batch operator to a batch alone derives exactly that
batch's contribution; no cross-batch rule firing exists. (The OWL
property rules are NOT linear — prp-trp composes facts — and their
incremental form is streaming/closure.py; compose the two for
OWL-transitive predicates.)

What needs state is exactly-once EMISSION: the same inference can be
derivable from facts in two different batches, and an inference
emitted early can later arrive as an asserted fact. The store keeps
one (subject, predicate, object, asserted) table bucketed by
crc32(subject): per batch,
    emit = rdfs_entailment(batch, tbox) \\ store-slice
(bucket-pruned anti-join — never a store scan), then the store
accrues the batch's asserted facts and the emitted inferences
(asserted wins on conflict, recorded by OR-ing the flag).

Render parity: the batch operator excludes inferences that are ALSO
asserted; under incremental arrival an inference may be emitted
before its assertion arrives. `inferred_view` therefore serves
(emitted minus ever-asserted) — row-identical to
rdfs_entailment(all facts, tbox) for ANY wave split (the
bm25_from_index render-step pattern).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mms_rdf_spark.operators.materialize import rdfs_entailment
from mms_rdf_spark.streaming import snapshot
from mms_rdf_spark.streaming.snapshot import (
    N_BUCKETS,
    applied_batches,
    bucket_col,
)

SPO = ["subject", "predicate", "object"]


def read_store(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """(subject, predicate, object, asserted, bucket) rows."""
    return snapshot.read_table(spark, store_dir, "triples")


def entail_batch(
    spark: SparkSession,
    facts: DataFrame,
    tbox: DataFrame,
    store_dir: str,
    n_buckets: int = N_BUCKETS,
) -> tuple[DataFrame, DataFrame, set[int]]:
    """One incremental step. Returns (emit, merged, touched): `emit`
    the NEW inferences this batch is responsible for, `merged` the
    store table to commit, `touched` its buckets."""
    batch = facts.select(*SPO, *(
        [F.col("object_is_iri")] if "object_is_iri" in facts.columns
        else [F.lit(True).alias("object_is_iri")])).localCheckpoint()
    inferred = rdfs_entailment(batch, tbox).localCheckpoint()
    new_rows = (batch.select(*SPO,
                             F.lit(True).alias("asserted"))
                .unionByName(inferred.select(
                    *SPO, F.lit(False).alias("asserted")))
                .withColumn("bucket", bucket_col("subject", n_buckets)))
    existing = read_store(spark, store_dir)
    if existing is None:
        emit = inferred
        merged = (new_rows.groupBy(*SPO, "bucket")
                  .agg(F.max("asserted").alias("asserted")))
        touched = {r.bucket for r in
                   merged.select("bucket").distinct().collect()}
        return emit, merged, touched
    touched = {r.bucket for r in
               new_rows.select("bucket").distinct().collect()}
    slice_ = existing.where(F.col("bucket").isin(sorted(touched)))
    emit = inferred.join(slice_.select(*SPO), on=SPO, how="left_anti")
    # asserted wins: OR the flag across old slice + batch + inferences
    merged_touched = (slice_.select(*SPO, "asserted", "bucket")
                      .unionByName(new_rows)
                      .groupBy(*SPO, "bucket")
                      .agg(F.max("asserted").alias("asserted")))
    merged = (existing.where(~F.col("bucket").isin(sorted(touched)))
              .select(*merged_touched.columns)
              .unionByName(merged_touched))
    return emit, merged, touched


def incremental_entailment(
    spark: SparkSession,
    facts_dir: str,
    tbox: DataFrame,
    store_dir: str,
    emit_dir: str,
    checkpoint_dir: str,
    n_buckets: int = N_BUCKETS,
) -> StreamingQuery:
    """AvailableNow incremental RDFS materialization over a growing
    fact table: drains unseen parquet files, emits this wave's new
    inferences to `emit_dir/batch=<id>/`, commits the accrued triple
    store. Crash replays of an applied batch are no-ops."""
    os.makedirs(store_dir, exist_ok=True)
    sample = spark.read.parquet(facts_dir)
    stream = spark.readStream.schema(sample.schema).parquet(facts_dir)
    tbox = tbox.localCheckpoint()

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch_id in applied_batches(store_dir):
            return  # crash replay of a committed batch
        emit, merged, touched = entail_batch(
            spark, batch, tbox, store_dir, n_buckets)
        emit.write.mode("overwrite").parquet(
            os.path.join(emit_dir, f"batch={batch_id}"))
        snapshot.commit(spark, store_dir, batch_id,
                        {"triples": (merged, touched)}, n_buckets)

    return (stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def inferred_view(spark: SparkSession, store_dir: str) -> DataFrame:
    """The materialized inference set: emitted inferences minus
    everything ever asserted — row-identical to
    rdfs_entailment(all facts, tbox) for any wave split."""
    store = read_store(spark, store_dir)
    if store is None:
        raise ValueError("inferred_view: empty store")
    return store.where(~F.col("asserted")).select(*SPO)
