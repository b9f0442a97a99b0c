"""Incremental connected components: the streaming twin of
`operators.cc.connected_components` — the canonicalization stage of
the KG pipeline kept exact as the entity graph grows.

The key identity: components already computed are CONTRACTIONS. A new
batch of edges can only merge whole existing components (or mint new
ones), so the per-batch work runs on the COMPONENT-LEVEL graph — each
new edge (a, b) becomes (comp(a), comp(b)), a batch-sized graph solved
with the battle-tested batch operator (driver union-find fast path at
this size). Because every component label IS the min member node, the
min over merged component labels is exactly the min node of the merged
component — so incremental labels equal the batch operator on the
cumulative edge set ROW-FOR-ROW across any wave split
(tests/test_streaming_cc.py pins it). This closes the transitive gap
the blocking-key linker cannot see: a new surface BRIDGING two
existing entities merges their whole components.

Store: one `labels` table (node, comp, bucket) through the versioned
snapshot protocol, bucket = crc32(comp) — component-bucketed, so a
merge rewrites ONLY the buckets holding the affected components' rows
(old and new labels); untouched components' buckets hardlink through.
The per-batch read is a full labels scan (Spark-side filter); the
WRITE is touched-buckets-only — the same trade as the entity linker,
with the same Iceberg MERGE upgrade seam.

Crash replay of an applied batch id is a no-op (manifest inside the
version dir); a crash before the pointer swap replays against the old
store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mms_rdf_spark.streaming import snapshot
from mms_rdf_spark.streaming.snapshot import N_BUCKETS, applied_batches


def _bucket(col: str, n_buckets: int):
    return F.pmod(F.crc32(F.col(col).cast("string")),
                  F.lit(n_buckets)).cast("int")


def read_components(spark: SparkSession,
                    store_dir: str) -> DataFrame | None:
    """(node, comp) of the CURRENT store version, or None."""
    t = snapshot.read_table(spark, store_dir, "labels")
    return None if t is None else t.select("node", "comp")


def cc_batch(
    spark: SparkSession,
    edges: DataFrame,
    store_dir: str,
    n_buckets: int = N_BUCKETS,
    src: str = "src",
    dst: str = "dst",
) -> tuple[DataFrame, set[int]]:
    """One incremental step. Returns (labels_full, touched): the FULL
    logical labels table to commit and the component buckets this
    batch rewrites. Pure transformation — the caller commits."""
    from mms_rdf_spark.operators.cc import connected_components

    e = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .where(F.col("a").isNotNull() & F.col("b").isNotNull()
                & (F.col("a") != F.col("b")))
         .distinct().localCheckpoint())
    nodes = (e.select(F.col("a").alias("node"))
             .unionByName(e.select(F.col("b").alias("node")))
             .distinct())
    existing = snapshot.read_table(spark, store_dir, "labels")
    if existing is None:
        fresh = (connected_components(e, "a", "b")
                 .withColumnRenamed("component", "comp")
                 .withColumn("bucket", _bucket("comp", n_buckets))
                 .localCheckpoint())
        touched = {r.bucket for r in
                   fresh.select("bucket").distinct().collect()}
        return fresh, touched

    # contract existing components to super-nodes under the new edges
    seed = (nodes.join(existing.select("node", "comp"),
                       on="node", how="left")
            .select("node",
                    F.coalesce(F.col("comp"), F.col("node"))
                    .alias("comp")).localCheckpoint())
    ca = seed.select(F.col("node").alias("a"),
                     F.col("comp").alias("ca"))
    cb = seed.select(F.col("node").alias("b"),
                     F.col("comp").alias("cb"))
    comp_edges = (e.join(ca, on="a").join(cb, on="b")
                  .select(F.col("ca").alias("a"),
                          F.col("cb").alias("b")))
    mapping = (connected_components(comp_edges, "a", "b")
               .withColumnRenamed("node", "comp")
               .withColumnRenamed("component", "final")
               .localCheckpoint())  # (old comp -> merged label)

    affected = mapping.select("comp")
    members = existing.join(F.broadcast(affected), on="comp",
                            how="left_semi")
    rest = existing.join(F.broadcast(affected), on="comp",
                         how="left_anti")
    remapped = (members.select("node", "comp", "bucket")
                .unionByName(
                    seed.join(existing.select("node"), on="node",
                              how="left_anti")
                    .select("node", "comp")
                    .withColumn("bucket", _bucket("comp", n_buckets)))
                .join(F.broadcast(mapping), on="comp")
                .select("node", F.col("final").alias("comp"),
                        "bucket"))
    # touched buckets: every bucket a remapped row leaves OR lands in
    new_rows = (remapped.drop("bucket")
                .withColumn("bucket", _bucket("comp", n_buckets))
                .localCheckpoint())
    touched = {r.bucket for r in
               remapped.select("bucket").distinct().collect()} \
        | {r.bucket for r in
           new_rows.select("bucket").distinct().collect()}
    return rest.unionByName(new_rows), touched


def incremental_cc(
    spark: SparkSession,
    edges_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    n_buckets: int = N_BUCKETS,
    src: str = "src",
    dst: str = "dst",
) -> StreamingQuery:
    """AvailableNow incremental components over a growing edge table:
    drains unseen parquet files and commits the merged labels store
    atomically. Crash replays of an applied batch are no-ops."""
    os.makedirs(store_dir, exist_ok=True)
    sample = spark.read.parquet(edges_dir)
    stream = (spark.readStream.schema(sample.schema)
              .parquet(edges_dir).select(src, dst))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch_id in applied_batches(store_dir):
            return
        labels, touched = cc_batch(spark, batch, store_dir,
                                   n_buckets, src, dst)
        snapshot.commit(spark, store_dir, batch_id,
                        {"labels": (labels, touched)}, n_buckets)

    return (stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
