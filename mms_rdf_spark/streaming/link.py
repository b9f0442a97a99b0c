"""Incremental (streaming) entity linking against a live entity table.

Completes the streaming KG-construction chain (incremental.py extracts
triples as transcript files land; this module resolves their mention
surfaces): each micro-batch's NEW surfaces are linked using the SAME
blocking/scoring machinery as the batch linker (operators/link.py),
but against only the slice of the existing entity table that shares a
blocking key with the batch — per-batch cost is O(batch + touched
blocks), never a re-link of the full table.

Resolution per batch:
  1. surfaces already in the table keep their entity (freq accrues);
  2. fresh surfaces + touched-block anchors go through
     candidate_edges -> connected_components; a component containing
     an anchor ADOPTS the anchor's entity_id (min across anchors,
     deterministic), components with no anchor mint a new entity
     (min norm — the batch rule);
  3. the merged table is committed as a NEW VERSION directory with a
     single atomic pointer swap (see "Commit protocol" below); only
     buckets touched by the batch are rewritten.

Storage: the versioned snapshot store (streaming/snapshot.py — a
CURRENT pointer file whose os.replace() is the one atomic commit op,
version dirs carrying their own applied-batch manifest, entity rows
hash-partitioned by crc32(surface) % n_buckets). Crash before the
pointer swap replays against the OLD table (nothing lost, freq cannot
double-accrue); crash after, the replay is a no-op — see the snapshot
module's commit-protocol docstring.

Scale: per-batch WRITE cost is O(touched buckets) = O(batch size),
not O(entity table). The anchor scan still reads the full table's
(surface, norm, entity_id) columns once per batch (pruned by a
broadcast semi-join on blocking keys); at 10^9 entities the next step
is a persisted block-key -> bucket index, same seam.

Drift contract (documented, tested): a fresh surface that BRIDGES two
existing entities adopts the min entity_id but does not rewrite the
other entity's historical rows — the standard lambda split. A periodic
batch re-canonicalization (pipeline.py `link` stage over the full
corpus) reconciles; until then, incremental labels are a superset
refinement, never a loss (every surface has exactly one entity).

Reference provenance: the reference's closest behavior is the
after-the-fact dangling patch (src/action/ammend.js); true incremental
resolution is part of the beyond-reference streaming suite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mms_rdf_spark.functions.iri import sanitize_suffix_col
from mms_rdf_spark.operators.link import (
    DEFAULT_JACCARD,
    blocking_keys,
    candidate_edges,
    distinct_surfaces,
    entity_table,
)
from mms_rdf_spark.streaming import snapshot
from mms_rdf_spark.streaming.snapshot import N_BUCKETS, applied_batches

__all__ = ["link_batch", "incremental_link", "read_entities",
           "applied_batches"]


def _block_keys() -> F.Column:
    """The batch linker's blocking keys as an array column — imported
    from operators.link.blocking_keys (single source of truth), so
    anchor pruning can never drift from candidate_edges' blocking."""
    return F.array(*blocking_keys())


def _bucket_col(n_buckets: int) -> F.Column:
    return snapshot.bucket_col("surface", n_buckets)


def _canonical_iri(entity_id) -> F.Column:
    return F.concat(F.lit("mms-element:Entity."),
                    sanitize_suffix_col(entity_id))


# versioning: delegated to streaming.snapshot (shared with the node
# materializer); kept as thin aliases for the public API and tests
_current_version = snapshot.current_version


def read_entities(spark: SparkSession,
                  entities_dir: str) -> DataFrame | None:
    """The live entity table (CURRENT version), or None if no commit
    has happened yet."""
    return snapshot.read_table(spark, entities_dir, "data")


# ----------------------------------------------------------- linking
def _merge_touched(
    spark: SparkSession,
    surfaces: DataFrame,
    existing: DataFrame | None,
    jaccard_threshold: float,
    n_buckets: int,
) -> DataFrame:
    """Entity rows for the batch's TOUCHED buckets only: existing rows
    in those buckets (freq accrued where the surface recurs) plus the
    linked/adopted/minted fresh surfaces. Rows in untouched buckets
    cannot change (a recurring surface hashes to its own bucket), so
    the caller reuses their files verbatim."""
    from mms_rdf_spark.operators.cc import connected_components

    if existing is None:
        comps = connected_components(
            candidate_edges(surfaces, jaccard_threshold), "src", "dst")
        return entity_table(surfaces, comps) \
            .withColumn("bucket", _bucket_col(n_buckets))

    touched = [r.bucket for r in
               surfaces.select(_bucket_col(n_buckets).alias("bucket"))
               .distinct().collect()]
    ex_touched = existing.where(F.col("bucket").isin(touched))

    # recurring surfaces: entity kept, frequency accrues (a recurring
    # surface shares its bucket, so ex_touched suffices)
    add = surfaces.select("surface", F.col("freq").alias("_add"))
    kept = (ex_touched.join(add, "surface", "left")
            .withColumn("freq", (F.col("freq")
                                 + F.coalesce("_add", F.lit(0)))
                        .cast("long"))
            .drop("_add"))

    fresh = surfaces.join(existing.select("surface"), "surface",
                          "left_anti").localCheckpoint()
    # anchors: existing surfaces sharing a blocking key with the batch
    # (the only rows the batch linker could ever pair with); scans the
    # FULL table's three columns, pruned by the broadcast key join
    touched_keys = fresh.select(F.explode(_block_keys()).alias("_bk")) \
        .distinct()
    anchors = (existing.select("surface", "norm", "entity_id")
               .withColumn("_bk", F.explode(_block_keys()))
               .join(F.broadcast(touched_keys), "_bk")
               .select("surface", "norm", "entity_id").distinct()
               .localCheckpoint())

    union_surf = fresh.select("surface", "norm") \
        .unionByName(anchors.select("surface", "norm"))
    comps = connected_components(
        candidate_edges(union_surf, jaccard_threshold), "src", "dst") \
        .withColumnRenamed("node", "surface")

    labeled = (fresh.join(comps, "surface", "left")
               .withColumn("_comp", F.coalesce("component", "surface")))
    anchor_comp = (anchors.join(comps, "surface", "left")
                   .withColumn("_comp",
                               F.coalesce("component", "surface"))
                   .groupBy("_comp")
                   .agg(F.min("entity_id").alias("_adopt")))
    minted = (labeled.join(anchor_comp, "_comp", "left_anti")
              .groupBy("_comp").agg(F.min("norm").alias("_mint")))
    fresh_ents = (
        labeled
        .join(anchor_comp, "_comp", "left")
        .join(minted, "_comp", "left")
        .withColumn("entity_id", F.coalesce("_adopt", "_mint"))
        .select("surface", "norm", "freq", "entity_id",
                _canonical_iri(F.col("entity_id")).alias("canonical_iri"))
        .withColumn("bucket", _bucket_col(n_buckets))
    )
    return kept.unionByName(fresh_ents)


def link_batch(
    spark: SparkSession,
    mention_triples: DataFrame,
    entities_dir: str,
    jaccard_threshold: float = DEFAULT_JACCARD,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """One incremental linking step: returns the FULL merged entity
    table (existing + this batch). Pure transformation — the caller
    commits (`_commit_batch`). The untouched-bucket rows pass through
    unchanged; the commit path reuses their files without rewriting."""
    surfaces = distinct_surfaces(mention_triples) \
        .withColumn("bucket", _bucket_col(n_buckets)).localCheckpoint()
    existing = read_entities(spark, entities_dir)
    merged_touched = _merge_touched(spark, surfaces, existing,
                                    jaccard_threshold, n_buckets)
    if existing is None:
        return merged_touched
    touched = [r.bucket for r in surfaces.select("bucket")
               .distinct().collect()]
    untouched = existing.where(~F.col("bucket").isin(touched))
    return untouched.unionByName(merged_touched)


def _commit_batch(spark: SparkSession, merged: DataFrame,
                  entities_dir: str, batch_id: int,
                  n_buckets: int = N_BUCKETS,
                  touched: set[int] | None = None) -> None:
    """Commit a merged entity table as a new version (see the
    snapshot-module commit protocol). `merged` is the FULL table
    (link_batch output). When `touched` (the batch's surface-hash
    buckets) is given, only those buckets are written — every other
    bucket's files are hardlinked from the current version, so they
    stay byte-identical (same inodes). Without `touched`, the full
    table is rewritten (still crash-safe, just not incremental)."""
    snapshot.commit(spark, entities_dir, batch_id,
                    {"data": (merged, touched)}, n_buckets)


def incremental_link(
    spark: SparkSession,
    triples_dir: str,
    entities_dir: str,
    checkpoint_dir: str,
    jaccard_threshold: float = DEFAULT_JACCARD,
    n_buckets: int = N_BUCKETS,
) -> StreamingQuery:
    """AvailableNow incremental linking over a growing triples table:
    drains unseen triple files, links their mention surfaces against
    the live entity table, commits a new version with an atomic
    pointer swap. Re-running after new files arrive processes only the
    delta; crash replays of an applied batch are no-ops (the applied
    list lives inside the committed version's manifest)."""
    from mms_rdf_spark.operators.extract import TRIPLE_SCHEMA

    os.makedirs(entities_dir, exist_ok=True)
    stream = (spark.readStream.schema(TRIPLE_SCHEMA)
              .parquet(triples_dir)
              .where(F.col("predicate") == "mms-property:mentions"))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch_id in applied_batches(entities_dir):
            return  # crash replay of a committed batch
        merged = link_batch(spark, batch, entities_dir,
                            jaccard_threshold, n_buckets)
        touched = {r.bucket for r in
                   distinct_surfaces(batch)
                   .select(_bucket_col(n_buckets).alias("bucket"))
                   .distinct().collect()}
        _commit_batch(spark, merged, entities_dir, batch_id, n_buckets,
                      touched=touched)

    return (stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
