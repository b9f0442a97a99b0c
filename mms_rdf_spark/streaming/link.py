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
  3. the merged table is committed atomically (tmp + rename, runlog
     discipline) and the applied batch id is recorded, so foreachBatch
     replays after a crash are no-ops (idempotent exactly-once).

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

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mms_rdf_spark.functions.iri import sanitize_suffix_col
from mms_rdf_spark.operators.link import (
    DEFAULT_JACCARD,
    candidate_edges,
    distinct_surfaces,
    entity_table,
)


def _block_keys() -> F.Column:
    """The two blocking keys of link.candidate_edges (prefix / suffix
    bigram + length bucket), as an array — MUST stay in lockstep with
    the batch linker so anchor pruning can never miss a candidate."""
    len_bucket = (F.length("norm") / 4).cast("int").cast("string")
    return F.array(
        F.concat(F.lit("p#"), F.substring("norm", 1, 2), F.lit("#"),
                 len_bucket),
        F.concat(F.lit("s#"), F.substring(F.col("norm"), -2, 2),
                 F.lit("#"), len_bucket),
    )


def _canonical_iri(entity_id) -> F.Column:
    return F.concat(F.lit("mms-element:Entity."),
                    sanitize_suffix_col(entity_id))


def link_batch(
    spark: SparkSession,
    mention_triples: DataFrame,
    entities_dir: str,
    jaccard_threshold: float = DEFAULT_JACCARD,
) -> DataFrame:
    """One incremental linking step: returns the MERGED entity table
    (existing + this batch). Pure transformation — the caller commits.
    """
    from mms_rdf_spark.operators.cc import connected_components

    surfaces = distinct_surfaces(mention_triples).localCheckpoint()
    data_dir = os.path.join(entities_dir, "data")
    if not os.path.isdir(data_dir):
        comps = connected_components(
            candidate_edges(surfaces, jaccard_threshold), "src", "dst")
        return entity_table(surfaces, comps)

    existing = spark.read.parquet(data_dir)

    # recurring surfaces: entity kept, frequency accrues
    add = surfaces.select("surface", F.col("freq").alias("_add"))
    kept = (existing.join(add, "surface", "left")
            .withColumn("freq", (F.col("freq")
                                 + F.coalesce("_add", F.lit(0)))
                        .cast("long"))
            .drop("_add"))

    fresh = surfaces.join(existing.select("surface"), "surface",
                          "left_anti").localCheckpoint()
    # anchors: existing surfaces sharing a blocking key with the batch
    # (the only rows the batch linker could ever pair with)
    touched = fresh.select(F.explode(_block_keys()).alias("_bk")) \
        .distinct()
    anchors = (existing.select("surface", "norm", "entity_id")
               .withColumn("_bk", F.explode(_block_keys()))
               .join(F.broadcast(touched), "_bk")
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
    )
    return kept.unionByName(fresh_ents)


def _applied_path(entities_dir: str) -> str:
    return os.path.join(entities_dir, "_applied.json")


def _commit_batch(spark: SparkSession, merged: DataFrame,
                  entities_dir: str, batch_id: int) -> None:
    data_dir = os.path.join(entities_dir, "data")
    tmp = data_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    # writing tmp executes the read of the CURRENT table; only then swap
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(data_dir, ignore_errors=True)
    os.replace(tmp, data_dir)
    applied = []
    if os.path.exists(_applied_path(entities_dir)):
        with open(_applied_path(entities_dir)) as fh:
            applied = json.load(fh)
    with open(_applied_path(entities_dir), "w") as fh:
        json.dump(applied + [batch_id], fh)


def incremental_link(
    spark: SparkSession,
    triples_dir: str,
    entities_dir: str,
    checkpoint_dir: str,
    jaccard_threshold: float = DEFAULT_JACCARD,
) -> StreamingQuery:
    """AvailableNow incremental linking over a growing triples table:
    drains unseen triple files, links their mention surfaces against
    the live entity table, commits atomically. Re-running after new
    files arrive processes only the delta; crash replays of an applied
    batch are skipped via the applied-batch manifest."""
    from mms_rdf_spark.operators.extract import TRIPLE_SCHEMA

    os.makedirs(entities_dir, exist_ok=True)
    stream = (spark.readStream.schema(TRIPLE_SCHEMA)
              .parquet(triples_dir)
              .where(F.col("predicate") == "mms-property:mentions"))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if os.path.exists(_applied_path(entities_dir)):
            with open(_applied_path(entities_dir)) as fh:
                if batch_id in json.load(fh):
                    return  # crash replay of a committed batch
        merged = link_batch(spark, batch, entities_dir,
                            jaccard_threshold)
        _commit_batch(spark, merged, entities_dir, batch_id)

    return (stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
