"""Incremental (streaming) LPG edge materialization.

Completes the streaming KG chain (incremental.py extracts, link.py
resolves entities, this appends the graph): each micro-batch of new
triples is projected to LPG edges with the SAME deterministic edge ids
as the batch materializer (hash of from/label/to/idx —
materialize.py), anti-joined against the already-committed edge ids,
and appended. Deterministic ids make the dedup exact: an edge
re-derived in a later batch (recurring artifact, replayed file) maps
to the same ~id and is dropped, so the edge table is append-only AND
duplicate-free without any wide merge.

Node rows are NOT streamed: lpg_nodes pivots all literal predicates of
a subject into one row, and a subject's triples can span batches — an
incremental pivot would need per-column merge semantics. The batch
materialize stage owns nodes (the same lambda split incremental.py
documents for conversation-level list triples).

Scale note: the anti-join's build side is the existing edge-ID column
only (not the edge payload); on a real deployment that read prunes to
the partitions the batch's subjects hash into (or a bloom filter of
committed ids) — here it is a column-pruned parquet scan, asserted in
the test via the read schema.

Exactly-once: applied-batch manifest + atomic append directory (same
discipline as streaming/link.py).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mms_rdf_spark.operators.materialize import lpg_edges


def _applied_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_applied.json")


def edges_batch(spark: SparkSession, triples: DataFrame,
                out_dir: str) -> DataFrame:
    """One incremental step: new-edge rows of this batch (committed
    edge ids excluded). Pure transformation — caller appends."""
    new_edges = lpg_edges(triples)
    data_dir = os.path.join(out_dir, "data")
    if not os.path.isdir(data_dir):
        return new_edges
    seen = spark.read.parquet(data_dir).select("~id")
    return new_edges.join(seen, on="~id", how="left_anti")


def incremental_lpg_edges(
    spark: SparkSession,
    triples_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """AvailableNow incremental edge materialization over a growing
    triples table: drains unseen triple files, appends only edges whose
    deterministic id is not yet committed."""
    from mms_rdf_spark.operators.extract import TRIPLE_SCHEMA

    os.makedirs(out_dir, exist_ok=True)
    stream = spark.readStream.schema(TRIPLE_SCHEMA).parquet(triples_dir)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if os.path.exists(_applied_path(out_dir)):
            with open(_applied_path(out_dir)) as fh:
                if batch_id in json.load(fh):
                    return
        fresh = edges_batch(spark, batch, out_dir)
        fresh.write.mode("append").parquet(os.path.join(out_dir, "data"))
        applied = []
        if os.path.exists(_applied_path(out_dir)):
            with open(_applied_path(out_dir)) as fh:
                applied = json.load(fh)
        with open(_applied_path(out_dir), "w") as fh:
            json.dump(applied + [batch_id], fh)

    return (stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
