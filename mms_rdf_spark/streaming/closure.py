"""Incremental transitive closure: the streaming twin of
`plans.closure.transitive_closure` (twin #15) — semi-naive Datalog
evaluation for the KG's core closure queries (rdfs:subClassOf*,
nextTurn chains, reachability) under growing edge sets.

Batch re-closure is O(closure) per run; the incremental step is
O(batch + affected paths): with the accumulated closure C already
transitively CLOSED, every path that uses >= 1 new edge decomposes
into segments of the form old* · new · old* — so

    N1 = (id ∪ C) ⋈ E_new ⋈ (id ∪ C)        (one new edge)
    delta = transitive_closure(N1) \\ C       (>= 1 new edge)

(pointer doubling over N1 composes the multi-new-edge paths; the old
segments BETWEEN new edges are already absorbed into each N1 row's
prefix/suffix, because each alternating path splits at its new edges).
Both old-side joins are store-probe joins, never store scans: the
store keeps the SAME closure rows in TWO orientations — `fwd`
bucketed by source (probed by the batch's tail set) and `rev`
bucketed by destination (probed by the head set) — the SPO/OPS layout
trick, so bucket pruning bounds the read to the batch's own key
buckets. The final \\ C anti-join prunes the same way (delta sources'
buckets only).

Exactly-once pair emission: a pair enters C exactly once, in the
batch whose delta first derives it; re-arriving edges and
already-implied edges anti-join away. Cumulative emitted pairs ==
batch transitive_closure on the full edge set, for ANY wave split.
Crash safety: emission precedes the snapshot commit (replay re-derives
identical rows against the old version; the applied-batch manifest
makes the commit a no-op).

Worst case is honest: a new edge bridging two giant reachability sets
makes |delta| = |left| x |right| — that is the true output growth, not
an artifact; the pointer-doubling rounds are bounded by
log2(new-edge-count per path).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mms_rdf_spark.plans.closure import transitive_closure
from mms_rdf_spark.streaming import snapshot
from mms_rdf_spark.streaming.snapshot import (
    N_BUCKETS,
    applied_batches,
    bucket_col,
)


def read_closure(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """(s, d) rows of the CURRENT accumulated closure (fwd copy)."""
    t = snapshot.read_table(spark, store_dir, "fwd")
    return None if t is None else t.select("s", "d")


def closure_batch(
    spark: SparkSession,
    edges: DataFrame,
    store_dir: str,
    max_iterations: int = 20,
    n_buckets: int = N_BUCKETS,
) -> tuple[DataFrame, DataFrame, set[int], set[int]]:
    """One incremental step over batch `edges` (src, dst). Returns
    (delta, merged, touched_fwd, touched_rev): `delta` the NEW closure
    pairs this batch derives (the emission), `merged` the full (s, d)
    closure to commit, and the touched bucket sets for the two store
    orientations. Pure transformation — the caller writes and commits.
    """
    e_new = (edges.select(F.col(edges.columns[0]).alias("s"),
                          F.col(edges.columns[1]).alias("d"))
             .distinct().localCheckpoint())
    existing = read_closure(spark, store_dir)
    if existing is None:
        delta = transitive_closure(
            e_new.select(F.col("s").alias("sub"),
                         F.col("d").alias("sup")),
            max_iterations=max_iterations, reflexive=False) \
            .select(F.col("sub").alias("s"), F.col("sup").alias("d"))
        delta = delta.localCheckpoint()
        merged = delta
    else:
        heads = e_new.select(F.col("s").alias("k")).distinct()
        tails = e_new.select(F.col("d").alias("k")).distinct()
        h_buckets = sorted({r.b for r in heads.select(
            bucket_col("k", n_buckets).alias("b")).distinct().collect()})
        t_buckets = sorted({r.b for r in tails.select(
            bucket_col("k", n_buckets).alias("b")).distinct().collect()})
        # rev is bucketed BY d: rows ending at a batch head live only
        # in the heads' buckets (same for fwd / tails) — store probes,
        # never store scans
        rev = snapshot.read_table(spark, store_dir, "rev") \
            .where(F.col("bucket").isin(h_buckets)) \
            .join(F.broadcast(heads), F.col("d") == F.col("k"),
                  "left_semi").select("s", "d")
        fwd = snapshot.read_table(spark, store_dir, "fwd") \
            .where(F.col("bucket").isin(t_buckets)) \
            .join(F.broadcast(tails), F.col("s") == F.col("k"),
                  "left_semi").select("s", "d")
        # (id ∪ C): the IDENTITY variants must be explicit union rows —
        # a left join emits only the matched prefixes once any exist,
        # silently dropping the bare-edge segment a later composition
        # needs (the no-old-suffix variant that meets the next
        # segment's old bridge)
        pre = (rev.select(F.col("s").alias("ps"),
                          F.col("d").alias("pm"))
               .unionByName(heads.select(F.col("k").alias("ps"),
                                         F.col("k").alias("pm"))))
        suf = (fwd.select(F.col("s").alias("sm"),
                          F.col("d").alias("sd"))
               .unionByName(tails.select(F.col("k").alias("sm"),
                                         F.col("k").alias("sd"))))
        n1 = (e_new
              .join(pre, F.col("pm") == F.col("s"))
              .join(suf, F.col("sm") == F.col("d"))
              .select(F.col("ps").alias("sub"),
                      F.col("sd").alias("sup"))
              .distinct())
        closed = transitive_closure(
            n1, max_iterations=max_iterations, reflexive=False) \
            .select(F.col("sub").alias("s"), F.col("sup").alias("d")) \
            .localCheckpoint()
        # literal bucket list so the partitioned store scan actually
        # prunes (a join-side filter would defeat directory pruning)
        d_buckets = sorted({r.b for r in closed.select(
            bucket_col("s", n_buckets).alias("b"))
            .distinct().collect()})
        old_slice = snapshot.read_table(spark, store_dir, "fwd") \
            .where(F.col("bucket").isin(d_buckets)) \
            .select("s", "d")
        delta = closed.join(old_slice, on=["s", "d"], how="left_anti") \
            .localCheckpoint()
        merged = existing.unionByName(delta)
    touched_fwd = {r.b for r in delta.select(
        bucket_col("s", n_buckets).alias("b")).distinct().collect()}
    touched_rev = {r.b for r in delta.select(
        bucket_col("d", n_buckets).alias("b")).distinct().collect()}
    return delta, merged, touched_fwd, touched_rev


def incremental_closure(
    spark: SparkSession,
    edges_dir: str,
    store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    max_iterations: int = 20,
    n_buckets: int = N_BUCKETS,
) -> StreamingQuery:
    """AvailableNow incremental closure over a growing edge table
    (src, dst): drains unseen parquet files, emits this wave's NEW
    reachability pairs to `pairs_dir/batch=<id>/`, and commits the
    enlarged closure store (fwd + rev orientations, one atomic
    version). Crash replays of an applied batch are no-ops."""
    os.makedirs(store_dir, exist_ok=True)
    sample = spark.read.parquet(edges_dir)
    stream = (spark.readStream.schema(sample.schema).parquet(edges_dir)
              .select("src", "dst"))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch_id in applied_batches(store_dir):
            return  # crash replay of a committed batch
        delta, merged, tf, tr = closure_batch(
            spark, batch, store_dir, max_iterations, n_buckets)
        delta.write.mode("overwrite").parquet(
            os.path.join(pairs_dir, f"batch={batch_id}"))
        snapshot.commit(
            spark, store_dir, batch_id,
            {"fwd": (merged.withColumn(
                "bucket", bucket_col("s", n_buckets)), tf),
             "rev": (merged.withColumn(
                 "bucket", bucket_col("d", n_buckets)), tr)},
            n_buckets)

    return (stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def read_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """All closure pairs emitted so far (s, d, batch)."""
    return spark.read.option("basePath", pairs_dir).parquet(pairs_dir)
