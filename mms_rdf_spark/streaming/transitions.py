"""Incremental per-key transition counts: the streaming twin of
`operators.analytics._transition_counts` / `transition_probs`
(twin #19; `markov_stationary` consumes the same counts).

A first-order behavioral model over a growing event log should not
re-pair the world per wave — but unlike token counts (streaming/
vocab.py), transitions are NOT additive across waves: a late event
that lands BETWEEN two already-paired events RETRACTS the stale pair
(a->c becomes a->b, b->c), and the first event of a new wave pairs
with the last event of the previous one. The store therefore keeps
TWO tables in ONE snapshot version (the lpg_nodes precedent):

    seq    (user_id, event_id, event_type, ts, bucket)
           the raw per-key event history, bucket = crc32(user_id)
    counts (src, dst, n, bucket)
           exact global transition counts,
           bucket = crc32(src || chr(30) || dst)

Per batch: touched keys' OLD histories are read bucket-pruned, their
contribution is recounted before and after the batch rows land, and
the (src, dst) DELTA is merged into `counts` — so a key's whole
history re-pairs only when that key appears, and counts for keys
that never re-appear are never touched. Per-wave cost is
O(batch + touched keys' histories + touched buckets), never
O(corpus).

`render_transitions` reproduces `transition_probs`'s exact output
shape (src, dst, n, p); cumulative-store render == the batch operator
on the concatenated log ROW-IDENTICALLY for ANY wave split INCLUDING
out-of-order arrival, where a late wave retroactively rewrites
transitions emitted earlier (pinned in
tests/test_streaming_transitions.py).

Exactly-once: counts are a deterministic function of seq; the
versioned snapshot protocol (streaming/snapshot.py) makes replay of
an applied batch a no-op and a pre-swap crash re-merge against the
old table. Reference scope: the reference has no streaming
(SURVEY §2.8); beyond-reference LLM-pipeline suite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mms_rdf_spark.streaming import snapshot
from mms_rdf_spark.streaming.snapshot import N_BUCKETS, applied_batches

_SEP = chr(30)  # the repo's record separator


def _key_bucket(col: str, n_buckets: int) -> F.Column:
    return (F.pmod(F.crc32(F.col(col).cast("string")),
                   F.lit(n_buckets))).cast("int")


def _pair_bucket(n_buckets: int) -> F.Column:
    return (F.pmod(F.crc32(F.concat_ws(_SEP, F.col("src"),
                                       F.col("dst"))),
                   F.lit(n_buckets))).cast("int")


def transitions_batch(
    spark: SparkSession,
    events: DataFrame,
    store_dir: str,
    n_buckets: int = N_BUCKETS,
) -> tuple[DataFrame, set[int], DataFrame, set[int]]:
    """One incremental step: returns (seq, seq_touched, counts,
    counts_touched) — the FULL logical tables to commit plus the
    buckets this batch writes. Pure transformation — the caller
    commits."""
    from mms_rdf_spark.operators.analytics import _transition_counts

    cols = ["user_id", "event_id", "event_type", "ts"]
    batch = (events.select(*cols)
             .withColumn("bucket", _key_bucket("user_id", n_buckets))
             .localCheckpoint())
    touched_users = batch.select("user_id", "bucket").distinct()
    seq_touched = {r.bucket for r in
                   touched_users.select("bucket").distinct().collect()}

    old_seq = snapshot.read_table(spark, store_dir, "seq")
    if old_seq is None:
        old_slice = batch.where(F.lit(False))
    else:
        # partition-pruned: only the touched users' buckets are read
        old_slice = (old_seq
                     .where(F.col("bucket").isin(sorted(seq_touched)))
                     .join(F.broadcast(touched_users.select("user_id")),
                           on="user_id", how="left_semi")
                     .select(*cols, "bucket"))
    new_slice = old_slice.unionByName(batch).localCheckpoint()

    old_c = _transition_counts(old_slice, "user_id", "event_type",
                               "ts", "event_id")
    new_c = _transition_counts(new_slice, "user_id", "event_type",
                               "ts", "event_id")
    delta = (new_c.select("src", "dst", F.col("n").alias("_d"))
             .unionByName(old_c.select("src", "dst",
                                       (-F.col("n")).alias("_d")))
             .groupBy("src", "dst")
             .agg(F.sum("_d").cast("long").alias("_d"))
             .where(F.col("_d") != 0)
             .withColumn("bucket", _pair_bucket(n_buckets))
             .localCheckpoint())
    counts_touched = {r.bucket for r in
                      delta.select("bucket").distinct().collect()}

    old_counts = snapshot.read_table(spark, store_dir, "counts")
    if old_counts is None:
        counts = delta.select(
            "src", "dst", F.col("_d").alias("n"), "bucket")
    else:
        keys = delta.select("src", "dst")
        hit = (old_counts
               .where(F.col("bucket").isin(sorted(counts_touched)))
               .join(F.broadcast(keys), on=["src", "dst"],
                     how="left_semi"))
        merged = (hit.select("src", "dst", F.col("n").alias("_d"),
                             "bucket")
                  .unionByName(delta)
                  .groupBy("src", "dst", "bucket")
                  .agg(F.sum("_d").cast("long").alias("n"))
                  .where(F.col("n") > 0)
                  .select("src", "dst", "n", "bucket"))
        rest = old_counts.join(F.broadcast(keys), on=["src", "dst"],
                               how="left_anti")
        counts = rest.unionByName(merged)

    if old_seq is None:
        seq = new_slice
    else:
        seq_rest = (old_seq
                    .join(F.broadcast(touched_users.select("user_id")),
                          on="user_id", how="left_anti")
                    .select(*cols, "bucket"))
        seq = seq_rest.unionByName(new_slice)
    return seq, seq_touched, counts, counts_touched


def incremental_transitions(
    spark: SparkSession,
    events_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    n_buckets: int = N_BUCKETS,
) -> StreamingQuery:
    """AvailableNow incremental transition counting over a growing
    events table: drains unseen parquet files, commits the enlarged
    (seq, counts) store atomically. Crash replays are no-ops."""
    os.makedirs(store_dir, exist_ok=True)
    sample = spark.read.parquet(events_dir)
    stream = (spark.readStream.schema(sample.schema)
              .parquet(events_dir)
              .select("user_id", "event_id", "event_type", "ts"))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch_id in applied_batches(store_dir):
            return
        seq, st, counts, ct = transitions_batch(spark, batch,
                                                store_dir, n_buckets)
        snapshot.commit(spark, store_dir, batch_id,
                        {"seq": (seq, st), "counts": (counts, ct)},
                        n_buckets)

    return (stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def render_transitions(spark: SparkSession, store_dir: str,
                       ndigits: int = 6) -> DataFrame:
    """(src, dst, n, p) in analytics.transition_probs' exact output
    shape: per-src normalized probabilities over the cumulative
    counts."""
    from pyspark.sql.window import Window

    counts = snapshot.read_table(spark, store_dir, "counts")
    if counts is None:
        raise ValueError(f"no committed transitions at {store_dir}")
    wsrc = Window.partitionBy("src")
    return (counts.select("src", "dst", "n")
            .withColumn("p", F.round(
                F.col("n") / F.sum("n").over(wsrc), ndigits)))
