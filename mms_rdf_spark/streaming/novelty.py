"""Incremental first-occurrence n-gram novelty: the streaming twin of
`operators.textstats.ngram_novelty` (twin #18).

The corpus-ordering signal should not rescan the world per wave: the
store keeps TWO tables moved through the versioned snapshot protocol
(streaming/snapshot.py), transactional as a unit:

    grams    (gram, first_doc, bucket)   global min doc_id per distinct
                                         shingle; bucket = crc32(gram)
    docstats (doc_id, n_grams, bucket)   per-doc distinct-shingle count,
                                         stamped once on arrival;
                                         bucket = crc32(str(doc_id))

The gram merge is MIN-idempotent (min(x, x) = x), so even a replayed
merge cannot corrupt first_doc; replay protection from the in-version
manifest guards the docstats append. Only store rows for grams PRESENT
IN THE BATCH re-aggregate (bucket-pruned write, untouched buckets
hardlink forward) — per-wave cost is O(batch + touched buckets), never
O(corpus).

`render_novelty` reproduces the batch operator's exact output shape
(doc_id, n_grams, n_new, novelty): n_new(doc) falls straight out of a
groupBy(first_doc) on the gram store, so cumulative-store render ==
ngram_novelty on the concatenated corpus ROW-IDENTICALLY for any wave
split — min over waves IS the global min, regardless of arrival order
(pinned in tests/test_streaming_novelty.py).

Input contract: each doc_id arrives in exactly one wave (same contract
as the other document twins; re-delivery of a whole batch is handled by
the manifest, re-delivery of a doc under a NEW batch id is not a
streaming-dedup concern but an upstream keying bug).

Reference scope: the reference has no streaming (SURVEY §2.8); this
extends its corpus-construction role the way streaming/vocab.py extends
vocabulary construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mms_rdf_spark.streaming import snapshot
from mms_rdf_spark.streaming.snapshot import (
    N_BUCKETS,
    applied_batches,
    bucket_col,
)


def _doc_grams(docs: DataFrame, n: int) -> DataFrame:
    """Distinct (doc_id, gram) shingles — same construction as the
    batch operator (textstats.ngram_novelty)."""
    toks = F.filter(F.split(F.coalesce(F.col("text"), F.lit("")), " "),
                    lambda x: x != "")
    base = docs.select("doc_id", toks.alias("toks"))
    t = F.col("toks")
    cols = [F.slice(t, i + 1, F.greatest(F.size(t) - (n - 1), F.lit(0)))
            for i in range(n)]
    grams = cols[0]
    for c in cols[1:]:
        grams = F.zip_with(grams, c, lambda a, b: F.concat_ws(" ", a, b))
    return (base.select("doc_id", F.explode(grams).alias("gram"))
            .distinct())


def novelty_batch(
    spark: SparkSession,
    docs: DataFrame,
    store_dir: str,
    n_buckets: int = N_BUCKETS,
    n: int = 3,
) -> tuple[DataFrame, set[int], DataFrame, set[int]]:
    """One incremental step: returns (grams, touched_gram_buckets,
    docstats, touched_stat_buckets) — the FULL logical tables to commit
    and the buckets this batch writes. Pure transformation — the
    caller commits both tables in ONE snapshot version."""
    dg = _doc_grams(docs, n).localCheckpoint()

    batch_first = (dg.groupBy("gram")
                   .agg(F.min("doc_id").alias("first_doc"))
                   .withColumn("bucket", bucket_col("gram", n_buckets)))
    batch_stats = (dg.groupBy("doc_id")
                   .agg(F.count(F.lit(1)).alias("n_grams"))
                   .withColumn("bucket", F.pmod(
                       F.crc32(F.col("doc_id").cast("string")),
                       F.lit(n_buckets)).cast("int")))
    batch_first = batch_first.localCheckpoint()
    batch_stats = batch_stats.localCheckpoint()
    touched_g = {r.bucket for r in
                 batch_first.select("bucket").distinct().collect()}
    touched_s = {r.bucket for r in
                 batch_stats.select("bucket").distinct().collect()}

    old_g = snapshot.read_table(spark, store_dir, "grams")
    old_s = snapshot.read_table(spark, store_dir, "docstats")
    if old_g is None:
        return batch_first, touched_g, batch_stats, touched_s

    batch_grams = batch_first.select("gram")
    hit = (old_g.join(F.broadcast(batch_grams), on="gram",
                      how="left_semi")
           .unionByName(batch_first)
           .groupBy("gram", "bucket")
           .agg(F.min("first_doc").alias("first_doc"))
           .select("gram", "first_doc", "bucket"))
    rest = old_g.join(F.broadcast(batch_grams), on="gram",
                      how="left_anti")
    grams = rest.unionByName(hit)
    stats = old_s.unionByName(batch_stats)
    return grams, touched_g, stats, touched_s


def incremental_novelty(
    spark: SparkSession,
    docs_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    n_buckets: int = N_BUCKETS,
    n: int = 3,
) -> StreamingQuery:
    """AvailableNow incremental novelty over a growing documents
    table: drains unseen parquet files, commits the enlarged gram +
    docstats store atomically (one pointer swap for both tables).
    Crash replays are no-ops."""
    os.makedirs(store_dir, exist_ok=True)
    sample = spark.read.parquet(docs_dir)
    stream = (spark.readStream.schema(sample.schema).parquet(docs_dir)
              .select("doc_id", "text"))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch_id in applied_batches(store_dir):
            return
        grams, tg, stats, ts = novelty_batch(spark, batch, store_dir,
                                             n_buckets, n)
        snapshot.commit(spark, store_dir, batch_id,
                        {"grams": (grams, tg),
                         "docstats": (stats, ts)}, n_buckets)

    return (stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def render_novelty(spark: SparkSession, store_dir: str) -> DataFrame:
    """(doc_id, n_grams, n_new, novelty) in ngram_novelty's exact
    output shape over the cumulative corpus: n_new is a
    groupBy(first_doc) of the gram store, left-joined onto docstats
    (docs introducing nothing get 0)."""
    grams = snapshot.read_table(spark, store_dir, "grams")
    stats = snapshot.read_table(spark, store_dir, "docstats")
    if grams is None or stats is None:
        raise ValueError(f"no committed novelty store at {store_dir}")
    n_new = (grams.groupBy(F.col("first_doc").alias("doc_id"))
             .agg(F.count(F.lit(1)).alias("n_new")))
    return (stats.select("doc_id", "n_grams")
            .join(n_new, on="doc_id", how="left")
            .select("doc_id", "n_grams",
                    F.coalesce("n_new", F.lit(0)).cast("long")
                    .alias("n_new"),
                    F.round(F.coalesce("n_new", F.lit(0))
                            / F.col("n_grams"), 6).alias("novelty")))
