"""Incremental inverted index: the streaming twin of
`operators.textstats.inverted_index`.

The batch operator rescans the corpus per build; a retrieval pipeline
over a growing corpus needs O(batch + touched buckets) per wave. Two
tables move through the versioned snapshot protocol
(streaming/snapshot.py) in ONE atomic commit:

    dfc     (token, df, bucket)        exact document frequency —
                                       additive across waves because
                                       doc ids are append-only
    entries (token, doc, tf, bucket)   the <= max_postings SMALLEST
                                       doc ids per token (with tf)

The per-token cap is MERGE-SAFE: min-k by doc id is a semilattice
(cap(cap(A) ∪ cap(B)) == cap(A ∪ B)), so the rendered index after any
wave split is row-identical to the batch operator on the full corpus
— pinned in tests/test_streaming_index.py. df stays exact because it
is counted BEFORE the cap, exactly like the batch operator.

Per batch: tokenize only the new docs; existing rows for the batch's
tokens load via an O(batch) broadcast semi-join (never a store scan);
the cap window runs over touched tokens only. Crash replay of an
applied batch id is a no-op (manifest inside the version dir);
a crash before the pointer swap replays against the old store.

Reference scope: the reference has no streaming (SURVEY.md §2.8);
this extends its ES-indexing role (SURVEY S5) the way the rest of the
streaming package extends conversion.
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

MAX_POSTINGS = 32


def index_batch(
    spark: SparkSession,
    docs: DataFrame,
    store_dir: str,
    max_postings: int = MAX_POSTINGS,
    n_buckets: int = N_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, set[int]]:
    """One incremental step. Returns (entries, dfc, touched): the two
    FULL logical tables to commit and the buckets this batch writes.
    Pure transformation — the caller commits."""
    from pyspark.sql.window import Window

    from mms_rdf_spark.operators.textstats import _toks

    tf = (docs.select(F.col(id_col).alias("doc"),
                      F.explode(_toks(F.col(text_col))).alias("token"))
          .groupBy("token", "doc").agg(F.count(F.lit(1)).alias("tf"))
          .withColumn("bucket", bucket_col("token", n_buckets))
          .localCheckpoint())
    d_df = (tf.groupBy("token", "bucket")
            .agg(F.count(F.lit(1)).alias("df")))
    touched = {r.bucket for r in
               tf.select("bucket").distinct().collect()}
    batch_tokens = tf.select("token").distinct()

    old_entries = snapshot.read_table(spark, store_dir, "entries")
    old_dfc = snapshot.read_table(spark, store_dir, "dfc")
    if old_entries is None:
        merged_entries, merged_dfc = tf, d_df
    else:
        hit_e = old_entries.join(F.broadcast(batch_tokens),
                                 on="token", how="left_semi")
        rest_e = old_entries.join(F.broadcast(batch_tokens),
                                  on="token", how="left_anti")
        merged_entries = rest_e.unionByName(hit_e.unionByName(tf))
        hit_d = (old_dfc.join(F.broadcast(batch_tokens),
                              on="token", how="left_semi")
                 .unionByName(d_df)
                 .groupBy("token", "bucket")
                 .agg(F.sum("df").cast("long").alias("df")))
        rest_d = old_dfc.join(F.broadcast(batch_tokens),
                              on="token", how="left_anti")
        merged_dfc = rest_d.unionByName(hit_d)
    # min-k cap per token: applied to touched tokens only (the rest
    # already satisfy it); merge-safe because min-k is a semilattice
    w = Window.partitionBy("token").orderBy("doc")
    capped_hit = (merged_entries
                  .join(F.broadcast(batch_tokens), on="token",
                        how="left_semi")
                  .withColumn("_rn", F.row_number().over(w))
                  .where(F.col("_rn") <= max_postings).drop("_rn"))
    rest = merged_entries.join(F.broadcast(batch_tokens),
                               on="token", how="left_anti")
    return rest.unionByName(capped_hit), merged_dfc, touched


def incremental_index(
    spark: SparkSession,
    docs_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    max_postings: int = MAX_POSTINGS,
    n_buckets: int = N_BUCKETS,
) -> StreamingQuery:
    """AvailableNow incremental indexing over a growing documents
    table: drains unseen parquet files and commits the enlarged
    (entries, dfc) store atomically. Re-running after new files
    arrive processes only the delta; crash replays are no-ops."""
    os.makedirs(store_dir, exist_ok=True)
    sample = spark.read.parquet(docs_dir)
    stream = (spark.readStream.schema(sample.schema).parquet(docs_dir)
              .select("doc_id", "text"))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch_id in applied_batches(store_dir):
            return
        entries, dfc, touched = index_batch(
            spark, batch, store_dir, max_postings, n_buckets)
        snapshot.commit(spark, store_dir, batch_id,
                        {"entries": (entries, touched),
                         "dfc": (dfc, touched)}, n_buckets)

    return (stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def render_index(spark: SparkSession, store_dir: str) -> DataFrame:
    """(token, df, postings) in the batch operator's exact output
    shape — the equality surface against textstats.inverted_index."""
    entries = snapshot.read_table(spark, store_dir, "entries")
    dfc = snapshot.read_table(spark, store_dir, "dfc")
    if entries is None or dfc is None:
        raise ValueError(f"no committed index at {store_dir}")
    postings = (entries.groupBy("token")
                .agg(F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("doc", "tf"))),
                        lambda x: F.concat(
                            x["doc"].cast("string"), F.lit(":"),
                            x["tf"].cast("string"))),
                    ",").alias("postings")))
    return (dfc.select("token", "df")
            .join(postings, on="token")
            .select("token", "df", "postings"))
