"""Incremental inverted index + BM25 serving: the streaming twin of
`operators.textstats.inverted_index` AND `bm25_topk`.

The batch operator rescans the corpus per build; a retrieval pipeline
over a growing corpus needs O(batch + touched buckets) per wave.
Three tables move through the versioned snapshot protocol
(streaming/snapshot.py) in ONE atomic commit:

    entries (token, doc, tf, bucket)   UNCAPPED postings — the index
                                       itself; bucket = crc32(token)
    dfc     (token, df, bucket)        exact document frequency —
                                       additive across waves because
                                       doc ids are append-only
    doclen  (doc, dl, bucket)          per-doc token length, bucket =
                                       crc32(doc) — the BM25 norm side

The batch operator's `max_postings` is an OUTPUT-SHAPING cap (df
counts every doc; only the postings string truncates), so the cap
here applies at RENDER time, not in the store — which is what lets
the same store serve exact BM25: `bm25_from_index` reproduces
`bm25_topk` on the full corpus ROW-IDENTICALLY (same driver-folded
idf/avgdl rounding, same score expression order), pinned in
tests/test_streaming_index.py. Per-batch work is also cheaper than a
capped store: merge is a pure union (no window), since the entries
multiset is append-only under disjoint doc ids.

Crash replay of an applied batch id is a no-op (manifest inside the
version dir); a crash before the pointer swap replays against the old
store.

Reference scope: the reference has no streaming (SURVEY.md §2.8);
this extends its ES-indexing role (SURVEY S5) the way the rest of the
streaming package extends conversion.
"""

from __future__ import annotations

import math
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
    n_buckets: int = N_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, DataFrame, set[int], set[int]]:
    """One incremental step. Returns (entries, dfc, doclen,
    touched_tok, touched_doc): the three FULL logical tables to
    commit and the buckets this batch writes per bucketing scheme.
    Pure transformation — the caller commits."""
    from mms_rdf_spark.operators.textstats import _toks

    toks = F.coalesce(F.col(text_col), F.lit(""))
    tf = (docs.select(F.col(id_col).alias("doc"),
                      F.explode(_toks(toks)).alias("token"))
          .groupBy("token", "doc").agg(F.count(F.lit(1)).alias("tf"))
          .withColumn("bucket", bucket_col("token", n_buckets))
          .localCheckpoint())
    # dl WITHOUT the NULL-coalesce: bm25_topk's corpus stats count a
    # NULL-text doc in N but exclude it from avgdl (size(NULL) =
    # NULL); the store must preserve that exact semantics
    dl = (docs.select(F.col(id_col).alias("doc"),
                      F.size(_toks(F.col(text_col))).cast("long")
                      .alias("dl"))
          .withColumn("bucket",
                      F.pmod(F.crc32(F.col("doc").cast("string")),
                             F.lit(n_buckets)).cast("int"))
          .localCheckpoint())
    d_df = (tf.groupBy("token", "bucket")
            .agg(F.count(F.lit(1)).alias("df")))
    touched_tok = {r.bucket for r in
                   tf.select("bucket").distinct().collect()}
    touched_doc = {r.bucket for r in
                   dl.select("bucket").distinct().collect()}
    batch_tokens = tf.select("token").distinct()

    old_entries = snapshot.read_table(spark, store_dir, "entries")
    old_dfc = snapshot.read_table(spark, store_dir, "dfc")
    old_dl = snapshot.read_table(spark, store_dir, "doclen")
    if old_entries is None:
        return tf, d_df, dl, touched_tok, touched_doc
    merged_entries = old_entries.unionByName(tf)
    hit_d = (old_dfc.join(F.broadcast(batch_tokens),
                          on="token", how="left_semi")
             .unionByName(d_df)
             .groupBy("token", "bucket")
             .agg(F.sum("df").cast("long").alias("df")))
    rest_d = old_dfc.join(F.broadcast(batch_tokens),
                          on="token", how="left_anti")
    merged_dl = old_dl.unionByName(dl)
    return (merged_entries, rest_d.unionByName(hit_d), merged_dl,
            touched_tok, touched_doc)


def incremental_index(
    spark: SparkSession,
    docs_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    n_buckets: int = N_BUCKETS,
) -> StreamingQuery:
    """AvailableNow incremental indexing over a growing documents
    table: drains unseen parquet files and commits the enlarged
    (entries, dfc, doclen) store atomically. Re-running after new
    files arrive processes only the delta; crash replays are
    no-ops."""
    os.makedirs(store_dir, exist_ok=True)
    sample = spark.read.parquet(docs_dir)
    stream = (spark.readStream.schema(sample.schema).parquet(docs_dir)
              .select("doc_id", "text"))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch_id in applied_batches(store_dir):
            return
        entries, dfc, doclen, t_tok, t_doc = index_batch(
            spark, batch, store_dir, n_buckets)
        snapshot.commit(spark, store_dir, batch_id,
                        {"entries": (entries, t_tok),
                         "dfc": (dfc, t_tok),
                         "doclen": (doclen, t_doc)}, n_buckets)

    return (stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def render_index(spark: SparkSession, store_dir: str,
                 max_postings: int = MAX_POSTINGS) -> DataFrame:
    """(token, df, postings) in the batch operator's exact output
    shape — df exact from dfc, postings the `max_postings` smallest
    doc ids (the cap is output shaping, applied here, not in the
    store). The equality surface against textstats.inverted_index."""
    from pyspark.sql.window import Window

    entries = snapshot.read_table(spark, store_dir, "entries")
    dfc = snapshot.read_table(spark, store_dir, "dfc")
    if entries is None or dfc is None:
        raise ValueError(f"no committed index at {store_dir}")
    w = Window.partitionBy("token").orderBy("doc")
    capped = (entries.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") <= max_postings))
    postings = (capped.groupBy("token")
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


def bm25_from_index(
    spark: SparkSession,
    store_dir: str,
    terms: list,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k served FROM THE STORE — row-identical to
    textstats.bm25_topk on the full corpus (same driver-folded
    idf/avgdl rounding to 6dp, same fixed-order score chain, round 4,
    ties by doc_id), but touching only the query terms' postings and
    the doclen table instead of rescanning the corpus: the point of
    maintaining the index incrementally."""
    entries = snapshot.read_table(spark, store_dir, "entries")
    dfc = snapshot.read_table(spark, store_dir, "dfc")
    doclen = snapshot.read_table(spark, store_dir, "doclen")
    if entries is None or dfc is None or doclen is None:
        raise ValueError(f"no committed index at {store_dir}")
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("dl"), 6).alias("avgdl")).collect()[0]
    n, avgdl = stats["n"], stats["avgdl"]
    if not n:
        return doclen.select(F.col("doc").alias("doc_id"),
                             F.lit(None).cast("double").alias("score"))
    df_map = {r.token: r.df for r in
              dfc.where(F.col("token").isin(list(terms))).collect()}
    idf = [round(math.log(1 + (n - df_map.get(t, 0) + 0.5)
                          / (df_map.get(t, 0) + 0.5)), 6)
           for t in terms]
    hits = (entries.where(F.col("token").isin(list(terms)))
            .groupBy("doc")
            .agg(*[F.sum(F.when(F.col("token") == t, F.col("tf"))
                         .otherwise(0)).alias(f"tf_{i}")
                   for i, t in enumerate(terms)])
            .join(doclen.select("doc", "dl"), on="doc"))
    norm = F.col("dl") / avgdl
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        part = F.lit(idf[i]) * (tf * (k1 + 1)) \
            / (tf + k1 * (1 - b + b * norm))
        score = part if score is None else score + part
    return (hits.select(F.col("doc").alias("doc_id"),
                        F.round(score, 4).alias("score"))
            .orderBy(F.col("score").desc(), "doc_id").limit(k))
