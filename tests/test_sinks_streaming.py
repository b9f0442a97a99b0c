"""TTL / LPG-CSV export sinks and incremental streaming extraction."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from mms_rdf_spark.operators import materialize as M
from mms_rdf_spark.operators.sinks import ttl_header, ttl_lines, write_lpg_csvs, write_ttl


def test_ttl_lines_shapes(spark, triples_df):
    lines = ttl_lines(triples_df.limit(200)).collect()
    for r in lines:
        assert r["value"].endswith(" .")
    # literal triples quoted, IRI triples not
    lit = ttl_lines(
        triples_df.where(~F.col("object_is_iri")
                         & (F.col("predicate") == "mms-property:text"))
        .limit(5)).collect()
    assert all('"' in r["value"] for r in lit)


def test_write_ttl_roundtrip_counts(spark, triples_df, tmp_path):
    out = str(tmp_path / "ttl")
    n = triples_df.count()
    write_ttl(triples_df, out)
    text = spark.read.text(out + "/part-*").count()
    assert text == n
    assert ttl_header().startswith("@prefix")
    assert os.path.exists(out + "/_prefixes.ttl")


def test_write_lpg_csvs(spark, triples_df, tmp_path):
    out = str(tmp_path / "lpg")
    nodes, edges = M.lpg_nodes(triples_df), M.lpg_edges(triples_df)
    write_lpg_csvs(nodes, edges, out)
    edge_files = glob.glob(out + "/edges/*.csv")
    assert edge_files
    back = spark.read.option("header", True).csv(out + "/edges")
    assert back.columns == ["~id", "~label", "~from", "~to"]
    assert back.count() == edges.count()


def test_incremental_streaming_extract(spark, tmp_path):
    from mms_rdf_spark.operators.extract import extract_triples
    from mms_rdf_spark.streaming.incremental import incremental_extract
    from mms_rdf_spark.synth import make_transcripts

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    pdf = make_transcripts(n_convs=10, hot_conv_turns=20)
    half = len(pdf) // 2
    pdf.iloc[:half].to_parquet(src + "/batch1.parquet", index=False)

    q = incremental_extract(spark, src, out, ckpt)
    q.awaitTermination(120)
    first = spark.read.parquet(out).count()
    want_first = extract_triples(
        spark, spark.createDataFrame(pdf.iloc[:half]),
        include_conversations=False).count()
    assert first == want_first

    # new file lands -> only the delta is processed
    pdf.iloc[half:].to_parquet(src + "/batch2.parquet", index=False)
    q2 = incremental_extract(spark, src, out, ckpt)
    q2.awaitTermination(120)
    total = spark.read.parquet(out).count()
    want_total = extract_triples(
        spark, spark.createDataFrame(pdf),
        include_conversations=False).count()
    assert total == want_total


def test_streaming_dedup_incremental(spark, tmp_path):
    """Two AvailableNow drains: duplicates within a batch AND across
    batches (inside the watermark) are suppressed; state survives via
    the checkpoint."""
    import pandas as pd

    from mms_rdf_spark.streaming.dedup import streaming_dedup

    ind = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = pd.Timestamp("2024-01-01 00:00:00")

    batch1 = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["alpha", "beta", "alpha"],          # in-batch dup
        "ts": [t0, t0, t0 + pd.Timedelta(minutes=1)],
    })
    spark.createDataFrame(batch1).coalesce(1).write.parquet(ind)
    streaming_dedup(spark, ind, out, ckpt).awaitTermination()
    got1 = spark.read.parquet(out)
    assert got1.count() == 2
    assert {r["content_hash"] for r in got1.collect()} == \
        {r["h"] for r in spark.createDataFrame(batch1)
         .selectExpr("md5(text) h").distinct().collect()}

    batch2 = pd.DataFrame({
        "doc_id": [4, 5],
        "text": ["alpha", "gamma"],                  # cross-batch dup
        "ts": [t0 + pd.Timedelta(minutes=2), t0 + pd.Timedelta(minutes=3)],
    })
    spark.createDataFrame(batch2).coalesce(1).write.mode("append") \
        .parquet(ind)
    streaming_dedup(spark, ind, out, ckpt).awaitTermination()
    got2 = spark.read.parquet(out)
    assert got2.count() == 3  # only 'gamma' is new
    assert got2.where("doc_id = 4").count() == 0


def test_streaming_curate_matches_batch_and_is_exactly_once(spark,
                                                            tmp_path):
    """Streaming curate = batch curate_full on an arrival-ordered
    corpus (survivor semantics coincide when the min doc_id arrives
    first), duplicates suppressed within and across drains, and a
    re-drain with no new files emits nothing (exactly-once)."""
    import pandas as pd

    from mms_rdf_spark.operators.curate import curate_full
    from mms_rdf_spark.streaming.curate import streaming_curate

    ind = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = pd.Timestamp("2024-01-01 00:00:00")

    texts = ["the cat sat on the mat and it is a story to read",
             "ZZZZ!!! $$$ ???",                       # fails quality
             "the cat sat on the mat and it is a story to read",  # dup
             "word word the of to in a good doc here to read now"]
    batch1 = pd.DataFrame({
        "doc_id": [1, 2, 3, 4], "text": texts,
        "ts": [t0 + pd.Timedelta(minutes=i) for i in range(4)]})
    spark.createDataFrame(batch1).coalesce(1).write.parquet(ind)
    streaming_curate(spark, ind, out, ckpt).awaitTermination()
    got1 = spark.read.parquet(out)
    want = curate_full(
        spark.createDataFrame(batch1[["doc_id", "text"]]))
    assert sorted(map(tuple, got1.drop("ts").collect())) == \
        sorted(map(tuple, want.collect()))

    # re-drain with no new input: nothing re-emitted
    streaming_curate(spark, ind, out, ckpt).awaitTermination()
    assert spark.read.parquet(out).count() == got1.count()

    # new file: cross-batch duplicate suppressed, new doc curated
    batch2 = pd.DataFrame({
        "doc_id": [5, 6],
        "text": [texts[0],                            # cross-batch dup
                 "a fresh document with plain words to keep and read"],
        "ts": [t0 + pd.Timedelta(minutes=5),
               t0 + pd.Timedelta(minutes=6)]})
    spark.createDataFrame(batch2).coalesce(1).write.mode("append") \
        .parquet(ind)
    streaming_curate(spark, ind, out, ckpt).awaitTermination()
    got2 = spark.read.parquet(out)
    assert got2.where("doc_id = 5").count() == 0
    assert got2.where("doc_id = 6").count() == 1
    assert got2.count() == got1.count() + 1
