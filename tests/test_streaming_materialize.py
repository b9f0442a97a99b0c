"""Incremental LPG edge materialization: batch parity, cross-batch
dedup by deterministic id, exactly-once replay."""

from __future__ import annotations

import os

import pyspark.sql.functions as F


def _triples(spark, rows):
    """(subject, predicate, object) object-property rows."""
    return spark.createDataFrame(
        [(s, p, o, True, None, None, None, "c0", 0) for s, p, o in rows],
        "subject string, predicate string, object string, "
        "object_is_iri boolean, datatype string, lang string, "
        "idx int, conv_id string, turn_idx int")


def test_streaming_edges_match_batch_and_dedup(spark, tmp_path):
    from mms_rdf_spark.operators.extract import TRIPLE_SCHEMA
    from mms_rdf_spark.operators.materialize import lpg_edges
    from mms_rdf_spark.streaming.materialize import incremental_lpg_edges

    tdir = str(tmp_path / "triples")
    out = str(tmp_path / "edges")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(tdir, exist_ok=True)

    r1 = [("mms-element:A", "mms-property:mentions", "mms-artifact:X"),
          ("mms-element:B", "mms-property:uses", "mms-artifact:Y")]
    t1 = _triples(spark, r1)
    spark.createDataFrame(t1.collect(), TRIPLE_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(tdir)
    q = incremental_lpg_edges(spark, tdir, out, ckpt)
    q.awaitTermination(120)
    got1 = spark.read.parquet(os.path.join(out, "data"))
    ref1 = lpg_edges(t1)
    assert sorted(r["~id"] for r in got1.collect()) \
        == sorted(r["~id"] for r in ref1.collect())

    # second drain: one overlapping edge (same deterministic id) and
    # one new edge — only the new edge lands
    r2 = [("mms-element:A", "mms-property:mentions", "mms-artifact:X"),
          ("mms-element:C", "mms-property:uses", "mms-artifact:Z")]
    spark.createDataFrame(_triples(spark, r2).collect(), TRIPLE_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(tdir)
    q = incremental_lpg_edges(spark, tdir, out, ckpt)
    q.awaitTermination(120)
    got2 = spark.read.parquet(os.path.join(out, "data"))
    assert got2.count() == 3
    assert got2.select("~id").distinct().count() == 3  # no duplicates

    # third drain with nothing new: table unchanged (exactly-once)
    q = incremental_lpg_edges(spark, tdir, out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(os.path.join(out, "data")).count() == 3


def test_edges_batch_dedup_reads_id_column_only(spark, tmp_path):
    from mms_rdf_spark.streaming.materialize import edges_batch

    out = str(tmp_path / "edges")
    t = _triples(spark, [("mms-element:A", "mms-property:uses",
                          "mms-artifact:X")])
    # seed the committed table
    from mms_rdf_spark.operators.materialize import lpg_edges
    lpg_edges(t).write.parquet(os.path.join(out, "data"))
    fresh = edges_batch(spark, t, out)
    assert fresh.count() == 0
    # the committed-side scan is pruned to the id column
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    import re
    scans = [m for m in re.findall(r"ReadSchema: struct<[^>]*>", plan)]
    assert any("~id" in s and "~from" not in s for s in scans), scans


def _lit_triples(spark, rows):
    """(subject, predicate, object, is_iri) mixed rows."""
    return spark.createDataFrame(
        [(s, p, o, iri, None if iri else "xsd:string", None, None,
          "c0", 0) for s, p, o, iri in rows],
        "subject string, predicate string, object string, "
        "object_is_iri boolean, datatype string, lang string, "
        "idx int, conv_id string, turn_idx int")


def test_streaming_nodes_two_waves_match_batch(spark, tmp_path):
    """The last missing streaming twin (round-4 verdict item 7): node
    pivots across TWO waves equal the batch pivot over the full corpus
    — including a subject whose literals SPAN the waves and whose
    rdf:type only arrives in wave 2."""
    from mms_rdf_spark.operators.extract import TRIPLE_SCHEMA
    from mms_rdf_spark.operators.materialize import lpg_nodes
    from mms_rdf_spark.streaming.materialize import (
        incremental_lpg_nodes, read_nodes)

    tdir = str(tmp_path / "triples")
    out = str(tmp_path / "nodes")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(tdir, exist_ok=True)

    w1 = [("mms-element:A", "rdf:type", "mms-class:Turn", True),
          ("mms-element:A", "mms-property:text", "hello", False),
          ("mms-element:B", "mms-property:text", "spans waves", False),
          ("mms-element:C", "rdf:type", "mms-class:Conversation", True),
          ("mms-element:C", "mms-property:turns", "mms-element:A", True)]
    w2 = [("mms-element:B", "rdf:type", "mms-class:Turn", True),
          ("mms-element:B", "mms-property:role", "user", False),
          ("mms-element:A", "mms-property:text", "again", False),
          ("mms-element:D", "rdf:type", "mms-class:Turn", True)]

    for wave in (w1, w2):
        t = _lit_triples(spark, wave)
        spark.createDataFrame(t.collect(), TRIPLE_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(tdir)
        q = incremental_lpg_nodes(spark, tdir, out, ckpt)
        q.awaitTermination(120)

    all_t = _lit_triples(spark, w1 + w2)
    ref = lpg_nodes(all_t).toPandas().set_index("~id").sort_index()
    got = read_nodes(spark, out).toPandas().set_index("~id").sort_index()
    assert sorted(got.columns) == sorted(ref.columns)
    assert got[sorted(got.columns)].equals(ref[sorted(ref.columns)])
    # the wave-spanning subject merged literals from BOTH waves
    assert got.loc["mms-element:A", "mms-property:text"] == "again;hello"

    # exactly-once: a replayed drain with no new files changes nothing
    q = incremental_lpg_nodes(spark, tdir, out, ckpt)
    q.awaitTermination(120)
    got2 = read_nodes(spark, out).toPandas().set_index("~id").sort_index()
    assert got2[sorted(got2.columns)].equals(got[sorted(got.columns)])


def test_streaming_nodes_untouched_buckets_hardlinked(spark, tmp_path):
    """Bucket-upsert discipline for the node store: a wave that
    touches one subject leaves every other bucket's files as the SAME
    inodes across the commit."""
    from mms_rdf_spark.operators.extract import TRIPLE_SCHEMA
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.materialize import incremental_lpg_nodes

    tdir = str(tmp_path / "triples")
    out = str(tmp_path / "nodes")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(tdir, exist_ok=True)

    w1 = [(f"mms-element:N{i}", "rdf:type", "mms-class:Turn", True)
          for i in range(12)]
    t = _lit_triples(spark, w1)
    spark.createDataFrame(t.collect(), TRIPLE_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(tdir)
    incremental_lpg_nodes(spark, tdir, out, ckpt).awaitTermination(120)
    v0 = snapshot.current_version(out)

    def inodes(version):
        root = os.path.join(out, version, "nodes")
        return {b: {f: os.stat(os.path.join(root, b, f)).st_ino
                    for f in os.listdir(os.path.join(root, b))}
                for b in os.listdir(root) if b.startswith("bucket=")}

    before = inodes(v0)
    w2 = [("mms-element:N0", "mms-property:text", "touched", False)]
    spark.createDataFrame(_lit_triples(spark, w2).collect(),
                          TRIPLE_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(tdir)
    incremental_lpg_nodes(spark, tdir, out, ckpt).awaitTermination(120)
    v1 = snapshot.current_version(out)
    assert v1 != v0
    after = inodes(v1)
    import zlib
    # same formula as snapshot.bucket_col: crc32(subject) % n_buckets
    touched_bucket = f"bucket={zlib.crc32(b'mms-element:N0') % 16}"
    untouched = set(before) - {touched_bucket}
    assert untouched
    for b in untouched:
        assert after[b] == before[b]  # same inodes
