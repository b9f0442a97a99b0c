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
