"""Incremental entity linking (streaming/link.py): single-batch parity
with the batch linker, cross-batch entity adoption, exactly-once
commit discipline."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F


def _mentions(spark, rows):
    """(conv_id, surface) rows -> minimal mention-triple frame."""
    return spark.createDataFrame(
        [(f"mms-element:Turn.{c}.0", "mms-property:mentions",
          f"mms-artifact:Mention.ID:{s}", True, None, None, None, c, 0)
         for c, s in rows],
        "subject string, predicate string, object string, "
        "object_is_iri boolean, datatype string, lang string, "
        "idx int, conv_id string, turn_idx int")


def test_single_batch_matches_batch_linker(spark, tmp_path):
    from mms_rdf_spark.operators.link import link_mentions
    from mms_rdf_spark.streaming.link import link_batch

    rows = [("c1", "Apache_Spark"), ("c1", "apache_spark"),
            ("c2", "APACHE.SPARK"), ("c2", "DuckDB"),
            ("c3", "duckdb"), ("c3", "Postgres")]
    m = _mentions(spark, rows)
    got = link_batch(spark, m, str(tmp_path / "ents")) \
        .orderBy("surface").toPandas()
    ref = link_mentions(m).orderBy("surface").toPandas()
    assert got[sorted(got.columns)].equals(ref[sorted(ref.columns)])


def test_incremental_adopts_existing_entities(spark, tmp_path):
    from mms_rdf_spark.streaming.link import _commit_batch, link_batch

    ents = str(tmp_path / "ents")
    os.makedirs(ents, exist_ok=True)
    # batch 0 seeds the table
    b0 = _mentions(spark, [("c1", "Apache_Spark"),
                           ("c1", "apache_spark"),
                           ("c2", "DuckDB")])
    _commit_batch(spark, link_batch(spark, b0, ents), ents, 0)
    t0 = spark.read.parquet(os.path.join(ents, "data")).toPandas()
    spark_eid = t0.set_index("surface").entity_id["Apache_Spark"]

    # batch 1: a recurring surface, a near-duplicate, and a new entity
    b1 = _mentions(spark, [("c3", "Apache_Spark"),     # recurring
                           ("c4", "APACHE-SPARK"),     # near-dup -> adopt
                           ("c5", "Postgres")])        # fresh entity
    _commit_batch(spark, link_batch(spark, b1, ents), ents, 1)
    t1 = spark.read.parquet(os.path.join(ents, "data")) \
        .toPandas().set_index("surface")

    # recurring surface kept its entity, freq accrued
    assert t1.entity_id["Apache_Spark"] == spark_eid
    assert t1.freq["Apache_Spark"] == 2
    # near-duplicate adopted the existing entity (anchor via block)
    assert t1.entity_id["APACHE-SPARK"] == spark_eid
    # genuinely new surface minted a new entity
    assert t1.entity_id["Postgres"] not in set(t0.entity_id) or \
        t1.entity_id["Postgres"] == "postgres"
    # every surface labeled exactly once
    assert t1.index.is_unique and t1.entity_id.notna().all()


def test_streaming_link_end_to_end_and_exactly_once(spark, tmp_path):
    from mms_rdf_spark.operators.extract import TRIPLE_SCHEMA
    from mms_rdf_spark.streaming.link import incremental_link

    triples = str(tmp_path / "triples")
    ents = str(tmp_path / "ents")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(triples, exist_ok=True)

    m0 = _mentions(spark, [("c1", "Apache_Spark"), ("c2", "DuckDB")])
    spark.createDataFrame(m0.collect(), TRIPLE_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(triples)
    q = incremental_link(spark, triples, ents, ckpt)
    q.awaitTermination(120)
    t0 = spark.read.parquet(os.path.join(ents, "data"))
    assert t0.count() == 2

    # second drain with a new file picks up ONLY the delta
    m1 = _mentions(spark, [("c3", "apache spark"), ("c4", "SQLite")])
    spark.createDataFrame(m1.collect(), TRIPLE_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(triples)
    q = incremental_link(spark, triples, ents, ckpt)
    q.awaitTermination(120)
    t1 = spark.read.parquet(os.path.join(ents, "data")).toPandas() \
        .set_index("surface")
    assert len(t1) == 4
    assert t1.entity_id["apache spark"] == t1.entity_id["Apache_Spark"]

    # a third drain with NO new data leaves the table untouched
    applied = json.load(open(os.path.join(ents, "_applied.json")))
    q = incremental_link(spark, triples, ents, ckpt)
    q.awaitTermination(120)
    t2 = spark.read.parquet(os.path.join(ents, "data")).toPandas() \
        .set_index("surface").sort_index()
    assert t2.equals(t1.sort_index())
    # and replaying an applied batch id is a no-op (crash discipline)
    from mms_rdf_spark.streaming.link import _applied_path
    assert json.load(open(_applied_path(ents)))[:len(applied)] == applied
