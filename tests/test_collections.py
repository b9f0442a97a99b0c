"""RDF-collection export/walk: idx -> rdf:first/rdf:rest -> idx must be
byte-identical (reference triplifier.js:256-288 emission,
lpg/convert.js:28-46 unroll)."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from mms_rdf_spark.operators.collections import (
    RDF_FIRST,
    RDF_REST,
    TRIPLE_COLS,
    sequence_member_elements,
    to_rdf_collection,
    unroll_collections,
)
from mms_rdf_spark.vocab import RDF_NIL


def _sorted(df) -> pd.DataFrame:
    pdf = df.select(*TRIPLE_COLS).toPandas()
    return pdf.sort_values(TRIPLE_COLS).reset_index(drop=True)


def test_collection_roundtrip_byte_identical(spark, triples_df):
    coll = to_rdf_collection(triples_df)
    back = unroll_collections(coll)
    pd.testing.assert_frame_equal(_sorted(back), _sorted(triples_df))


def test_collection_well_formed(spark, triples_df):
    coll = to_rdf_collection(triples_df).cache()
    n_members = triples_df.where(F.col("idx").isNotNull()).count()
    assert coll.where(F.col("predicate") == RDF_FIRST).count() == n_members
    assert coll.where(F.col("predicate") == RDF_REST).count() == n_members
    # exactly one chain terminator per list
    n_lists = (triples_df.where(F.col("idx").isNotNull())
               .select("subject", "predicate").distinct().count())
    assert coll.where((F.col("predicate") == RDF_REST)
                      & (F.col("object") == RDF_NIL)).count() == n_lists
    # cons IRIs carry the reference's .Index:<i> suffix
    head = coll.where(F.col("predicate") == RDF_FIRST).first()
    assert ".Index:" in head["subject"]
    coll.unpersist()


def test_collection_long_list_positions(spark):
    # a single 600-member list exercises ~10 doubling rounds
    from mms_rdf_spark.operators.extract import TRIPLE_SCHEMA

    rows = [("mms-element:c", "mms-property:turns",
             f"mms-element:c.Turn.{i}", True, None, None, i, "c", i)
            for i in range(600)]
    t = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    back = unroll_collections(to_rdf_collection(t))
    got = {(r["object"], r["idx"]) for r in back.collect()}
    assert got == {(f"mms-element:c.Turn.{i}", i) for i in range(600)}


def test_sequence_member_elements(spark, triples_df):
    mention_lists = triples_df.where(
        F.col("idx").isNotNull()
        & F.col("object").startswith("mms-artifact:Mention.ID:"))
    n = mention_lists.count()
    assert n > 0
    out = sequence_member_elements(
        triples_df, predicates=["mms-property:mentions"]).cache()
    # every member produced a typed sequence element + path back-pointer
    seqs = out.where(F.col("subject").rlike(
        r"^mms-artifact:Mention\.Element:.*\.Index:\d+$"))
    preds = {r["predicate"]: r["n"] for r in
             seqs.groupBy("predicate").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    mention_list_rows = triples_df.where(
        (F.col("predicate") == "mms-property:mentions")
        & F.col("idx").isNotNull()).count()
    assert preds.get("rdf:type", 0) == mention_list_rows
    assert preds.get("mms-ontology:path", 0) == mention_list_rows
    # the list rows now point at the sequence elements
    rewritten = out.where((F.col("predicate") == "mms-property:mentions")
                          & F.col("idx").isNotNull())
    assert rewritten.where(
        ~F.col("object").contains(".Element:")).count() == 0
    out.unpersist()


def test_unroll_from_ttl_loaded_graph(spark, triples_df, tmp_path):
    """The documented interchange loop: emit collection-form Turtle,
    re-read it (6 core columns only), walk the chains back to
    positions. Partial frames must null-fill, not crash."""
    from mms_rdf_spark.operators.sinks import ttl_lines
    from mms_rdf_spark.sources.ttl import read_ttl

    turns = triples_df.where(F.col("predicate") == "mms-property:turns")
    out = str(tmp_path / "coll_ttl")
    ttl_lines(to_rdf_collection(turns)).write.text(out)
    back = unroll_collections(read_ttl(spark, out))
    got = {(r["subject"], r["object"], r["idx"]) for r in back.collect()}
    want = {(r["subject"], r["object"], r["idx"])
            for r in turns.collect()}
    assert got == want


def test_cons_iris_distinct_across_prefixes(spark):
    """Two predicates sharing a local name on one subject must not
    merge chains (full-predicate cons keys)."""
    from mms_rdf_spark.operators.extract import TRIPLE_SCHEMA

    rows = [("mms-element:c", "mms-property:turns", "a", True,
             None, None, 0, None, None),
            ("mms-element:c", "ext:turns", "b", True,
             None, None, 0, None, None)]
    t = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    back = unroll_collections(to_rdf_collection(t))
    got = {(r["predicate"], r["object"], r["idx"]) for r in back.collect()}
    assert got == {("mms-property:turns", "a", 0), ("ext:turns", "b", 0)}


def test_conversation_fingerprints_detect_replays(spark):
    from mms_rdf_spark.operators.dedup import conversation_fingerprints

    rows = [("a", 0, "hi"), ("a", 1, "there"),
            ("b", 0, "hi"), ("b", 1, "there"),    # replay of a
            ("c", 1, "there"), ("c", 0, "hi"),    # same, rows shuffled
            ("d", 0, "hithere")]                  # boundary smear probe
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, "
                                     "text string")
    fps = {r["conv_id"]: r["fp"]
           for r in conversation_fingerprints(df).collect()}
    assert fps["a"] == fps["b"] == fps["c"]   # order-insensitive input
    assert fps["d"] != fps["a"]               # digests prevent smearing
    # repartition-stable
    again = {r["conv_id"]: r["fp"] for r in
             conversation_fingerprints(df.repartition(5)).collect()}
    assert fps == again
