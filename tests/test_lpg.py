"""LPG projection: predicate classification, node pivot, edge
determinism, Void stubs (reference src/lpg/convert.js semantics)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mms_rdf_spark.operators import materialize as M


def test_predicate_classification(spark, triples_df):
    cls = {r["predicate"]: (r["has_literal"], r["has_edge"])
           for r in M.classify_predicates(triples_df).collect()}
    assert cls["mms-property:text"] == (1, 0)
    assert cls["mms-property:turns"] == (0, 1)
    # role can be an IRI (enum) — edge-ish, never literal
    assert cls["mms-property:role"][0] == 0
    # deny-list predicates never classified
    assert "mms-ontology:elementId" not in cls


def test_node_pivot_multivalue(spark, triples_df):
    nodes = M.lpg_nodes(triples_df)
    row = nodes.where(F.col("~label") == "mms-class:AssistantTurn").first()
    assert row is not None and row["~id"].startswith("mms-element:")
    # every typed subject appears exactly once
    assert nodes.groupBy("~id").count().where("count > 1").count() == 0


def test_edges_deterministic_and_nil_free(spark, triples_df):
    e1 = M.lpg_edges(triples_df)
    e2 = M.lpg_edges(triples_df.repartition(7))
    assert e1.where(F.col("~to") == "rdf:nil").count() == 0
    ids1 = {r["~id"] for r in e1.collect()}
    ids2 = {r["~id"] for r in e2.collect()}
    assert ids1 == ids2  # hash ids stable under repartitioning


def test_void_stubs_cover_dangling(spark, triples_df):
    nodes = M.lpg_nodes(triples_df)
    edges = M.lpg_edges(triples_df)
    void = M.lpg_void_nodes(nodes, edges)
    # without amend, tool artifacts dangle -> Void stubs exist
    assert void.count() > 0
    # every edge target is now covered
    covered = nodes.select("~id").union(void.select("~id"))
    uncovered = edges.select(F.col("~to").alias("~id")) \
        .join(covered, on="~id", how="left_anti")
    assert uncovered.count() == 0


def test_amend_closes_graph(spark, triples_df):
    from mms_rdf_spark.operators.amend import amend, dangling_objects

    amended = amend(triples_df)
    assert dangling_objects(amended).count() == 0
    # idempotent: second pass adds nothing
    again = amend(amended)
    assert again.count() == amended.count()


def test_graph_diff_tags_changes(spark):
    from mms_rdf_spark.operators.amend import graph_diff

    ddl = "subject string, predicate string, object string"
    old = spark.createDataFrame(
        [("a", "p", "x"), ("b", "p", "y"), ("c", "p", None)], ddl)
    new = spark.createDataFrame(
        [("a", "p", "x"), ("b", "p", "z"), ("c", "p", None)], ddl)
    got = {(r["subject"], r["object"], r["change"])
           for r in graph_diff(old, new).collect()}
    # unchanged (incl. the NULL-object triple) absent; change tagged
    assert got == {("b", "z", "added"), ("b", "y", "removed")}


def test_rdfs_entailment_rules_and_literal_guard(spark):
    from mms_rdf_spark.operators.materialize import rdfs_entailment

    ddl = "subject string, predicate string, object string, object_is_iri boolean"
    abox = spark.createDataFrame(
        [("x", "p_sub", "y", True),        # fires 7 (2 hops), 2, 3
         ("u", "rdf:type", "C1", True),    # fires 9 through C1<C2<C3
         ("w", "p_lit", "hello", False)],  # literal: rdfs3 must NOT fire
        ddl)
    tddl = "subject string, predicate string, object string"
    tbox = spark.createDataFrame(
        [("p_sub", "rdfs:subPropertyOf", "p_mid"),
         ("p_mid", "rdfs:subPropertyOf", "p_top"),
         ("p_mid", "rdfs:domain", "DC"),
         ("p_mid", "rdfs:range", "RC"),
         ("p_lit", "rdfs:range", "LC"),
         ("C1", "rdfs:subClassOf", "C2"),
         ("C2", "rdfs:subClassOf", "C3"),
         ("DC", "rdfs:subClassOf", "DSup")], tddl)
    got = {(r["subject"], r["predicate"], r["object"])
           for r in rdfs_entailment(abox, tbox).collect()}
    assert got == {
        # rdfs7: p_sub <=+ p_mid, p_top
        ("x", "p_mid", "y"), ("x", "p_top", "y"),
        # rdfs2 via the extended domain (p_sub inherits p_mid's)
        ("x", "rdf:type", "DC"),
        # rdfs3 likewise (y is an IRI)
        ("y", "rdf:type", "RC"),
        # rdfs9 over asserted AND derived types
        ("u", "rdf:type", "C2"), ("u", "rdf:type", "C3"),
        ("x", "rdf:type", "DSup"),
    }
    # delta excludes asserted rows, and the literal never gained a type
    assert ("w", "rdf:type", "LC") not in got
    assert ("u", "rdf:type", "C1") not in got


def test_rdfs_entailment_empty_tbox_is_empty_delta(spark):
    from mms_rdf_spark.operators.materialize import rdfs_entailment

    ddl = "subject string, predicate string, object string"
    abox = spark.createDataFrame([("x", "p", "y")], ddl)
    tbox = spark.createDataFrame([], ddl)
    assert rdfs_entailment(abox, tbox).count() == 0


def test_sameas_smush_chain_literal_guard_and_merge(spark):
    from mms_rdf_spark.operators.materialize import sameas_smush

    ddl = "subject string, predicate string, object string, object_is_iri boolean"
    triples = spark.createDataFrame(
        [# 2-hop sameAs chain: e3 = e2 = e1 -> canonical e1 (min)
         ("e3", "owl:sameAs", "e2", True),
         ("e2", "owl:sameAs", "e1", True),
         # facts that must merge after smushing (dup by design)
         ("e2", "p", "X", True),
         ("e3", "p", "X", True),
         # object rewrite (IRI) vs literal guard (same lexical form!)
         ("a", "q", "e2", True),
         ("a", "r", "e2", False),
         # untouched row
         ("z", "p", "Z", True)], ddl)
    got = {(r["subject"], r["predicate"], r["object"], r["object_is_iri"])
           for r in sameas_smush(triples).collect()}
    assert got == {
        ("e1", "p", "X", True),          # merged: e2/e3 rows collapse to ONE
        ("a", "q", "e1", True),          # IRI object rewritten via 2-hop CC
        ("a", "r", "e2", False),         # literal survives verbatim
        ("z", "p", "Z", True),
    }


def test_sameas_smush_without_iri_flag_rewrites_all_objects(spark):
    from mms_rdf_spark.operators.materialize import sameas_smush

    ddl = "subject string, predicate string, object string"
    triples = spark.createDataFrame(
        [("b", "owl:sameAs", "a"),
         ("s", "p", "b")], ddl)
    got = {(r["subject"], r["predicate"], r["object"])
           for r in sameas_smush(triples).collect()}
    assert got == {("s", "p", "a")}
