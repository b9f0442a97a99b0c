"""SPARQL helper library, Gremlin traversal, and shape validation."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from mms_rdf_spark.operators import materialize as M
from mms_rdf_spark.shapes import validate, vocab_shapes
from mms_rdf_spark.sparql import Graph, Traversal


def test_pattern_and_bgp(spark, triples_df):
    g = Graph(triples_df)
    tool_turns = g.subjects_of_type("mms-class:ToolTurn")
    invoked = g.pattern(p="mms-property:invokedTool")
    assert (tool_turns.join(invoked, on="subject").count()
            == invoked.count())
    # bgp: conversation -turns-> turn -role-> role IRI
    chain = g.bgp(("mms-property:turns", "turn"),
                  ("mms-property:role", "role"))
    assert chain.columns == ["subject", "turn", "role"]
    assert chain.count() == g.pattern(p="mms-property:role").join(
        g.pattern(p="mms-property:turns").select(
            F.col("object").alias("subject")), on="subject").count()


def test_not_exists_and_values(spark, triples_df):
    g = Graph(triples_df)
    turns = g.pattern(p="rdf:type").where(
        F.col("object").endswith("Turn")).select("subject")
    silent = g.not_exists(turns, "mms-property:mentions")
    with_mentions = g.pattern(p="mms-property:mentions") \
        .select("subject").distinct()
    assert silent.count() + with_mentions.count() == turns.count()
    vals = g.values(g.pattern(p="mms-property:role"), "object",
                    ["mms-class:Role.User"])
    assert vals.select("object").distinct().count() == 1


def test_construct(spark, triples_df):
    g = Graph(triples_df)
    base = g.pattern(p="mms-property:invokedTool")
    built = g.construct(base, F.col("subject"), "mms-property:usedTool",
                        F.col("object"))
    assert built.count() == base.count()
    assert {r["predicate"] for r in built.select("predicate")
            .distinct().collect()} == {"mms-property:usedTool"}


def test_gremlin_traversal(spark, triples_df):
    edges = M.lpg_edges(triples_df)
    g = Graph(triples_df)
    convs = [r["subject"] for r in
             g.subjects_of_type("mms-class:Conversation").limit(2).collect()]
    # conv -out(turns)-> turn -out(role)-> role IRIs
    roles = (Traversal.V(edges, convs).out("mms-property:turns")
             .out("mms-property:role").to_df())
    got = {r["~id"] for r in roles.collect()}
    assert got and got <= {"mms-class:Role.User", "mms-class:Role.Assistant",
                           "mms-class:Role.System", "mms-class:Role.Tool",
                           "rdf:nil"}
    # in_ inverts out
    back = Traversal.V(edges, list(got)).in_("mms-property:role").to_df()
    assert back.count() > 0


def test_shapes_conforming_graph(spark, triples_df):
    v = validate(spark, triples_df)
    assert v.count() == 0, v.limit(5).collect()


def test_shapes_catch_violations(spark, triples_df):
    shapes = vocab_shapes()
    # break the graph: drop all role triples -> minCount violations;
    # flip a text triple to IRI -> nodeKind violation
    broken = triples_df.where(F.col("predicate") != "mms-property:role")
    v1 = validate(spark, broken)
    assert v1.where(F.col("constraint") == "minCount").count() > 0

    flipped = triples_df.withColumn(
        "object_is_iri",
        F.when(F.col("predicate") == "mms-property:text", F.lit(True))
        .otherwise(F.col("object_is_iri")))
    v2 = validate(spark, flipped, shapes)
    assert v2.where(F.col("constraint") == "nodeKind").count() > 0

    # duplicate role triples -> maxCount violation
    doubled = triples_df.unionByName(
        triples_df.where(F.col("predicate") == "mms-property:role")
        .withColumn("object", F.lit("mms-class:Role.User")))
    v3 = validate(spark, doubled)
    assert v3.where(F.col("constraint") == "maxCount").count() > 0


def test_vocab_shapes_content():
    s = vocab_shapes()
    role = s[(s.target_class == "mms-class:UserTurn")
             & (s.predicate == "mms-property:role")].iloc[0]
    assert role.min_count == 1 and role.max_count == 1
    assert role.node_kind == "IRI"
    text = s[(s.target_class == "mms-class:AssistantTurn")
             & (s.predicate == "mms-property:text")].iloc[0]
    assert text.lang == "en" and pd.isna(text.datatype)


def test_shexc_golden():
    """Generated ShExC for the fixture vocabulary (uml-to-shexc.js
    :196-216 layout, multiplicity table :38-56)."""
    from mms_rdf_spark.shapes import shexc_export

    text = shexc_export()
    golden_turn = (
        "mms-shape:Turn extends @mms-shape:Element {\n"
        "\tmms-property:role @mms-shape:Role ;\n"
        "\tmms-property:text xsd:string? ;\n"
        "\tmms-property:tool @mms-shape:Tool? ;\n"
        "\tmms-property:timestamp xsd:dateTime? ;\n"
        "\tmms-property:mentions @mms-shape:Mention* ;\n"
        "\tmms-property:urls @mms-shape:Url* ;\n"
        "\tmms-property:emails @mms-shape:Email* ;\n"
        "}\n"
    )
    assert golden_turn in text
    # diamond: ToolTurn extends both supers, reference-style repetition
    assert ("mms-shape:ToolTurn extends @mms-shape:Turn "
            "extends @mms-shape:AgentAction {") in text
    # lang-restricted override renders as rdf:langString
    assert "mms-property:text rdf:langString? ;" in text


def test_shape_map_and_shacl_export():
    from mms_rdf_spark.shapes import shacl_export, shape_map_export

    m = shape_map_export()
    assert "{ FOCUS a mms-class:Turn }@mms-shape:Turn," in m
    s = shacl_export()
    assert "mms-shape:Turn a shacl:NodeShape ;" in s
    assert "shacl:targetClass mms-class:Turn ;" in s
    assert ("shacl:path mms-property:role ; shacl:class mms-class:Role ; "
            "shacl:minCount 1 ; shacl:maxCount 1") in s
    # every block ends as a complete turtle statement
    for block in s.strip().split("\n\n"):
        assert block.rstrip().endswith(".")


def test_traversal_repeat_and_values_map(spark, triples_df):
    """repeat(out()).times(2) == out().out(); propertiesMap joins the
    nodes table."""
    from mms_rdf_spark.operators.materialize import lpg_edges, lpg_nodes

    edges = lpg_edges(triples_df).cache()
    convs = [r["~from"] for r in
             edges.where(F.col("~label") == "mms-property:turns")
             .select("~from").distinct().limit(3).collect()]
    two_hops = (Traversal.V(edges, convs)
                .out("mms-property:turns").out("mms-property:role").to_df())
    repeated = (Traversal.V(edges, convs)
                .repeat("out", 2).to_df())  # unlabeled: superset
    got2 = {r["~id"] for r in two_hops.collect()}
    gotr = {r["~id"] for r in repeated.collect()}
    assert got2 and got2 <= gotr
    nodes = lpg_nodes(triples_df)
    vm = (Traversal.V(edges, convs).out("mms-property:turns")
          .values_map(nodes))
    row = vm.where(F.col("~label").isNotNull()).first()
    assert row is not None and row["~label"].endswith("Turn")
    edges.unpersist()
