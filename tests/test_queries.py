"""SPARQL-equivalent query checks (SURVEY.md §2.10): the six patterns
the produced graph must support, each validated against an
independently-computed expectation from the input frame."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from mms_rdf_spark.functions import MENTION_RE, element_iri, turn_element_id
from mms_rdf_spark.plans.closure import transitive_closure
from mms_rdf_spark.vocab import CLASS_HIERARCHY


def test_bgp_join_chain(spark, triples_df, transcripts_pdf):
    """BGP: ?t a ToolTurn . ?t invokedTool ?tool — tool-turn subjects
    joined to their invoked tool (notebook cell 9 analog)."""
    types = triples_df.where((F.col("predicate") == "rdf:type")
                             & (F.col("object") == "mms-class:ToolTurn"))
    tools = triples_df.where(F.col("predicate") == "mms-property:invokedTool")
    got = types.select("subject").join(tools, on="subject").count()
    want = int(((transcripts_pdf.role == "tool")
                & transcripts_pdf.tool.notna()).sum())
    assert got == want


def test_filter_not_exists_anti_join(spark, triples_df, transcripts_pdf):
    """Turn elements with NO mention triples (filter not exists)."""
    turns = triples_df.where(
        (F.col("predicate") == "rdf:type")
        & F.col("object").endswith("Turn")).select("subject")
    mentioned = triples_df.where(
        F.col("predicate") == "mms-property:mentions").select("subject")
    got = turns.join(mentioned, on="subject", how="left_anti").count()
    import re
    cre = re.compile(MENTION_RE)
    want = int(transcripts_pdf.text.fillna("").map(
        lambda t: len(cre.findall(t)) == 0).sum())
    assert got == want


def test_ordered_list_walk(spark, triples_df, transcripts_pdf):
    """rdf:rest*/rdf:first equivalent: unroll the per-conversation
    _turns list and compare with turn_idx order (W2 round-trip)."""
    from mms_rdf_spark.plans.closure import unroll_lists

    lists = triples_df.where(F.col("predicate") == "mms-property:turns")
    got = {r["subject"]: r["items"]
           for r in unroll_lists(lists).collect()}
    for conv_id, grp in transcripts_pdf.groupby("conv_id"):
        want = [element_iri(turn_element_id(conv_id, int(i)))
                for i in sorted(grp.turn_idx)]
        assert got[element_iri(conv_id)] == want


def test_rdf_nil_emptiness(spark, triples_df, transcripts_pdf):
    """Empty tool value ('') -> rdf:nil object (cells 11/13 analog)."""
    got = triples_df.where(
        F.col("predicate").isin("mms-property:tool",
                                "mms-property:invokedTool")
        & (F.col("object") == "rdf:nil")).count()
    want = int((transcripts_pdf.tool == "").sum())
    assert got == want


def test_values_in_list(spark, triples_df):
    """`values` inline table -> isin over mention objects (cell 19)."""
    fixed = ["mms-artifact:Mention.ID:Catalyst",
             "mms-artifact:Mention.ID:catalyst"]
    got = (triples_df.where((F.col("predicate") == "mms-property:mentions")
                            & F.col("object").isin(fixed))
           .select("object").distinct().count())
    assert got == 2


def test_subclassof_closure_join(spark, triples_df):
    """rdfs:subClassOf* join: every element whose type is transitively
    a Turn — equals the count of turn-type triples, and none of the
    Conversation elements leak in."""
    closure = transitive_closure(
        spark.createDataFrame(CLASS_HIERARCHY, ["sub", "sup"]))
    turn_subtypes = closure.where(F.col("sup") == "mms-class:Turn") \
        .select(F.col("sub").alias("object"))
    typed = triples_df.where(F.col("predicate") == "rdf:type")
    got = typed.join(turn_subtypes, on="object").select("subject").distinct()
    want = typed.where(F.col("object").endswith("Turn")) \
        .select("subject").distinct()
    assert got.count() == want.count()
    assert got.join(
        typed.where(F.col("object") == "mms-class:Conversation"),
        on="subject").count() == 0


def test_rest_star_first_over_collection_graph(spark, triples_df):
    """The literal p/rdf:rest*/rdf:first walk (notebook cell 11) over a
    graph emitted in RDF-collection form recovers the same membership
    + order as the idx encoding."""
    from mms_rdf_spark.operators.collections import to_rdf_collection
    from mms_rdf_spark.sparql import Graph

    coll_graph = Graph(to_rdf_collection(triples_df))
    got = {(r["subject"], r["object"], r["idx"]) for r in
           coll_graph.rest_star_first("mms-property:turns").collect()}
    want = {(r["subject"], r["object"], r["idx"]) for r in
            triples_df.where(F.col("predicate") == "mms-property:turns")
            .select("subject", "object", "idx").collect()}
    assert got == want


def test_entry_registry_has_no_duplicate_keys():
    """The queries() dict is built from one literal; a re-added name
    silently SHADOWS the original (the text_zipf near-miss and the
    link_sorted_parts shadowing before it). AST-pin uniqueness so a
    duplicate key fails loudly, and pin oracle keys ⊆ query keys."""
    import ast
    from collections import Counter

    import __spark_entry__ as e

    tree = ast.parse(open(e.__file__).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "queries":
            dicts = [d for d in ast.walk(node)
                     if isinstance(d, ast.Dict) and len(d.keys) > 100]
            assert len(dicts) == 1
            keys = [k.value for k in dicts[0].keys]
            dups = [k for k, c in Counter(keys).items() if c > 1]
            assert not dups, f"duplicate queries() keys: {dups}"
            registry = set(keys)
    # oracle keys must reference existing queries (and no oracle key
    # may be assigned twice — double assignment hides a replacement)
    import re
    src = open(e.__file__).read()
    okeys = re.findall(r'q\["([a-z0-9_]+)"\] = ', src)
    odups = [k for k, c in Counter(okeys).items() if c > 1]
    assert not odups, f"oracle keys assigned twice: {odups}"
    assert set(okeys) <= registry
