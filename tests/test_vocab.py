"""Vocabulary resolution semantics (SURVEY.md hard-part #1):
transitive domain reach, most-specific-domain preference (J2),
diamond hierarchies, conflict detection."""

from __future__ import annotations

import pytest

from mms_rdf_spark.vocab import (
    CLASS_HIERARCHY,
    VocabConflict,
    hierarchy_closure,
    resolve_vocabulary,
)


def test_closure_reflexive_and_transitive():
    c = hierarchy_closure(CLASS_HIERARCHY)
    assert c[("mms-class:Turn", "mms-class:Turn")] == 0
    assert c[("mms-class:UserTurn", "mms-class:Element")] == 2
    # diamond: ToolTurn reaches Element via two paths, min distance 2
    assert c[("mms-class:ToolTurn", "mms-class:Element")] == 2
    assert ("mms-class:Element", "mms-class:Turn") not in c


def test_most_specific_domain_wins():
    v = resolve_vocabulary()
    # ToolTurn inherits (Turn, tool) but its own binding is more derived
    assert v[("mms-class:ToolTurn", "tool")].predicate == "mms-property:invokedTool"
    assert v[("mms-class:UserTurn", "tool")].predicate == "mms-property:tool"
    # lang-restricted override only on AssistantTurn
    assert v[("mms-class:AssistantTurn", "text")].lang == "en"
    assert v[("mms-class:UserTurn", "text")].lang is None


def test_inheritance_through_hierarchy():
    v = resolve_vocabulary()
    for t in ("mms-class:UserTurn", "mms-class:SystemTurn", "mms-class:Turn"):
        assert v[(t, "role")].predicate == "mms-property:role"
        assert v[(t, "ts")].range == "xsd:dateTime"
    # Conversation does not inherit Turn keys
    assert ("mms-class:Conversation", "role") not in v


def test_diamond_ambiguity_raises():
    """Two same-key properties at equal domain distance must throw —
    the reference's minting-conflict hard error."""
    rows = [
        {"domain_type": "mms-class:Turn", "key": "k", "predicate": "p1",
         "property_type": "DatatypeProperty", "range": "xsd:string",
         "range_category": None, "cardinality": None,
         "list_item_range": None, "is_list": False, "lang": None,
         "nested_under": None},
        {"domain_type": "mms-class:AgentAction", "key": "k", "predicate": "p2",
         "property_type": "DatatypeProperty", "range": "xsd:string",
         "range_category": None, "cardinality": None,
         "list_item_range": None, "is_list": False, "lang": None,
         "nested_under": None},
    ]
    # ToolTurn is 1 hop from both Turn and AgentAction -> ambiguous
    with pytest.raises(VocabConflict):
        resolve_vocabulary(rows, CLASS_HIERARCHY)


def test_distributed_closure_matches_driver(spark):
    from mms_rdf_spark.plans.closure import transitive_closure

    edges = spark.createDataFrame(CLASS_HIERARCHY, ["sub", "sup"])
    got = {(r["sub"], r["sup"]) for r in transitive_closure(edges).collect()}
    want = set(hierarchy_closure(CLASS_HIERARCHY).keys())
    assert got == want
