"""XMI vocabulary ingestion (S4): parse a UML-ish metamodel and drive
extraction with the parsed vocabulary."""

from __future__ import annotations

from mms_rdf_spark.vocab import hierarchy_closure, resolve_vocabulary
from mms_rdf_spark.vocab_xmi import parse_xmi_vocabulary

XMI = """<?xml version="1.0"?>
<xmi:XMI xmlns:xmi="http://www.omg.org/XMI">
  <packagedElement xmi:type="uml:Class" name="Element"/>
  <packagedElement xmi:type="uml:Class" name="Turn">
    <generalization general="Element"/>
    <ownedAttribute name="role" type="Role" multiplicity="1..1"/>
    <ownedAttribute name="text" type="String"/>
    <ownedAttribute name="ts" type="Date"/>
    <ownedAttribute name="mentionIds" type="Mention" multiplicity="0..*"/>
  </packagedElement>
  <packagedElement xmi:type="uml:Class" name="ToolTurn">
    <generalization general="Turn"/>
    <ownedAttribute name="tool" type="Tool" multiplicity="0..1"/>
  </packagedElement>
  <packagedElement xmi:type="uml:Class" name="Conversation">
    <generalization general="Element"/>
    <ownedAttribute name="active" type="Boolean"/>
  </packagedElement>
</xmi:XMI>
"""


def test_parse_classes_and_edges():
    rows, edges = parse_xmi_vocabulary(XMI)
    assert ("mms-class:Turn", "mms-class:Element") in edges
    assert ("mms-class:ToolTurn", "mms-class:Turn") in edges
    by_key = {(r["domain_type"], r["key"]): r for r in rows}
    role = by_key[("mms-class:Turn", "role")]
    assert role["property_type"] == "ObjectProperty"
    assert role["cardinality"] == "1"
    text = by_key[("mms-class:Turn", "text")]
    assert text["range"] == "xsd:string"
    ts = by_key[("mms-class:Turn", "ts")]
    assert ts["range"] == "xsd:dateTime"
    mentions = by_key[("mms-class:Turn", "mentionIds")]
    assert mentions["is_list"] and mentions["list_item_range"] == "mms-class:Mention"
    assert by_key[("mms-class:Conversation", "active")]["range"] == "xsd:boolean"


def test_parsed_vocabulary_resolves():
    rows, edges = parse_xmi_vocabulary(XMI)
    v = resolve_vocabulary(rows, edges)
    # ToolTurn inherits Turn's keys through the parsed hierarchy
    assert v[("mms-class:ToolTurn", "text")].range == "xsd:string"
    assert v[("mms-class:ToolTurn", "tool")].predicate == "mms-property:tool"
    assert ("mms-class:Conversation", "role") not in v
    c = hierarchy_closure(edges)
    assert c[("mms-class:ToolTurn", "mms-class:Element")] == 2
