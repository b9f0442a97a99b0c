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


PROFILE_XMI = """<?xml version="1.0"?>
<xmi:XMI xmlns:xmi="http://www.omg.org/XMI">
  <packagedElement xmi:type="uml:Package" xmi:id="TranscriptProfile">
    <packagedElement xmi:type="uml:Stereotype" xmi:id="AgentTurn"
                     name="AgentTurn">
      <generalization xmi:type="uml:Generalization" general="Turn"/>
      <ownedAttribute xmi:id="AgentTurn-model" name="model">
        <type href="http://www.omg.org/spec/UML/20131001/PrimitiveTypes.xmi#String"/>
        <lowerValue xmi:type="uml:LiteralInteger" value="0"/>
        <upperValue xmi:type="uml:LiteralUnlimitedNatural" value="1"/>
      </ownedAttribute>
      <ownedAttribute xmi:id="AgentTurn-steps" name="steps" type="Step"
                      isOrdered="true" aggregation="composite">
        <lowerValue xmi:type="uml:LiteralInteger" value="0"/>
        <upperValue xmi:type="uml:LiteralUnlimitedNatural" value="*"/>
      </ownedAttribute>
      <ownedAttribute xmi:id="AgentTurn-temp" name="temperature"
                      type="Celsius"/>
    </packagedElement>
    <packagedElement xmi:type="uml:Stereotype" xmi:id="Step" name="Step">
      <ownedAttribute xmi:id="Step-kind" name="kind" type="String">
        <lowerValue value="1"/>
        <upperValue value="1"/>
      </ownedAttribute>
    </packagedElement>
  </packagedElement>
  <packagedElement xmi:type="uml:PrimitiveType" xmi:id="Celsius"
                   name="Celsius"/>
</xmi:XMI>
"""


def test_parse_profile_stereotypes():
    from mms_rdf_spark.vocab_xmi import parse_xmi_profile

    rows, edges = parse_xmi_profile(PROFILE_XMI)
    # stereotype generalization -> subclass edge
    assert ("mms-class:AgentTurn", "mms-class:Turn") in edges
    by_key = {(r["domain_type"], r["key"]): r for r in rows}
    # primitive range via <type href=...>, multiplicity from children
    model = by_key[("mms-class:AgentTurn", "model")]
    assert model["property_type"] == "DatatypeProperty"
    assert model["range"] == "xsd:string"
    assert model["cardinality"] == "1"
    # ordered 0..* object property -> ElementList shape
    steps = by_key[("mms-class:AgentTurn", "steps")]
    assert steps["is_list"] and steps["list_item_range"] == "mms-class:Step"
    assert steps["range"] == "mms-class:StepList"
    # locally-declared PrimitiveType resolves as a datatype
    temp = by_key[("mms-class:AgentTurn", "temperature")]
    assert temp["property_type"] == "DatatypeProperty"
    # default 1..1 when no lower/upper children
    kind = by_key[("mms-class:Step", "kind")]
    assert kind["cardinality"] == "1" and kind["range"] == "xsd:string"


def test_profile_vocabulary_resolves():
    from mms_rdf_spark.vocab import resolve_vocabulary
    from mms_rdf_spark.vocab_xmi import parse_xmi_profile

    prows, pedges = parse_xmi_profile(PROFILE_XMI)
    crows, cedges = parse_xmi_vocabulary(XMI)
    # profile stereotypes graft onto the class vocabulary: AgentTurn
    # inherits Turn's keys and adds its own
    v = resolve_vocabulary(crows + prows, cedges + pedges)
    assert v[("mms-class:AgentTurn", "text")].range == "xsd:string"
    assert v[("mms-class:AgentTurn", "model")].predicate == \
        "mms-property:model"
    assert v[("mms-class:AgentTurn", "steps")].is_list
