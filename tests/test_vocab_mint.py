"""Property-minting rules (reference mappings-to-rdf.js dispatch):
boolean keys, Id/Ids suffixes, derived keys, multiplicity parsing,
camelCase/pluralization naming, and nested_under scoping."""

from __future__ import annotations

from mms_rdf_spark.vocab import CLASS_HIERARCHY, resolve_vocabulary
from mms_rdf_spark.vocab_mint import (
    camel_words,
    mint_property,
    mint_vocabulary,
    multiplicity_to_cardinality,
    parse_multiplicity,
    pluralize,
)


def test_camel_words():
    assert camel_words("ownedElementIds") == ["owned", "Element", "Ids"]
    assert camel_words("id") == ["id"]


def test_pluralize():
    assert pluralize("element") == "elements"
    assert pluralize("activity") == "activities"
    assert pluralize("class") == "classes"
    assert pluralize("box") == "boxes"


def test_multiplicity():
    assert parse_multiplicity("0..1") == (0, 1)
    assert parse_multiplicity("1..*") == (1, None)
    assert parse_multiplicity(None) == (0, 1)
    assert multiplicity_to_cardinality("1..1") == "1"
    assert multiplicity_to_cardinality("0..*") is None


def test_boolean_key():
    r = mint_property("isAbstract", "mms-class:Turn")
    assert r["property_type"] == "DatatypeProperty"
    assert r["range"] == "xsd:boolean"
    assert r["predicate"] == "mms-property:isAbstract"


def test_direct_object_key():
    r = mint_property("ownerId", "mms-class:Turn")
    assert r["property_type"] == "ObjectProperty"
    assert r["range"] == "mms-class:Owner"
    assert r["predicate"] == "mms-property:owner"
    assert not r["is_list"]


def test_list_object_key():
    r = mint_property("ownedElementIds", "mms-class:Turn")
    assert r["is_list"]
    assert r["list_item_range"] == "mms-class:Element"
    assert r["predicate"] == "mms-property:ownedElements"
    assert r["range"] == "mms-class:ElementList"


def test_derived_key():
    r = mint_property("_modified", "mms-class:Turn", mapping_type="date")
    assert r["property_type"] == "DerivedDatatypeProperty"
    assert r["range"] == "xsd:dateTime"


def test_minted_vocabulary_resolves():
    """Minted rows slot straight into the resolver."""
    rows = mint_vocabulary(
        {"isActive": {"type": "boolean"},
         "ownerId": {},
         "childIds": {},
         "_created": {"type": "date"},
         "name": {"type": "text", "multiplicity": "1..1"}},
        "mms-class:Turn")
    v = resolve_vocabulary(rows, CLASS_HIERARCHY)
    assert v[("mms-class:UserTurn", "ownerId")].range == "mms-class:Owner"
    assert v[("mms-class:Turn", "name")].cardinality == "1"
    assert v[("mms-class:ToolTurn", "childIds")].is_list


def test_nested_under_scoping():
    base = dict(property_type="DatatypeProperty", range="xsd:string",
                range_category=None, cardinality=None, list_item_range=None,
                is_list=False, lang=None)
    rows = [
        {"domain_type": "mms-class:Turn", "key": "name",
         "predicate": "mms-property:name", "nested_under": None, **base},
        {"domain_type": "mms-class:Turn", "key": "name",
         "predicate": "mms-property:payloadName",
         "nested_under": "payload", **base},
    ]
    # outside the parent context the scoped row is invisible
    v = resolve_vocabulary(rows, CLASS_HIERARCHY)
    assert v[("mms-class:Turn", "name")].predicate == "mms-property:name"
    # inside it, the scoped binding wins over the unscoped one
    v2 = resolve_vocabulary(rows, CLASS_HIERARCHY, parent_key="payload")
    assert v2[("mms-class:Turn", "name")].predicate == "mms-property:payloadName"
