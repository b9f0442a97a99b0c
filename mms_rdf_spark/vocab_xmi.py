"""XMI (UML XML) vocabulary ingestion — the reference's S4 scan.

The reference builds its TBox by SAX-parsing UML/SysML .xmi metamodels
(src/vocabulary/convert-uml.js: classes + generalizations at :49-60,
216-237, owned attributes with name/type/multiplicity at :76-123).
Vocabulary is tiny, so this is a one-time driver-side parse (SURVEY.md
§3.2 prescribes exactly that) feeding the same resolver as the minted
and fixture vocabularies.

Supported XMI subset (deliberately the same shapes convert-uml.js
consumes):

    <packagedElement xmi:type="uml:Class" name="Turn">
      <generalization general="Element"/>
      <ownedAttribute name="role" type="Role" multiplicity="1..1"/>
      <ownedAttribute name="text" type="String"/>
    </packagedElement>

Primitive type names (String/Boolean/Integer/Real/Date) map to xsd
ranges; anything else becomes an object-property range class.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from mms_rdf_spark.vocab_mint import multiplicity_to_cardinality

PRIMITIVES = {
    "String": "xsd:string",
    "Boolean": "xsd:boolean",
    "Integer": "xsd:integer",
    "Real": "xsd:double",
    "Date": "xsd:dateTime",
}

_XMI_TYPE_KEYS = ("{http://www.omg.org/XMI}type", "xmi:type", "type")


def _xmi_type(el: ET.Element) -> str | None:
    for k in _XMI_TYPE_KEYS:
        if k in el.attrib:
            return el.attrib[k]
    return None


def _xmi_attr(el: ET.Element, name: str) -> str | None:
    """Read an xmi:-namespaced attribute under any prefix form."""
    for k in (f"{{http://www.omg.org/XMI}}{name}", f"xmi:{name}", name):
        if k in el.attrib:
            return el.attrib[k]
    return None


def _primitive_from_href(href: str) -> str | None:
    """`<type href=".../PrimitiveTypes.xmi#String"/>` -> xsd range
    (the reference resolves the same hrefs, convert-uml-profile.js
    :125-133 remap + rdfs:range)."""
    tail = href.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
    return PRIMITIVES.get(tail)


def parse_xmi_profile(
    xml_text: str, class_prefix: str = "mms-class:",
    property_prefix: str = "mms-property:",
) -> tuple[list[dict], list[tuple[str, str]]]:
    """UML *profile* XMI -> (vocab rows, class-hierarchy edges).

    The profile variant of the S4 scan (reference
    src/vocabulary/convert-uml-profile.js): packages scope
    `uml:Stereotype` packagedElements; a stereotype is a class whose
    `generalization` becomes a subclass edge (:49-58), and whose
    ownedAttributes become properties with multiplicity read from
    `lowerValue`/`upperValue` CHILD elements (:163-170) rather than a
    multiplicity attribute, range from the `type` attribute or a
    `<type href=…>` child resolving UML primitive hrefs (:125-133),
    orderedness from `isOrdered` (:93-95). `uml:PrimitiveType`
    packagedElements register additional primitive names (:239-252).
    Output feeds the same `vocab.resolve_vocabulary(rows, edges)` as
    every other vocabulary source."""
    root = ET.fromstring(xml_text)
    rows: list[dict] = []
    edges: list[tuple[str, str]] = []
    primitives = dict(PRIMITIVES)

    # pass 1: locally-declared primitive types
    for el in root.iter():
        if el.tag.endswith("packagedElement") \
                and _xmi_type(el) == "uml:PrimitiveType":
            name = el.attrib.get("name") or _xmi_attr(el, "id")
            if name and name not in primitives:
                primitives[name] = "xsd:string"

    for el in root.iter():
        if not el.tag.endswith("packagedElement"):
            continue
        if _xmi_type(el) != "uml:Stereotype":
            continue
        cls_name = el.attrib.get("name") or _xmi_attr(el, "id")
        if not cls_name:
            continue
        cls = class_prefix + cls_name
        for gen in el.findall("generalization"):
            general = gen.attrib.get("general")
            if general:
                edges.append((cls, class_prefix + general))
        for attr in el.findall("ownedAttribute"):
            name = attr.attrib.get("name")
            if not name:
                continue
            # multiplicity from child elements, defaults 1..1
            lo = hi = "1"
            for lv in attr.findall("lowerValue"):
                lo = lv.attrib.get("value") or "0"
            for uv in attr.findall("upperValue"):
                hi = uv.attrib.get("value") or "0"
            mult = f"{lo}..{hi}"
            is_list = hi == "*"
            # range: type attribute, or <type href=…> child
            type_name = attr.attrib.get("type")
            xsd = primitives.get(type_name) if type_name else None
            if type_name is None:
                for t in attr.findall("type"):
                    href = t.attrib.get("href")
                    if href:
                        xsd = _primitive_from_href(href)
                        type_name = href.rsplit("#", 1)[-1] \
                            .rsplit("/", 1)[-1]
            if type_name is None:
                type_name, xsd = "String", primitives["String"]
            if xsd is not None:
                rows.append(dict(
                    domain_type=cls, key=name,
                    predicate=property_prefix + name,
                    property_type="DatatypeProperty",
                    range=xsd, range_category=None,
                    cardinality=multiplicity_to_cardinality(mult),
                    list_item_range=None, is_list=False, lang=None,
                    nested_under=None))
            else:
                rng = class_prefix + type_name
                ordered = attr.attrib.get("isOrdered") == "true"
                rows.append(dict(
                    domain_type=cls, key=name,
                    predicate=property_prefix + name,
                    property_type="ObjectProperty",
                    range=(rng + "List") if (is_list and ordered) else rng,
                    range_category="Element",
                    cardinality=multiplicity_to_cardinality(mult),
                    list_item_range=rng if (is_list and ordered) else None,
                    is_list=is_list and ordered, lang=None,
                    nested_under=None))
    return rows, edges


def parse_xmi_vocabulary(
    xml_text: str, class_prefix: str = "mms-class:",
    property_prefix: str = "mms-property:",
) -> tuple[list[dict], list[tuple[str, str]]]:
    """XMI text -> (vocab rows, class-hierarchy edges), ready for
    `vocab.resolve_vocabulary(rows, edges)`."""
    root = ET.fromstring(xml_text)
    rows: list[dict] = []
    edges: list[tuple[str, str]] = []

    for el in root.iter():
        if not el.tag.endswith("packagedElement"):
            continue
        if _xmi_type(el) not in (None, "uml:Class"):
            continue
        cls_name = el.attrib.get("name")
        if not cls_name:
            continue
        cls = class_prefix + cls_name
        for gen in el.findall("generalization"):
            general = gen.attrib.get("general")
            if general:
                edges.append((cls, class_prefix + general))
        for attr in el.findall("ownedAttribute"):
            name = attr.attrib.get("name")
            if not name:
                continue
            type_name = attr.attrib.get("type", "String")
            mult = attr.attrib.get("multiplicity")
            is_list = mult is not None and mult.endswith("*")
            if type_name in PRIMITIVES:
                rows.append(dict(
                    domain_type=cls, key=name,
                    predicate=property_prefix + name,
                    property_type="DatatypeProperty",
                    range=PRIMITIVES[type_name], range_category=None,
                    cardinality=multiplicity_to_cardinality(mult),
                    list_item_range=None, is_list=False, lang=None,
                    nested_under=None))
            else:
                rng = class_prefix + type_name
                rows.append(dict(
                    domain_type=cls, key=name,
                    predicate=property_prefix + name,
                    property_type="ObjectProperty",
                    range=(rng + "List") if is_list else rng,
                    range_category="Element",
                    cardinality=multiplicity_to_cardinality(mult),
                    list_item_range=rng if is_list else None,
                    is_list=is_list, lang=None, nested_under=None))
    return rows, edges
