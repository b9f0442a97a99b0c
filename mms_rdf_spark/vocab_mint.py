"""Vocabulary property minting from a field-mapping description.

The reference mints its property vocabulary from an Elasticsearch
mapping file + UML property defs (reference src/vocabulary/
mappings-to-rdf.js): key shape decides the property class —

  - /^is[A-Z]/        -> boolean datatype property   (:1015-1018)
  - endsWith('Id')    -> direct object property      (:972-976)
  - endsWith('Ids')   -> ordered-list object property(:977-982)
  - leading '_'       -> derived property            (:968-970)
  - mapping type date -> xsd:dateTime range          (:996-999)
  - camelCase words drive range-class + relation naming, with
    pluralized relation names for lists              (:223-244, 344-373)
  - multiplicity 'a..b' -> cardinality               (:18-19)

This module reproduces those minting rules for our domain so a
vocabulary can be DERIVED from a mapping rather than hand-authored —
the data-driven path the reference uses. Driver-side by design
(vocabulary scale, SURVEY.md §3.2).
"""

from __future__ import annotations

import re

_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])")


def camel_words(name: str) -> list[str]:
    """Split a camelCase key into words: 'ownedElementIds' ->
    ['owned', 'Element', 'Ids'] (F3)."""
    return _CAMEL_RE.sub(" ", name).split(" ")


def pluralize(word: str) -> str:
    """Relation-name pluralization (F4): y->ies, s/x/ch/sh->es, else +s."""
    if re.search(r"[^aeiou]y$", word):
        return word[:-1] + "ies"
    if re.search(r"(s|x|z|ch|sh)$", word):
        return word + "es"
    return word + "s"


def parse_multiplicity(m: str | None) -> tuple[int, int | None]:
    """'a..b' -> (min, max); '*' -> unbounded (F5). None -> (0, 1)."""
    if not m:
        return (0, 1)
    parts = m.split("..")
    lo = 0 if parts[0] == "*" else int(parts[0])
    hi_raw = parts[-1]
    hi = None if hi_raw == "*" else int(hi_raw)
    return (lo, hi)


def multiplicity_to_cardinality(m: str | None) -> str | None:
    lo, hi = parse_multiplicity(m)
    return "1" if hi == 1 else None


def mint_property(key: str, domain_type: str,
                  mapping_type: str = "text",
                  multiplicity: str | None = None) -> dict:
    """Mint one vocabulary row (VOCAB_COLUMNS shape) from a field key
    and its mapping type, following the reference's dispatch order."""
    derived = key.startswith("_")
    stem = key[1:] if derived else key
    prefix = "Derived" if derived else ""

    row = dict(domain_type=domain_type, key=key, predicate=None,
               property_type=None, range=None, range_category=None,
               cardinality=multiplicity_to_cardinality(multiplicity),
               list_item_range=None, is_list=False, lang=None,
               nested_under=None)

    if re.match(r"^is[A-Z]", stem):  # boolean property
        row.update(predicate=f"mms-property:{stem}",
                   property_type=f"{prefix}DatatypeProperty",
                   range="xsd:boolean")
        return row

    if stem.endswith("Ids"):  # ordered-list object property
        base = stem[:-3]
        words = camel_words(base)
        range_class = words[-1][0].upper() + words[-1][1:]
        relation = "".join(words[:-1]) + pluralize(words[-1]) \
            if len(words) > 1 else pluralize(words[0])
        row.update(predicate=f"mms-property:{relation}",
                   property_type=f"{prefix}ObjectProperty",
                   range=f"mms-class:{range_class}List",
                   range_category="Element", is_list=True,
                   list_item_range=f"mms-class:{range_class}")
        return row

    if stem.endswith("Id"):  # direct object property
        base = stem[:-2]
        words = camel_words(base)
        range_class = words[-1][0].upper() + words[-1][1:]
        row.update(predicate=f"mms-property:{base}",
                   property_type=f"{prefix}ObjectProperty",
                   range=f"mms-class:{range_class}",
                   range_category="Element")
        return row

    # plain datatype property from the mapping type
    xsd = {"date": "xsd:dateTime", "boolean": "xsd:boolean",
           "long": "xsd:integer", "integer": "xsd:integer",
           "double": "xsd:double"}.get(mapping_type, "xsd:string")
    row.update(predicate=f"mms-property:{stem}",
               property_type=f"{prefix}DatatypeProperty", range=xsd)
    return row


def mint_vocabulary(mapping: dict[str, dict], domain_type: str) -> list[dict]:
    """ES-mapping-like {key: {type, multiplicity?}} -> vocab rows,
    sorted by key for deterministic output (the analog of the
    element-properties.ttl build artifact)."""
    rows = []
    for key in sorted(mapping):
        spec = mapping[key] or {}
        rows.append(mint_property(
            key, domain_type,
            mapping_type=spec.get("type", "text"),
            multiplicity=spec.get("multiplicity")))
    return rows
