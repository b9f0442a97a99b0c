"""Vocabulary (TBox) for the transcripts domain + resolution semantics.

The reference drives conversion from a vocabulary graph it builds from
UML/SysML XMI (reference src/vocabulary/convert-uml.js,
mappings-to-rdf.js) and consults per (element-type, key) through SPARQL
at convert time with per-type memoization (reference
src/class/triplifier.js:433-436, 445-520; src/class/vocab-entry.js).

Spark-first inversion: the vocabulary is tiny (the committed reference
build has 648 mms-property defs / 283 subclass edges), so we resolve
EVERYTHING at build time into one flat `(type, key) -> property` table
and broadcast it — zero per-row lookups, zero network, and the subtle
SPARQL semantics (transitive domain reach, most-specific-domain
preference, nestedUnder scoping) become explicit, testable functions:

  - domain reach  = `rdfs:subClassOf*` closure
    (reference triplifier.js:453-455)
  - most-specific = drop a candidate if another same-key property has a
    strictly more-derived domain — the `filter not exists {... ?subD
    rdfs:subClassOf+ ?D}` anti-join (reference triplifier.js:463-477);
    realized here as min-distance ranking over the closure.
  - nested_under  = prefer bindings scoped to the parent key
    (reference triplifier.js:495-510)

Fixture content follows FIXTURES.md §2-4 (transcripts transposition of
build/vocabulary/element-properties.ttl).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

RDF_NIL = "rdf:nil"

# ----------------------------------------------------------- class hierarchy
# (sub, sup) edges — includes a diamond (ToolTurn reaches Element both
# via Turn and via AgentAction) to exercise most-specific resolution.
CLASS_HIERARCHY: list[tuple[str, str]] = [
    ("mms-class:UserTurn", "mms-class:Turn"),
    ("mms-class:AssistantTurn", "mms-class:Turn"),
    ("mms-class:SystemTurn", "mms-class:Turn"),
    ("mms-class:ToolTurn", "mms-class:Turn"),
    ("mms-class:ToolTurn", "mms-class:AgentAction"),
    ("mms-class:AgentAction", "mms-class:Element"),
    ("mms-class:Turn", "mms-class:Element"),
    ("mms-class:Conversation", "mms-class:Element"),
    ("mms-class:Mention", "mms-class:Element"),
    ("mms-class:Entity", "mms-class:Element"),
]

# role literal -> concrete element type (the analog of the reference's
# per-record `type` field driving dispatch, triplifier.js:423-440).
ROLE_TO_TYPE = {
    "user": "mms-class:UserTurn",
    "assistant": "mms-class:AssistantTurn",
    "system": "mms-class:SystemTurn",
    "tool": "mms-class:ToolTurn",
    None: "mms-class:Turn",
}

# ------------------------------------------------------------------ vocab
VOCAB_COLUMNS = [
    "domain_type", "key", "predicate", "property_type", "range",
    "range_category", "cardinality", "list_item_range", "is_list",
    "lang", "nested_under",
]


def _row(domain_type, key, predicate, property_type, range_, *,
         range_category=None, cardinality=None, list_item_range=None,
         is_list=False, lang=None, nested_under=None):
    return dict(
        domain_type=domain_type, key=key, predicate=predicate,
        property_type=property_type, range=range_,
        range_category=range_category, cardinality=cardinality,
        list_item_range=list_item_range, is_list=is_list, lang=lang,
        nested_under=nested_under,
    )


VOCAB_ROWS: list[dict] = [
    _row("mms-class:Turn", "role", "mms-property:role", "ObjectProperty",
         "mms-class:Role", cardinality="1"),
    _row("mms-class:Turn", "text", "mms-property:text", "DatatypeProperty",
         "xsd:string"),
    # lang-restricted override on a subtype: assistant text is tagged @en
    # (datatype-restriction semantics, reference triplifier.js:218-234)
    _row("mms-class:AssistantTurn", "text", "mms-property:text",
         "DatatypeProperty", "rdfs:langString", lang="en"),
    _row("mms-class:Turn", "tool", "mms-property:tool", "ObjectProperty",
         "mms-class:Tool", range_category="Artifact"),
    # most-specific-domain override (J2): tool turns mint a different
    # predicate for the same key.
    _row("mms-class:ToolTurn", "tool", "mms-property:invokedTool",
         "ObjectProperty", "mms-class:Tool", range_category="Artifact"),
    _row("mms-class:Turn", "ts", "mms-property:timestamp",
         "DatatypeProperty", "xsd:dateTime"),
    # derived keys (leading '_', reference mappings-to-rdf.js:968-970) —
    # one ordered-list property per mention kind (FIXTURES mentions.kind)
    _row("mms-class:Turn", "_mentions", "mms-property:mentions",
         "DerivedObjectProperty", "mms-class:MentionList",
         range_category="Artifact", is_list=True,
         list_item_range="mms-class:Mention"),
    _row("mms-class:Turn", "_urls", "mms-property:urls",
         "DerivedObjectProperty", "mms-class:UrlList",
         range_category="Artifact", is_list=True,
         list_item_range="mms-class:Url"),
    _row("mms-class:Turn", "_emails", "mms-property:emails",
         "DerivedObjectProperty", "mms-class:EmailList",
         range_category="Artifact", is_list=True,
         list_item_range="mms-class:Email"),
    _row("mms-class:Conversation", "_turns", "mms-property:turns",
         "DerivedObjectProperty", "mms-class:TurnList",
         range_category="Element", is_list=True,
         list_item_range="mms-class:Turn"),
]

# enumeration dimension (owl:oneOf analog, reference
# mappings-to-rdf.js:1134-1163 incl. the NULL -> rdf:nil row)
ENUM_ROWS: list[dict] = [
    {"enum_class": "mms-class:Role", "value": "user", "iri": "mms-class:Role.User"},
    {"enum_class": "mms-class:Role", "value": "assistant", "iri": "mms-class:Role.Assistant"},
    {"enum_class": "mms-class:Role", "value": "system", "iri": "mms-class:Role.System"},
    {"enum_class": "mms-class:Role", "value": "tool", "iri": "mms-class:Role.Tool"},
    {"enum_class": "mms-class:Role", "value": None, "iri": RDF_NIL},
]

ENUM_CLASSES = {"mms-class:Role"}


# ----------------------------------------------------------------- closure
def hierarchy_closure(edges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    """Reflexive-transitive closure with hop distance.

    Returns {(sub, sup): min_hops}. Small input (vocab scale) so this
    runs on the driver; the distributed equivalent for big graphs lives
    in plans/closure.py and is tested against this one.
    """
    nodes = {n for e in edges for n in e}
    dist: dict[tuple[str, str], int] = {(n, n): 0 for n in nodes}
    adj: dict[str, list[str]] = {}
    for sub, sup in edges:
        adj.setdefault(sub, []).append(sup)
    for start in nodes:
        frontier = [(start, 0)]
        seen = {start: 0}
        while frontier:
            cur, d = frontier.pop()
            for nxt in adj.get(cur, ()):
                if nxt not in seen or seen[nxt] > d + 1:
                    seen[nxt] = d + 1
                    frontier.append((nxt, d + 1))
        for sup, d in seen.items():
            key = (start, sup)
            if key not in dist or dist[key] > d:
                dist[key] = d
    return dist


class VocabConflict(Exception):
    """Two same-key properties with equally-derived domains for a type —
    the analog of the reference's minting-conflict hard throw
    (mappings-to-rdf.js:172-189)."""


@dataclass(frozen=True)
class PropertyDef:
    predicate: str
    property_type: str
    range: str
    range_category: str | None
    cardinality: str | None
    list_item_range: str | None
    is_list: bool
    lang: str | None


def resolve_vocabulary(
    vocab_rows: list[dict] | None = None,
    hierarchy: list[tuple[str, str]] | None = None,
    parent_key: str | None = None,
) -> dict[tuple[str, str], PropertyDef]:
    """Flatten vocabulary to {(concrete_type, key): PropertyDef}.

    For each concrete type T and key k: candidates are rows whose
    domain_type D satisfies T subClassOf* D; rows carrying a
    nested_under scope apply only when it equals `parent_key`
    (the reference's nestedUnder disambiguation, triplifier.js:495-510),
    and a matching scoped binding beats any unscoped one. Among the
    surviving candidates the winner has minimal closure distance
    (most-derived domain). A full tie between distinct predicates
    raises VocabConflict.
    """
    vocab_rows = VOCAB_ROWS if vocab_rows is None else vocab_rows
    hierarchy = CLASS_HIERARCHY if hierarchy is None else hierarchy
    closure = hierarchy_closure(hierarchy)
    types = {n for e in hierarchy for n in e}

    resolved: dict[tuple[str, str], PropertyDef] = {}
    for t in types:
        by_key: dict[str, list[tuple[tuple[int, int], dict]]] = {}
        for row in vocab_rows:
            d = closure.get((t, row["domain_type"]))
            if d is None:
                continue
            scope = row.get("nested_under")
            if scope is not None and scope != parent_key:
                continue  # scoped binding outside its parent context
            scope_rank = 0 if (scope is not None and scope == parent_key) else 1
            by_key.setdefault(row["key"], []).append(((scope_rank, d), row))
        for key, cands in by_key.items():
            cands.sort(key=lambda c: c[0])
            best_rank, best = cands[0]
            ties = [r for rk, r in cands
                    if rk == best_rank and r["predicate"] != best["predicate"]]
            if ties:
                raise VocabConflict(f"ambiguous vocab for ({t}, {key}): "
                                    f"{best['predicate']} vs {ties[0]['predicate']}")
            resolved[(t, key)] = PropertyDef(
                predicate=best["predicate"],
                property_type=best["property_type"],
                range=best["range"],
                range_category=best["range_category"],
                cardinality=best["cardinality"],
                list_item_range=best["list_item_range"],
                is_list=bool(best["is_list"]),
                lang=best["lang"],
            )
    return resolved


def resolved_vocab_pdf() -> pd.DataFrame:
    """Resolved vocabulary as a flat pandas frame — the broadcast side
    of the core J1 join (one row per concrete (type, key))."""
    rows = []
    for (t, k), p in resolve_vocabulary().items():
        rows.append({
            "type": t, "key": k, "predicate": p.predicate,
            "property_type": p.property_type, "range": p.range,
            "range_category": p.range_category, "cardinality": p.cardinality,
            "list_item_range": p.list_item_range, "is_list": p.is_list,
            "lang": p.lang,
        })
    return pd.DataFrame(rows).sort_values(["type", "key"]).reset_index(drop=True)


def vocab_triples_pdf() -> pd.DataFrame:
    """The vocabulary itself as triples — the TBox named graph.

    The reference keeps TBox and ABox in separate named graphs
    (mms-graph:vocabulary vs mms-graph:data.<project>, emk.js:109,233);
    our equivalent is a separate `vocab_triples` table (or a `graph`
    partition column). Emits, per property row: rdf:type,
    mms-ontology:key, rdfs:domain, rdfs:range, and (when set)
    mms-ontology:cardinality / listItemRange / category — mirroring the
    minted defs in build/vocabulary/element-properties.ttl. Class
    hierarchy edges become rdfs:subClassOf; enum members become
    owl:oneOf membership triples (flattened, idx = member position)."""
    rows: list[tuple] = []

    def emit(s, p, o, is_iri=True, dt=None, idx=None):
        rows.append((s, p, o, is_iri, dt, None, idx))

    for r in VOCAB_ROWS:
        pred = r["predicate"]
        emit(pred, "rdf:type", f"owl:{r['property_type']}")
        emit(pred, "mms-ontology:key", r["key"], False, "xsd:string")
        emit(pred, "rdfs:domain", r["domain_type"])
        emit(pred, "rdfs:range", r["range"])
        if r["cardinality"]:
            emit(pred, "mms-ontology:cardinality", r["cardinality"],
                 False, "xsd:integer")
        if r["list_item_range"]:
            emit(pred, "mms-ontology:listItemRange", r["list_item_range"])
        if r["lang"]:
            emit(pred, "mms-ontology:lang", r["lang"], False, "xsd:string")
    for sub, sup in CLASS_HIERARCHY:
        emit(sub, "rdfs:subClassOf", sup)
    for i, e in enumerate(ENUM_ROWS):
        if e["value"] is not None:
            emit(e["enum_class"], "owl:oneOf", e["iri"], True, None, i)
            emit(e["iri"], "mms-ontology:enumValue", e["value"],
                 False, "xsd:string")
    return pd.DataFrame(
        rows, columns=["subject", "predicate", "object", "object_is_iri",
                       "datatype", "lang", "idx"])


def enums_pdf() -> pd.DataFrame:
    return pd.DataFrame(ENUM_ROWS)


def enum_lookup() -> dict[tuple[str, str | None], str]:
    """{(enum_class, literal value): iri} incl. (cls, None) -> rdf:nil."""
    return {(r["enum_class"], r["value"]): r["iri"] for r in ENUM_ROWS}
