"""Single-process reference-semantics oracle (SURVEY.md §5).

A direct, deliberately-naive Python reimplementation of the reference
converter's semantics (type dispatch -> vocabulary resolution -> IRI
minting -> literal encoding -> list/enum handling), run over the small
fixture corpus to produce `golden_triples`. The Spark pipeline is
scored against this set: exact-match precision/recall on canonicalized
(subject, predicate, object, object_is_iri, datatype, lang, idx)
tuples, target P/R >= 0.95 (BASELINE.json `metric`).

Semantics ledger (each rule cites the reference behavior it mirrors):
  R1  element IRI   mms-element:<sanitized id>        triplifier.js:24-33
  R2  type triple   (el, rdf:type, mms-class:T)       triplifier.js:576-580
  R3  elementId     raw id as xsd:string literal      triplifier.js:581-583
  R4  null value    skipped entirely                  src/data/worker.js:375-376
      EXCEPT enum-ranged keys, where NULL resolves through the
      enumeration table to rdf:nil                    mappings-to-rdf.js:1159-1163
  R5  empty-string object-property value -> rdf:nil   src/data/worker.js:218-220
  R6  enum literal -> enumeration IRI                 triplifier.js:373-399
  R7  artifact object -> mms-artifact:<T>.ID:<id>     triplifier.js:35-58
  R8  datatype literal carries its xsd range;
      lang-restricted ranges carry @lang instead      triplifier.js:175-234
  R9  ordered lists -> one triple per member with an
      explicit 0-based idx (order from DATA, never
      from iteration order)                           triplifier.js:256-278
  R10 most-specific-domain vocabulary resolution      triplifier.js:463-477
  R11 unmapped keys -> warning side-channel, no throw triplifier.js:540-545
"""

from __future__ import annotations

import re

import pandas as pd

from mms_rdf_spark.functions import (
    MENTION_KINDS,
    artifact_iri,
    element_iri,
    turn_element_id,
)
from mms_rdf_spark.vocab import (
    ENUM_CLASSES,
    RDF_NIL,
    ROLE_TO_TYPE,
    PropertyDef,
    enum_lookup,
    resolve_vocabulary,
)

GOLDEN_COLUMNS = [
    "subject", "predicate", "object", "object_is_iri", "datatype", "lang", "idx",
]

_MENTION_CRES = [(key, re.compile(pattern))
                 for key, pattern, _art, _lit in MENTION_KINDS]


def _fmt_ts(ts) -> str:
    return pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")


def _artifact_type(range_iri: str) -> str:
    return range_iri.split(":", 1)[1] if ":" in range_iri else range_iri


def convert_transcripts(pdf: pd.DataFrame) -> pd.DataFrame:
    """transcripts frame -> golden triples frame (one row per triple)."""
    vocab = resolve_vocabulary()
    enums = enum_lookup()
    out: list[tuple] = []

    def emit(s, p, o, is_iri, dt=None, lang=None, idx=None):
        out.append((s, p, o, is_iri, dt, lang, idx))

    def prop(el_type: str, key: str) -> PropertyDef | None:
        return vocab.get((el_type, key))  # R10 resolved at build; R11 if None

    # ---- per-turn elements
    for r in pdf.itertuples(index=False):
        role = None if pd.isna(r.role) else r.role
        el_type = ROLE_TO_TYPE.get(role, "mms-class:Turn")
        raw_id = turn_element_id(r.conv_id, int(r.turn_idx))
        subj = element_iri(raw_id)

        emit(subj, "rdf:type", el_type, True)  # R2
        emit(subj, "mms-ontology:elementId", raw_id, False, "xsd:string")  # R3

        for key, value in (("role", role),
                           ("text", None if pd.isna(r.text) else r.text),
                           ("tool", None if pd.isna(r.tool) else r.tool),
                           ("ts", r.ts)):
            p = prop(el_type, key)
            if p is None:
                continue  # R11
            if p.property_type in ("DatatypeProperty", "DerivedDatatypeProperty"):
                if value is None:
                    continue  # R4
                lex = _fmt_ts(value) if p.range == "xsd:dateTime" else str(value)
                if p.lang:  # R8 lang-restricted
                    emit(subj, p.predicate, lex, False, None, p.lang)
                else:
                    emit(subj, p.predicate, lex, False, p.range)
            else:  # Object / DerivedObject
                if p.range in ENUM_CLASSES:  # R6 (+ R4 exception for NULL)
                    iri = enums.get((p.range, value))
                    if iri is None:
                        continue  # unmapped enum literal -> warn side (R11)
                    emit(subj, p.predicate, iri, True)
                elif value is None:
                    continue  # R4
                elif value == "":
                    emit(subj, p.predicate, RDF_NIL, True)  # R5
                else:
                    emit(subj, p.predicate,
                         artifact_iri(_artifact_type(p.range), str(value)), True)  # R7

        # derived ordered mention lists, one per kind (R9)
        if isinstance(r.text, str):
            for key, cre in _MENTION_CRES:
                p = prop(el_type, key)
                if p is None:
                    continue
                for i, m in enumerate(cre.findall(r.text)):
                    emit(subj, p.predicate,
                         artifact_iri(_artifact_type(p.list_item_range), m),
                         True, None, None, i)

    # ---- per-conversation elements (ordered _turns list, R9: order from
    # turn_idx — the stable-ordering invariant from input_hint)
    conv_prop = resolve_vocabulary()[("mms-class:Conversation", "_turns")]
    for conv_id, grp in pdf.groupby("conv_id", sort=False):
        csubj = element_iri(str(conv_id))
        emit(csubj, "rdf:type", "mms-class:Conversation", True)
        emit(csubj, "mms-ontology:elementId", str(conv_id), False, "xsd:string")
        ordered = grp.sort_values("turn_idx")
        for i, (_, row) in enumerate(ordered.iterrows()):
            tsubj = element_iri(turn_element_id(str(conv_id), int(row.turn_idx)))
            emit(csubj, conv_prop.predicate, tsubj, True, None, None, i)

    df = pd.DataFrame(out, columns=GOLDEN_COLUMNS)
    df["object_is_iri"] = df["object_is_iri"].astype(bool)
    df["idx"] = df["idx"].astype("Int32")
    return df


def triple_keyset(df: pd.DataFrame) -> set[tuple]:
    """Canonical tuple set for P/R scoring (None-normalized)."""
    def norm(v):
        return None if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NA else v
    return {
        tuple(norm(v) for v in row)
        for row in df[GOLDEN_COLUMNS].itertuples(index=False, name=None)
    }


def precision_recall(got: pd.DataFrame, golden: pd.DataFrame) -> tuple[float, float]:
    g, want = triple_keyset(got), triple_keyset(golden)
    if not g or not want:
        return 0.0, 0.0
    tp = len(g & want)
    return tp / len(g), tp / len(want)
