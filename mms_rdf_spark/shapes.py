"""Shape generation + validation (the reference's ShEx/SHACL surface).

The reference generates ShEx and SHACL shapes from the UML vocabulary
(src/shapes/uml-to-shexc.js: multiplicity -> ? * + {m,n} at :38-91,
property/alias join at :125-162) FOR validating instance data, though
it never wires up an automated run (SURVEY.md §5.4). We close that
loop: `vocab_shapes()` derives per-(class, predicate) constraints from
the resolved vocabulary, and `validate()` checks a triples DataFrame
against them distributedly — each constraint class is one aggregate or
anti-join, unioned into a violations table (empty = conforms).

Constraint classes generated:
  - cardinality: property with cardinality '1' must appear exactly
    once per subject of its domain type
  - datatype: literal objects must carry the declared datatype (or
    lang tag for lang-restricted ranges)
  - nodeKind: object-property values must be IRIs; datatype-property
    values must be literals
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mms_rdf_spark.vocab import (
    CLASS_HIERARCHY,
    ENUM_CLASSES,
    VOCAB_ROWS,
    resolve_vocabulary,
)

SHAPE_COLUMNS = ["target_class", "predicate", "min_count", "max_count",
                 "node_kind", "datatype", "lang"]


def vocab_shapes() -> pd.DataFrame:
    """Flatten the resolved vocabulary into SHACL-ish shape rows."""
    rows = []
    for (cls, _key), p in sorted(resolve_vocabulary().items()):
        is_dt = p.property_type in ("DatatypeProperty",
                                    "DerivedDatatypeProperty")
        rows.append({
            "target_class": cls,
            "predicate": p.predicate,
            "min_count": 1 if p.cardinality == "1" else 0,
            "max_count": 1 if (p.cardinality == "1" and not p.is_list) else None,
            "node_kind": "Literal" if is_dt else "IRI",
            "datatype": None if (not is_dt or p.lang) else p.range,
            "lang": p.lang,
        })
    return pd.DataFrame(rows, columns=SHAPE_COLUMNS).drop_duplicates() \
        .reset_index(drop=True)


def validate(spark: SparkSession, triples: DataFrame,
             shapes: pd.DataFrame | None = None) -> DataFrame:
    """Triples -> violations(subject, predicate, constraint, detail).

    Distributed: one pass computes per-(subject, predicate) counts and
    observed node kinds; the broadcast shapes table is joined against
    typed subjects. Empty result = graph conforms."""
    shp = spark.createDataFrame(
        vocab_shapes() if shapes is None else shapes)
    types = triples.where(F.col("predicate") == "rdf:type").select(
        "subject", F.col("object").alias("target_class"))
    expected = types.join(F.broadcast(shp), on="target_class")

    observed = triples.groupBy("subject", "predicate").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.col("object_is_iri").cast("int")).alias("any_iri"),
        F.min(F.col("object_is_iri").cast("int")).alias("all_iri"),
        F.count_distinct("datatype").alias("n_dt"),
        F.first("datatype", ignorenulls=True).alias("obs_datatype"),
        F.first("lang", ignorenulls=True).alias("obs_lang"),
    )
    # all five constraint checks fire from ONE streaming pass over the
    # joined frame: each check contributes an optional violation struct
    # to a per-row array that is filtered and exploded in place — the
    # row SET is identical to the old five-filter union, but the join
    # runs once and nothing is eagerly materialized (round 6: the old
    # localCheckpoint of the multi-million-row joined frame was the
    # pipeline SHACL stage's dominant cost). Safe to fuse here (unlike
    # extract's conversation branches): `validate` has a single
    # consumer (the pipeline count) and no downstream predicate filter
    # relies on per-branch constant folding.
    joined = expected.join(observed, on=["subject", "predicate"], how="left")

    def _v(cond, constraint, detail):
        return F.when(cond, F.struct(
            F.lit(constraint).alias("constraint"),
            detail.cast("string").alias("detail")))

    checks = F.filter(F.array(
        _v((F.col("min_count") > 0) & F.col("n").isNull(),
           "minCount", F.lit("missing required property")),
        _v(F.col("max_count").isNotNull() & (F.col("n") > F.col("max_count")),
           "maxCount", F.concat(F.lit("count="), F.col("n").cast("string"))),
        _v(F.col("n").isNotNull() & (
            ((F.col("node_kind") == "IRI") & (F.col("all_iri") == 0))
            | ((F.col("node_kind") == "Literal") & (F.col("any_iri") == 1))),
           "nodeKind", F.col("node_kind")),
        _v(F.col("datatype").isNotNull() & F.col("n").isNotNull()
           & ~F.col("datatype").eqNullSafe(F.col("obs_datatype")),
           "datatype",
           F.concat_ws(" != ", F.col("obs_datatype"), F.col("datatype"))),
        _v(F.col("lang").isNotNull() & F.col("n").isNotNull()
           & ~F.col("lang").eqNullSafe(F.col("obs_lang")),
           "lang", F.lit("missing/incorrect language tag")),
    ), lambda x: x.isNotNull())

    return (joined.select("subject", "predicate",
                          F.explode(checks).alias("_v"))
            .select("subject", "predicate",
                    F.col("_v.constraint").alias("constraint"),
                    F.col("_v.detail").alias("detail")))


# ------------------------------------------------------------ text export
# Schema-document generation (reference src/shapes/uml-to-shexc.js):
# per-class ShExC shapes with `extends` for the hierarchy (:196-216),
# a shape map targeting instances by rdf:type (:218-221), and SHACL
# node shapes (:223-236). Multiplicity renders via the reference's
# table (:38-56): 1..1 -> '', 0..1 -> '?', 0..* -> '*', 1..* -> '+',
# m..n -> '{m,n}'.

def _shex_multiplicity(min_count: int, max_count: int | None) -> str:
    if (min_count, max_count) == (1, 1):
        return ""
    if (min_count, max_count) == (0, 1):
        return "?"
    if (min_count, max_count) == (0, None):
        return "*"
    if (min_count, max_count) == (1, None):
        return "+"
    return f"{{{min_count},{'' if max_count is None else max_count}}}"


def _counts(row: dict) -> tuple[int, int | None]:
    # UML multiplicity reconstruction: lower bound from cardinality,
    # upper bound * only for ordered lists (0..1 / 1..1 otherwise)
    min_count = 1 if row["cardinality"] == "1" else 0
    max_count = None if row["is_list"] else 1
    return min_count, max_count


def _shape_name(cls: str) -> str:
    return "mms-shape:" + cls.split(":", 1)[1]


def _constraint(row: dict) -> str:
    is_dt = row["property_type"] in ("DatatypeProperty",
                                     "DerivedDatatypeProperty")
    if is_dt:
        target = "rdf:langString" if row["lang"] else row["range"]
    else:
        rng = row["list_item_range"] or row["range"]
        target = "@" + _shape_name(rng)
    return (f"{row['predicate']} {target}"
            f"{_shex_multiplicity(*_counts(row))} ;")


def _classes(rows: list[dict],
             hierarchy: list[tuple[str, str]]) -> list[str]:
    return sorted({r["domain_type"] for r in rows}
                  | {c for e in hierarchy for c in e})


def shexc_export(rows: list[dict] | None = None,
                 hierarchy: list[tuple[str, str]] | None = None) -> str:
    """The vocabulary as a ShExC schema document (uml-to-shexc.js
    :196-216 layout: one shape per class, `extends @<super-shape>` per
    direct superclass, one constraint line per OWN property)."""
    rows = VOCAB_ROWS if rows is None else rows
    hierarchy = CLASS_HIERARCHY if hierarchy is None else hierarchy
    out = []
    for cls in _classes(rows, hierarchy):
        supers = [sup for (sub, sup) in hierarchy if sub == cls]
        extends = "".join(f"extends @{_shape_name(s)} " for s in supers)
        own = [_constraint(r) for r in rows if r["domain_type"] == cls]
        body = "\n\t".join(own) if own else "# no own properties"
        out.append(f"{_shape_name(cls)} {extends}{{\n\t{body}\n}}\n")
    return "\n".join(out)


def shape_map_export(rows: list[dict] | None = None,
                     hierarchy: list[tuple[str, str]] | None = None) -> str:
    """ShEx shape map: every instance typed `a <class>` validates
    against the class's shape (uml-to-shexc.js:218-221)."""
    rows = VOCAB_ROWS if rows is None else rows
    hierarchy = CLASS_HIERARCHY if hierarchy is None else hierarchy
    return "\n".join(
        f"{{ FOCUS a {cls} }}@{_shape_name(cls)},"
        for cls in _classes(rows, hierarchy)) + "\n"


def shacl_export(rows: list[dict] | None = None,
                 hierarchy: list[tuple[str, str]] | None = None) -> str:
    """The vocabulary as SHACL node shapes in Turtle (prefixed-name
    form, valid under sinks.ttl_header(); uml-to-shexc.js:223-236)."""
    rows = VOCAB_ROWS if rows is None else rows
    hierarchy = CLASS_HIERARCHY if hierarchy is None else hierarchy
    blocks = []
    for cls in _classes(rows, hierarchy):
        lines = [f"{_shape_name(cls)} a shacl:NodeShape ;",
                 f"\tshacl:targetClass {cls} ;",
                 "\tshacl:nodeKind shacl:IRI ;"]
        for r in (r for r in rows if r["domain_type"] == cls):
            is_dt = r["property_type"] in ("DatatypeProperty",
                                           "DerivedDatatypeProperty")
            min_count, max_count = _counts(r)
            props = [f"shacl:path {r['predicate']}"]
            if is_dt:
                props.append("shacl:datatype "
                             + ("rdf:langString" if r["lang"] else r["range"]))
            else:
                props.append("shacl:class "
                             + (r["list_item_range"] or r["range"]))
            props.append(f"shacl:minCount {min_count}")
            if max_count is not None:
                props.append(f"shacl:maxCount {max_count}")
            lines.append("\tshacl:property [ " + " ; ".join(props) + " ] ;")
        lines[-1] = lines[-1].rstrip(" ;") + " ."
        blocks.append("\n".join(lines))
    return "\n\n".join(blocks) + "\n"
