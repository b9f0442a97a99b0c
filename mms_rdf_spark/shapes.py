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

from mms_rdf_spark.vocab import ENUM_CLASSES, resolve_vocabulary

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
    # the five constraint branches below all filter this one frame;
    # truncate lineage so the expensive join runs once, not per branch
    joined = expected.join(observed, on=["subject", "predicate"], how="left") \
        .localCheckpoint()

    cardinality_min = joined.where(
        (F.col("min_count") > 0) & F.col("n").isNull()
    ).select("subject", "predicate", F.lit("minCount").alias("constraint"),
             F.lit("missing required property").alias("detail"))

    cardinality_max = joined.where(
        F.col("max_count").isNotNull() & (F.col("n") > F.col("max_count"))
    ).select("subject", "predicate", F.lit("maxCount").alias("constraint"),
             F.concat(F.lit("count="), F.col("n").cast("string"))
             .alias("detail"))

    node_kind = joined.where(
        F.col("n").isNotNull() & (
            ((F.col("node_kind") == "IRI") & (F.col("all_iri") == 0))
            | ((F.col("node_kind") == "Literal") & (F.col("any_iri") == 1)))
    ).select("subject", "predicate", F.lit("nodeKind").alias("constraint"),
             F.col("node_kind").alias("detail"))

    datatype = joined.where(
        F.col("datatype").isNotNull() & F.col("n").isNotNull()
        & ~F.col("datatype").eqNullSafe(F.col("obs_datatype"))
    ).select("subject", "predicate", F.lit("datatype").alias("constraint"),
             F.concat_ws(" != ", F.col("obs_datatype"), F.col("datatype"))
             .alias("detail"))

    lang = joined.where(
        F.col("lang").isNotNull() & F.col("n").isNotNull()
        & ~F.col("lang").eqNullSafe(F.col("obs_lang"))
    ).select("subject", "predicate", F.lit("lang").alias("constraint"),
             F.lit("missing/incorrect language tag").alias("detail"))

    return (cardinality_min.unionByName(cardinality_max)
            .unionByName(node_kind).unionByName(datatype).unionByName(lang))
