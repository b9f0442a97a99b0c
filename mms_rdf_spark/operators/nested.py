"""Nested-object recursion: struct(-array) columns -> child elements.

The reference converts a value `{id, type, …}` as its own element and
links it from the parent through the property for that key
(src/class/triplifier.js:299-334 — `convert_object(z_item)` per nested
item, then the parent's value maps to the child's element IRI).

Spark-first restatement: the reference recurses PER OBJECT at runtime;
here the recursion is driven by the SCHEMA at plan time — a struct
array is one posexplode + a static fan of projections, and a nested
struct array inside it unrolls into another branch of the same plan.
Depth equals the schema depth (statically known), so the emitted plan
is all whole-stage-codegen projections + unions: no per-row Python,
no driver-side iteration over data.

Child field typing mirrors the extractor's literal rules: Spark
primitive type -> xsd datatype; a field named `id`/`type` is consumed
as element identity; struct-array fields with id+type recurse.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from mms_rdf_spark.functions.iri import element_iri_col, sanitize_suffix_col
from mms_rdf_spark.operators.extract import TRIPLE_COLS

_XSD_BY_TYPE: list[tuple[type, str]] = [
    (StringType, "xsd:string"),
    (BooleanType, "xsd:boolean"),
    (IntegerType, "xsd:integer"),
    (LongType, "xsd:integer"),
    (FloatType, "xsd:double"),
    (DoubleType, "xsd:double"),
    (TimestampType, "xsd:dateTime"),
    (TimestampNTZType, "xsd:dateTime"),
]

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def _xsd_for(dt: DataType) -> str | None:
    for t, xsd in _XSD_BY_TYPE:
        if isinstance(dt, t):
            return xsd
    return None


def _is_element_struct(dt: DataType) -> bool:
    """A struct (or array of structs) with `id` and `type` fields is a
    nested element (the reference's `z_item && z_item.id` test,
    triplifier.js:302,326)."""
    if isinstance(dt, ArrayType):
        dt = dt.elementType
    return (isinstance(dt, StructType)
            and "id" in dt.fieldNames() and "type" in dt.fieldNames())


def _finish(df: DataFrame) -> DataFrame:
    for name in TRIPLE_COLS:
        if name not in df.columns:
            df = df.withColumn(name, F.lit(None))
    casts = {"object_is_iri": "boolean", "idx": "int", "turn_idx": "int"}
    return df.select(*[
        F.col(c).cast(casts.get(c, "string")).alias(c) for c in TRIPLE_COLS])


def _literal_value(col: Column, dt: DataType) -> Column:
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return F.date_format(col.cast("timestamp_ntz"), _TS_FMT)
    return col.cast("string")


def _child_triples(exploded: DataFrame, struct_type: StructType,
                   predicate_prefix: str) -> list[DataFrame]:
    """Triples for one level: exploded has (_subject, _pos, _child).
    Returns the frames for this level plus recursed levels."""
    child_subject = element_iri_col(F.col("_child.id").cast("string"))
    parts: list[DataFrame] = []
    base = exploded.select(
        F.col("_subject"), F.col("_pos"),
        child_subject.alias("subject"),
        F.col("_child").alias("_c"))

    parts.append(_finish(base.select(
        "subject", F.lit("rdf:type").alias("predicate"),
        F.concat(F.lit("mms-class:"),
                 sanitize_suffix_col(F.col("_c.type").cast("string")))
        .alias("object"),
        F.lit(True).alias("object_is_iri"))))
    parts.append(_finish(base.select(
        "subject", F.lit("mms-ontology:elementId").alias("predicate"),
        F.col("_c.id").cast("string").alias("object"),
        F.lit(False).alias("object_is_iri"),
        F.lit("xsd:string").alias("datatype"))))

    for field in struct_type.fields:
        if field.name in ("id", "type"):
            continue
        pred = F.lit(predicate_prefix + field.name)
        if _is_element_struct(field.dataType):
            # recurse: grandchildren linked from this child
            parts.extend(_nested_from(
                base.select(F.col("subject").alias("_subject"),
                            F.col(f"_c.{field.name}").alias("_v")),
                field.dataType, field.name, predicate_prefix))
            continue
        xsd = _xsd_for(field.dataType)
        if xsd is None:
            continue  # unsupported field types degrade silently, R11
        val = F.col(f"_c.{field.name}")
        parts.append(_finish(base.where(val.isNotNull()).select(
            "subject", pred.alias("predicate"),
            _literal_value(val, field.dataType).alias("object"),
            F.lit(False).alias("object_is_iri"),
            F.lit(xsd).alias("datatype"))))
    return parts


def _nested_from(frame: DataFrame, dt: DataType, key: str,
                 predicate_prefix: str) -> list[DataFrame]:
    """frame: (_subject, _v) where _v is the struct or struct array."""
    pred = F.lit(predicate_prefix + key)
    if isinstance(dt, ArrayType):
        struct_type = dt.elementType
        exploded = frame.where(F.col("_v").isNotNull()).select(
            "_subject", F.posexplode("_v").alias("_pos", "_child"))
        link_idx = F.col("_pos").cast("int")
    else:
        struct_type = dt
        exploded = frame.where(F.col("_v").isNotNull()).select(
            "_subject", F.lit(None).cast("int").alias("_pos"),
            F.col("_v").alias("_child"))
        link_idx = F.lit(None).cast("int")

    links = _finish(exploded.select(
        F.col("_subject").alias("subject"),
        pred.alias("predicate"),
        element_iri_col(F.col("_child.id").cast("string")).alias("object"),
        F.lit(True).alias("object_is_iri"),
        link_idx.alias("idx")))
    return [links] + _child_triples(exploded, struct_type, predicate_prefix)


def element_triples(df: DataFrame,
                    predicate_prefix: str = "mms-property:") -> DataFrame:
    """Generic element conversion: each ROW is an element `{id, type,
    …fields}` (the reference's convert_object entry, triplifier.js:299
    onward, without a parent). Emits rdf:type + elementId + one literal
    triple per primitive column; struct(-array) columns with id+type
    recurse through the nested machinery. The schema-generic companion
    to the transcripts-specialized extractor: point it at any element
    table whose columns ARE the fields."""
    if "id" not in df.columns or "type" not in df.columns:
        raise ValueError("element frame needs id + type columns")
    struct_type = df.schema
    frame = df.select(
        element_iri_col(F.col("id").cast("string")).alias("_subject"),
        F.struct(*[F.col(f.name) for f in struct_type.fields]).alias("_c"))
    exploded = frame.select("_subject", F.lit(None).cast("int").alias("_pos"),
                            F.col("_c").alias("_child"))
    parts = _child_triples(exploded, struct_type, predicate_prefix)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def nested_element_triples(
    df: DataFrame, column: str, key: str | None = None,
    subject: Column | None = None,
    predicate_prefix: str = "mms-property:",
) -> DataFrame:
    """Convert a nested element column into triples.

    df: any DataFrame with a `subject` column (or pass `subject`) and
    a struct / array<struct> column whose elements carry `id` and
    `type` fields. Emits, per nested element, recursively:
      (parent, <prefix><key>, mms-element:<id>)   [+ idx if ordered]
      (child,  rdf:type,      mms-class:<type>)
      (child,  mms-ontology:elementId, <id>)
      (child,  <prefix><field>, <literal>)        per primitive field
    Schema-recursive: struct-array fields with id+type inside the
    child fan out the same way (plan-time unroll, no runtime
    recursion)."""
    key = key if key is not None else column
    dt = df.schema[column].dataType
    if not _is_element_struct(dt):
        raise ValueError(f"column {column!r} is not a nested element "
                         "struct (needs id + type fields)")
    subj = subject if subject is not None else F.col("subject")
    frame = df.select(subj.alias("_subject"), F.col(column).alias("_v"))
    parts = _nested_from(frame, dt, key, predicate_prefix)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
