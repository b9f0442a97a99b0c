"""Nested-object recursion (triplifier.js:299-334): struct-array
children become their own elements, linked from the parent; nesting
unrolls at plan time from the schema."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mms_rdf_spark.operators.nested import nested_element_triples

SCHEMA = (
    "subject string, tool_calls array<struct<"
    "id string, type string, name string, ok boolean, latency_ms long,"
    "args array<struct<id string, type string, key string>>>>"
)

ROWS = [
    ("mms-element:t1", [
        {"id": "t1.call0", "type": "ToolCall", "name": "search",
         "ok": True, "latency_ms": 120,
         "args": [{"id": "t1.call0.a0", "type": "Arg", "key": "q"},
                  {"id": "t1.call0.a1", "type": "Arg", "key": "k"}]},
        {"id": "t1.call1", "type": "ToolCall", "name": "fetch",
         "ok": False, "latency_ms": None, "args": []},
    ]),
    ("mms-element:t2", []),
    ("mms-element:t3", None),
]


@pytest.fixture(scope="module")
def nested_out(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    return nested_element_triples(df, "tool_calls").cache()


def test_parent_links_with_order(nested_out):
    links = {(r["subject"], r["object"], r["idx"]) for r in
             nested_out.where(F.col("predicate") == "mms-property:tool_calls")
             .collect()}
    assert links == {("mms-element:t1", "mms-element:t1.call0", 0),
                     ("mms-element:t1", "mms-element:t1.call1", 1)}


def test_child_elements(nested_out):
    types = {(r["subject"], r["object"]) for r in
             nested_out.where(F.col("predicate") == "rdf:type").collect()}
    assert ("mms-element:t1.call0", "mms-class:ToolCall") in types
    assert ("mms-element:t1.call0.a0", "mms-class:Arg") in types
    lits = {(r["subject"], r["predicate"], r["object"], r["datatype"])
            for r in nested_out.where(~F.col("object_is_iri")).collect()}
    assert ("mms-element:t1.call0", "mms-property:name", "search",
            "xsd:string") in lits
    assert ("mms-element:t1.call0", "mms-property:ok", "true",
            "xsd:boolean") in lits
    assert ("mms-element:t1.call0", "mms-property:latency_ms", "120",
            "xsd:integer") in lits
    # null field -> no triple (R11 degrade, never error)
    assert not any(s == "mms-element:t1.call1"
                   and p == "mms-property:latency_ms"
                   for s, p, _o, _d in lits)


def test_grandchildren_recurse(nested_out):
    args = {(r["subject"], r["object"], r["idx"]) for r in
            nested_out.where(F.col("predicate") == "mms-property:args")
            .collect()}
    assert args == {("mms-element:t1.call0", "mms-element:t1.call0.a0", 0),
                    ("mms-element:t1.call0", "mms-element:t1.call0.a1", 1)}
    keys = {(r["subject"], r["object"]) for r in
            nested_out.where(F.col("predicate") == "mms-property:key")
            .collect()}
    assert keys == {("mms-element:t1.call0.a0", "q"),
                    ("mms-element:t1.call0.a1", "k")}


def test_nested_plan_is_shuffle_free(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    plan = nested_element_triples(df, "tool_calls") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, \
        "schema recursion must stay projections+unions, never shuffle"


def test_scalar_struct_child(spark):
    df = spark.createDataFrame(
        [("mms-element:t9", {"id": "t9.r", "type": "Result", "code": 200})],
        "subject string, result struct<id string, type string, code long>")
    out = nested_element_triples(df, "result")
    rows = {(r["predicate"], r["object"], r["idx"]) for r in out.collect()}
    assert ("mms-property:result", "mms-element:t9.r", None) in rows
    assert ("mms-property:code", "200", None) in rows


def test_non_element_column_rejected(spark):
    df = spark.createDataFrame([("s", [1, 2])],
                               "subject string, xs array<int>")
    with pytest.raises(ValueError):
        nested_element_triples(df, "xs")


def test_top_level_element_triples(spark):
    from mms_rdf_spark.operators.nested import element_triples

    df = spark.createDataFrame(
        [("e1", "Doc", "hello", 3, {"id": "e1.m", "type": "Meta",
                                    "lang": "en"})],
        "id string, type string, title string, pages long,"
        "meta struct<id string, type string, lang string>")
    out = element_triples(df)
    rows = {(r["subject"], r["predicate"], r["object"]) for r in out.collect()}
    assert ("mms-element:e1", "rdf:type", "mms-class:Doc") in rows
    assert ("mms-element:e1", "mms-ontology:elementId", "e1") in rows
    assert ("mms-element:e1", "mms-property:title", "hello") in rows
    assert ("mms-element:e1", "mms-property:pages", "3") in rows
    # nested struct recursed with a parent link
    assert ("mms-element:e1", "mms-property:meta", "mms-element:e1.m") in rows
    assert ("mms-element:e1.m", "mms-property:lang", "en") in rows


def test_element_triples_requires_identity(spark):
    from mms_rdf_spark.operators.nested import element_triples

    df = spark.createDataFrame([("x",)], "name string")
    with pytest.raises(ValueError):
        element_triples(df)
