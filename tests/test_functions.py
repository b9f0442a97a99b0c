"""Unit tests for IRI minting / sanitization (F1/F2 parity: the pure
functions that define triple identity, reference triplifier.js:18-58)."""

from __future__ import annotations

import pandas as pd
import pytest

from mms_rdf_spark.functions import (
    artifact_iri,
    element_iri,
    sanitize_suffix,
    turn_element_id,
)
from mms_rdf_spark.functions.iri import element_iri_col, sanitize_suffix_col


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("abc", "abc"),
        ("a b\tc", "a_b_c"),
        ("a<b>c", "a-b-c"),
        ("  x  ", "_x_"),
        ("tab\nnl", "tab_nl"),
    ],
)
def test_sanitize_python(raw, expected):
    assert sanitize_suffix(raw) == expected


def test_element_and_artifact_iri():
    assert element_iri("c 1") == "mms-element:c_1"
    assert artifact_iri("Tool", "x<y>") == "mms-artifact:Tool.ID:x-y-"
    assert artifact_iri(None, "z") == "mms-artifact:Unknown.ID:z"
    assert turn_element_id("c", 3) == "c.Turn.3"


def test_column_form_matches_python(spark):
    """The JVM column expressions and the Python functions must agree —
    they jointly define the P/R contract."""
    raws = ["abc", "a b\tc", "a<b>c", "  x  ", "conv 00003", "conv<00005>"]
    df = spark.createDataFrame(pd.DataFrame({"s": raws}))
    got = [
        (r["sanitized"], r["iri"])
        for r in df.select(
            sanitize_suffix_col(df.s).alias("sanitized"),
            element_iri_col(df.s).alias("iri"),
        ).collect()
    ]
    for raw, (sanitized, iri) in zip(raws, got):
        assert sanitized == sanitize_suffix(raw)
        assert iri == element_iri(raw)


def test_sniffed_datatype_lexical_shapes(spark):
    """F6 sniffing order: boolean > integer > double > string
    (reference triplifier.js:151-172 JSON-type override)."""
    from mms_rdf_spark.functions.sniff import sniffed_datatype

    cases = {
        "true": "xsd:boolean", "false": "xsd:boolean",
        "True": "xsd:string",          # JSON booleans are lowercase
        "42": "xsd:integer", "-7": "xsd:integer", "+3": "xsd:integer",
        "3.14": "xsd:double", ".5": "xsd:double", "3.": "xsd:double",
        "-2.5e-3": "xsd:double", "1e5": "xsd:double",
        "": "xsd:string", "nan": "xsd:string", "12a": "xsd:string",
        "1.2.3": "xsd:string",
    }
    df = spark.createDataFrame(pd.DataFrame({"v": list(cases)}))
    got = {r["v"]: r["dt"] for r in
           df.select("v", sniffed_datatype(df.v).alias("dt")).collect()}
    assert got == cases


def test_mention_split_form_equals_regex(spark):
    """The split formulation of @entity: extraction is value-identical
    to regexp_extract_all (the candidate fast path for the extractor's
    thread-scaling bottleneck, tools/bench_mention_forms.py)."""
    import pyspark.sql.functions as F

    from mms_rdf_spark.functions.iri import MENTION_RE, mention_surfaces_split

    cases = ["hello @entity:Apache_Spark world", "@entity:a@entity:b",
             "@entity:!bad", "no mentions", "", "@entity:",
             "x@entity:A-b_c<d>e!tail", "@entity:abc@entity:def @entity:x",
             "@entity:@entity:abc", "trailing @entity:xyz",
             "@entity:A" * 50, "@@entity::x", "@entity:_-<>_",
             "é @entity:café accent stops the class", None]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    out = df.select(
        F.regexp_extract_all(F.coalesce("text", F.lit("")),
                             F.lit(MENTION_RE), F.lit(1)).alias("re"),
        mention_surfaces_split(F.col("text")).alias("sp")).collect()
    for r in out:
        assert r.re == r.sp, (r.re, r.sp)


def test_mention_split_form_property(spark):
    """Randomized equivalence sweep over marker-dense strings."""
    import random

    import pyspark.sql.functions as F

    from mms_rdf_spark.functions.iri import MENTION_RE, mention_surfaces_split

    rng = random.Random(7)
    alphabet = list("ab1_<>-@entity: .!é")
    cases = ["".join(rng.choice(alphabet)
                     for _ in range(rng.randrange(0, 80)))
             for _ in range(300)]
    cases += [c + "@entity:" + c for c in cases[:50]]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    out = df.select(
        F.regexp_extract_all(F.coalesce("text", F.lit("")),
                             F.lit(MENTION_RE), F.lit(1)).alias("re"),
        mention_surfaces_split(F.col("text")).alias("sp")).collect()
    for r in out:
        assert r.re == r.sp, (r.re, r.sp)
