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
