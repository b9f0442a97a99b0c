"""Property-based checks (hypothesis): the pure functions that define
triple identity, and the oracle/engine equivalence invariant on random
transcript frames (SURVEY.md §5 'property-based' bullet)."""

from __future__ import annotations

import re

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from mms_rdf_spark.functions import (
    artifact_iri,
    element_iri,
    sanitize_suffix,
)
from mms_rdf_spark.vocab_mint import parse_multiplicity, pluralize

text_like = st.text(
    alphabet=st.characters(codec="utf-8",
                           exclude_categories=("Cs",)),
    min_size=0, max_size=40)


@given(text_like)
def test_sanitize_idempotent_and_clean(s):
    out = sanitize_suffix(s)
    assert sanitize_suffix(out) == out  # idempotent
    assert not re.search(r"\s", out)
    assert "<" not in out and ">" not in out


@given(text_like.filter(lambda s: s != ""))
def test_element_iri_prefix_stable(s):
    iri = element_iri(s)
    assert iri.startswith("mms-element:")
    assert iri == element_iri(s)  # deterministic


@given(st.sampled_from(["Tool", "Mention", None]), text_like)
def test_artifact_iri_shape(t, s):
    iri = artifact_iri(t, s)
    assert iri.startswith(f"mms-artifact:{t or 'Unknown'}.ID:")


@given(st.integers(0, 99), st.integers(0, 99))
def test_multiplicity_roundtrip(lo, hi):
    lo, hi = sorted((lo, hi))
    assert parse_multiplicity(f"{lo}..{hi}") == (lo, hi)
    assert parse_multiplicity(f"{lo}..*") == (lo, None)


@given(st.from_regex(r"[a-z]{2,12}", fullmatch=True))
def test_pluralize_changes_and_terminates(w):
    p = pluralize(w)
    assert p != w and p.startswith(w[0]) and p.endswith("s")


# --- engine/oracle equivalence on randomized micro-frames -----------
ROLES = st.sampled_from(["user", "assistant", "system", "tool", None])
TOOLS = st.sampled_from([None, "", "search", "x<y>", "a b"])
TEXTS = st.sampled_from([None, "", "plain words",
                         "with @entity:Foo and @entity:bar_Baz",
                         "dup @entity:Foo @entity:Foo",
                         "weird @entity:x<z> tail"])


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(ROLES, TEXTS, TOOLS), min_size=1, max_size=8))
def test_fused_matches_oracle_on_random_frames(spark, rows):
    from mms_rdf_spark.operators.extract import extract_triples
    from mms_rdf_spark.oracle import (
        GOLDEN_COLUMNS,
        convert_transcripts,
        precision_recall,
    )

    pdf = pd.DataFrame({
        "conv_id": ["c0"] * len(rows),
        "turn_idx": pd.array(range(len(rows)), dtype="int32"),
        "role": [r[0] for r in rows],
        "text": [r[1] for r in rows],
        "tool": [r[2] for r in rows],
        "ts": pd.to_datetime(
            [f"2025-01-01 00:{i:02d}:00" for i in range(len(rows))]),
    })
    got = extract_triples(spark, spark.createDataFrame(pdf)).toPandas()
    p, r = precision_recall(got[GOLDEN_COLUMNS], convert_transcripts(pdf))
    assert (p, r) == (1.0, 1.0)
