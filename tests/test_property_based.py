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


# ---------------------------------------------------------- round-2 laws
@given(st.lists(st.booleans(), min_size=0, max_size=6))
def test_sniff_boolean_shapes(flags):
    """Python-side mirror of the sniffing CASE order on generated
    boolean-ish strings."""
    from mms_rdf_spark.functions.sniff import BOOL_RE, DOUBLE_RE, INT_RE

    for b in flags:
        s = "true" if b else "false"
        assert re.fullmatch(BOOL_RE, s)
        assert not re.fullmatch(INT_RE, s)
        assert not re.fullmatch(DOUBLE_RE, s)


@given(st.integers(min_value=-10**15, max_value=10**15),
       st.integers(min_value=0, max_value=999999))
def test_sniff_numeric_order(i, frac):
    """Every integer string matches INT before DOUBLE; every decimal
    matches DOUBLE but never INT/BOOL (the dispatch order invariant)."""
    from mms_rdf_spark.functions.sniff import BOOL_RE, DOUBLE_RE, INT_RE

    s_int = str(i)
    assert re.fullmatch(INT_RE, s_int) and not re.fullmatch(BOOL_RE, s_int)
    s_dec = f"{i}.{frac}"
    assert re.fullmatch(DOUBLE_RE, s_dec)
    assert not re.fullmatch(INT_RE, s_dec)


def test_collection_roundtrip_random_lists(spark):
    """Random dense-idx list shapes (incl. singletons and the empty
    frame) survive idx -> cons chain -> idx byte-identically."""
    import random

    from mms_rdf_spark.operators.collections import (
        to_rdf_collection,
        unroll_collections,
    )
    from mms_rdf_spark.operators.extract import TRIPLE_SCHEMA

    rng = random.Random(42)
    rows = []
    for s in range(12):
        n = rng.choice([1, 2, 3, 7, 40])
        pred = rng.choice(["mms-property:turns", "mms-property:mentions"])
        for i in range(n):
            rows.append((f"mms-element:s{s}", pred, f"mms-element:o{s}.{i}",
                         True, None, None, i, None, None))
    # plus non-list passthrough rows
    rows += [(f"mms-element:s{s}", "rdf:type", "mms-class:Conversation",
              True, None, None, None, None, None) for s in range(12)]
    t = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    back = unroll_collections(to_rdf_collection(t))
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_unroll_raises_on_cycle(spark):
    from mms_rdf_spark.operators.collections import unroll_collections
    from mms_rdf_spark.operators.extract import TRIPLE_SCHEMA
    import pytest as _pytest

    # a two-cell rdf:rest cycle: c0 -> c1 -> c0
    rows = [("c0", "rdf:first", "x", True, None, None, None, None, None),
            ("c1", "rdf:first", "y", True, None, None, None, None, None),
            ("c0", "rdf:rest", "c1", True, None, None, None, None, None),
            ("c1", "rdf:rest", "c0", True, None, None, None, None, None),
            ("mms-element:s", "mms-property:turns", "c0", True,
             None, None, None, None, None)]
    t = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    with _pytest.raises(ValueError, match="cycle"):
        unroll_collections(t, max_rounds=6)


# ---- distributed selection vs Python sorted (kth_smallest) ----------
# hypothesis drives the INPUTS; each case runs one small Spark job, so
# keep examples few and deadline off (JVM warmup dominates).
from hypothesis import HealthCheck  # noqa: E402


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(-1000, 1000).map(float),
                min_size=1, max_size=60),
       st.floats(0.01, 1.0))
def test_kth_smallest_matches_sorted(spark, vals, q):
    from mms_rdf_spark.operators.sketch import kth_smallest
    import math

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = kth_smallest(df, "v", q=q, n_bins=7).collect()[0]
    k = max(1, math.ceil(q * len(vals)))
    assert got["k"] == k
    assert got["kth"] == sorted(vals)[k - 1]
