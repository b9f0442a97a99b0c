"""Connected components: correctness on known topologies + the
pathological-chain convergence the SURVEY watch-list calls out.
Parametrized over both execution paths: the driver union-find fast
path (small graphs) and the distributed hash-min + pointer-jumping
fixpoint (threshold=0 forces it)."""

from __future__ import annotations

import pytest

from mms_rdf_spark.operators.cc import connected_components

PATHS = [pytest.param(10**9, id="driver"), pytest.param(0, id="distributed")]


def _components(spark, edges, threshold):
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = connected_components(df, "src", "dst",
                                driver_threshold=threshold).collect()
    comps: dict[str, set[str]] = {}
    for r in rows:
        comps.setdefault(r["component"], set()).add(r["node"])
    return {frozenset(v) for v in comps.values()}


@pytest.mark.parametrize("threshold", PATHS)
def test_two_disjoint_components(spark, threshold):
    got = _components(spark, [("a", "b"), ("b", "c"), ("x", "y")], threshold)
    assert got == {frozenset({"a", "b", "c"}), frozenset({"x", "y"})}


@pytest.mark.parametrize("threshold", PATHS)
def test_pathological_chain(spark, threshold):
    """A 256-node chain: hash-min alone needs 256 rounds; pointer
    jumping must converge in O(log n) (well under the 50-iteration cap)."""
    n = 256
    edges = [(f"n{i:04d}", f"n{i+1:04d}") for i in range(n - 1)]
    got = _components(spark, edges, threshold)
    assert got == {frozenset(f"n{i:04d}" for i in range(n))}


@pytest.mark.parametrize("threshold", PATHS)
def test_star_with_hot_hub(spark, threshold):
    """Hot-entity topology: one hub with many spokes (skew shape)."""
    edges = [("hub", f"s{i}") for i in range(200)]
    got = _components(spark, edges, threshold)
    assert len(got) == 1 and len(next(iter(got))) == 201


@pytest.mark.parametrize("threshold", PATHS)
def test_component_label_is_min(spark, threshold):
    df = spark.createDataFrame([("b", "c"), ("a", "b")], ["src", "dst"])
    rows = connected_components(df, "src", "dst",
                                driver_threshold=threshold).collect()
    assert {r["component"] for r in rows} == {"a"}


def test_paths_agree(spark):
    import random
    rng = random.Random(7)
    edges = [(f"v{rng.randrange(300)}", f"v{rng.randrange(300)}")
             for _ in range(400)]
    a = _components(spark, edges, 10**9)
    b = _components(spark, edges, 0)
    assert a == b
