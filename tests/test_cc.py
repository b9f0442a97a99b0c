"""Connected components: correctness on known topologies + the
pathological-chain convergence the SURVEY watch-list calls out."""

from __future__ import annotations

from mms_rdf_spark.operators.cc import connected_components


def _components(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = connected_components(df, "src", "dst").collect()
    comps: dict[str, set[str]] = {}
    for r in rows:
        comps.setdefault(r["component"], set()).add(r["node"])
    return {frozenset(v) for v in comps.values()}


def test_two_disjoint_components(spark):
    got = _components(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    assert got == {frozenset({"a", "b", "c"}), frozenset({"x", "y"})}


def test_pathological_chain(spark):
    """A 256-node chain: hash-min alone needs 256 rounds; pointer
    jumping must converge in O(log n) (well under the 50-iteration cap)."""
    n = 256
    edges = [(f"n{i:04d}", f"n{i+1:04d}") for i in range(n - 1)]
    got = _components(spark, edges)
    assert got == {frozenset(f"n{i:04d}" for i in range(n))}


def test_star_with_hot_hub(spark):
    """Hot-entity topology: one hub with many spokes (skew shape)."""
    edges = [("hub", f"s{i}") for i in range(200)]
    got = _components(spark, edges)
    assert len(got) == 1 and len(next(iter(got))) == 201


def test_component_label_is_min(spark):
    df = spark.createDataFrame([("b", "c"), ("a", "b")], ["src", "dst"])
    rows = connected_components(df, "src", "dst").collect()
    assert {r["component"] for r in rows} == {"a"}
