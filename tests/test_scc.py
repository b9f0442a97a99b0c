"""strongly_connected_components: directed mutual-reachability
components — driver Tarjan fast path vs the distributed FW-BW-trim
coloring, equivalence pinned (the connected_components pattern)."""

from __future__ import annotations

import pytest


def _scc(spark, edges, **kw):
    from mms_rdf_spark.operators.cc import strongly_connected_components

    e = spark.createDataFrame(edges, "src string, dst string")
    out = strongly_connected_components(e, **kw)
    return {(r.node, r.component) for r in out.collect()}


# two 3-cycles bridged by a one-way edge, plus a DAG tail and a
# self-loop: every structural case in one fixture
EDGES = [
    ("a", "b"), ("b", "c"), ("c", "a"),          # SCC {a,b,c}
    ("c", "x"),                                   # one-way bridge
    ("x", "y"), ("y", "z"), ("z", "x"),          # SCC {x,y,z}
    ("z", "t1"), ("t1", "t2"),                   # DAG tail (singletons)
    ("s", "s"),                                   # self-loop singleton SCC
]
EXPECTED = {
    ("a", "a"), ("b", "a"), ("c", "a"),
    ("x", "x"), ("y", "x"), ("z", "x"),
    ("t1", "t1"), ("t2", "t2"), ("s", "s"),
}


def test_tarjan_fast_path(spark):
    assert _scc(spark, EDGES) == EXPECTED


def test_distributed_path_matches_tarjan(spark):
    got = _scc(spark, EDGES, driver_threshold=0)
    assert got == EXPECTED


def test_distributed_matches_on_random_digraph(spark):
    import hashlib

    # deterministic pseudo-random digraph: 40 nodes, ~90 edges
    edges = []
    for i in range(90):
        h = hashlib.md5(f"scc{i}".encode()).hexdigest()
        a, b = int(h[:4], 16) % 40, int(h[4:8], 16) % 40
        edges.append((f"n{a:02d}", f"n{b:02d}"))
    fast = _scc(spark, edges)
    dist = _scc(spark, edges, driver_threshold=0)
    assert fast == dist
    # sanity: mutual reachability holds inside one sampled component
    comps = {}
    for n, c in fast:
        comps.setdefault(c, set()).add(n)
    assert any(len(m) > 1 for m in comps.values())  # fixture non-trivial


def test_direction_matters_vs_undirected_cc(spark):
    from mms_rdf_spark.operators.cc import connected_components

    e = spark.createDataFrame([("a", "b"), ("b", "c")],
                              "src string, dst string")
    und = {(r.node, r.component)
           for r in connected_components(e).collect()}
    assert und == {("a", "a"), ("b", "a"), ("c", "a")}
    assert _scc(spark, [("a", "b"), ("b", "c")]) == {
        ("a", "a"), ("b", "b"), ("c", "c")}


def test_max_rounds_exhaustion_raises(spark):
    # a chain of 2-cycles forces one FW-BW round per SCC: with
    # max_rounds=1 the distributed path must fail LOUDLY, not mislabel
    edges = []
    for i in range(4):
        edges += [(f"p{i}a", f"p{i}b"), (f"p{i}b", f"p{i}a")]
        if i:
            edges.append((f"p{i-1}a", f"p{i}a"))
    with pytest.raises(RuntimeError, match="max_rounds"):
        _scc(spark, edges, driver_threshold=0, max_rounds=1)


def test_condensation_is_dag_and_layers(spark):
    from mms_rdf_spark.operators.cc import (
        scc_condensation, topological_layers)

    e = spark.createDataFrame(EDGES, "src string, dst string")
    cond = scc_condensation(e)
    got = {(r.src_component, r.dst_component) for r in cond.collect()}
    # {a,b,c} -> {x,y,z} -> t1 -> t2; the self-loop s is isolated
    assert got == {("a", "x"), ("x", "t1"), ("t1", "t2")}
    layers = {r.node: r.layer for r in topological_layers(
        cond, "src_component", "dst_component").collect()}
    assert layers == {"a": 0, "x": 1, "t1": 2, "t2": 3}


def test_topological_layers_rejects_cycles(spark):
    from mms_rdf_spark.operators.cc import topological_layers

    e = spark.createDataFrame([("a", "b"), ("b", "a")],
                              "src string, dst string")
    with pytest.raises(RuntimeError, match="cycle"):
        topological_layers(e, max_iterations=5)


def test_layers_longest_path_semantics(spark):
    from mms_rdf_spark.operators.cc import topological_layers

    # diamond with a long arm: d's layer is the LONGEST path (3)
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")],
        "src string, dst string")
    layers = {r.node: r.layer for r in topological_layers(e).collect()}
    assert layers == {"a": 0, "b": 1, "c": 2, "d": 3}
