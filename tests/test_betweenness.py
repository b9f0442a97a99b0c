"""betweenness_centrality: exact Brandes pair dependencies, both
accumulation strategies (all-pairs `pairs` joins and layered `brandes`
backward recursion), pinned against analytic values and a pure-Python
exact Brandes."""

from __future__ import annotations

from collections import deque

import pytest


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _bc(edges, **kw):
    from mms_rdf_spark.operators.pagerank import betweenness_centrality

    return {r.node: r.betweenness
            for r in betweenness_centrality(edges, **kw).collect()}


def _python_brandes(pairs):
    """Exact directed betweenness (textbook Brandes), driver-side."""
    adj: dict[str, list[str]] = {}
    nodes = set()
    for s, d in set(pairs):
        if s == d:
            continue
        adj.setdefault(s, []).append(d)
        nodes.update((s, d))
    bc = dict.fromkeys(nodes, 0.0)
    for s in nodes:
        dist = {s: 0}
        sigma = {s: 1}
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = dict.fromkeys(order, 0.0)
        for w in reversed(order):
            for x in adj.get(w, ()):
                if dist.get(x) == dist[w] + 1:
                    delta[w] += sigma[w] / sigma[x] * (1 + delta[x])
            if w != s:
                bc[w] += delta[w]
    return bc


CHAIN = [("a", "b"), ("b", "c"), ("c", "d")]
DIAMOND = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")]
# diamond + tail + a skip edge: multiplicities AND competing paths
MIXED = DIAMOND + [("d", "e"), ("a", "e"), ("b", "e"), ("e", "a")]


def test_chain_analytic(spark):
    # directed path a->b->c->d: through-pairs are i * (L-1-i)
    got = _bc(_edges(spark, CHAIN))
    assert got == {"a": 0.0, "b": 2.0, "c": 2.0, "d": 0.0}


def test_diamond_splits_sigma(spark):
    # sigma_ad = 2; each middle node carries half of the (a, d) pair
    got = _bc(_edges(spark, DIAMOND))
    assert got == {"a": 0.0, "b": 0.5, "c": 0.5, "d": 0.0}


@pytest.mark.parametrize("method", ["pairs", "brandes"])
def test_matches_python_brandes(spark, method):
    got = _bc(_edges(spark, MIXED), method=method)
    want = _python_brandes(MIXED)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-6, (n, got[n], want[n])


def test_pairs_and_brandes_agree(spark):
    e = _edges(spark, MIXED)
    p = _bc(e, method="pairs")
    b = _bc(e, method="brandes")
    assert set(p) == set(b)
    for n in p:
        assert abs(p[n] - b[n]) < 1e-6


def test_sampled_sources_partial_sums(spark):
    e = _edges(spark, MIXED)
    full = _bc(e, method="brandes")
    sampled = _bc(
        e, method="brandes",
        sources=spark.createDataFrame([("a",)], "node string"))
    # per-source dependencies are non-negative: sampling lower-bounds
    for n, v in sampled.items():
        assert v <= full[n] + 1e-9
    # and the a-source dependencies alone are exact
    want = 0.0
    assert sampled["a"] == want


def test_pairs_rejects_sampled_sources(spark):
    with pytest.raises(ValueError, match="ALL sources"):
        _bc(_edges(spark, CHAIN), method="pairs",
            sources=_edges(spark, CHAIN).select(
                _f_col("src").alias("node")))


def _f_col(name):
    from pyspark.sql import functions as F

    return F.col(name)


def test_self_loops_and_parallel_edges_ignored(spark):
    noisy = CHAIN + [("b", "b"), ("a", "b"), ("a", "b")]
    assert _bc(_edges(spark, noisy)) == _bc(_edges(spark, CHAIN))


def test_exhaustion_raises(spark):
    with pytest.raises(RuntimeError, match="not converged"):
        _bc(_edges(spark, CHAIN), max_depth=1)


def test_closeness_chain_analytic(spark):
    from mms_rdf_spark.operators.pagerank import closeness_centrality

    got = {r.node: (r.n_reachable, r.closeness, r.harmonic)
           for r in closeness_centrality(_edges(spark, CHAIN)).collect()}
    # from a: dists 1,2,3 -> r=3, closeness 3/6, harmonic 1+1/2+1/3
    assert got["a"] == (3, 0.5, 1.833333333)
    assert got["b"] == (2, pytest.approx(0.666666667), 1.5)
    assert got["c"] == (1, 1.0, 1.0)
    assert got["d"] == (0, 0.0, 0.0)  # sink: nothing reachable


def test_closeness_cycle_reaches_all(spark):
    from mms_rdf_spark.operators.pagerank import closeness_centrality

    cyc = [("a", "b"), ("b", "c"), ("c", "a")]
    got = {r.node: (r.n_reachable, r.closeness)
           for r in closeness_centrality(_edges(spark, cyc)).collect()}
    assert got == {n: (2, pytest.approx(2 / 3)) for n in "abc"}


def _walks(spark, pairs, **kw):
    from mms_rdf_spark.operators.pagerank import biased_random_walks

    sym = pairs + [(b, a) for a, b in pairs]
    return {(r.walk_id, r.step): r.node
            for r in biased_random_walks(
                _edges(spark, sym), **kw).collect()}


def test_biased_walk_return_penalty_prefers_exploration(spark):
    # path a-b-c, huge return penalty: from a the walk must go
    # a -> b -> c -> b (the only option back), never b -> a
    got = _walks(spark, [("a", "b"), ("b", "c")],
                 walk_len=3, p=1000.0, q=1.0)
    assert got[("a", 0)] == "a" and got[("a", 1)] == "b"
    assert got[("a", 2)] == "c"          # exploration beats return
    assert got[("a", 3)] == "b"          # sole candidate: returns


def test_biased_walk_triangle_beats_return(spark):
    # triangle a-b-c: at step 2 the walk sits on b or c with prev a;
    # the third vertex is a's neighbor (triangle step, weight 1) and
    # must beat the heavily penalized return to a
    got = _walks(spark, [("a", "b"), ("b", "c"), ("a", "c")],
                 walk_len=2, p=1000.0, q=1.0)
    first = got[("a", 1)]
    assert first in ("b", "c")
    assert got[("a", 2)] == ({"b", "c"} - {first}).pop()


def test_biased_walk_deterministic(spark):
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    assert _walks(spark, pairs, walk_len=3, p=4.0, q=0.25) \
        == _walks(spark, pairs, walk_len=3, p=4.0, q=0.25)


def test_weighted_pagerank_uniform_equals_plain(spark):
    from mms_rdf_spark.operators.pagerank import (
        pagerank,
        weighted_pagerank,
    )

    e = _edges(spark, MIXED)
    plain = {r.node: r.rank for r in pagerank(e).collect()}
    from pyspark.sql import functions as F

    uni = {r.node: r.rank for r in weighted_pagerank(
        e.withColumn("w", F.lit(1))).collect()}
    assert plain == uni  # identical rounding discipline -> identical


def test_weighted_pagerank_weight_pulls_rank(spark):
    from pyspark.sql import functions as F

    from mms_rdf_spark.operators.pagerank import weighted_pagerank

    # a -> b (weight 9), a -> c (weight 1): b must outrank c
    e = spark.createDataFrame(
        [("a", "b", 9), ("a", "c", 1)], "src string, dst string, w int")
    got = {r.node: r.rank for r in weighted_pagerank(e).collect()}
    assert got["b"] > got["c"]


def test_hop_plot_chain(spark):
    from mms_rdf_spark.operators.pagerank import hop_plot

    got = {r.dist: (r.n_pairs, r.cum_pairs, r.frac)
           for r in hop_plot(_edges(spark, CHAIN)).collect()}
    # chain a->b->c->d: 3 pairs at d=1, 2 at d=2, 1 at d=3
    assert got == {1: (3, 3, 0.5), 2: (2, 5, round(5 / 6, 6)),
                   3: (1, 6, 1.0)}


def test_ktruss_k4_keeps_clique_drops_pendant(spark):
    from mms_rdf_spark.operators.pagerank import k_truss

    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    pendant = [("c", "x"), ("d", "x")]  # triangle (c,d,x), support 1
    got = {(r.a, r.b): r.support
           for r in k_truss(_edges(spark, k4 + pendant), k=4).collect()}
    # the K4 survives (every edge in 2 triangles); the pendant falls
    assert set(got) == {(a, b) for a, b in k4}
    assert all(s == 2 for s in got.values())


def test_ktruss_cascade_needs_rounds(spark):
    from mms_rdf_spark.operators.pagerank import k_truss

    # triangle strip a-b-c-d-e: outer edges have support 1, the
    # shared edges 2; dropping the outers starves the shared ones —
    # visible only with enough rounds (bounded-round superset
    # contract, k_core's)
    strip = [("a", "b"), ("a", "c"), ("b", "c"),
             ("b", "d"), ("c", "d"), ("c", "e"), ("d", "e")]
    e = _edges(spark, strip)
    assert k_truss(e, k=4, rounds=1).count() > 0   # superset
    assert k_truss(e, k=4, rounds=4).count() == 0  # exact (fixpoint)


def test_eccentricity_chain(spark):
    from mms_rdf_spark.operators.pagerank import eccentricity

    got = {r.node: (r.n_reachable, r.ecc)
           for r in eccentricity(_edges(spark, CHAIN)).collect()}
    assert got == {"a": (3, 3), "b": (2, 2), "c": (1, 1), "d": (0, 0)}
