from __future__ import annotations

from mms_rdf_spark.operators.analytics import cube_counts, pivot_counts
from mms_rdf_spark.operators.pagerank import k_core, label_propagation


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_labelprop_triangle_absorbs_bridge(spark):
    # triangle a-b-c with pendant d hanging off a; 2 synchronous
    # rounds hand-simulated (mode of neighbors, tie -> min label)
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")])
    got = {r["node"]: r["label"]
           for r in label_propagation(e, iters=2).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "b"}


def test_labelprop_deterministic_across_runs(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
                       ("x", "y")])
    r1 = sorted(map(tuple, label_propagation(e, iters=3).collect()))
    r2 = sorted(map(tuple, label_propagation(e, iters=3).collect()))
    assert r1 == r2


def test_kcore_peels_pendant_keeps_cycle(spark):
    # square 1-2-3-4 plus pendant 5 on 1: 2-core is exactly the square
    e = _edges(spark, [("1", "2"), ("2", "3"), ("3", "4"), ("4", "1"),
                       ("1", "5")])
    got = {r["node"]: r["degree"] for r in k_core(e, k=2, iters=2).collect()}
    assert got == {"1": 2, "2": 2, "3": 2, "4": 2}


def test_kcore_empty_when_k_exceeds_graph(spark):
    e = _edges(spark, [("1", "2"), ("2", "3"), ("3", "4"), ("4", "1")])
    assert k_core(e, k=3, iters=2).count() == 0


def test_kcore_cascade_needs_multiple_rounds(spark):
    # chain of triangles sharing vertices: removing the tail pendant
    # drops the next node below k only in the following round
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"),  # triangle
                       ("c", "d"), ("d", "e")])             # tail
    one = {r["node"] for r in k_core(e, k=2, iters=1).collect()}
    two = {r["node"] for r in k_core(e, k=2, iters=2).collect()}
    assert "e" not in one and "d" in one       # first peel: only e
    assert two == {"a", "b", "c"}              # second peel: d cascades


def test_pivot_counts_explicit_columns(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "b")], "k long, t string")
    got = {r["k"]: (r["a"], r["b"], r["c"])
           for r in pivot_counts(df, "k", "t", ["a", "b", "c"]).collect()}
    assert got == {1: (2, 1, 0), 2: (0, 1, 0)}


def test_pivot_drops_unlisted_values(spark):
    df = spark.createDataFrame([(1, "zz")], "k long, t string")
    row = pivot_counts(df, "k", "t", ["a"]).collect()[0]
    assert row["a"] == 0


def test_cube_counts_all_levels(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 1)], "t string, d long")
    got = {(r["t"], r["d"]): r["n"]
           for r in cube_counts(df, ["t", "d"]).collect()}
    assert got[("a", "1")] == 2 and got[("b", "1")] == 1
    assert got[("a", "__all__")] == 3
    assert got[("__all__", "1")] == 3
    assert got[("__all__", "__all__")] == 4
    # 3 cells + 2 row margins + 2 col margins + 1 grand total
    assert len(got) == 8


def test_assortativity_star_is_negative(spark):
    from mms_rdf_spark.operators.pagerank import degree_assortativity
    # star: hub degree 4, leaves degree 1 -> perfectly disassortative
    e = _edges(spark, [("h", f"l{i}") for i in range(4)])
    r = degree_assortativity(e).collect()[0]
    assert r["n_edges"] == 4
    assert r["assortativity"] == -1.0


def test_assortativity_regular_graph_dropped(spark):
    from mms_rdf_spark.operators.pagerank import degree_assortativity
    # cycle: every degree 2 -> zero variance -> row dropped (den=0)
    e = _edges(spark, [("1", "2"), ("2", "3"), ("3", "1")])
    assert degree_assortativity(e).count() == 0


def test_adamic_adar_weights_rare_mediators_higher(spark):
    import math

    from mms_rdf_spark.operators.pagerank import adamic_adar
    # z1 connects a,b (deg 2); z2 connects a,b,c (deg 3): the pair
    # (a,b) is mediated by BOTH, (a,c)/(b,c) only by z2
    e = _edges(spark, [("z1", "a"), ("z1", "b"),
                       ("z2", "a"), ("z2", "b"), ("z2", "c")])
    got = {(r["a"], r["b"]): r["score"]
           for r in adamic_adar(e).collect()}
    w2 = round(1e6 / math.log(2))
    w3 = round(1e6 / math.log(3))
    assert got[("a", "b")] == round((w2 + w3) / 1e6, 6)
    assert got[("a", "c")] == round(w3 / 1e6, 6)
    # a and b are themselves mediators of (z1, z2)
    assert got[("z1", "z2")] == round(2 * w2 / 1e6, 6)


def test_adamic_adar_max_deg_drops_hub_mediator(spark):
    from mms_rdf_spark.operators.pagerank import adamic_adar
    e = _edges(spark, [("hub", f"x{i}") for i in range(6)]
               + [("z", "x0"), ("z", "x1")])
    got = {(r["a"], r["b"]) for r in
           adamic_adar(e, max_deg=3).collect()}
    # hub (deg 6) is excluded as MEDIATOR, so no x_i-x_j pairs via it;
    # z still mediates x0-x1, and x0/x1 (deg 2) mediate (hub, z)
    assert got == {("x0", "x1"), ("hub", "z")}


def test_weighted_sssp_prefers_cheap_detour(spark):
    from mms_rdf_spark.operators.pagerank import weighted_sssp
    e = spark.createDataFrame(
        [("a", "b", 10), ("a", "c", 1), ("c", "b", 2), ("b", "d", 1)],
        "src string, dst string, w long")
    srcs = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"]
           for r in weighted_sssp(e, srcs, rounds=3).collect()}
    # a->c->b (3) beats a->b (10); d via the detour at 4
    assert got == {"a": 0, "c": 1, "b": 3, "d": 4}


def test_weighted_sssp_round_bound_limits_hops(spark):
    from mms_rdf_spark.operators.pagerank import weighted_sssp
    e = spark.createDataFrame(
        [("a", "b", 10), ("a", "c", 1), ("c", "b", 2)],
        "src string, dst string, w long")
    srcs = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"]
           for r in weighted_sssp(e, srcs, rounds=1).collect()}
    assert got["b"] == 10  # the 2-hop detour needs a second round


def test_clustering_coefficient_values(spark):
    from mms_rdf_spark.operators.pagerank import clustering_coefficient
    # triangle a-b-c plus pendant d on a: a has neighbors {b,c,d},
    # 1 triangle of 3 possible pairs -> 1/3; b,c are 1/1; d excluded
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")])
    got = {r["node"]: (r["degree"], r["n_tri"], r["coeff"])
           for r in clustering_coefficient(e).collect()}
    assert got["a"] == (3, 1, round(2 * 1 / (3 * 2), 6))
    assert got["b"] == (2, 1, 1.0)
    assert got["c"] == (2, 1, 1.0)
    assert "d" not in got


def test_clustering_triangle_free_is_zero(spark):
    from mms_rdf_spark.operators.pagerank import clustering_coefficient
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = {r["node"]: r["coeff"]
           for r in clustering_coefficient(e).collect()}
    assert got == {"b": 0.0, "c": 0.0}


def test_modularity_two_cliques_vs_random(spark):
    from mms_rdf_spark.operators.pagerank import modularity
    # two triangles joined by one bridge: the natural 2-community
    # partition scores high; the everything-in-one partition scores 0
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"),
                       ("x", "y"), ("y", "z"), ("x", "z"),
                       ("c", "x")])
    good = spark.createDataFrame(
        [(n, "L" if n in "abc" else "R") for n in "abcxyz"],
        "node string, label string")
    one = spark.createDataFrame(
        [(n, "ALL") for n in "abcxyz"], "node string, label string")
    q_good = modularity(e, good).collect()[0]
    q_one = modularity(e, one).collect()[0]
    assert q_good["n_communities"] == 2
    assert q_good["modularity"] > 0.3
    assert q_one["modularity"] == 0.0  # m_c/m = 1, (d_c/2m)^2 = 1


def test_reciprocity_counts_mutual_pairs(spark):
    from mms_rdf_spark.operators.pagerank import reciprocity
    e = _edges(spark, [("a", "b"), ("b", "a"),   # mutual pair
                       ("a", "c"),               # one-way
                       ("c", "c")])              # loop: dropped
    r = reciprocity(e).collect()[0]
    assert (r["n_edges"], r["n_mutual"]) == (3, 2)
    assert r["reciprocity"] == round(2 / 3, 6)


def test_katz_attenuated_walk_counts(spark):
    from mms_rdf_spark.operators.pagerank import katz_centrality
    # chain a -> b -> c: katz(c) counts walks of length 1 and 2
    e = _edges(spark, [("a", "b"), ("b", "c")])
    got = {r["node"]: r["katz"]
           for r in katz_centrality(e, alpha=0.1, iters=3).collect()}
    assert got["a"] == 1.0
    assert got["b"] == 1.1                      # one in-walk from a
    assert got["c"] == round(1 + 0.1 * 1.1, 8)  # walk b + walk a-b


def test_katz_hub_not_diluted_by_outdegree(spark):
    from mms_rdf_spark.operators.pagerank import katz_centrality
    # hub points at two targets: both receive the FULL attenuated
    # contribution (PageRank would split it)
    e = _edges(spark, [("h", "x"), ("h", "y")])
    got = {r["node"]: r["katz"] for r in katz_centrality(e).collect()}
    assert got["x"] == got["y"] == 1.1


def test_harmonic_2hop_path_graph(spark):
    from mms_rdf_spark.operators.pagerank import harmonic_centrality_2hop
    # path a-b-c-d: a has N1={b}, N2={c}; b has N1={a,c}, N2={d}
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = {r["node"]: (r["degree"], r["n_2hop"], r["harmonic"])
           for r in harmonic_centrality_2hop(e).collect()}
    assert got["a"] == (1, 1, 1.5)
    assert got["b"] == (2, 1, 2.5)
    assert got["d"] == (1, 1, 1.5)


def test_harmonic_2hop_excludes_direct_and_self(spark):
    from mms_rdf_spark.operators.pagerank import harmonic_centrality_2hop
    # triangle: everyone's 2-hop set is empty (all nodes adjacent)
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    got = {r["node"]: r["harmonic"]
           for r in harmonic_centrality_2hop(e).collect()}
    assert got == {"a": 2.0, "b": 2.0, "c": 2.0}


def test_ppr_mass_concentrates_near_seed(spark):
    from mms_rdf_spark.operators.pagerank import personalized_pagerank
    # two disjoint chains; seeding in one leaves the other at 0
    e = _edges(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["rank"]
           for r in personalized_pagerank(e, seeds, iters=3).collect()}
    assert got["x"] == 0.0 and got["y"] == 0.0
    assert got["a"] > got["b"] > got["c"] > 0


def test_ppr_seed_outside_graph_ignored(spark):
    from mms_rdf_spark.operators.pagerank import personalized_pagerank
    e = _edges(spark, [("a", "b")])
    seeds = spark.createDataFrame([("a",), ("zz",)], "node string")
    got = {r["node"]: r["rank"]
           for r in personalized_pagerank(e, seeds, iters=2).collect()}
    assert set(got) == {"a", "b"}  # zz never appears


# ---- simrank


def _simrank_py(pairs, c=0.8, iters=2, prec=9, eps=1e-4):
    """Pure-Python twin of pagerank.simrank with the SAME rounding,
    micro-unit accumulation, and eps pruning."""
    edges = sorted(set(pairs))
    nodes = sorted({u for e in edges for u in e})
    din, out = {}, {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
        din[v] = din.get(v, 0) + 1
    s = {(n, n): 1.0 for n in nodes}
    for _ in range(iters):
        t = {}
        for (u, v), suv in s.items():
            for a2 in out.get(u, []):
                for b2 in out.get(v, []):
                    if a2 != b2:
                        t[(a2, b2)] = (t.get((a2, b2), 0)
                                       + round(suv * 1e9))
        new = {(n, n): 1.0 for n in nodes}
        for (a2, b2), tt in t.items():
            val = round(c * (tt / 1e9) / (din[a2] * din[b2]), prec)
            if val >= eps:
                new[(a2, b2)] = val
        s = new
    return {(a2, b2): v for (a2, b2), v in s.items() if a2 < b2}


def test_simrank_matches_python_twin(spark):
    from mms_rdf_spark.operators.pagerank import simrank
    # bipartite users->items with shared purchases + a 2nd-order hop
    pairs = [("u1", "i1"), ("u1", "i2"), ("u2", "i1"), ("u2", "i2"),
             ("u3", "i2"), ("u3", "i3"), ("i1", "s"), ("i3", "s")]
    both = pairs + [(b, a) for a, b in pairs]  # undirected
    e = _edges(spark, both)
    got = {(r["a"], r["b"]): r["s"]
           for r in simrank(e, iters=2).collect()}
    assert got == _simrank_py(both, iters=2)
    # sanity: co-purchased items are structurally similar
    assert got[("i1", "i2")] > 0.1


def test_simrank_diagonal_excluded_and_symmetric_halved(spark):
    from mms_rdf_spark.operators.pagerank import simrank
    e = _edges(spark, [("a", "c"), ("b", "c"), ("c", "a"), ("c", "b")])
    rows = simrank(e, iters=2).collect()
    assert all(r["a"] < r["b"] for r in rows)
    got = {(r["a"], r["b"]): r["s"] for r in rows}
    assert got == _simrank_py(
        [("a", "c"), ("b", "c"), ("c", "a"), ("c", "b")], iters=2)
    assert ("a", "b") in got  # both fed by c


def test_simrank_hub_cap_drops_hub_pairs(spark):
    from mms_rdf_spark.operators.pagerank import simrank
    # hub h points at 5 leaves; capping out-degree at 4 removes h as a
    # pair generator, so no leaf pair survives
    pairs = [("h", f"l{i}") for i in range(5)] + [("x", "l0"), ("x", "l1")]
    e = _edges(spark, pairs)
    with_hub = {(r["a"], r["b"]) for r in simrank(e, iters=1).collect()}
    capped = {(r["a"], r["b"])
              for r in simrank(e, iters=1, hub_cap=4).collect()}
    assert ("l0", "l1") in with_hub
    assert capped == {("l0", "l1")}  # only x's fan-out remains
    assert len(with_hub) > len(capped)


def test_simrank_empty_input(spark):
    from mms_rdf_spark.operators.pagerank import simrank
    e = spark.createDataFrame([], "src string, dst string")
    out = simrank(e, iters=2)
    assert out.count() == 0 and out.columns == ["a", "b", "s"]


# ---- maximal independent set (Luby)


def _mis_py(pairs, rounds=3):
    import hashlib

    nodes, sym = set(), set()
    for a, b in pairs:
        nodes.update((a, b))
        if a != b:
            sym.add((a, b))
            sym.add((b, a))
    pr = {n: hashlib.md5(n.encode()).hexdigest() + "#" + n
          for n in nodes}
    pool, out = set(nodes), {}
    for r in range(1, rounds + 1):
        if not pool:
            break
        sel = set()
        for v in pool:
            nbrs = [u for (x, u) in sym if x == v and u in pool]
            if not nbrs or pr[v] < min(pr[u] for u in nbrs):
                sel.add(v)
        cov = {u for (x, u) in sym if x in sel and u in pool}
        for v in sel:
            out[v] = ("mis", r)
        pool -= sel | cov
    for v in pool:
        out[v] = ("undecided", 0)
    return out


def test_mis_matches_python_twin_and_is_maximal(spark):
    from mms_rdf_spark.operators.pagerank import maximal_independent_set
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
             ("e", "a"), ("c", "f"), ("f", "g"), ("h", "h")]
    got = {r["node"]: (r["state"], r["round"])
           for r in maximal_independent_set(
               _edges(spark, pairs), rounds=4).collect()}
    assert got == _mis_py(pairs, rounds=4)
    mis = {n for n, (s, _) in got.items() if s == "mis"}
    und = {n for n, (s, _) in got.items() if s == "undecided"}
    assert not und  # 4 rounds drain this graph
    sym = {(a, b) for a, b in pairs if a != b}
    sym |= {(b, a) for a, b in sym}
    # independence: no edge inside the MIS
    assert not any((a, b) in sym for a in mis for b in mis)
    # maximality: every non-MIS node has a MIS neighbor
    for n in set(got) - mis:
        assert any((n, m) in sym for m in mis)
    # the self-loop-only node has no real neighbor -> always MIS
    assert "h" in mis and got["h"][1] == 1


def test_mis_deterministic_and_bounded_rounds(spark):
    from mms_rdf_spark.operators.pagerank import maximal_independent_set
    pairs = [(f"n{i}", f"n{i+1}") for i in range(12)]
    e = _edges(spark, pairs)
    r1 = sorted(map(tuple, maximal_independent_set(e, rounds=2).collect()))
    r2 = sorted(map(tuple, maximal_independent_set(e, rounds=2).collect()))
    assert r1 == r2 == sorted(
        (n, s, r) for n, (s, r) in _mis_py(pairs, rounds=2).items())
    # rounds=1 may leave undecided survivors on a 13-path
    one = {r["state"] for r in
           maximal_independent_set(e, rounds=1).collect()}
    assert "mis" in one


# ---- greedy coloring (iterated MIS)


def test_coloring_is_proper_and_complete(spark):
    from mms_rdf_spark.operators.pagerank import greedy_coloring
    pairs = [("a", "b"), ("b", "c"), ("a", "c"),   # triangle
             ("c", "d"), ("d", "e"), ("e", "a"),
             ("f", "g")]
    got = {r["node"]: r["color"]
           for r in greedy_coloring(_edges(spark, pairs)).collect()}
    assert set(got) == set("abcdefg")
    assert all(c >= 1 for c in got.values())  # nothing left uncolored
    sym = {(x, y) for x, y in pairs} | {(y, x) for x, y in pairs}
    assert not any(got[x] == got[y] for x, y in sym)  # proper
    # the triangle forces at least 3 colors
    assert len({got["a"], got["b"], got["c"]}) == 3


def test_coloring_deterministic_and_bipartite_two_colors(spark):
    from mms_rdf_spark.operators.pagerank import greedy_coloring
    # even cycle = bipartite; greedy-MIS needs few colors (<= 3 on a
    # cycle) and must be identical across runs
    pairs = [(f"n{i}", f"n{(i + 1) % 8}") for i in range(8)]
    e = _edges(spark, pairs)
    r1 = sorted(map(tuple, greedy_coloring(e).collect()))
    r2 = sorted(map(tuple, greedy_coloring(e).collect()))
    assert r1 == r2
    assert max(c for _, c in r1) <= 3


def test_coloring_max_colors_leftover_observable(spark):
    from mms_rdf_spark.operators.pagerank import greedy_coloring
    # K4 needs 4 colors; capping at 2 leaves uncolored nodes as 0
    ns = ["w", "x", "y", "z"]
    pairs = [(a, b) for i, a in enumerate(ns) for b in ns[i + 1:]]
    got = {r["node"]: r["color"]
           for r in greedy_coloring(_edges(spark, pairs),
                                    max_colors=2).collect()}
    assert sorted(got) == ns
    assert sum(1 for c in got.values() if c == 0) == 2  # 2 leftovers
    colored = [n for n, c in got.items() if c > 0]
    assert len({got[n] for n in colored}) == 2


# ---- Boruvka MST


def _kruskal_py(tri):
    # Kruskal under the same (w, a, b) total order; tri = (a, b, w)
    # canonical pairs already collapsed to min weight
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = []
    for w, a, b in sorted((w, a, b) for a, b, w in tri):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            forest.append((a, b, w))
    return sorted(forest)


def test_boruvka_matches_kruskal_with_ties(spark):
    from mms_rdf_spark.operators.pagerank import boruvka_mst
    # duplicate weights + a parallel edge + both edge directions
    rows = [("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 2.0),
            ("c", "d", 1.0), ("d", "e", 3.0), ("e", "c", 3.0),
            ("b", "a", 9.0),              # parallel, collapses to 1.0
            ("x", "y", 5.0)]              # separate component
    e = spark.createDataFrame(rows, "src string, dst string, w double")
    got = sorted(map(tuple, boruvka_mst(e).collect()))
    tri = {}
    for s, d, w in rows:
        k = (min(s, d), max(s, d))
        tri[k] = min(tri.get(k, w), w)
    want = _kruskal_py([(a, b, w) for (a, b), w in tri.items()])
    assert got == want
    # spanning forest: 7 nodes, 2 components -> 5 edges
    assert len(got) == 5


def test_boruvka_chain_needs_multiple_rounds(spark):
    from mms_rdf_spark.operators.pagerank import boruvka_mst
    # a path graph: every edge is in the MST. ALTERNATING weights
    # (cheap, expensive, cheap, ...) force multi-round merging —
    # round 1 picks only the cheap edges (each node's min incident),
    # later rounds bridge the merged pairs. (Monotone weights would
    # finish in ONE round: every edge is its right endpoint's min.)
    rows = [(f"n{i:02d}", f"n{i+1:02d}",
             1.0 + i if i % 2 == 0 else 100.0 + i)
            for i in range(15)]
    e = spark.createDataFrame(rows, "src string, dst string, w double")
    got = sorted(map(tuple, boruvka_mst(e, rounds=5).collect()))
    assert len(got) == 15  # the whole path
    one_round = boruvka_mst(e, rounds=1).collect()
    assert len(one_round) < 15  # a single round cannot finish it


def test_boruvka_deterministic(spark):
    from mms_rdf_spark.operators.pagerank import boruvka_mst
    rows = [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)]
    e = spark.createDataFrame(rows, "src string, dst string, w double")
    r1 = sorted(map(tuple, boruvka_mst(e).collect()))
    r2 = sorted(map(tuple, boruvka_mst(e).collect()))
    # all weights tie: the (w, a, b) order still picks a unique tree
    # (Kruskal under that order takes (a,b) then (a,c), skips (b,c))
    assert r1 == r2 == [("a", "b", 1.0), ("a", "c", 1.0)]
