from __future__ import annotations

from pyspark.sql import functions as F

from mms_rdf_spark.operators.pagerank import pagerank


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_hub_outranks_leaves(spark):
    # star: 10 leaves all point at the hub
    e = _edges(spark, [(f"leaf{i}", "hub") for i in range(10)])
    ranks = {r["node"]: r["rank"]
             for r in pagerank(e, iters=3).collect()}
    assert all(ranks["hub"] > ranks[f"leaf{i}"] for i in range(10))
    leaf_vals = {ranks[f"leaf{i}"] for i in range(10)}
    assert len(leaf_vals) == 1  # symmetric leaves rank identically


def test_total_rank_is_conserved(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    total = (pagerank(e, iters=5)
             .agg(F.sum("rank")).collect()[0][0])
    # dangling redistribution keeps mass ~1 (per-iteration round-8
    # drift bounded by n * 5e-9 per round)
    assert abs(total - 1.0) < 1e-6


def test_cycle_is_uniform(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    vals = {r["rank"] for r in pagerank(e, iters=4).collect()}
    assert len(vals) == 1


def test_stable_under_repartition(spark):
    rows = [(f"n{i}", f"n{(i * 7) % 23}") for i in range(100)]
    e = _edges(spark, rows)
    a = sorted(map(tuple, pagerank(e, iters=3).collect()))
    b = sorted(map(tuple, pagerank(e.repartition(13), iters=3).collect()))
    assert a == b


def test_no_collect_in_loop(spark):
    """The DISTRIBUTED loop must stay declarative: scalar stages (node
    count, dangling mass) enter via broadcast nested-loop joins, never
    a driver round-trip per iteration. Guard: the final plan contains
    broadcast exchanges and the ranks frame is a checkpointed scan
    (bounded lineage), not a 3-iteration join tower.
    driver_threshold=-1 forces the frame loop — sub-threshold graphs
    take the round-6 driver fold (row-identical, pinned in
    test_r06_optimizations), which is a deliberate single collect,
    not a per-iteration round-trip."""
    e = _edges(spark, [("a", "b"), ("b", "c")])
    out = pagerank(e, iters=2, driver_threshold=-1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # localCheckpoint per iteration truncates lineage: final plan is
    # flat (scan of the checkpointed RDD), not nested joins
    assert "Scan ExistingRDD" in plan, plan


def test_triangle_count_known_graphs(spark):
    from mms_rdf_spark.operators.pagerank import triangle_count

    def count(pairs):
        df = spark.createDataFrame(pairs, "src string, dst string")
        return triangle_count(df).collect()[0]["n_triangles"]

    # K4: 4 triangles (with duplicate/reversed/self edges thrown in)
    k4 = [(a, b) for a in "abcd" for b in "abcd" if a != b]
    assert count(k4 + [("a", "a"), ("b", "a")]) == 4
    # 4-cycle: none
    assert count([("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]) == 0
    # star + one chord: exactly 1
    assert count([("h", "x"), ("h", "y"), ("h", "z"), ("x", "y")]) == 1


def test_random_walks_follow_edges_and_are_deterministic(spark):
    from mms_rdf_spark.operators.pagerank import random_walks

    rows = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d")]
    e = _edges(spark, rows)
    out = sorted(map(tuple, random_walks(e, walk_len=3).collect()))
    # every step follows an actual edge
    eset = set(rows)
    by_walk = {}
    for wid, step, node in out:
        by_walk.setdefault(wid, {})[step] = node
    for wid, steps in by_walk.items():
        assert steps[0] == wid
        for s in range(1, max(steps) + 1):
            assert (steps[s - 1], steps[s]) in eset
    # 'd' is a sink: any walk reaching d stops there, others reach len 3
    assert all(max(s) <= 3 for s in by_walk.values())
    # deterministic under repartition
    again = sorted(map(tuple,
                       random_walks(e.repartition(5), walk_len=3)
                       .collect()))
    assert out == again


def test_neighborhood_mean_two_hops(spark):
    from mms_rdf_spark.operators.pagerank import neighborhood_mean

    # star: leaves l1/l2 feed hub h; hub feeds t
    e = _edges(spark, [("l1", "h"), ("l2", "h"), ("h", "t")])
    feats = spark.createDataFrame([("l1", 10.0), ("l2", 30.0)],
                                  "node string, f double")
    h1 = {r["node"]: r["f"] for r in
          neighborhood_mean(e, feats, hops=1).collect()}
    assert h1 == {"h": 20.0}   # mean of the leaves; t has no valued in
    h2 = {r["node"]: r["f"] for r in
          neighborhood_mean(e, feats, hops=2).collect()}
    assert h2 == {"t": 20.0}   # hub's value propagates one hop further


def test_negative_edges_properties(spark):
    from mms_rdf_spark.operators.pagerank import negative_edges

    edges = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("c", "z")],
        "src string, dst string")
    out = negative_edges(edges, k=3).collect()
    pos = {("a", "x"), ("a", "y"), ("b", "x"), ("c", "z")}
    for r in out:
        assert (r.src, r.neg_dst) not in pos   # no false negatives
        assert r.neg_dst != r.dst              # never the true tail
        assert 0 <= r.j < 3
    # at most k negatives per (positive edge, j) and deterministic
    keys = [(r.src, r.dst, r.j) for r in out]
    assert len(keys) == len(set(keys))
    again = negative_edges(edges, k=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_square_counts_c4_and_k4(spark):
    from mms_rdf_spark.operators.pagerank import square_counts

    # plain 4-cycle 1-2-3-4-1 (+ a pendant node 5 off node 1):
    # every cycle node sits on exactly one square, the pendant on none
    c4 = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 5)], "src long, dst long")
    got = {r.node: r.squares for r in square_counts(c4).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}

    # K4 has 3 four-cycles, each node on all 3 (global = 12 / 4 = 3)
    k4 = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)],
        "src long, dst long")
    got = {r.node: r.squares for r in square_counts(k4).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_densest_subgraph_finds_planted_clique(spark):
    from mms_rdf_spark.operators.pagerank import (
        densest_subgraph,
        density_profile,
    )

    # 4-clique {1,2,3,4} + pendant path 4-5-6-7: densest = the
    # clique (density 1.5 > 9/7 global); eps=0.1 peels the path
    # first, so suffix round 1 IS the clique
    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    path = [(4, 5), (5, 6), (6, 7)]
    e = spark.createDataFrame(clique + path, "src long, dst long")
    nodes = {r.node for r in
             densest_subgraph(e, eps=0.1).collect()}
    assert nodes == {1, 2, 3, 4}
    prof = {r.t: r for r in density_profile(e, eps=0.1).collect()}
    assert prof[0].n_nodes == 7 and prof[0].n_edges == 9
    assert prof[0].density == round(9 / 7, 6)
    assert max(r.density for r in prof.values()) == 1.5


def test_densest_subgraph_brute_force_bound(spark):
    from itertools import combinations

    from mms_rdf_spark.operators.pagerank import density_profile

    # deterministic 8-node graph; check the 2(1+eps) guarantee
    # against the exhaustive optimum
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6),
             (6, 7), (7, 5), (2, 8), (8, 1), (8, 3), (4, 7)]
    eps = 0.25
    best = 0.0
    nodes = sorted({x for p in edges for x in p})
    for k in range(1, len(nodes) + 1):
        for sub in combinations(nodes, k):
            s = set(sub)
            m = sum(1 for a, b in edges if a in s and b in s)
            best = max(best, m / len(s))
    e = spark.createDataFrame(edges, "src long, dst long")
    prof = density_profile(e, eps=eps).collect()
    found = max(r.density for r in prof)
    assert found >= best / (2 * (1 + eps)) - 1e-9
    assert found <= best + 1e-9  # never exceeds the true optimum


def test_densest_subgraph_empty_and_selfloop(spark):
    from mms_rdf_spark.operators.pagerank import (
        densest_subgraph,
        density_profile,
    )

    e = spark.createDataFrame([(1, 1)], "src long, dst long")
    # self-loops are dropped -> graph empty
    assert density_profile(e).count() == 0
    assert densest_subgraph(e).count() == 0
    empty = e.where("src < 0")
    assert density_profile(empty).count() == 0
